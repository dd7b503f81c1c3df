"""functions/hnsw.py — deterministic pure-Python HNSW (the reference's
embeddingstore serves NearestNeighbor from an hnswlib index,
embeddinghub/embeddingstore/index.cc:10-54; this is its in-process
sibling for the online path, recall-pinned against exact brute
force)."""

from __future__ import annotations

import hashlib
import math

import pytest

from embeddinghub_spark.functions.hnsw import HnswIndex


def _vec(i: int, dim: int = 16) -> list[float]:
    """Deterministic pseudo-random vector from md5 — no RNG state."""
    h = hashlib.md5(f"v{i}".encode()).hexdigest()
    out = []
    for d in range(dim):
        hh = hashlib.md5(f"{h}|{d}".encode()).hexdigest()
        out.append((int(hh[:8], 16) / 0xFFFFFFFF) * 2 - 1)
    return out


def _brute(vectors: dict, q: list[float], k: int) -> list[str]:
    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    return [
        kk for kk, _ in sorted(
            ((kk, l2(v, q)) for kk, v in vectors.items()),
            key=lambda t: (t[1], t[0]),
        )[:k]
    ]


def test_recall_against_brute_force():
    vecs = {f"k{i}": _vec(i) for i in range(500)}
    idx = HnswIndex(16, m=16, ef_construction=120)
    for kk in sorted(vecs):
        idx.add(kk, vecs[kk])
    hits = total = 0
    for qi in range(40):
        q = _vec(10_000 + qi)
        exact = set(_brute(vecs, q, 10))
        approx = {kk for kk, _ in idx.search(q, 10, ef=80)}
        hits += len(exact & approx)
        total += 10
    recall = hits / total
    assert recall >= 0.9, f"recall {recall}"


def test_deterministic_rebuild_and_exact_top1():
    vecs = {f"k{i}": _vec(i, 8) for i in range(200)}
    a = HnswIndex(8, m=8, ef_construction=60)
    b = HnswIndex(8, m=8, ef_construction=60)
    for kk in sorted(vecs):
        a.add(kk, vecs[kk])
        b.add(kk, vecs[kk])
    for qi in range(10):
        q = _vec(999 + qi, 8)
        assert a.search(q, 5) == b.search(q, 5)
    # querying an indexed vector itself returns it first at distance 0
    got = a.search(vecs["k7"], 1)
    assert got[0][0] == "k7" and got[0][1] == pytest.approx(0.0)


def test_incremental_add_overwrite_and_exclude():
    idx = HnswIndex(4, m=4, ef_construction=30)
    idx.add("a", [0, 0, 0, 0])
    idx.add("b", [1, 0, 0, 0])
    idx.add("c", [2, 0, 0, 0])
    assert [k for k, _ in idx.search([0.1, 0, 0, 0], 2)] == ["a", "b"]
    # overwrite moves a key: 'a' relocates far away
    idx.add("a", [9, 9, 9, 9])
    assert [k for k, _ in idx.search([0.1, 0, 0, 0], 2)] == ["b", "c"]
    assert [k for k, _ in idx.search([9, 9, 9, 9], 1)] == ["a"]
    # exclusion (the key-query-excludes-itself contract)
    got = idx.search([1, 0, 0, 0], 2, exclude={"b"})
    assert "b" not in [k for k, _ in got]
    with pytest.raises(ValueError, match="dim"):
        idx.add("bad", [1, 2])
    with pytest.raises(ValueError, match="dim"):
        idx.search([1, 2], 1)
    assert HnswIndex(4).search([0, 0, 0, 0], 3) == []


def test_space_ann_serving_path(spark):
    """Space.build_ann_index + nearest_neighbor(approximate=True):
    answers match exact brute force on a small space, writes after the
    build keep the index current, and the no-index call raises."""
    from embeddinghub_spark.serving.spaces import EmbeddingHub

    hub = EmbeddingHub(spark)
    sp = hub.create_space("ann_demo", dims=8)
    vecs = {f"k{i}": _vec(i, 8) for i in range(120)}
    sp.multiset(vecs)
    with pytest.raises(RuntimeError, match="no ANN index"):
        sp.nearest_neighbor(3, vector=_vec(1, 8), approximate=True)
    n = sp.build_ann_index(m=8, ef_construction=80)
    assert n == 120
    q = _vec(5000, 8)
    exact = sp.nearest_neighbor(5, vector=q)
    approx = sp.nearest_neighbor(5, vector=q, approximate=True, ef=80)
    assert len(set(exact) & set(approx)) >= 4
    # key query excludes itself on the approximate path too
    by_key = sp.nearest_neighbor(3, key="k7", approximate=True, ef=80)
    assert "k7" not in by_key and len(by_key) == 3
    # a post-build write is immediately visible
    sp.set("fresh", list(q))
    assert sp.nearest_neighbor(
        1, vector=q, approximate=True
    ) == ["fresh"]


def test_non_str_keys_rejected_at_insert():
    """ADVICE r14: the saved format is JSON, whose object keys are
    always strings — a non-str key would save fine but reload as str,
    silently breaking the load()-is-identical contract. Rejected at
    add() time instead."""
    idx = HnswIndex(4, m=4, ef_construction=20, seed=1)
    with pytest.raises(TypeError, match="keys must be str"):
        idx.add(7, [0.0, 0.0, 0.0, 0.0])
    with pytest.raises(TypeError, match="keys must be str"):
        idx.add((1, 2), [0.0, 0.0, 0.0, 0.0])
    idx.add("7", [0.0, 0.0, 0.0, 0.0])  # str keys unaffected
    assert idx.search([0.0, 0.0, 0.0, 0.0], k=1)[0][0] == "7"


def test_save_load_identical_and_o_n(tmp_path, monkeypatch):
    """VERDICT r13 #5: save -> load restores the EXACT graph — same
    entry point, levels, links and search results — and load performs
    ZERO distance evaluations (O(N) reconstruction, not the
    O(N·ef·log N) rebuild)."""
    idx = HnswIndex(8, m=8, ef_construction=60, seed=7)
    vecs = {f"k{i}": _vec(i, 8) for i in range(150)}
    for k in sorted(vecs):
        idx.add(k, vecs[k])
    p = str(tmp_path / "space.hnsw.json")
    idx.save(p)

    calls = {"n": 0}
    orig = HnswIndex._dist

    def counting(self, a, b):
        calls["n"] += 1
        return orig(self, a, b)

    monkeypatch.setattr(HnswIndex, "_dist", counting)
    loaded = HnswIndex.load(p)
    assert calls["n"] == 0, "load must not evaluate distances"
    monkeypatch.undo()

    assert loaded._entry == idx._entry
    assert loaded._levels == idx._levels
    assert loaded._links == idx._links
    assert loaded._vecs == idx._vecs
    for qi in (3, 77, 5000):
        q = _vec(qi, 8)
        assert loaded.search(q, 5, ef=60) == idx.search(q, 5, ef=60)
    # a loaded index keeps accepting writes
    loaded.add("new", _vec(9999, 8))
    assert "new" in loaded
    # unknown format is loud
    import json as _json
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as fh:
        _json.dump({"format": 99}, fh)
    with pytest.raises(ValueError, match="format"):
        HnswIndex.load(bad)


def test_space_persist_dir_roundtrip(spark, tmp_path, monkeypatch):
    """build_ann_index(persist_dir=…): first build saves; a second
    build with the UNCHANGED space loads (zero distance evals, same
    answers); mutating the space invalidates the digest and triggers
    a rebuild + re-save that indexes the new vector."""
    from embeddinghub_spark.serving.spaces import EmbeddingHub

    hub = EmbeddingHub(spark)
    sp = hub.create_space("persisted", dims=8)
    vecs = {f"k{i}": _vec(i, 8) for i in range(80)}
    sp.multiset(vecs)
    d = str(tmp_path / "idx")
    assert sp.build_ann_index(m=8, ef_construction=60, persist_dir=d) == 80
    import os
    assert os.path.exists(os.path.join(d, "persisted.hnsw.json"))
    q = _vec(42, 8)
    first = sp.nearest_neighbor(5, vector=q, approximate=True, ef=60)

    calls = {"n": 0}
    orig = HnswIndex.add

    def counting_add(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(HnswIndex, "add", counting_add)
    assert sp.build_ann_index(m=8, ef_construction=60, persist_dir=d) == 80
    assert calls["n"] == 0, "unchanged space must LOAD, not rebuild"
    monkeypatch.undo()
    assert sp.nearest_neighbor(
        5, vector=q, approximate=True, ef=60
    ) == first

    sp.set("extra", list(q))  # space changed -> digest mismatch
    assert sp.build_ann_index(m=8, ef_construction=60, persist_dir=d) == 81
    assert sp.nearest_neighbor(
        1, vector=q, approximate=True, ef=60
    ) == ["extra"]


def test_sharded_hnsw_matches_single_index(tmp_path):
    """VERDICT r14 #7: the sharding recipe (stable-hash key split +
    per-shard top-k merge) gives `nearest` a path beyond one driver's
    RAM. In the exhaustive regime (ef ≥ shard size) each shard search
    is exact, so the merged top-k must EQUAL the single index's exact
    top-k; save → load round-trips shard by shard; overwrites route to
    the owning shard."""
    from embeddinghub_spark.functions.hnsw import ShardedHnsw

    dim, n = 8, 200
    vecs = {f"k{i}": _vec(i, dim) for i in range(n)}
    single = HnswIndex(dim, m=8, ef_construction=60, seed=7)
    sharded = ShardedHnsw(dim, n_shards=4, m=8, ef_construction=60,
                          seed=7)
    for k in sorted(vecs):
        single.add(k, vecs[k])
        sharded.add(k, vecs[k])
    assert len(sharded) == n
    assert "k5" in sharded and "nope" not in sharded
    # shards are balanced enough to be a real split
    sizes = [len(s) for s in sharded._shards]
    assert min(sizes) > 0 and max(sizes) < n

    q = _vec(12345, dim)
    exact = sorted(
        ((sum((a - b) ** 2 for a, b in zip(q, v)), k)
         for k, v in vecs.items())
    )[:10]
    got_single = single.search(q, 10, ef=n)
    got_sharded = sharded.search(q, 10, ef=n)
    assert [(k, round(d, 9)) for k, d in got_sharded] == [
        (k, round(d, 9)) for d, k in exact
    ]
    assert got_sharded == [
        (k, d) for k, d in sorted(got_single, key=lambda t: (t[1], t[0]))
    ]

    # save → load → identical results
    d = str(tmp_path / "shards")
    sharded.save(d)
    back = ShardedHnsw.load(d)
    assert back.state_key() == sharded.state_key()
    assert back.search(q, 10, ef=n) == got_sharded

    # overwrite routes to the owning shard (no duplicate key)
    sharded.add("k5", _vec(999, dim))
    assert len(sharded) == n
    # exclude set flows through the fan-out
    ex = {exact[0][1]}
    got_ex = sharded.search(q, 3, ef=n, exclude=ex)
    assert ex.isdisjoint({k for k, _ in got_ex})
