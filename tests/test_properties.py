"""Property-based semantics checks (hypothesis): random inputs, the
operator's result compared against a brute-force Python reference.
Few examples per property (Spark jobs are the cost), deadline off —
the value is the adversarial input shapes (ties, empties, nulls,
whale keys), not the example count."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# Example budget (VERDICT r16 #2: the full suite must fit the round
# driver's pytest window — the r16 driver run was cut off at ~82%).
# Default 6; EH_TEST_FULL=1 restores 12 (run at round close). With
# derandomize=True the reduced run executes a strict PREFIX of the
# full run's example sequence, so it can never be flakier — only
# narrower — than the full suite that gates each round.
import os as _os

_MAX_EXAMPLES = 12 if _os.environ.get("EH_TEST_FULL") else 6

SETTINGS = dict(
    max_examples=_MAX_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
    derandomize=True,  # CI-stable: the seed is part of the suite
)

_ts = st.integers(min_value=0, max_value=50).map(
    lambda h: dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)
)
_entity = st.integers(min_value=0, max_value=6)
_value = st.integers(min_value=-5, max_value=5).map(float)

_rows = st.lists(st.tuples(_entity, _value, _ts), min_size=1, max_size=60)


@given(rows=_rows)
@settings(**SETTINGS)
def test_materialize_is_brute_force_latest(spark, rows):
    """C3: max(struct) winner == brute-force max by (ts, value)."""
    from embeddinghub_spark.operators.materialize import materialize

    df = spark.createDataFrame(rows, ["entity", "value", "ts"])
    got = {r["entity"]: (r["value"], r["ts"]) for r in materialize(df).collect()}
    want: dict = {}
    for e, v, t in rows:
        if e not in want or (t, v) > want[e][::-1]:
            want[e] = (v, t)
    assert got == want


@given(rows=_rows, labels=st.lists(st.tuples(_entity, _value, _ts), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_asof_union_is_brute_force_asof(spark, rows, labels):
    """C6: union+last ASOF == per-label brute-force scan of feature
    history (latest feature with f.ts <= l.ts, ties max value)."""
    from embeddinghub_spark.operators.pit import asof_join_union

    feats = spark.createDataFrame(rows, ["entity", "value", "ts"])
    lbls = spark.createDataFrame(labels, ["entity", "label", "ts"])
    out = asof_join_union(
        lbls.withColumnRenamed("label", "value"), feats, {"f": "value"}
    )
    got = {
        (r["entity"], r["value"], r["ts"]): r["f"] for r in out.collect()
    }
    for le, lv, lt in set(labels):
        cands = [(t, v) for (e, v, t) in rows if e == le and t <= lt]
        want = max(cands)[1] if cands else None
        assert got[(le, lv, lt)] == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=40
    )
)
@settings(**SETTINGS)
def test_connected_components_is_brute_force_union_find(spark, edges):
    """Large/small-star CC == brute-force union-find on any graph
    (self-loops, duplicates, reversed edges included)."""
    from embeddinghub_spark.functions.dedup import connected_components

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    # the r16 size-gated driver union-find and the distributed star
    # rounds must agree with the brute force (and each other) on
    # every generated graph
    got_dist = {
        r["node"]: r["component"]
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert got == got_dist

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@given(texts=st.lists(st.text(alphabet="ab c", max_size=12), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_simhash_staged_equals_expression_form(spark, texts):
    """The SWAR/explode simhash must stay bit-identical to the HOF
    expression form on arbitrary (incl. empty / whitespace-only)
    text."""
    from embeddinghub_spark.functions.dedup import simhash, simhash_staged

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    a = {r["doc_id"]: r["sh"] for r in
         df.select("doc_id", simhash("text").alias("sh")).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_staged(df).collect()}
    assert a == b


@given(
    target=st.lists(st.tuples(_entity, _value), min_size=1, max_size=20),
    source=st.lists(st.tuples(_entity, _value), min_size=1, max_size=20),
)
@settings(**SETTINGS)
def test_merge_upsert_df_is_dict_update(spark, target, source):
    """S12 rebuild == dict.update semantics: every source key wins,
    untouched target keys survive (duplicate keys within each side
    collapse to 'some row of that side', which both paths allow)."""
    from embeddinghub_spark.sources.tables import merge_upsert_df

    t = spark.createDataFrame(target, ["entity", "value"]).dropDuplicates(["entity"])
    s = spark.createDataFrame(source, ["entity", "value"]).dropDuplicates(["entity"])
    got = {r["entity"]: r["value"] for r in merge_upsert_df(t, s, ["entity"]).collect()}
    want = {e: v for e, v in t.collect()}
    want.update({e: v for e, v in s.collect()})
    assert got == want


@given(
    n=st.integers(min_value=1, max_value=200),
    test_size=st.sampled_from([0.1, 0.25, 0.5]),
    seed=st.integers(min_value=0, max_value=3),
)
@settings(**SETTINGS)
def test_train_test_split_partitions_deterministically(spark, n, test_size, seed):
    """C15: split is a PARTITION (every row in exactly one side) and a
    pure function of (data, seed) — rerunning yields the same split."""
    from embeddinghub_spark.operators.split import train_test_split

    df = spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("v"))
    tr1, te1 = train_test_split(df, test_size=test_size, seed=seed)
    tr2, te2 = train_test_split(df, test_size=test_size, seed=seed)
    ids_tr = {r["id"] for r in tr1.collect()}
    ids_te = {r["id"] for r in te1.collect()}
    assert ids_tr | ids_te == set(range(n))
    assert not (ids_tr & ids_te)
    assert ids_tr == {r["id"] for r in tr2.collect()}
    assert ids_te == {r["id"] for r in te2.collect()}


@given(
    n_tokens=st.integers(min_value=0, max_value=120),
    chunk=st.integers(min_value=2, max_value=24),
    overlap=st.integers(min_value=0, max_value=23),
)
@settings(**SETTINGS)
def test_chunk_documents_properties(spark, n_tokens, chunk, overlap):
    """Invariants for any (n, chunk_tokens, overlap):
    1) every token index is covered by some chunk;
    2) chunk i starts exactly at i·stride (starts strictly increase);
    3) no chunk's token window is contained in another's;
    4) every chunk has between 1 and chunk_tokens tokens;
    5) n == 0 emits no chunks.
    """
    from hypothesis import assume

    from embeddinghub_spark.functions.text import chunk_documents

    assume(overlap < chunk)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = sorted(
        (r["chunk_id"], r["chunk_text"].split(" "), r["chunk_n_tokens"])
        for r in chunk_documents(
            df, chunk_tokens=chunk, overlap=overlap
        ).collect()
    )
    if n_tokens == 0:
        assert out == []
        return
    stride = chunk - overlap
    covered = set()
    windows = []
    for i, (cid, toks, n) in enumerate(out):
        assert cid == i
        start = i * stride          # 0-based
        assert toks[0] == f"t{start}"
        assert 1 <= n <= chunk and len(toks) == n
        windows.append((start, start + n - 1))
        covered.update(range(start, start + n))
    assert covered == set(range(n_tokens))
    for a in windows:
        for b in windows:
            if a is not b:
                assert not (a[0] >= b[0] and a[1] <= b[1]), (a, b, out)


_vals = st.lists(
    st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200
)


@given(vals=_vals, q=st.sampled_from([0.25, 0.5, 0.75, 0.9, 1.0]))
@settings(**SETTINGS)
def test_histogram_quantiles_within_bin_width(spark, vals, q):
    """The sketch estimate is within one bin width of the true
    (nearest-rank-interpolated) quantile, for arbitrary distributions
    including constants, duplicates, and negatives."""
    from embeddinghub_spark.functions.profile import histogram_quantiles

    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    est = histogram_quantiles(df, "x", [q], n_bins=64).collect()[0]["value"]
    s = sorted(float(v) for v in vals)
    lo, hi = s[0], s[-1]
    if hi == lo:
        assert est == round(lo, 6)
        return
    bin_w = (hi - lo) / 64.0
    # true quantile by the same t = q*n crossing definition
    t = q * len(s)
    idx = max(0, min(len(s) - 1, int(t) - (1 if t == int(t) else 0)))
    truth = s[idx]
    assert est >= lo - 1e-9 and est <= hi + 1e-9
    assert abs(est - truth) <= bin_w + 1e-6


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=0, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_unigram_logprob_is_brute_force(spark, texts):
    """Operator == Python reference on arbitrary tiny corpora,
    including empty docs (no row) and single-word corpora."""
    import math

    from embeddinghub_spark.functions.text import unigram_logprob

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["logprob"])
        for r in unigram_logprob(df).collect()
    }
    counts: dict = {}
    for _, t in docs:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    n = sum(counts.values())
    want = {}
    for i, t in docs:
        ws = t.split()
        if not ws:
            continue
        terms = [round(math.log10(counts[w] / n), 9) for w in ws]
        want[i] = (len(ws), round(sum(terms) / len(ws), 6))
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-6


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["x", "y", "z", "w"]),
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(**SETTINGS)
def test_hll_profile_matches_python_replica(spark, rows):
    """The sketch is EXACTLY replayable: a pure-Python md5 register
    replica produces the identical estimate for arbitrary int/string
    columns (the property the DuckDB oracle relies on)."""
    import hashlib

    from embeddinghub_spark.functions.profile import _hll_alpha, hll_profile

    df = spark.createDataFrame(rows, ["a", "b"])
    got = {r["column"]: r["approx_ndv"] for r in hll_profile(df, ["a", "b"]).collect()}

    def replica(vals):
        m = 512
        regs: dict = {}
        for v in vals:
            h = hashlib.md5(str(v).encode()).hexdigest()
            bucket = int(h[:3], 16) % m
            x = int(h[3:16], 16)
            rho = 53 if x == 0 else 53 - len(bin(x)[2:])
            regs[bucket] = max(regs.get(bucket, 0), rho)
        s = sum(1 << (53 - r) for r in regs.values()) + (m - len(regs)) * (1 << 53)
        c1 = _hll_alpha(m) * m * m * float(1 << 53)
        raw = c1 / float(s)
        empties = m - len(regs)
        import math
        if raw <= 2.5 * m and empties > 0:
            return round(float(m) * math.log(float(m) / empties), 3)
        return round(raw, 3)

    assert got["a"] == replica([r[0] for r in rows])
    assert got["b"] == replica([r[1] for r in rows])


_vecs = st.lists(
    st.lists(
        st.integers(min_value=-3, max_value=3).map(float), min_size=4, max_size=4
    ).filter(lambda v: any(x != 0 for x in v)),
    min_size=2,
    max_size=24,
)


@given(vecs=_vecs)
@settings(**SETTINGS)
def test_semantic_dedup_is_brute_force(spark, vecs):
    """Operator == Python reference: nearest-centroid cells (max dot,
    smaller cell wins ties) and the lowest-id-wins keep rule, on
    arbitrary small-integer vectors (exact float arithmetic -> exact
    tie cases exercised)."""
    from embeddinghub_spark.functions.dedup import semantic_dedup

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    k = min(3, len(rows))
    thr = 0.8
    got = {r["vec_id"]: (r["cell"], r["kept"])
           for r in semantic_dedup(df, dim=4, n_clusters=k, threshold=thr).collect()}

    cents = [(c + 1, rows[c][1]) for c in range(k)]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def cell_of(v):
        return max(cents, key=lambda cv: (dot(cv[1], v), -cv[0]))[0]

    cells = {i: cell_of(v) for i, v in rows}
    import math
    kept = {}
    for i, v in rows:
        ok = True
        for j, w in rows:
            if j < i and cells[j] == cells[i]:
                c = dot(v, w) / (math.sqrt(dot(v, v)) * math.sqrt(dot(w, w)))
                if round(c, 6) >= thr:
                    ok = False
                    break
        kept[i] = ok
    assert got == {i: (cells[i], kept[i]) for i, _ in rows}


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["table", "stream", "vector", "join", "kafka", "zzz"]),
            min_size=0, max_size=6,
        ).map(" ".join),
        min_size=1, max_size=15,
    )
)
@settings(**SETTINGS)
def test_domain_tag_is_brute_force(spark, texts):
    from embeddinghub_spark.functions.text import DOMAIN_LEXICONS, domain_tag

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["domain"], r["domain_score"])
           for r in domain_tag(df).collect()}
    for i, t in rows:
        ws = [w.lower() for w in t.split()]
        scores = [
            (sum(1 for w in ws if w in set(lex)), -j, name)
            for j, (name, lex) in enumerate(DOMAIN_LEXICONS.items())
        ]
        s, _, name = max(scores)
        want = ("other", 0) if s == 0 else (name, s)
        assert got[i] == want, (i, t, got[i], want)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_cms_topk_matches_python_replica(spark, docs):
    """At collision-forcing width=4 the sketch estimate equals a
    pure-Python count-min replica exactly, and never underestimates —
    the one-sided CMS error guarantee."""
    import hashlib
    from collections import Counter

    from embeddinghub_spark.functions.profile import cms_topk

    width, depth, k = 4, 2, 8
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        r["token"]: (r["exact_count"], r["cms_estimate"], r["overestimate"])
        for r in cms_topk(df, depth=depth, width=width, k=k).collect()
    }

    exact = Counter(t for d in docs for t in d)
    counters: Counter = Counter()
    for tok, n in exact.items():
        for d in range(depth):
            h = hashlib.md5(f"{d}:{tok}".encode()).hexdigest()
            counters[(d, int(h[:15], 16) % width)] += n

    topk = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert set(got) == {t for t, _ in topk}
    for tok, n in topk:
        est = min(
            counters[(d, int(hashlib.md5(f"{d}:{tok}".encode()).hexdigest()[:15], 16) % width)]
            for d in range(depth)
        )
        assert got[tok] == (n, est, est - n), (tok, got[tok], (n, est))
        assert est >= n


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10000),
            st.integers(min_value=-500, max_value=500),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_zorder_key_matches_python_replica(spark, rows):
    """The Morton key equals a pure-Python interleave of the same
    min-max-scaled values for arbitrary int columns (incl. negatives
    and constant columns)."""
    from embeddinghub_spark.functions.layout import with_zorder_key

    bits = 8
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], ["id", "a", "b"]
    )
    got = {
        r["id"]: r["z_key"]
        for r in with_zorder_key(df, ["a", "b"], bits=bits).collect()
    }

    amin, amax = min(a for a, _ in rows), max(a for a, _ in rows)
    bmin, bmax = min(b for _, b in rows), max(b for _, b in rows)

    def scale(x, lo, hi):
        if hi == lo:
            return 0
        import math
        return math.floor((x - lo) * ((1 << bits) - 1) / (hi - lo))

    def interleave(sa, sb):
        z = 0
        for bit in range(bits):
            z |= ((sa >> bit) & 1) << (bit * 2)
            z |= ((sb >> bit) & 1) << (bit * 2 + 1)
        return z

    for i, (a, b) in enumerate(rows):
        assert got[i] == interleave(scale(a, amin, amax), scale(b, bmin, bmax)), (
            i, a, b, got[i],
        )


@given(
    starts=st.lists(
        st.integers(min_value=1, max_value=60), min_size=1, max_size=25
    ),
    gram_n=st.integers(min_value=2, max_value=6),
)
@settings(**SETTINGS)
def test_span_islands_matches_python_replica(spark, starts, gram_n):
    """The gaps-and-islands window merge equals a straightforward
    Python sweep for arbitrary duplicated-gram start sets (duplicate
    starts included — they collapse like any overlapping hit)."""
    from embeddinghub_spark.functions.dedup import _span_islands

    df = spark.createDataFrame([(1, s) for s in starts], ["doc_id", "start"])
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in _span_islands(df, "doc_id", gram_n).collect()
    )

    expected = []
    for s in sorted(set(starts)):
        fin = s + gram_n - 1
        if expected and s <= expected[-1][1] + 1:
            expected[-1] = (expected[-1][0], max(expected[-1][1], fin))
        else:
            expected.append((s, fin))
    assert got == expected, (starts, gram_n, got, expected)


@given(
    members=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6),
                    min_size=1, max_size=30),
    probes=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6),
                   min_size=1, max_size=30),
)
@settings(**SETTINGS)
def test_bloom_no_false_negatives(spark, members, probes):
    """Every true member probes positive (the Bloom guarantee);
    at generous m_bits the tiny test sets also produce no false
    positives, pinning the hash arithmetic end to end."""
    from embeddinghub_spark.functions.profile import bloom_build, bloom_probe

    mdf = spark.createDataFrame([(m,) for m in members], ["key"])
    pdf = spark.createDataFrame([(p,) for p in probes], ["key"])
    bloom = bloom_build(mdf, "key", m_bits=8192, k_hashes=4)
    got = {
        r["key"]: r["maybe_member"]
        for r in bloom_probe(pdf, bloom, "key", m_bits=8192, k_hashes=4).collect()
    }
    for p in probes:
        assert got[p] == (p in members), (p, got[p])


def test_bloom_probe_validates_and_returns_candidate_rows(spark):
    """Probe-side parameter validation (a silent mismatch would break
    the no-false-negative guarantee) and the full-candidate-row
    output contract."""
    import pytest

    from embeddinghub_spark.functions.profile import bloom_build, bloom_probe

    mdf = spark.createDataFrame([("a",), ("b",)], ["key"])
    cdf = spark.createDataFrame([(1, "a"), (2, "a"), (3, "zz")], ["rid", "key"])
    bloom = bloom_build(mdf, "key", m_bits=4096)
    out = {r["rid"]: r["maybe_member"]
           for r in bloom_probe(cdf, bloom, "key", m_bits=4096).collect()}
    assert out == {1: True, 2: True, 3: False}  # dup rows preserved
    with pytest.raises(ValueError, match="m_bits"):
        bloom_probe(cdf, bloom, "key", m_bits=1000)


def test_bloom_probe_null_key_rows_retained(spark):
    """NULL-key candidate rows come back (the rejoin is null-safe,
    not a plain equi-join that silently drops them) flagged
    maybe_member=false — a NULL key was never inserted, so false is
    the only answer consistent with no-false-negatives."""
    from embeddinghub_spark.functions.profile import bloom_build, bloom_probe

    mdf = spark.createDataFrame([("a",), ("b",)], ["key"])
    cdf = spark.createDataFrame([(1, "a"), (2, None), (3, None)], ["rid", "key"])
    bloom = bloom_build(mdf, "key", m_bits=4096)
    out = {
        r["rid"]: r["maybe_member"]
        for r in bloom_probe(cdf, bloom, "key", m_bits=4096).collect()
    }
    assert out == {1: True, 2: False, 3: False}


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),
            st.text(alphabet="abcdef ", min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(**{**SETTINGS, "max_examples": 5})  # 12 Spark jobs per example
def test_sketch_union_laws_across_partitionings(spark, rows):
    """Every sketch in the family (HLL max-merge, CMS +-merge,
    histogram +-merge, Bloom OR-merge) must be PARTIAL-AGGREGATION-
    ORDER INDEPENDENT: the collected result is bit-identical however
    the input is partitioned — 1 partition (no partial merge), 7
    (uneven partials), 32 (mostly-empty partials). This is the
    algebraic property that makes the sketches 100 TB-safe: AQE,
    speculative re-execution, and shard-at-a-time building cannot
    change the answer."""
    from embeddinghub_spark.functions.profile import (
        bloom_build,
        cms_topk,
        histogram_quantiles,
        hll_profile,
    )

    base = spark.createDataFrame(rows, ["num", "txt"])

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    results = {"hll": [], "cms": [], "hist": [], "bloom": []}
    for parts in (1, 7, 32):
        df = base.repartition(parts)
        results["hll"].append(canon(hll_profile(df, ["num", "txt"])))
        results["cms"].append(canon(cms_topk(df.select(F.col("txt").alias("text")), depth=3, width=32, k=5)))
        results["hist"].append(
            canon(histogram_quantiles(df, "num", [0.25, 0.5, 0.9], n_bins=16))
        )
        results["bloom"].append(canon(bloom_build(df, "txt", m_bits=2048)))
    for name, (a, b, c) in results.items():
        assert a == b == c, f"{name} sketch varies with partitioning"


def test_hll_distinct_by_accuracy_and_partition_invariance(spark):
    """Grouped HLL: per-group estimate within the sketch's error
    band of the exact grouped distinct, NULL values excluded,
    all-NULL groups absent, and the result identical across
    partitionings (the max-merge law, grouped)."""
    import pytest

    from embeddinghub_spark.functions.profile import hll_distinct_by

    rows = (
        [("a", i % 700) for i in range(4000)]
        + [("b", i % 23) for i in range(400)]
        + [("c", None)] * 10
    )
    df = spark.createDataFrame(rows, ["grp", "uid"])
    outs = []
    for parts in (1, 32):
        out = {
            r["grp"]: r["approx_ndv"]
            for r in hll_distinct_by(
                df.repartition(parts), ["grp"], "uid"
            ).collect()
        }
        outs.append(out)
    assert outs[0] == outs[1]
    got = outs[0]
    assert set(got) == {"a", "b"}  # all-NULL group absent
    assert abs(got["a"] - 700) / 700 < 0.15  # ~3 sigma at p=9
    assert abs(got["b"] - 23) / 23 < 0.15
    with pytest.raises(ValueError, match="fractional"):
        hll_distinct_by(
            spark.createDataFrame([("a", 1.0)], ["grp", "v"]), ["grp"], "v"
        )


def test_histogram_quantiles_by_matches_per_group_brute_force(spark):
    """Grouped histogram quantiles: each group's estimate is within
    one bin width of the exact per-group quantile, degenerate groups
    return their constant, and all-NULL groups are absent."""
    from embeddinghub_spark.functions.profile import histogram_quantiles_by

    rows = (
        [("a", float(i)) for i in range(1000)]
        + [("b", 7.0)] * 50
        + [("c", None)] * 5
    )
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {
        (r["grp"], r["quantile"]): r["value"]
        for r in histogram_quantiles_by(
            df, ["grp"], "v", [0.5, 0.9], n_bins=64
        ).collect()
    }
    assert set(g for g, _ in out) == {"a", "b"}
    bin_w = 999.0 / 64
    assert abs(out[("a", 0.5)] - 499.5) <= bin_w
    assert abs(out[("a", 0.9)] - 899.1) <= bin_w
    assert out[("b", 0.5)] == 7.0 and out[("b", 0.9)] == 7.0


def test_bigram_logprob_is_brute_force(spark):
    """Interpolated bigram LM vs a Python replica on a tiny corpus:
    identical n_bigrams and logprob (round-6), <2-token docs absent,
    and word order actually matters (a shuffled doc scores lower
    than its in-order twin when the corpus repeats the ordered
    phrase)."""
    import math

    from embeddinghub_spark.functions.text import bigram_logprob

    docs = [
        (1, "the quick brown fox"),
        (2, "the quick brown fox"),
        (3, "fox the brown quick"),
        (4, "single"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob"])
        for r in bigram_logprob(df).collect()
    }
    assert set(got) == {1, 2, 3}

    # Python replica with the same decimal discipline
    toks = {d: t.split() for d, t in docs if len(t.split()) >= 2}
    from collections import Counter

    bc: Counter = Counter()
    for ts in toks.values():
        bc.update(zip(ts, ts[1:]))
    cf: Counter = Counter()
    for (w1, _), c in bc.items():
        cf[w1] += c
    wc: Counter = Counter()
    for _, t in docs:
        wc.update(w for w in t.split() if w)
    n = sum(wc.values())
    lam = 0.7
    for d, ts in toks.items():
        tfb = Counter(zip(ts, ts[1:]))
        total = 0
        acc = 0.0
        for (w1, w2), tf in tfb.items():
            p = lam * (bc[(w1, w2)] / cf[w1]) + (1.0 - lam) * (wc[w2] / n)
            acc += round(tf * math.log10(p), 9)
            total += tf
        assert got[d][0] == total
        assert abs(got[d][1] - round(acc / total, 6)) < 1e-9, d
    # word order matters: the in-order phrase (seen twice) outscores
    # its shuffled twin
    assert got[1][1] > got[3][1]


def test_group_overlap_estimates_jaccard(spark):
    """Bottom-k overlap matrix: disjoint groups estimate exactly 0,
    identical groups exactly 1, a known 1/3 overlap lands within the
    sketch's error band, and the estimate is partitioning-invariant
    (deterministic md5 order, not sample luck)."""
    from embeddinghub_spark.functions.profile import group_overlap

    rows = (
        [("a", i) for i in range(300)]
        + [("b", i) for i in range(150, 450)]   # |a∩b|=150, |a∪b|=450 → 1/3
        + [("c", i) for i in range(10_000, 10_300)]
        + [("d", i) for i in range(300)]        # d == a → J = 1
    )
    df = spark.createDataFrame(rows, ["src", "v"])
    outs = []
    for parts in (1, 32):
        out = {
            (r["group_a"], r["group_b"]): r["est_jaccard"]
            for r in group_overlap(
                df.repartition(parts), "src", "v", k=128
            ).collect()
        }
        outs.append(out)
    assert outs[0] == outs[1], "sketch must be partitioning-invariant"
    got = outs[0]
    assert got[("a", "c")] == 0.0 and got[("b", "c")] == 0.0
    assert got[("a", "d")] == 1.0
    assert abs(got[("a", "b")] - 1 / 3) < 0.12  # ~3/sqrt(128)


# -- cdc_apply ≡ dict replay --------------------------------------------------

_cdc_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.sampled_from(["U", "D", "I"]),
        st.integers(min_value=-9, max_value=9),  # value
    ),
    min_size=0,
    max_size=30,
)
_cdc_snap = st.dictionaries(
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=-9, max_value=9),
    max_size=6,
)


@given(snap=_cdc_snap, ops=_cdc_ops)
@settings(**SETTINGS)
def test_cdc_apply_is_dict_replay(spark, snap, ops):
    from embeddinghub_spark.operators.cdc import cdc_apply

    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [(None, None)],
        "k INT, v INT",
    )
    if not snap:
        snap_df = snap_df.filter("k IS NOT NULL")
    log_df = spark.createDataFrame(
        [(k, i + 1, op, v) for i, (k, op, v) in enumerate(ops)]
        or [(None, None, None, None)],
        "k INT, seq INT, op STRING, v INT",
    )
    if not ops:
        log_df = log_df.filter("k IS NOT NULL")
    got = {
        r["k"]: r["v"]
        for r in cdc_apply(snap_df, log_df, ["k"]).collect()
    }
    want = dict(snap)
    # replay in seq order: latest op per key wins by construction
    for k, op, v in ops:
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


# -- fuzzy_pairs ≡ brute force on adversarial short strings -------------------


@given(
    texts=st.lists(
        st.text(alphabet="ab", max_size=5), min_size=2, max_size=10
    ),
    k=st.integers(min_value=1, max_value=2),
)
@settings(**SETTINGS)
def test_fuzzy_pairs_is_bruteforce_on_short_strings(spark, texts, k):
    """Tiny two-letter strings maximize duplicate grams, empty
    strings, and pairs below the pigeonhole bound — the filter's
    hardest regime."""
    import itertools

    from embeddinghub_spark.functions.fuzzy import fuzzy_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    df = spark.createDataFrame(list(enumerate(texts)), "id INT, s STRING")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=k).collect()
    }
    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(texts), 2)
        if lev(a, b) <= k
    }
    assert got == want


# -- scd2_build ≡ sorted-collapse replay --------------------------------------


@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=10),  # ts hour
            st.sampled_from(["x", "y", None]),  # attr (incl. NULL)
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_scd2_build_is_sorted_collapse_replay(spark, changes):
    from embeddinghub_spark.operators.cdc import scd2_build

    rows = [
        (k, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), a)
        for k, h, a in changes
    ]
    df = spark.createDataFrame(rows, "k INT, ts TIMESTAMP, a STRING")
    def nskey(t):
        return (
            t[0],
            t[1] is not None,
            t[1] or "",
            t[2],
            t[3] is not None,
            t[3] or dt.datetime.min,
            t[4],
        )

    got = sorted(
        (
            (r.k, r.a, r.valid_from, r.valid_to, r.version, r.is_current)
            for r in scd2_build(df, ["k"], "ts").collect()
        ),
        key=nskey,
    )
    # replica: per key sort by (ts, attr NULLS FIRST), collapse equal
    # consecutive attrs, chain intervals
    want = []
    bykey = {}
    for k, ts, a in rows:
        bykey.setdefault(k, []).append((ts, a))
    for k, items in bykey.items():
        items.sort(key=lambda t: (t[0], t[1] is not None, t[1] or ""))
        kept = []
        for ts, a in items:
            if not kept or kept[-1][1] != a:
                kept.append((ts, a))
        for i, (ts, a) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            want.append((k, a, ts, nxt, i + 1, nxt is None))
    assert got == sorted(want, key=nskey)


# -- scd2_merge(prefix, suffix) ≡ scd2_build(full) ---------------------------


@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=20),
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=1,
        max_size=30,
    ),
    cut=st.integers(min_value=0, max_value=21),
)
@settings(**SETTINGS)
def test_scd2_merge_prefix_suffix_equals_full_build(spark, changes, cut):
    """Any time-cutoff split is in-order per key, so the incremental
    merge must reproduce the from-scratch build exactly."""
    from embeddinghub_spark.operators.cdc import scd2_build, scd2_merge

    rows = [
        (k, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), a)
        for k, h, a in changes
    ]
    cutoff = dt.datetime(2024, 1, 1) + dt.timedelta(hours=cut)
    df = spark.createDataFrame(rows, "k INT, ts TIMESTAMP, a STRING")
    old = df.filter(F.col("ts") < F.lit(cutoff))
    new = df.filter(F.col("ts") >= F.lit(cutoff))
    dim = scd2_build(old, ["k"], "ts")
    got = sorted(
        (r.k, r.a, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_merge(dim, new, ["k"], "ts").collect()
    )
    want = sorted(
        (r.k, r.a, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_build(df, ["k"], "ts").collect()
    )
    assert got == want


def test_kn_bigram_logprob_is_brute_force(spark):
    """Interpolated Kneser–Ney vs a Python replica on a tiny corpus —
    identical n_bigrams/logprob under the same decimal discipline —
    plus the KN signature: a word frequent in ONE context only
    ("francisco", always after "san") gets a lower continuation
    weight than an equally-frequent word seen in many contexts."""
    import math
    from collections import Counter

    from embeddinghub_spark.functions.text import kn_bigram_logprob

    docs = [
        (1, "san francisco is in san francisco bay"),
        (2, "the bay and the bridge and the fog"),
        (3, "san francisco fog"),
        (4, "solo"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob"])
        for r in kn_bigram_logprob(df).collect()
    }
    assert set(got) == {1, 2, 3}

    toks = {d: t.split() for d, t in docs if len(t.split()) >= 2}
    bc: Counter = Counter()
    for ts in toks.values():
        bc.update(zip(ts, ts[1:]))
    cf: Counter = Counter()
    t_of: Counter = Counter()
    ncont: Counter = Counter()
    for (w1, w2), c in bc.items():
        cf[w1] += c
        t_of[w1] += 1
        ncont[w2] += 1
    b = len(bc)
    dsc = 0.75
    for d, ts in toks.items():
        tfb = Counter(zip(ts, ts[1:]))
        total, acc = 0, 0.0
        for (w1, w2), tf in tfb.items():
            p = (
                max(bc[(w1, w2)] - dsc, 0.0) / cf[w1]
                + dsc * t_of[w1] / cf[w1] * (ncont[w2] / b)
            )
            acc += round(tf * math.log10(p), 9)
            total += tf
        assert got[d][0] == total
        assert abs(got[d][1] - round(acc / total, 6)) < 1e-9, d

    # KN signature: continuation probability of "francisco" (1 distinct
    # left-context) is lower than "the"-style multi-context words even
    # when raw frequency is equal; assert via the model stats replica.
    assert ncont[("francisco")] == 1
    assert ncont[("bay")] == 2  # after "francisco" and after "the"


def test_kn_trigram_logprob_is_brute_force(spark):
    """Trigram interpolated Kneser–Ney vs a Python replica: identical
    n_trigrams/logprob under the same decimal discipline, with every
    model statistic (context totals, type counts, continuation
    counts) rebuilt independently from the trigram type table."""
    import math
    from collections import Counter

    from embeddinghub_spark.functions.text import kn_trigram_logprob

    docs = [
        (1, "san francisco is in san francisco bay"),
        (2, "the bay and the bridge and the fog rolls in"),
        (3, "san francisco fog rolls in the bay"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_trigrams"], r["logprob"])
        for r in kn_trigram_logprob(df).collect()
    }
    assert set(got) == {1, 2, 3}

    toks = {d: t.split() for d, t in docs if len(t.split()) >= 3}
    tc: Counter = Counter()
    for ts in toks.values():
        tc.update(zip(ts, ts[1:], ts[2:]))
    cf12: Counter = Counter()
    t12: Counter = Counter()
    nmid: Counter = Counter()
    for (w1, w2, w3), c in tc.items():
        cf12[(w1, w2)] += c
        t12[(w1, w2)] += 1
        nmid[(w2, w3)] += 1
    nd2: Counter = Counter()
    t2: Counter = Counter()
    n3: Counter = Counter()
    for (w2, w3), n in nmid.items():
        nd2[w2] += n
        t2[w2] += 1
        n3[w3] += 1
    bt = len(nmid)
    dsc = 0.75
    for d, ts in toks.items():
        tft = Counter(zip(ts, ts[1:], ts[2:]))
        total, acc = 0, 0.0
        for (w1, w2, w3), tf in tft.items():
            p_low = (
                max(nmid[(w2, w3)] - dsc, 0.0) / nd2[w2]
                + dsc * t2[w2] / nd2[w2] * (n3[w3] / bt)
            )
            p = (
                max(tc[(w1, w2, w3)] - dsc, 0.0) / cf12[(w1, w2)]
                + dsc * t12[(w1, w2)] / cf12[(w1, w2)] * p_low
            )
            acc += round(tf * math.log10(p), 9)
            total += tf
        assert got[d][0] == total
        assert abs(got[d][1] - round(acc / total, 6)) < 1e-9, d


# ---------------------------------------------------------------- r12 staged
# selection family: random weights/budgets/corpora vs brute-force replicas


_domains = st.sampled_from(["a", "b", "c"])
_sel_rows = st.lists(
    st.tuples(st.integers(min_value=1, max_value=500), _domains),
    min_size=1,
    max_size=50,
    unique_by=lambda t: t[0],
)
_weights = st.dictionaries(
    _domains,
    st.integers(min_value=0, max_value=7),
    min_size=1,
    max_size=3,
).filter(lambda w: sum(w.values()) > 0)


@given(rows=_sel_rows, weights=_weights,
       total=st.integers(min_value=1, max_value=200),
       epochs=st.integers(min_value=1, max_value=4))
@settings(**SETTINGS)
def test_epoch_interleave_is_brute_force(spark, rows, weights, total, epochs):
    """epoch_interleave == the pure-Python stride/epoch replay under
    random weights (including zero-weight domains), budgets and caps:
    per-domain contribution is exactly min(quota, epochs·n_d), each
    epoch a fresh md5 permutation, merged rank contiguous from 1."""
    import hashlib

    from embeddinghub_spark.functions.selection import (
        epoch_interleave,
        mixture_budgets,
    )

    quotas = {
        d: q for d, q in mixture_budgets(weights, total).items() if q > 0
    }
    if not quotas:
        return  # contract: raises; covered by the unit test
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    got = sorted(
        (r["doc_id"], r["domain"], r["epoch"], r["domain_position"],
         r["slot"], r["position"])
        for r in epoch_interleave(
            df, ["doc_id"], domain_col="domain", weights=weights,
            total_rows=total, max_epochs=epochs,
        ).collect()
    )
    by_dom: dict = {}
    for key, dom in rows:
        if dom in quotas:
            by_dom.setdefault(dom, []).append(key)
    merged = []
    for dom, keys in by_dom.items():
        q, nd = quotas[dom], len(keys)
        kd = min(q, epochs * nd)
        for e in range((kd - 1) // nd + 1):
            perm = sorted(
                keys,
                key=lambda k: (
                    hashlib.md5(f"{k}|42|{e}".encode()).hexdigest(), k
                ),
            )
            for p, key in enumerate(perm, start=1):
                slot = e * nd + p
                if slot > kd:
                    break
                merged.append(
                    ((2 * slot - 1) * total // q, dom, slot, key, e, p)
                )
    merged.sort()
    exp = sorted(
        (key, dom, e, p, slot, i + 1)
        for i, (_k, dom, slot, key, e, p) in enumerate(merged)
    )
    assert got == exp


_tok_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=0, max_value=40),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(rows=_tok_rows, bs=st.integers(min_value=1, max_value=7))
@settings(**SETTINGS)
def test_length_buckets_is_brute_force(spark, rows, bs):
    """length_buckets == brute-force bucket/shuffle/batch replay,
    including zero-token docs (bucket 0) and overflow (NULL pad)."""
    import hashlib

    from embeddinghub_spark.functions.selection import length_buckets

    bounds = [4, 8, 16]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = sorted(
        (r["doc_id"], r["bucket_id"], r["bucket_position"], r["batch_id"],
         r["batch_slot"], r["padded_len"], r["pad_waste"])
        for r in length_buckets(
            df, n_tokens_col="n_tokens", batch_size=bs, boundaries=bounds,
            key_cols=["doc_id"],
        ).collect()
    )

    def bkt(n):
        for i, b in enumerate(bounds):
            if n <= b:
                return i
        return len(bounds)

    byb: dict = {}
    for d, n in rows:
        byb.setdefault(bkt(n), []).append((d, n))
    exp = []
    for b, ds in byb.items():
        perm = sorted(
            ds,
            key=lambda x: (hashlib.md5(f"{x[0]}|42".encode()).hexdigest(),
                           str(x[0])),
        )
        for p, (d, n) in enumerate(perm, start=1):
            pl = bounds[b] if b < len(bounds) else None
            exp.append((d, b, p, (p - 1) // bs, (p - 1) % bs, pl,
                        (pl - n) if pl is not None else None))
    assert got == sorted(exp)


@given(n_tokens=st.lists(st.integers(min_value=0, max_value=30),
                         min_size=1, max_size=40),
       L=st.integers(min_value=1, max_value=17))
@settings(**SETTINGS)
def test_pack_sequences_tiles_exactly(spark, n_tokens, L):
    """pack_sequences under random token counts and context lengths:
    slices tile every kept document AND every sequence exactly; total
    slice tokens == total kept tokens; zero-token docs drop."""
    from embeddinghub_spark.functions.text import pack_sequences

    rows = [(i, n) for i, n in enumerate(n_tokens)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = pack_sequences(
        df, order_cols=["doc_id"], n_tokens_col="n_tokens", max_seq_len=L
    ).collect()
    kept = {i: n for i, n in rows if n > 0}
    assert {r["doc_id"] for r in out} == set(kept)
    assert sum(r["slice_len"] for r in out) == sum(kept.values())
    bydoc: dict = {}
    byseq: dict = {}
    for r in out:
        bydoc.setdefault(r["doc_id"], []).append(r)
        byseq.setdefault(r["seq_id"], []).append(r)
    for d, rs in bydoc.items():
        rs = sorted(rs, key=lambda r: r["doc_offset"])
        assert rs[0]["doc_offset"] == 0
        for a, b in zip(rs, rs[1:]):
            assert a["doc_offset"] + a["slice_len"] == b["doc_offset"]
        assert rs[-1]["doc_offset"] + rs[-1]["slice_len"] == kept[d]
    if byseq:
        last = max(byseq)
        for s, rs in byseq.items():
            rs = sorted(rs, key=lambda r: r["seq_offset"])
            assert rs[0]["seq_offset"] == 0
            for a, b in zip(rs, rs[1:]):
                assert a["seq_offset"] + a["slice_len"] == b["seq_offset"]
            total = rs[-1]["seq_offset"] + rs[-1]["slice_len"]
            assert total == L or (s == last and total <= L)
