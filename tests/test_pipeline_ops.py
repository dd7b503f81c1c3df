"""Unit tests for the round-3 training-pipeline additions: quality
filtering, token-shard packing, n-gram counting, markup stripping, and
the embedding-column transforms."""

import math

import pytest
from pyspark.sql import functions as F

from embeddinghub_spark.functions.embeddings import (
    group_centroids,
    normalize_vectors,
    random_projection,
)
from embeddinghub_spark.functions.text import (
    pack_token_shards,
    quality_filter,
    strip_markup,
    top_ngrams,
)


def _docs(spark):
    long_ok = (
        "the quick brown fox jumps over a lazy dog and then runs far away "
        "to find more food while birds sing songs in tall trees near calm "
        "rivers during warm summer days"
    )
    return spark.createDataFrame(
        [
            (1, long_ok),                               # passes everything
            (2, "short text"),                          # too_short
            (3, ("spam " * 48).strip()),                # repetition + stopwords
            (4, ("a@# b@# c@# " * 16).strip()),         # symbols
            (5, ""),                                    # empty
        ],
        ["doc_id", "text"],
    )


def test_quality_filter_rules(spark):
    out = {r["doc_id"]: r for r in quality_filter(_docs(spark)).collect()}
    assert out[1]["keep"] is True and out[1]["fail_reasons"] == ""
    assert out[2]["keep"] is False
    assert "too_short" in out[2]["fail_reasons"]
    assert out[3]["keep"] is False
    assert "repetition" in out[3]["fail_reasons"]
    assert "low_diversity" in out[3]["fail_reasons"]
    assert out[4]["keep"] is False
    assert "symbols" in out[4]["fail_reasons"]
    # empty doc: no repetition rows — defaults keep it measurable
    assert out[5]["keep"] is False
    assert out[5]["n_tokens"] == 0
    assert out[5]["distinct_ratio"] == 1.0


def test_quality_filter_custom_rules(spark):
    relaxed = {r["doc_id"]: r for r in quality_filter(
        _docs(spark), rules={"min_tokens": 2, "min_stopword_frac": 0.0,
                             "max_top_token_frac": 1.0, "min_distinct_ratio": 0.0}
    ).collect()}
    assert relaxed[2]["keep"] is True


def test_pack_token_shards(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         [(1, 30), (2, 30), (3, 30), (4, 30), (5, 150), (6, 10)]],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           pack_token_shards(df, shard_tokens=100).collect()}
    # offsets are the exclusive running sum in doc_id order
    assert [out[i]["start_offset"] for i in range(1, 7)] == [0, 30, 60, 90, 120, 270]
    assert [out[i]["shard_id"] for i in range(1, 7)] == [0, 0, 0, 0, 1, 2]
    assert out[4]["shard_pos"] == 90  # straddles into shard 1's budget
    # partition-count independence: same result with a different layout
    out3 = {r["doc_id"]: r for r in
            pack_token_shards(df, shard_tokens=100, num_partitions=3).collect()}
    assert all(out[i]["shard_id"] == out3[i]["shard_id"] for i in out)


def test_top_ngrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b x"), (3, "")], ["doc_id", "text"]
    )
    rows = top_ngrams(df, n=2, k=3).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in rows] == [
        ("a b", 3), ("b c", 1), ("b x", 1)  # ties broken by ngram asc
    ]


def test_strip_markup(spark):
    df = spark.createDataFrame(
        [(1, '<p class="x">hello <b>world</b></p> see https://ex.com/a now'),
         (2, "plain text")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in strip_markup(df).collect()}
    assert out[1]["clean_text"] == "hello world see now"
    assert out[1]["n_tags"] == 4 and out[1]["n_urls"] == 1
    assert out[2]["clean_text"] == "plain text"
    assert out[2]["n_tags"] == 0 and out[2]["n_urls"] == 0


def test_interval_join_semantics(spark):
    from embeddinghub_spark.operators.batch import interval_join

    points = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 15), (4, 100), (5, -5)], ["pid", "pos"]
    )
    ivs = spark.createDataFrame(
        [("a", 0, 10), ("b", 10, 20), ("c", 90, 200), ("d", 50, 40)],
        ["iid", "s", "e"],
    )
    out = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(points, ivs, "pos", "s", "e", 8).collect()
    )
    # inclusive both ends; pos=10 matches a AND b; inverted interval d
    # dropped; pair appears exactly once even when the interval spans
    # several buckets (c: buckets 11..25 with width 8)
    assert out == [(1, "a"), (2, "a"), (2, "b"), (3, "b"), (4, "c")]
    # bucket width must not change results
    for w in (1, 3, 64, 1000):
        assert out == sorted(
            (r["pid"], r["iid"])
            for r in interval_join(points, ivs, "pos", "s", "e", w).collect()
        )


def test_interval_join_with_keys(spark):
    from embeddinghub_spark.operators.batch import interval_join

    points = spark.createDataFrame(
        [("x", 1, 5), ("y", 2, 5)], ["k", "pid", "pos"]
    )
    ivs = spark.createDataFrame([("x", "a", 0, 10)], ["k", "iid", "s", "e"])
    out = interval_join(points, ivs, "pos", "s", "e", 4, keys=["k"]).collect()
    assert [(r["pid"], r["iid"]) for r in out] == [(1, "a")]


def test_sample_mixture(spark):
    from embeddinghub_spark.operators.split import sample_mixture

    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "src"])
    out = sample_mixture(
        df, "src", {"big": 0.5, "small": 0.5}, 160, key_cols=["id"]
    )
    by_src = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # ~80 requested from each stratum (md5-Bernoulli, so approximate)
    assert 50 <= by_src["big"] <= 110
    assert 50 <= by_src["small"] <= 100
    # deterministic: same call, same exact sample
    ids = sorted(r["id"] for r in out.collect())
    assert ids == sorted(r["id"] for r in sample_mixture(
        df, "src", {"big": 0.5, "small": 0.5}, 160, key_cols=["id"]
    ).collect())
    # clamp: an exhausted stratum keeps everything, never oversamples
    clamped = sample_mixture(
        df, "src", {"small": 1.0}, 1000, key_cols=["id"]
    )
    assert clamped.count() == 100
    assert clamped.filter(F.col("src") == "big").count() == 0


def test_ngram_contamination(spark):
    from embeddinghub_spark.functions.text import ngram_contamination

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # shares 2 trigrams w/ bench
            (2, "alpha beta gamma zeta eta"),        # shares 1
            (3, "unrelated words entirely here"),
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta something")], ["doc_id", "text"]
    )
    out = ngram_contamination(corpus, bench, n=3, min_shared=2).collect()
    assert [(r["doc_id"], r["bench_id"], r["n_shared"]) for r in out] == [
        (1, 100, 2)
    ]
    loose = ngram_contamination(corpus, bench, n=3, min_shared=1)
    assert sorted(r["doc_id"] for r in loose.collect()) == [1, 2]


def test_ngram_contamination_max_df(spark):
    from embeddinghub_spark.functions.text import ngram_contamination

    # 'x y z' appears in 3 corpus docs -> dropped at max_df=2; only the
    # rare 'y z tail0' gram still links doc 0 to the benchmark
    corpus = spark.createDataFrame(
        [(i, "x y z tail%d" % i) for i in range(3)], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "x y z tail0")], ["doc_id", "text"])
    no_df = ngram_contamination(corpus, bench, n=3, min_shared=1)
    assert sorted(r["doc_id"] for r in no_df.collect()) == [0, 1, 2]
    hits = ngram_contamination(corpus, bench, n=3, min_shared=1, max_df=2)
    assert [(r["doc_id"], r["n_shared"]) for r in hits.collect()] == [(0, 1)]


def test_bm25_scores(spark):
    import math

    from embeddinghub_spark.functions.text import bm25_scores

    df = spark.createDataFrame(
        [(1, "spark spark engine"), (2, "query engine"), (3, "other words")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           bm25_scores(df, ["spark", "query"], k1=1.2, b=0.75).collect()}
    # hand-computed: N=3, avgdl=(3+2+2)/3
    avgdl = 7.0 / 3.0
    def score(tf, dl, dfreq):
        idf = math.log((3 - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert out[1]["bm25"] == pytest.approx(round(score(2, 3, 1), 6), abs=1e-6)
    assert out[2]["bm25"] == pytest.approx(round(score(1, 2, 1), 6), abs=1e-6)
    assert out[3]["bm25"] == 0.0  # no hit -> explicit zero, row kept
    assert out[3]["doc_len"] == 2


def _vecs(spark):
    return spark.createDataFrame(
        [(1, [3.0, 4.0], "a"), (2, [1.0, 0.0], "a"),
         (3, [0.0, 2.0], "b"), (4, [0.0, 0.0], "b")],
        ["vec_id", "embedding", "label"],
    )


@pytest.mark.parametrize("dim", [2, None])
def test_group_centroids(spark, dim):
    out = {r["label"]: r for r in
           group_centroids(_vecs(spark), "label", dim=dim).collect()}
    assert out["a"]["n_members"] == 2
    assert out["a"]["centroid"] == [2.0, 2.0]
    assert out["b"]["centroid"] == [0.0, 1.0]


@pytest.mark.parametrize("dim", [2, None])
def test_normalize_vectors(spark, dim):
    out = {r["vec_id"]: r for r in
           normalize_vectors(_vecs(spark), dim=dim).collect()}
    assert out[1]["unit_vec"] == pytest.approx([0.6, 0.8])
    assert out[2]["unit_vec"] == [1.0, 0.0]
    assert out[4]["unit_vec"] is None  # zero vector -> NULL, not NaN


def test_random_projection_preserves_shape(spark):
    out = random_projection(_vecs(spark), dim=2, out_dim=2).collect()
    by_id = {r["vec_id"]: r["projected"] for r in out}
    assert all(len(v) == 2 for v in by_id.values())
    # deterministic: same seed -> same values
    again = {r["vec_id"]: r["projected"] for r in
             random_projection(_vecs(spark), dim=2, out_dim=2).collect()}
    assert by_id == again
    # linearity: projection of the zero vector is zero
    assert by_id[4] == [0.0, 0.0]
    # scaled dot against the literal matrix matches a python replay
    from embeddinghub_spark.functions.vector import random_hyperplanes
    planes = random_hyperplanes(2, 2, seed=11)
    scale = 1.0 / math.sqrt(2.0)
    expect = [sum(a * b for a, b in zip([3.0, 4.0], p)) * scale for p in planes]
    assert by_id[1] == pytest.approx(expect)


def test_profile_table_one_pass(spark):
    from embeddinghub_spark.functions.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 4.0), (None, "b", 4.0)],
        ["k", "s", "v"],
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "s", "v"}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 1
    assert out["k"]["n_distinct"] == 2
    assert out["k"]["min_num"] == 1.0 and out["k"]["max_num"] == 2.0
    assert out["k"]["min_str"] is None  # numeric column -> _num pair
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["min_num"] is None
    assert out["v"]["n_distinct"] == 2

    # HLL path keeps the same schema (the 100 TB swap-in)
    approx = {
        r["column"]: r
        for r in profile_table(df, exact_distinct=False).collect()
    }
    assert set(approx) == {"k", "s", "v"}
    assert approx["v"]["n_rows"] == 3


def test_pmi_collocations_exact_membership(spark):
    from embeddinghub_spark.functions.text import pmi_collocations

    # 'alpha beta' always co-occurs (PMI >> 0); 'alpha gamma' never
    # adjacent; common filler words pair with everything (PMI ~ 0)
    rows = [(i, "alpha beta filler filler gamma filler") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["ngram"]: r for r in pmi_collocations(df, min_count=5).collect()}
    assert "alpha beta" in out
    assert out["alpha beta"]["c_ab"] == 6
    assert out["alpha beta"]["pmi"] > 0
    assert "alpha gamma" not in out  # never adjacent
    # every returned pair satisfies the exact positive-PMI guard
    assert all(r["pmi"] >= 0 for r in out.values())


def test_hll_profile_accuracy_and_merge(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from embeddinghub_spark.functions.profile import hll_profile

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_orderkey", "l_suppkey", "l_returnflag"]
    est = {r["column"]: r["approx_ndv"] for r in hll_profile(li, cols).collect()}
    exact = li.agg(
        *[F.countDistinct(c).alias(c) for c in cols]
    ).collect()[0].asDict()
    for c in cols:
        lo, hi = 0.80 * exact[c], 1.20 * exact[c]
        assert lo <= est[c] <= hi, f"{c}: hll {est[c]} vs exact {exact[c]}"
    # float columns are rejected (engine-specific string rendering)
    with pytest.raises(ValueError, match="fractional"):
        hll_profile(li, ["l_quantity"])
    # sketch is algebraic: estimate over a partition-split union equals
    # the whole-table estimate (registers merge by max)
    half_a = li.filter(F.col("l_orderkey") % 2 == 0)
    half_b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = {
        r["column"]: r["approx_ndv"]
        for r in hll_profile(half_a.unionByName(half_b), cols).collect()
    }
    assert merged == est


def test_domain_tag_tiebreak_and_other(spark):
    from embeddinghub_spark.functions.text import domain_tag

    docs = spark.createDataFrame(
        [
            (1, "table join stream window"),   # 2-2 tie -> first declared
            (2, "stream kafka table"),          # streaming 2 > data_eng 1
            (3, "zzz qqq"),                     # no hits -> other
            (4, "vector vector vector join"),   # occurrences, not distinct
            (5, None),                          # null text -> other, not null
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: (r["domain"], r["domain_score"])
           for r in domain_tag(docs).collect()}
    assert out[1] == ("data_eng", 2)
    assert out[2] == ("streaming", 2)
    assert out[3] == ("other", 0)
    assert out[4] == ("ml", 3)
    assert out[5] == ("other", 0)


def test_histogram_quantiles_bounds(spark, sf_dir):
    import pytest

    from embeddinghub_spark.functions.profile import histogram_quantiles

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qs = [0.25, 0.5, 0.75, 0.99]
    est = {r["quantile"]: r["value"]
           for r in histogram_quantiles(li, "l_extendedprice", qs, n_bins=128).collect()}
    exact = dict(zip(qs, li.stat.approxQuantile("l_extendedprice", qs, 0.0)))
    lo, hi = (
        li.agg({"l_extendedprice": "min"}).first()[0],
        li.agg({"l_extendedprice": "max"}).first()[0],
    )
    bin_w = (hi - lo) / 128.0
    for q in qs:
        assert abs(est[q] - exact[q]) <= bin_w + 1e-6, (q, est[q], exact[q])
    # constant column degenerates to the constant
    from pyspark.sql import functions as F
    const = li.select(F.lit(7.5).alias("c"))
    rows = histogram_quantiles(const, "c", [0.5]).collect()
    assert rows[0]["value"] == 7.5
    with pytest.raises(ValueError, match="quantiles"):
        histogram_quantiles(li, "l_extendedprice", [0.0, 0.5])


def test_perplexity_buckets_strata(spark, sf_dir):
    from embeddinghub_spark.functions.text import perplexity_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = perplexity_buckets(docs, n_buckets=3).collect()
    n = len(out)
    assert n == docs.filter("text IS NOT NULL AND text != ''").count()
    by_bucket = {}
    for r in out:
        assert 0 <= r["bucket"] <= 2
        by_bucket.setdefault(r["bucket"], []).append(r["logprob"])
    # strata are ordered: every tail score <= every head score
    assert max(by_bucket[0]) <= min(by_bucket[2])
    # equal-mass-ish: no stratum under ~15% of docs (histogram cuts are
    # approximate, bin-width loose)
    for b, rows in by_bucket.items():
        assert len(rows) >= 0.15 * n, (b, len(rows), n)


def test_json_scan_roundtrip_and_tolerance(spark, sf_dir, tmp_path):
    from embeddinghub_spark.sources.readers import read_file

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    base = str(tmp_path / "j")
    nation.write.mode("overwrite").json(base)
    back = read_file(spark, base, fmt="json")
    assert back.count() == nation.count()
    assert set(c for c in back.columns if not c.startswith("_")) == set(nation.columns)
    # a malformed line must not sink the scan (PERMISSIVE)
    with open(f"{base}/zzz_bad.json", "w") as f:
        f.write('{"n_nationkey": 999, "n_name": "OK"}\n{not json at all\n')
    tolerant = read_file(spark, base, fmt="json")
    assert tolerant.filter("n_nationkey = 999").count() == 1


def test_embedding_clusters_structure(spark):
    """Three well-separated blobs -> exactly three clusters, labeled by
    the min member id; knn edges never cross blobs at min_cosine=0.9."""
    import random

    from embeddinghub_spark.functions.embeddings import embedding_clusters

    rng = random.Random(11)
    centers = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 0.0]]
    rows = [
        (i, [x + rng.uniform(-0.3, 0.3) for x in centers[i % 3]])
        for i in range(60)
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = embedding_clusters(vecs, dim=4, k=3, min_cosine=0.9).collect()
    assert len(out) == 60
    clusters: dict = {}
    for r in out:
        clusters.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    # no cluster mixes blobs
    for cid, members in clusters.items():
        assert len({m % 3 for m in members}) == 1, (cid, members)
        assert cid == min(members)
    # intra-blob cosines ~1 -> each blob collapses to few clusters
    assert len(clusters) <= 6


def test_cap_per_group_exact_ceiling(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from embeddinghub_spark.operators.split import cap_per_group

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    capped = cap_per_group(orders, "o_orderstatus", 50, ["o_orderkey"])
    sizes = {r[0]: r[1] for r in capped.groupBy("o_orderstatus").count().collect()}
    orig = {r[0]: r[1] for r in orders.groupBy("o_orderstatus").count().collect()}
    for s, n in sizes.items():
        assert n == min(50, orig[s]), (s, n, orig[s])
    # deterministic across repartitionings (the property sampleBy lacks)
    again = cap_per_group(orders.repartition(7), "o_orderstatus", 50, ["o_orderkey"])
    assert {r["o_orderkey"] for r in capped.collect()} == {
        r["o_orderkey"] for r in again.collect()
    }
    with pytest.raises(ValueError, match="k must"):
        cap_per_group(orders, "o_orderstatus", -1, ["o_orderkey"])


def test_robust_scale_properties(spark, sf_dir):
    from pyspark.sql import functions as F

    from embeddinghub_spark.operators.batch import robust_scale

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = robust_scale(li, "l_extendedprice")
    # median-ish center: roughly half the rows on each side of 0
    n = out.count()
    neg = out.filter(F.col("robust_z") < 0).count()
    assert 0.4 * n <= neg <= 0.6 * n, (neg, n)
    # monotone in the input value
    rows = out.select("l_extendedprice", "robust_z").orderBy("l_extendedprice").collect()
    zs = [r["robust_z"] for r in rows]
    assert zs == sorted(zs)
    # degenerate (constant) column scales to all-zero
    const = li.select(F.lit(5.0).alias("c"))
    assert robust_scale(const, "c").filter("robust_z != 0.0").count() == 0


def test_weighted_sample_favors_heavy_rows(spark):
    """E-S sampling: with a 200:1 weight ratio and k=1, the heavy row
    must win the large majority of seeds; output respects the per-
    group cap and drops non-positive weights."""
    from embeddinghub_spark.operators.split import weighted_sample

    rows = [(1, "g", 200.0), (2, "g", 1.0), (3, "g", 1.0), (4, "g", 0.0),
            (5, "h", 7.0), (6, "h", None)]
    df = spark.createDataFrame(rows, ["id", "grp", "w"])
    heavy_wins = 0
    for seed in range(12):
        out = weighted_sample(df, "grp", "w", 1, ["id"], seed=seed).collect()
        got = {r["grp"]: r["id"] for r in out}
        assert set(got) == {"g", "h"}
        assert got["h"] == 5          # only positive-weight h row
        assert got["g"] != 4          # zero weight can never win
        heavy_wins += got["g"] == 1
    assert heavy_wins >= 8, heavy_wins  # p(win)=200/202 per draw

    # without replacement: k=2 returns 2 DISTINCT g-rows, never id 4
    out = weighted_sample(df, "grp", "w", 2, ["id"], seed=3).collect()
    g_ids = sorted(r["id"] for r in out if r["grp"] == "g")
    assert len(g_ids) == len(set(g_ids)) == 2 and 4 not in g_ids


def test_pagerank_mass_and_symmetry(spark):
    """On a graph with no dangling nodes total rank mass stays ~1;
    symmetric positions earn identical rank; a hub out-ranks leaves."""
    from embeddinghub_spark.functions.graph import pagerank

    # star: hub 1 <-> leaves 2,3,4 (undirected via reverse edges)
    edges = [(1, x) for x in (2, 3, 4)] + [(x, 1) for x in (2, 3, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert abs(sum(out.values()) - 1.0) < 1e-4
    assert out[2] == out[3] == out[4]
    assert out[1] > out[2]


def test_zorder_clustering_prunes_both_dimensions(spark):
    """After cluster_by_zorder on (a, b), a narrow range predicate on
    EITHER column overlaps only a fraction of the partitions' min/max
    envelopes — the file-skipping property that motivates the layout.
    A plain sort by `a` would cluster `a` perfectly and leave `b`
    spread across ~all partitions."""
    from embeddinghub_spark.functions.layout import cluster_by_zorder

    n = 4096
    rows = [(i, (i * 2654435761) % n, (i * 40503) % n) for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    parts = (
        cluster_by_zorder(df, ["a", "b"], bits=12, partitions=16)
        .rdd.mapPartitions(
            lambda it: (lambda xs: [(
                min(x["a"] for x in xs), max(x["a"] for x in xs),
                min(x["b"] for x in xs), max(x["b"] for x in xs),
            )] if xs else [])(list(it))
        )
        .collect()
    )
    assert len(parts) >= 8

    def overlapping(lo, hi, dim):
        i = 0 if dim == "a" else 2
        return sum(1 for p in parts if not (p[i + 1] < lo or p[i] > hi))

    width = n // 16  # a 1/16-wide range on each dimension
    for dim in ("a", "b"):
        hits = overlapping(1000, 1000 + width, dim)
        assert hits <= len(parts) // 2, (dim, hits, len(parts))


def test_gap_fill_locf_and_flags(spark):
    """Missing slots materialize with the carried-forward value and
    observed=false; multi-event slots keep the latest event's value;
    the grid spans first..last observation only."""
    from datetime import datetime

    from embeddinghub_spark.operators.batch import gap_fill

    rows = [
        ("u1", datetime(2024, 1, 1, 5), 10.0),
        ("u1", datetime(2024, 1, 1, 9), 11.0),   # same day, later -> wins
        ("u1", datetime(2024, 1, 4, 1), 40.0),   # days 2,3 missing
        ("u2", datetime(2024, 1, 2, 0), 7.0),    # single point
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = sorted(
        gap_fill(df, "user_id", "ts", "value", 86400).collect(),
        key=lambda r: (r["user_id"], r["slot_ts"]),
    )
    u1 = [r for r in out if r["user_id"] == "u1"]
    assert [r["value"] for r in u1] == [11.0, 11.0, 11.0, 40.0]
    assert [r["observed"] for r in u1] == [True, False, False, True]
    assert u1[0]["slot_ts"] == datetime(2024, 1, 1)
    u2 = [r for r in out if r["user_id"] == "u2"]
    assert len(u2) == 1 and u2[0]["value"] == 7.0 and u2[0]["observed"]


def test_funnel_steps_ordering_matters(spark):
    """A signup BEFORE the first click does not count; stage i+1 must
    be at-or-after stage i's first qualifying event."""
    from datetime import datetime

    from embeddinghub_spark.operators.batch import funnel_steps

    t = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    rows = [
        # u1: full ordered funnel
        ("u1", t(1), "click"), ("u1", t(2), "signup"), ("u1", t(3), "purchase"),
        # u2: signup precedes the click -> funnel stops at click
        ("u2", t(2), "click"), ("u2", t(1), "signup"),
        # u3: purchase before signup -> stops at signup
        ("u3", t(1), "click"), ("u3", t(3), "signup"), ("u3", t(2), "purchase"),
        # u4: never clicks -> absent
        ("u4", t(1), "signup"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["user_id"]: r
        for r in funnel_steps(
            df, "user_id", "ts", "event_type", ["click", "signup", "purchase"]
        ).collect()
    }
    assert set(out) == {"u1", "u2", "u3"}
    assert out["u1"]["stages_reached"] == 3
    assert out["u2"]["stages_reached"] == 1 and out["u2"]["signup_ts"] is None
    assert out["u3"]["stages_reached"] == 2 and out["u3"]["purchase_ts"] is None


def test_cohort_retention_matrix(spark):
    """Cohorting by first-event period; retention counts distinct
    entities per (cohort, offset); period-0 row equals cohort size."""
    from datetime import datetime

    from embeddinghub_spark.operators.batch import cohort_retention

    day = 86400
    rows = [
        # cohort day 0: u1 (active days 0, 2), u2 (day 0 only)
        ("u1", datetime(2024, 1, 1, 3)), ("u1", datetime(2024, 1, 3, 9)),
        ("u1", datetime(2024, 1, 3, 23)),  # same period, still 1 user-period
        ("u2", datetime(2024, 1, 1, 8)),
        # cohort day 1: u3 (days 1 and 2)
        ("u3", datetime(2024, 1, 2, 1)), ("u3", datetime(2024, 1, 3, 1)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["cohort_start"], r["periods_since"]): r["n_active"]
        for r in cohort_retention(df, "user_id", "ts", day).collect()
    }
    d0, d1 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    assert out == {(d0, 0): 2, (d0, 2): 1, (d1, 0): 1, (d1, 1): 1}


def test_gap_fill_null_observation_and_pre_epoch(spark):
    """A slot whose latest event has a NULL value stays observed and
    NULL (not rewritten by LOCF, not carried forward); pre-1970
    timestamps floor toward -inf instead of aliasing into slot 0."""
    from datetime import datetime

    from embeddinghub_spark.operators.batch import gap_fill

    rows = [
        ("u1", datetime(2024, 1, 1, 5), 10.0),
        ("u1", datetime(2024, 1, 2, 5), None),   # observed NULL
        ("u1", datetime(2024, 1, 4, 5), 40.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = sorted(
        gap_fill(df, "user_id", "ts", "value", 86400).collect(),
        key=lambda r: r["slot_ts"],
    )
    assert [r["value"] for r in out] == [10.0, None, 10.0, 40.0]
    assert [r["observed"] for r in out] == [True, True, False, True]

    pre = spark.createDataFrame(
        [
            ("u2", datetime(1969, 12, 31, 23, 58), 1.0),
            ("u2", datetime(1970, 1, 1, 0, 2), 2.0),
        ],
        ["user_id", "ts", "value"],
    )
    slots = sorted(
        r["slot_ts"] for r in gap_fill(pre, "user_id", "ts", "value", 86400).collect()
    )
    # two DISTINCT day slots: 1969-12-31 and 1970-01-01
    assert slots == [datetime(1969, 12, 31), datetime(1970, 1, 1)]


def test_negative_samples_excludes_and_reproduces(spark):
    """Negatives never include the anchor or a known positive; same
    seed reproduces identically; different seed draws differently."""
    from embeddinghub_spark.operators.split import negative_samples

    ids = spark.createDataFrame([(i,) for i in range(50)], ["vec_id"])
    anchors = spark.createDataFrame([(1,), (2,)], ["anchor_id"])
    positives = spark.createDataFrame(
        [(1, 7), (1, 9), (2, 3)], ["anchor_id", "vec_id"]
    )
    out1 = {
        (r["anchor_id"], r["neg_id"])
        for r in negative_samples(
            ids, anchors, 10, positives=positives, seed=5
        ).collect()
    }
    for a, n in out1:
        assert n != a
        assert (a, n) not in {(1, 7), (1, 9), (2, 3)}
    assert len(out1) > 10  # up-to-k semantics, most draws survive

    out2 = {
        (r["anchor_id"], r["neg_id"])
        for r in negative_samples(
            ids, anchors, 10, positives=positives, seed=5
        ).collect()
    }
    assert out1 == out2
    out3 = {
        (r["anchor_id"], r["neg_id"])
        for r in negative_samples(
            ids, anchors, 10, positives=positives, seed=6
        ).collect()
    }
    assert out1 != out3


def test_pagerank_includes_sink_only_nodes(spark):
    """A node appearing ONLY as a destination (no out-edges) must
    still be ranked — for a curation weight the most-linked-to pages
    are exactly the ones that matter. Dangling policy: its absorbed
    mass is NOT redistributed, so total mass drops below 1 (the
    documented formula-verbatim choice)."""
    from embeddinghub_spark.functions.graph import pagerank

    edges = [(1, 2), (2, 3), (1, 3)]  # node 3 is sink-only
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    assert set(out) == {1, 2, 3}, "sink-only node missing from rank frame"
    teleport = 0.15 / 3
    assert out[3] > out[2] > teleport  # mass flows into the sink, none vanishes
    assert sum(out.values()) < 1.0     # no dangling redistribution


def test_zorder_scale_overflow_guard(spark):
    """A column span past the 2^53 double-exactness bound fails loudly
    (assert_true in the scale expression) instead of silently wrapping
    Morton keys into an oracle-divergent layout."""
    import pytest

    from embeddinghub_spark.functions.layout import with_zorder_key

    df = spark.createDataFrame([(0, 0), (1, 1 << 53)], ["id", "a"])
    with pytest.raises(Exception, match="exactness bound"):
        with_zorder_key(df, ["a"], bits=16).collect()


def test_quantize_dequantize_roundtrip_error_bound(spark):
    """int8 quantization: codes within [-127, 127], all-zero vectors
    yield NULL codes, and the dequantized reconstruction is within
    scale/2 per element (the floor(v+0.5) nearest-code guarantee)."""
    from embeddinghub_spark.functions.embeddings import (
        dequantize_vectors,
        quantize_vectors,
    )

    rows = [
        (1, [0.5, -1.25, 3.75, 0.0]),
        (2, [-0.001, 0.002, -0.003, 0.004]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = quantize_vectors(df, keep_cols=["vec_id"])
    out = {r["vec_id"]: (r["qscale"], r["qvec"]) for r in q.collect()}
    assert out[3][1] is None and out[3][0] == 0.0
    for vid in (1, 2):
        scale, codes = out[vid]
        assert all(-127 <= c <= 127 for c in codes)
        assert 127 in codes or -127 in codes  # max element maps to full range
    rec = {
        r["vec_id"]: r["embedding"]
        for r in dequantize_vectors(q, keep_cols=["vec_id"]).collect()
    }
    for vid, orig in [(1, rows[0][1]), (2, rows[1][1])]:
        scale = out[vid][0]
        assert all(
            abs(o - r) <= scale / 2 + 1e-12 for o, r in zip(orig, rec[vid])
        )
    assert rec[3] is None


def test_robust_scale_by_per_group_centering(spark):
    """Grouped robust scaling: each group centers on ITS OWN median
    (a global median would misplace both groups), a constant group
    yields 0.0 everywhere (MAD = 0), and NULL values drop."""
    from embeddinghub_spark.operators.batch import robust_scale_by

    rows = (
        [("a", float(i)) for i in range(101)]            # median 50
        + [("b", float(1000 + 10 * i)) for i in range(101)]  # median 1500
        + [("c", 5.0)] * 10
        + [("a", None)]
    )
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], ["rid", "grp", "v"]
    )
    out = {r["rid"]: r for r in robust_scale_by(df, "grp", "v", n_bins=64).collect()}
    assert len(out) == len(rows) - 1  # NULL dropped
    # the median row of each group scales to ~0 under ITS group stats
    mid_a = [r for r in out.values() if r["grp"] == "a" and r["v"] == 50.0][0]
    mid_b = [r for r in out.values() if r["grp"] == "b" and r["v"] == 1500.0][0]
    assert abs(mid_a["robust_z"]) < 0.1 and abs(mid_b["robust_z"]) < 0.1
    assert all(
        r["robust_z"] == 0.0 for r in out.values() if r["grp"] == "c"
    )
    # symmetric tails scale to roughly symmetric z
    lo_a = [r for r in out.values() if r["grp"] == "a" and r["v"] == 0.0][0]
    hi_a = [r for r in out.values() if r["grp"] == "a" and r["v"] == 100.0][0]
    assert lo_a["robust_z"] < -1 and hi_a["robust_z"] > 1


def test_join_fanout_profile_predicts_exact_output(spark):
    """The profile's summary output_rows equals the actual join's
    row count (hot-key quadratic contribution included), NULL keys
    are excluded from contributions but counted in side totals, and
    the hot key tops the per-key list."""
    from embeddinghub_spark.operators.batch import join_fanout_profile

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,)], ["k"]
    )
    right = spark.createDataFrame(
        [(1,), (1,), (2,), (4,), (None,), (None,)], ["k"]
    )
    out = join_fanout_profile(left, right, ["k"], top_k=5).collect()
    summary = [r for r in out if r["key"] is None][0]
    per_key = {r["key"]: r for r in out if r["key"] is not None}
    actual = left.join(right, "k").count()   # 3*2 + 1*1 = 7
    assert summary["output_rows"] == actual == 7
    assert summary["left_rows"] == 6 and summary["right_rows"] == 6
    assert summary["left_keys"] == 3 and summary["right_keys"] == 3
    assert set(per_key) == {"1", "2"}        # keys present on BOTH sides
    assert per_key["1"]["output_rows"] == 6  # the hot key, named


def test_skew_report_names_hot_key_and_salt(spark):
    """The summary row carries exact totals and the integer salt
    factor ceil(max*keys/rows); the hot key tops the per-key list
    with an exact ppm share; NULL key components render as '∅' and
    ARE counted (groupBy routes NULLs through one reducer)."""
    from embeddinghub_spark.operators.batch import skew_report

    rows = (
        [("hot", "x")] * 90
        + [("a", "x")] * 5
        + [("b", "y")] * 4
        + [(None, "y")]
    )
    df = spark.createDataFrame(rows, ["k1", "k2"])
    out = skew_report(df, ["k1", "k2"], top_k=3).collect()
    summary = [r for r in out if r["key"] is None][0]
    per_key = [r for r in out if r["key"] is not None]
    assert summary["rows"] == 100 and summary["keys"] == 4
    assert summary["max_cnt"] == 90
    # ceil(90 * 4 / 100) = ceil(3.6) = 4 mean-key-loads
    assert summary["salt_factor"] == 4
    assert [r["key"] for r in per_key] == ["hot|x", "a|x", "b|y"]
    assert per_key[0]["cnt"] == 90
    assert per_key[0]["share_ppm"] == 900000
    # NULL component rendered, present in totals (keys == 4 above)
    full = {r["key"] for r in skew_report(df, ["k1", "k2"], top_k=10).collect()}
    assert "∅|y" in full


def test_skew_report_level_keys_salt_one(spark):
    """A level distribution recommends salt_factor == 1 (no salting)."""
    from embeddinghub_spark.operators.batch import skew_report

    df = spark.createDataFrame([(i % 4,) for i in range(40)], ["k"])
    s = [r for r in skew_report(df, ["k"]).collect() if r["key"] is None][0]
    assert s["salt_factor"] == 1 and s["max_cnt"] == 10


def test_validate_rules_counts_violations(spark):
    """Every rule type counts its violations correctly on a frame
    seeded with known defects; NULL-exemption semantics (range/
    accepted/regexp don't count NULLs; unique ignores NULL keys) and
    the full-match regexp anchor are pinned."""
    import pytest

    from embeddinghub_spark.operators.validate import validate_rules

    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "ok1"),
            (1, 99.0, "A", "ok2"),     # dup id; out-of-range value
            (2, 20.0, "X", "bad!"),    # bad flag; regexp violation
            (None, None, None, None),  # nulls
            (3, 30.0, "B", "ok3"),
        ],
        ["id", "v", "flag", "code"],
    )
    ref = spark.createDataFrame([(1,), (2,)], ["rid"])
    rules = [
        {"name": "id_nn", "type": "not_null", "column": "id"},
        {"name": "v_range", "type": "range", "column": "v", "lo": 0, "hi": 50},
        {"name": "flag_ok", "type": "accepted_values", "column": "flag",
         "values": ["A", "B"]},
        {"name": "code_re", "type": "regexp", "column": "code",
         "pattern": "ok[0-9]"},
        {"name": "id_unique", "type": "unique", "column": "id"},
        {"name": "id_fk", "type": "referential", "column": "id",
         "ref": "r", "ref_column": "rid"},
    ]
    out = {
        r["rule"]: r
        for r in validate_rules(df, rules, refs={"r": ref}).collect()
    }
    assert out["id_nn"]["violations"] == 1 and out["id_nn"]["total"] == 5
    assert out["v_range"]["violations"] == 1       # NULL exempt
    assert out["flag_ok"]["violations"] == 1
    assert out["code_re"]["violations"] == 1       # full-match anchor
    assert out["id_unique"]["violations"] == 2     # both rows of id=1
    assert out["id_unique"]["total"] == 3          # distinct non-null keys
    assert out["id_fk"]["violations"] == 1         # id=3 missing from ref
    assert not out["id_fk"]["passed"] and out["v_range"]["passed"] is False
    assert out["id_nn"]["passed"] is False
    with pytest.raises(ValueError, match="unique 'name'"):
        validate_rules(df, [{"type": "not_null", "column": "id"}])


def test_event_transitions_counts_and_probs(spark):
    import datetime as dt

    from pyspark.sql import Row

    from embeddinghub_spark.operators.batch import event_transitions

    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    rows = [
        # user 1: a -> b -> a -> c
        Row(u=1, ts=ts(1), eid=1, s="a"),
        Row(u=1, ts=ts(2), eid=2, s="b"),
        Row(u=1, ts=ts(3), eid=3, s="a"),
        Row(u=1, ts=ts(4), eid=4, s="c"),
        # user 2: a -> b ; NULL state skipped entirely
        Row(u=2, ts=ts(1), eid=5, s="a"),
        Row(u=2, ts=ts(2), eid=6, s=None),
        Row(u=2, ts=ts(3), eid=7, s="b"),
        # user 3: single event -> no pairs
        Row(u=3, ts=ts(1), eid=8, s="z"),
        # user 1 tie timestamps: eid orders them
        Row(u=4, ts=ts(1), eid=10, s="x"),
        Row(u=4, ts=ts(1), eid=11, s="y"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r.src, r.dst): (r.n, round(r.p, 6))
        for r in event_transitions(
            df, "u", "ts", "s", order_cols=["eid"]
        ).collect()
    }
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
        ("x", "y"): (1, 1.0),
    }


def test_class_tf_idf_ranks_characteristic_terms(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.text import class_tf_idf

    df = spark.createDataFrame(
        [
            Row(doc_id=1, g="sports", text="goal goal match team"),
            Row(doc_id=2, g="sports", text="team match goal"),
            Row(doc_id=3, g="tech", text="code code compiler team"),
            Row(doc_id=4, g=None, text="ignored entirely"),
        ]
    )
    out = class_tf_idf(df, "g", "text", top_k=2).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append((r.rank, r.word))
    # "goal" dominates sports (tf=4, rare outside), "code" dominates tech
    assert sorted(by_grp["sports"])[0][1] == "goal"
    assert sorted(by_grp["tech"])[0][1] == "code"
    # shared term "team" scores lower than the group-specific terms
    assert all(len(v) == 2 for v in by_grp.values())
    # NULL group rows are excluded
    assert set(by_grp) == {"sports", "tech"}


def test_class_tf_idf_deterministic_tie_break(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.text import class_tf_idf

    df = spark.createDataFrame(
        [Row(doc_id=1, g="a", text="zz aa"), Row(doc_id=2, g="b", text="qq")]
    )
    # zz and aa tie exactly in group a -> word ascending breaks it
    out = sorted(
        (r.rank, r.word)
        for r in class_tf_idf(df, "g", "text", top_k=5).collect()
        if r.grp == "a"
    )
    assert out == [(1, "aa"), (2, "zz")]


def test_bloom_prefilter_join_equals_plain_join(spark, sf_dir):
    from embeddinghub_spark.functions.profile import bloom_prefilter_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("orderkey"), "l_quantity"
    )
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_orderkey").alias("orderkey"), "o_totalprice")
    )
    got = bloom_prefilter_join(li, od, "orderkey", m_bits=4096)
    want = li.join(od, "orderkey")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_prefilter_join_null_keys_dropped(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.profile import bloom_prefilter_join

    left = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=None, v="b"), Row(k=2, v="c")]
    )
    right = spark.createDataFrame([Row(k=1, w="x"), Row(k=None, w="y")])
    got = bloom_prefilter_join(left, right, "k").collect()
    assert [(r.k, r.v, r.w) for r in got] == [(1, "a", "x")]


def test_kfold_assign_deterministic_and_partition_invariant(spark):
    from embeddinghub_spark.operators.split import kfold_assign

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    a = {r.k: r.fold for r in kfold_assign(df, 5, ["k"]).collect()}
    b = {
        r.k: r.fold
        for r in kfold_assign(df.repartition(13), 5, ["k"]).collect()
    }
    assert a == b
    assert set(a.values()) == {0, 1, 2, 3, 4}
    sizes = [list(a.values()).count(i) for i in range(5)]
    assert all(100 < s < 300 for s in sizes)  # roughly balanced
    # different seed reshuffles
    c = {r.k: r.fold for r in kfold_assign(df, 5, ["k"], seed=1).collect()}
    assert c != a

    import pytest

    with pytest.raises(ValueError):
        kfold_assign(df, 1, ["k"])


def test_temporal_split_counts_and_embargo(spark):
    import datetime as dt

    from pyspark.sql import Row

    from embeddinghub_spark.operators.split import temporal_split

    rows = [
        Row(i=i, ts=dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    out = temporal_split(
        df, "ts", 0.2, embargo_seconds=5 * 3600, order_cols=["i"]
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.split, []).append(r.i)
    assert sorted(by["test"]) == list(range(80, 100))  # exact last 20%
    assert sorted(by["embargo"]) == list(range(75, 80))  # 5h purge
    assert sorted(by["train"]) == list(range(75))
    # every train ts strictly precedes every test ts (no leakage)
    assert max(by["train"]) < min(by["embargo"]) < min(by["test"])


def test_temporal_split_no_embargo_and_validation(spark):
    import datetime as dt

    import pytest
    from pyspark.sql import Row

    from embeddinghub_spark.operators.split import temporal_split

    df = spark.createDataFrame(
        [Row(i=i, ts=dt.datetime(2024, 1, 1 + i)) for i in range(10)]
    )
    out = temporal_split(df, "ts", 0.3, order_cols=["i"]).collect()
    assert sum(r.split == "test" for r in out) == 3
    assert sum(r.split == "train" for r in out) == 7
    with pytest.raises(ValueError):
        temporal_split(df, "ts", 0.0)
    with pytest.raises(ValueError):
        temporal_split(df, "ts", 0.5, embargo_seconds=-1)


def test_winsorize_clips_tails(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.operators.batch import winsorize

    rows = [Row(i=i, v=float(i)) for i in range(1, 101)] + [
        Row(i=999, v=10_000.0),  # whale outlier
        Row(i=1000, v=None),
    ]
    out = {r.i: r.v_w for r in winsorize(
        spark.createDataFrame(rows), "v", 0.05, 0.95, n_bins=512
    ).collect()}
    assert out[1000] is None  # NULL passes through
    assert out[999] == max(v for k, v in out.items() if v is not None)
    assert out[999] < 10_000.0  # clipped hard
    assert out[50] == 50.0  # middle untouched
    lo = min(v for v in out.values() if v is not None)
    assert lo > 1.0  # low tail clipped up

    import pytest

    with pytest.raises(ValueError):
        winsorize(spark.createDataFrame(rows), "v", 0.9, 0.1)


def test_psi_drift_detects_shift_and_is_stable_on_same_dist(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.operators.batch import psi_drift

    ref = spark.createDataFrame(
        [Row(v=float(i % 100)) for i in range(2000)]
    )
    same = spark.createDataFrame(
        [Row(v=float((i * 7) % 100)) for i in range(2000)]
    )
    shifted = spark.createDataFrame(
        [Row(v=float(i % 100) + 60.0) for i in range(2000)]
    )
    psi_same = sum(
        r.psi_term for r in psi_drift(ref, same, "v").collect()
    )
    psi_shift = sum(
        r.psi_term for r in psi_drift(ref, shifted, "v").collect()
    )
    assert psi_same < 0.01
    assert psi_shift > 0.25  # textbook "drifted" threshold
    # out-of-range current values clamp into the last bin
    rows = psi_drift(ref, shifted, "v").collect()
    assert len(rows) == 10
    last = [r for r in rows if r.bin == 9][0]
    assert last.cur_n > last.ref_n


def test_binary_auc_matches_sklearn_free_replica(spark):
    import random

    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import binary_auc

    rng = random.Random(5)
    rows = [
        Row(s=round(rng.random(), 2), y=rng.randint(0, 1)) for _ in range(500)
    ]

    def replica_auc(pairs):
        pos = sorted(s for s, y in pairs if y == 1)
        neg = sorted(s for s, y in pairs if y == 0)
        wins = 0.0
        for p in pos:
            import bisect

            lt = bisect.bisect_left(neg, p)
            eq = bisect.bisect_right(neg, p) - lt
            wins += lt + 0.5 * eq
        return wins / (len(pos) * len(neg))

    got = binary_auc(spark.createDataFrame(rows), "s", "y").collect()[0]
    want = replica_auc([(r.s, r.y) for r in rows])
    assert abs(got.auc - want) < 1e-9
    assert got.n_pos == sum(r.y for r in rows)
    assert got.n_pos + got.n_neg == len(rows)


def test_binary_auc_edges(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import binary_auc

    # perfect separation
    df = spark.createDataFrame(
        [Row(s=0.9, y=1), Row(s=0.8, y=1), Row(s=0.2, y=0), Row(s=None, y=1)]
    )
    r = binary_auc(df, "s", "y").collect()[0]
    assert r.auc == 1.0 and r.n_pos == 2 and r.n_neg == 1
    # single class -> NULL, not 0/1
    one = spark.createDataFrame([Row(s=0.5, y=1)])
    assert binary_auc(one, "s", "y").collect()[0].auc is None
    # all ties -> 0.5
    ties = spark.createDataFrame([Row(s=0.5, y=1), Row(s=0.5, y=0)])
    assert binary_auc(ties, "s", "y").collect()[0].auc == 0.5


def test_binary_auc_million_distinct_scores_stays_partitioned(spark):
    """r6 hardening pin (VERDICT r5 'What's wrong' #2): 10^6 DISTINCT
    unquantized scores must flow through a PARTITIONED prefix-sum
    window, never a single-partition cumulative window, and still give
    the exact analytic AUC. Construction: s=i, y=i%2 over i<2N — pos
    scores are the odds, each odd 2k+1 beats k+1 evens, so
    AUC = N(N+1)/2 / N^2 = (N+1)/(2N)."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.functions.metrics import binary_auc

    n = 1_000_000
    df = spark.range(n).select(
        F.col("id").cast("double").alias("s"),
        (F.col("id") % 2).cast("int").alias("y"),
    )
    out = binary_auc(df, "s", "y", quantize=None)
    # every window in the executed plan must carry a partition spec
    # (windowspecdefinition's first arg is the partition column list;
    # the distributed form partitions on _pid)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    n_specs = plan.count("windowspecdefinition(")
    assert n_specs >= 1, "prefix-sum window missing from plan"
    assert plan.count("windowspecdefinition(_pid") == n_specs, (
        "found a window without the _pid partition key:\n" + plan
    )
    r = out.collect()[0]
    half = n // 2
    want = (half + 1) / (2.0 * half)
    assert r.n_pos == half and r.n_neg == half
    assert abs(r.auc - want) < 1e-9


def test_binary_auc_quantize_collapses_ties(spark):
    """quantize=2 must rank 0.123 and 0.1201 as the SAME score (tie,
    avg rank) — pinning that quantization happens BEFORE the rank
    groupBy, not after."""
    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import binary_auc

    df = spark.createDataFrame(
        [Row(s=0.123, y=1), Row(s=0.1201, y=0), Row(s=0.9, y=1),
         Row(s=0.05, y=0)]
    )
    # unquantized: pos {0.123, 0.9} vs neg {0.1201, 0.05}: all 4 pos-neg
    # comparisons win -> AUC 1.0
    assert binary_auc(df, "s", "y", quantize=None).collect()[0].auc == 1.0
    # quantize=2: 0.123 and 0.1201 both -> 0.12 (tie, 0.5 credit):
    # AUC = (2 + 0.5 + 1) / 4 = 0.875
    assert binary_auc(df, "s", "y", quantize=2).collect()[0].auc == 0.875


def test_calibration_bins_shape_and_rates(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import calibration_bins

    rows = (
        [Row(s=0.05, y=0)] * 9 + [Row(s=0.05, y=1)]  # bin 0: 10% pos
        + [Row(s=0.95, y=1)] * 9 + [Row(s=0.95, y=0)]  # bin 9: 90% pos
        + [Row(s=1.7, y=1)]  # clamps into bin 9
    )
    out = {r.bin: r for r in calibration_bins(
        spark.createDataFrame(rows), "s", "y"
    ).collect()}
    assert set(out) == {0, 9}
    assert out[0].positive_rate == 0.1 and out[0].n == 10
    assert out[9].n == 11
    assert abs(out[0].mean_score - 0.05) < 1e-6
    assert out[0].lo == 0.0 and out[9].hi == 1.0


def test_temperature_mixture_flattens_distribution(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.operators.split import temperature_mixture

    rows = (
        [Row(i=i, src="big") for i in range(1600)]
        + [Row(i=10_000 + i, src="small") for i in range(100)]
    )
    df = spark.createDataFrame(rows)

    def shares(alpha):
        out = temperature_mixture(
            df, "src", alpha, 400, key_cols=["i"]
        ).groupBy("src").count().collect()
        d = {r.src: r["count"] for r in out}
        return d.get("big", 0), d.get("small", 0)

    b1, s1 = shares(1.0)  # natural: ~16:1
    b5, s5 = shares(0.5)  # sqrt: ~4:1
    assert b1 / max(s1, 1) > 8
    assert 2 < b5 / max(s5, 1) < 8
    # alpha=0 equalizes wants; "small" exhausts (without replacement)
    b0, s0 = shares(0.0)
    assert s0 == 100 and b0 < 2 * s0 + 60

    import pytest

    with pytest.raises(ValueError):
        temperature_mixture(df, "src", -0.1, 100, key_cols=["i"])


def test_auto_join_picks_strategies_and_matches_plain(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.operators.batch import auto_join

    skewed = spark.createDataFrame(
        [Row(k=1 if i < 900 else i, v=i) for i in range(1000)]
    )
    dim = spark.createDataFrame([Row(k=i, w=f"w{i}") for i in range(1000)])

    # tiny right side -> broadcast
    s1 = {}
    out1 = auto_join(skewed, dim, ["k"], stats=s1)
    assert s1["strategy"] == "broadcast"

    # force past broadcast: hot key 1 holds 90% of rows -> salted
    s2 = {}
    out2 = auto_join(
        skewed, dim, ["k"], broadcast_row_limit=10, stats=s2
    )
    assert s2["strategy"] == "salted"

    # uniform left -> plain
    uniform = spark.createDataFrame([Row(k=i % 50, v=i) for i in range(500)])
    s3 = {}
    auto_join(uniform, dim, ["k"], broadcast_row_limit=10, stats=s3)
    assert s3["strategy"] == "plain"

    want = {(r.k, r.v, r.w) for r in skewed.join(dim, "k").collect()}
    assert {(r.k, r.v, r.w) for r in out1.collect()} == want
    assert {(r.k, r.v, r.w) for r in out2.collect()} == want


def test_auto_join_byte_cap_blocks_wide_broadcast(spark):
    """A WIDE right side under the row limit must not be
    force-broadcast: the sampled-width byte estimate caps it and the
    join falls through to the profiled path (ADVICE r5)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from embeddinghub_spark.operators.batch import auto_join

    left = spark.createDataFrame([Row(k=i % 20, v=i) for i in range(200)])
    wide = spark.createDataFrame([Row(k=i) for i in range(50)]).withColumn(
        "payload", F.repeat(F.lit("x"), 10_000)
    )
    s = {}
    out = auto_join(left, wide, ["k"], broadcast_byte_limit=100_000, stats=s)
    assert s["strategy"] != "broadcast"
    assert s["est_right_bytes"] > 100_000
    # result is still the plain join
    assert out.count() == left.join(wide, "k").count()

    # same shape under the byte limit broadcasts as before
    s2 = {}
    auto_join(left, wide, ["k"], stats=s2)  # default 256 MB cap
    assert s2["strategy"] == "broadcast"


def test_expected_calibration_error(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import (
        expected_calibration_error,
    )

    # perfectly calibrated: score == empirical rate in each bin
    rows = []
    for b, rate in [(0, 0.05), (5, 0.55), (9, 0.95)]:
        s = b / 10 + 0.05
        n_pos = int(rate * 100)
        rows += [Row(s=s, y=1)] * n_pos + [Row(s=s, y=0)] * (100 - n_pos)
    r = expected_calibration_error(
        spark.createDataFrame(rows), "s", "y"
    ).collect()[0]
    assert r.ece < 1e-9 and r.n == 300 and r.n_bins_occupied == 3

    # badly calibrated: high scores, half positives
    bad = [Row(s=0.95, y=i % 2) for i in range(100)]
    r2 = expected_calibration_error(
        spark.createDataFrame(bad), "s", "y"
    ).collect()[0]
    assert abs(r2.ece - 0.45) < 1e-9


def test_auc_by_group_matches_per_slice_replica(spark):
    import bisect
    import random

    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import auc_by_group

    rng = random.Random(11)
    rows = [
        Row(g=f"lang{i % 3}", s=round(rng.random(), 2), y=rng.randint(0, 1))
        for i in range(600)
    ]

    def replica_auc(pairs):
        pos = sorted(s for s, y in pairs if y == 1)
        neg = sorted(s for s, y in pairs if y == 0)
        if not pos or not neg:
            return None
        wins = 0.0
        for p in pos:
            lt = bisect.bisect_left(neg, p)
            eq = bisect.bisect_right(neg, p) - lt
            wins += lt + 0.5 * eq
        return wins / (len(pos) * len(neg))

    got = {
        r.g: r for r in auc_by_group(
            spark.createDataFrame(rows), "g", "s", "y"
        ).collect()
    }
    assert len(got) == 3
    for g in ("lang0", "lang1", "lang2"):
        pairs = [(r.s, r.y) for r in rows if r.g == g]
        assert abs(got[g].auc - replica_auc(pairs)) < 1e-9
        assert got[g].n_pos == sum(y for _, y in pairs)

    # one-class group -> NULL auc, visible row
    one = spark.createDataFrame(
        [Row(g="a", s=0.9, y=1), Row(g="a", s=0.1, y=1),
         Row(g="b", s=0.9, y=1), Row(g="b", s=0.1, y=0)]
    )
    out = {r.g: r for r in auc_by_group(one, "g", "s", "y").collect()}
    assert out["a"].auc is None and out["b"].auc == 1.0


def test_auc_by_group_windows_partitioned_by_group(spark):
    """Every window in the plan must carry the group partition key —
    the sliced form must never fall back to a global window."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.functions.metrics import auc_by_group

    df = spark.range(10_000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        F.col("id").cast("double").alias("s"),
        (F.col("id") % 2).cast("int").alias("y"),
    )
    out = auc_by_group(df, "g", "s", "y")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    n_specs = plan.count("windowspecdefinition(")
    assert n_specs >= 1
    assert plan.count("windowspecdefinition(_g") == n_specs, plan


def test_ranking_metrics_known_values(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import ranking_metrics

    # q1: ranked docs by score -> d1(rel 3), d2(rel 0), d3(rel 1)
    # q2: no relevant docs at all
    rows = [
        Row(q="q1", d="d1", s=0.9, r=3.0),
        Row(q="q1", d="d2", s=0.8, r=0.0),
        Row(q="q1", d="d3", s=0.7, r=1.0),
        Row(q="q1", d="d4", s=0.6, r=2.0),
        Row(q="q2", d="d1", s=0.9, r=0.0),
        Row(q="q2", d="d2", s=0.8, r=0.0),
    ]
    out = {
        r.q: r for r in ranking_metrics(
            spark.createDataFrame(rows), "q", "d", "s", "r", k=3
        ).collect()
    }
    import math

    dcg = 3.0 + 0.0 + 1.0 / math.log2(4)
    idcg = 3.0 + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert abs(out["q1"].ndcg_at_k - dcg / idcg) < 1e-6
    assert abs(out["q1"].precision_at_k - 2 / 3) < 1e-9
    assert abs(out["q1"].recall_at_k - 2 / 3) < 1e-9
    assert out["q1"].reciprocal_rank == 1.0
    assert out["q1"].n_relevant == 3
    # no relevant docs: NDCG undefined (NULL), RR = 0 by convention
    assert out["q2"].ndcg_at_k is None
    assert out["q2"].recall_at_k is None
    assert out["q2"].reciprocal_rank == 0.0
    assert out["q2"].precision_at_k == 0.0


def test_ranking_metrics_deterministic_tiebreak(spark):
    """Equal scores rank by doc ascending — the permutation (and so
    the metrics) must not depend on input order or partitioning."""
    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import ranking_metrics

    rows = [
        Row(q="q", d="b", s=0.5, r=1.0),
        Row(q="q", d="a", s=0.5, r=0.0),
        Row(q="q", d="c", s=0.5, r=0.0),
    ]
    for perm in ([0, 1, 2], [2, 1, 0], [1, 2, 0]):
        df = spark.createDataFrame([rows[i] for i in perm]).repartition(4)
        r = ranking_metrics(df, "q", "d", "s", "r", k=1).collect()[0]
        # tie order a < b < c puts the relevant doc 'b' at rank 2
        assert r.precision_at_k == 0.0
        assert r.reciprocal_rank == 0.5


def test_logistic_regression_matches_numpy_free_replica(spark):
    """Batch-GD logistic regression vs a pure-Python replica running
    the IDENTICAL update schedule — same lr, same iterations — must
    agree to optimizer-noise tolerance (sums over partitions are the
    only nondeterminism). Separable 2-D data must also classify
    cleanly."""
    import math
    import random

    from pyspark.sql import Row

    from embeddinghub_spark.functions.linear import (
        logistic_regression_fit,
        logistic_regression_predict,
    )

    rng = random.Random(7)
    rows = []
    for _ in range(400):
        y = rng.randint(0, 1)
        cx = 1.5 if y else -1.5
        rows.append(
            Row(x=[cx + rng.gauss(0, 0.7), rng.gauss(0, 1.0)], y=y)
        )
    df = spark.createDataFrame(rows).repartition(8)
    fit = logistic_regression_fit(df, "x", "y", dim=2, n_iters=30, lr=1.0)
    assert fit["n"] == 400 and fit["n_iters_run"] == 30

    # python replica, identical schedule
    w, b = [0.0, 0.0], 0.0
    data = [(r.x, r.y) for r in rows]
    losses = []
    for _ in range(30):
        g = [0.0, 0.0]
        gb = 0.0
        loss = 0.0
        for x, y in data:
            m = w[0] * x[0] + w[1] * x[1] + b
            r = 1.0 / (1.0 + math.exp(-m)) - y
            g[0] += r * x[0]
            g[1] += r * x[1]
            gb += r
            loss += math.log(1.0 + math.exp(-abs(m))) + max(m, 0.0) - m * y
        n = len(data)
        losses.append(loss / n)
        w = [wi - gi / n for wi, gi in zip(w, g)]
        b -= gb / n
    assert abs(fit["weights"][0] - w[0]) < 1e-6
    assert abs(fit["weights"][1] - w[1]) < 1e-6
    assert abs(fit["intercept"] - b) < 1e-6
    assert abs(fit["loss_history"][-1] - losses[-1]) < 1e-9
    # loss decreases and the model separates the classes
    assert fit["loss_history"][-1] < fit["loss_history"][0]
    scored = logistic_regression_predict(
        df, "x", fit["weights"], fit["intercept"]
    )
    acc = scored.selectExpr(
        "avg(cast((score > 0.5) = (y = 1) as int)) as acc"
    ).collect()[0].acc
    assert acc > 0.9


def test_logistic_regression_validates_and_converges_early(spark):
    import pytest
    from pyspark.sql import Row

    from embeddinghub_spark.functions.linear import logistic_regression_fit

    df = spark.createDataFrame([Row(x=[1.0, 2.0], y=1), Row(x=[1.0], y=0)])
    with pytest.raises(ValueError, match="length dim"):
        logistic_regression_fit(df, "x", "y", dim=2, n_iters=1)

    # constant zero gradient -> early stop after the first iteration
    flat = spark.createDataFrame(
        [Row(x=[0.0], y=1), Row(x=[0.0], y=0)] * 10
    )
    fit = logistic_regression_fit(flat, "x", "y", dim=1, n_iters=50)
    assert fit["n_iters_run"] == 1  # grad exactly 0 at w=0 on balanced 0s


def test_isotonic_calibration_pav_properties(spark):
    """PAV essentials: a perfectly calibrated scorer maps (almost) to
    itself, an anti-monotone scorer pools to the global rate, output
    is monotone non-decreasing over the grid, and applying the map
    reduces ECE on a miscalibrated sample."""
    import random

    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import (
        apply_calibration,
        expected_calibration_error,
        fit_isotonic_calibration,
    )

    # anti-monotone: high score = never positive, low score = always
    anti = spark.createDataFrame(
        [Row(s=0.9, y=0)] * 30 + [Row(s=0.1, y=1)] * 30
    )
    cal = fit_isotonic_calibration(anti, "s", "y")
    rows = {r.score: r for r in cal.collect()}
    # pooled: every grid point gets the global rate 0.5
    assert abs(rows[0.1].calibrated - 0.5) < 1e-9
    assert abs(rows[0.9].calibrated - 0.5) < 1e-9
    assert rows[0.1].n == 30 and rows[0.5].n == 0
    # monotone over the full grid
    vals = [r.calibrated for r in cal.orderBy("score").collect()]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))

    # miscalibrated: scores ~0.9 but rate 0.5 -> calibration fixes ECE
    rng = random.Random(3)
    mis = spark.createDataFrame(
        [Row(s=round(0.85 + 0.1 * rng.random(), 3), y=i % 2)
         for i in range(400)]
    )
    cal2 = fit_isotonic_calibration(mis, "s", "y")
    scored = apply_calibration(mis, cal2, "s", out_col="s2")
    before = expected_calibration_error(mis, "s", "y").collect()[0].ece
    after = expected_calibration_error(scored, "s2", "y").collect()[0].ece
    assert after < before / 4

    # NULL scores pass through with NULL calibrated
    withnull = spark.createDataFrame([Row(s=None, y=1), Row(s=0.9, y=0)])
    out = {r.y: r for r in apply_calibration(
        withnull, cal, "s").collect()}
    assert out[1].calibrated is None
    assert out[0].calibrated is not None


def test_isotonic_calibration_matches_replica_pav(spark):
    """Fitted values equal a plain-Python PAV over the same quantized
    distinct-score table (weights = counts)."""
    import random

    from pyspark.sql import Row

    from embeddinghub_spark.functions.metrics import (
        fit_isotonic_calibration,
    )

    rng = random.Random(17)
    rows = [
        Row(s=round(rng.random(), 2), y=int(rng.random() < 0.3 + 0.4 * rng.random()))
        for _ in range(800)
    ]
    cal = {
        r.score: r.calibrated
        for r in fit_isotonic_calibration(
            spark.createDataFrame(rows), "s", "y", quantize=2
        ).collect()
    }

    # replica: group by rounded score, PAV
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        k = round(r.s, 2)
        agg[k][0] += r.y
        agg[k][1] += 1
    ordered = sorted(agg.items())
    blocks = []
    for s, (p, n) in ordered:
        blocks.append([p, n, s])
        while len(blocks) >= 2 and (
            blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            p2, n2, _ = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
    want = {}
    bi = 0
    for s, _ in ordered:
        if bi + 1 < len(blocks) and s >= blocks[bi + 1][2]:
            bi += 1
        want[s] = blocks[bi][0] / blocks[bi][1]
    for s, v in want.items():
        assert abs(cal[s] - v) < 1e-8, s


def test_corpus_diversity_matches_replica(spark):
    """Entropy/TTR per group vs a Python replica with the identical
    decimal discipline; uniform distribution hits log2(V) exactly,
    single-word spam hits 0."""
    import math
    from collections import Counter

    from embeddinghub_spark.functions.text import corpus_diversity

    docs = [
        ("a", "w1 w2 w3 w4"),           # uniform over 4 types -> H=2
        ("b", "spam spam spam spam"),   # degenerate -> H=0
        ("c", "x x y z"),
    ]
    df = spark.createDataFrame(docs, ["src", "text"])
    got = {r.group: r for r in corpus_diversity(df, "text", "src").collect()}
    assert got["a"].token_entropy == 2.0 and got["a"].vocab_size == 4
    assert got["b"].token_entropy == 0.0 and got["b"].vocab_size == 1
    assert got["b"].type_token_ratio == 0.25

    wc = Counter("x x y z".split())
    n = sum(wc.values())
    h = math.log2(n) - sum(
        round(c * math.log2(c), 9) for c in wc.values()
    ) / n
    assert abs(got["c"].token_entropy - round(h, 6)) < 1e-9

    # no group column -> one 'all' row over the whole corpus
    allrow = corpus_diversity(df, "text").collect()
    assert len(allrow) == 1 and allrow[0].group == "all"
    assert allrow[0].n_tokens == 12


def test_platt_calibration_and_quality_pipeline_compose(spark):
    """End-to-end integration pin: hash_vectorizer features ->
    logistic_regression_fit -> predict -> binary_auc + Platt
    recalibration. The pieces must compose without glue code and the
    trained pipeline must separate an easy quality signal."""
    from pyspark.sql import Row

    from embeddinghub_spark.functions.linear import (
        logistic_regression_predict,
    )
    from embeddinghub_spark.functions.metrics import (
        apply_platt_calibration,
        binary_auc,
        fit_platt_calibration,
    )

    # easy separable scores: label 1 clusters high, 0 clusters low,
    # but UNCALIBRATED (compressed into [0.4, 0.6])
    import random

    rng = random.Random(31)
    rows = [
        Row(s=round(0.5 + (0.08 if y else -0.08) + rng.gauss(0, 0.02), 4), y=y)
        for y in (rng.randint(0, 1) for _ in range(500))
    ]
    df = spark.createDataFrame(rows)
    model = fit_platt_calibration(df, "s", "y", n_iters=60, lr=6.0)
    assert model["n"] == 500 and model["a"] > 0  # monotone in score
    cal = apply_platt_calibration(df, model, "s")
    # calibration is monotone -> AUC unchanged; spread widens
    auc_raw = binary_auc(df, "s", "y").collect()[0].auc
    auc_cal = binary_auc(
        cal.select(F.col("calibrated").alias("s"), "y"), "s", "y"
    ).collect()[0].auc
    assert auc_raw > 0.95
    assert abs(auc_raw - auc_cal) < 0.02  # quantize=4 may merge ties
    lo, hi = cal.agg(
        F.min("calibrated"), F.max("calibrated")
    ).collect()[0]
    assert hi - lo > 0.5  # recalibration stretched the range

    # NULL score -> NULL calibrated
    nul = apply_platt_calibration(
        spark.createDataFrame([(None, 0)], "s DOUBLE, y INT"), model, "s"
    ).collect()[0]
    assert nul.calibrated is None


def test_entity_split_atomic_and_deterministic(spark):
    """Every row of an entity lands on ONE side (the leakage guard),
    the assignment is repartition-stable and seed-sensitive, and the
    test fraction over entities tracks test_size."""
    from embeddinghub_spark.operators.split import entity_split

    rows = [(e, r) for e in range(400) for r in range(3)]
    df = spark.createDataFrame(rows, ["ent", "row"])

    out = entity_split(df, ["ent"], test_size=0.25).collect()
    sides = {}
    for r in out:
        sides.setdefault(r["ent"], set()).add(r["is_test"])
    assert all(len(s) == 1 for s in sides.values())  # atomic per entity

    frac = sum(1 for s in sides.values() if s == {1}) / len(sides)
    assert 0.15 < frac < 0.35  # binomial around 0.25 over 400 entities

    again = {
        (r["ent"], r["row"]): r["is_test"]
        for r in entity_split(df.repartition(7), ["ent"], 0.25).collect()
    }
    assert again == {(r["ent"], r["row"]): r["is_test"] for r in out}

    other = {
        r["ent"]: r["is_test"]
        for r in entity_split(df, ["ent"], 0.25, seed=1).collect()
    }
    base = {r["ent"]: r["is_test"] for r in out}
    assert other != base  # seed moves the assignment

    # edges: 0 -> all train, 1 -> all test
    assert all(
        r["is_test"] == 0 for r in entity_split(df, ["ent"], 0.0).collect()
    )
    assert all(
        r["is_test"] == 1 for r in entity_split(df, ["ent"], 1.0).collect()
    )


def test_cross_validated_auc_composition(spark):
    """End-to-end eval harness: kfold_assign → per-fold logistic
    regression → held-out scoring → binary_auc. Pins that the split,
    trainer, scorer, and metric compose (train AUC ≫ 0.5 on separable
    data, every fold populated, no row scored by a model that saw
    it)."""
    import random

    from embeddinghub_spark.functions.linear import (
        logistic_regression_fit,
        logistic_regression_predict,
    )
    from embeddinghub_spark.functions.metrics import binary_auc
    from embeddinghub_spark.operators.split import kfold_assign

    rng = random.Random(7)
    rows = []
    for i in range(600):
        y = i % 2
        x0 = (2.0 if y else -2.0) + rng.gauss(0, 1)
        rows.append((i, [x0, rng.gauss(0, 1)], y))
    df = spark.createDataFrame(rows, ["id", "features", "label"])

    folded = kfold_assign(df, 3, ["id"]).cache()
    try:
        sizes = {
            r["fold"]: r["n"]
            for r in folded.groupBy("fold").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert set(sizes) == {0, 1, 2} and all(v > 100 for v in sizes.values())

        aucs = []
        for k in range(3):
            train = folded.filter(F.col("fold") != k)
            test = folded.filter(F.col("fold") == k)
            model = logistic_regression_fit(
                train, "features", "label", dim=2, n_iters=40
            )
            scored = logistic_regression_predict(
                test, "features", model["weights"], model["intercept"]
            )
            auc = binary_auc(scored, "score", "label").collect()[0]["auc"]
            aucs.append(auc)
        assert all(a > 0.9 for a in aucs), aucs
    finally:
        folded.unpersist()


def test_catalog_lineage_edges_and_upstream_closure(spark, tmp_path):
    """The lineage export carries every dependency edge (transform
    inputs, feature/label sources, training-set membership incl.
    lags, model consumption) and the upstream closure walks it
    transitively."""
    import datetime as dt

    from embeddinghub_spark.catalog import Catalog, SourceVariant

    cat = Catalog(spark)
    p = str(tmp_path / "raw.parquet")
    spark.createDataFrame(
        [(1, 2.0, dt.datetime(2024, 1, 1))], ["user_id", "value", "ts"]
    ).write.parquet(p)
    cat.register_source(SourceVariant(name="raw", variant="v1", path=p))
    cat.sql_transformation(
        "clean", "v1", "SELECT * FROM {{raw.v1}}"
    )
    cat.register_feature("f", "v1", ("clean", "v1"), "user_id", "value", "ts")
    cat.register_label("y", "v1", ("raw", "v1"), "user_id", "value", "ts")
    cat.register_training_set("t", "v1", ("y", "v1"), [("f", "v1")])
    cat.register_model("m", features=[("f", "v1")], training_sets=[("t", "v1")])

    edges = set(cat.lineage_edges())
    assert ("source", "raw.v1", "source", "clean.v1") in edges
    assert ("source", "clean.v1", "feature", "f.v1") in edges
    assert ("source", "raw.v1", "label", "y.v1") in edges
    assert ("label", "y.v1", "training_set", "t.v1") in edges
    assert ("feature", "f.v1", "training_set", "t.v1") in edges
    assert ("feature", "f.v1", "model", "m") in edges
    assert ("training_set", "t.v1", "model", "m") in edges

    up = cat.upstream_closure("model", "m")
    assert ("source", "raw.v1") in up and ("feature", "f.v1") in up
    assert ("training_set", "t.v1") in up and ("label", "y.v1") in up
    assert ("model", "m") not in up
    # a leaf source has no upstream
    assert cat.upstream_closure("source", "raw", "v1") == set()


def test_dataset_fingerprint_partition_invariant_and_sensitive(spark):
    """The fingerprint is identical under any partitioning/row order,
    changes when any value changes, does not cancel duplicates, and
    treats NULL and '∅'-string distinctly from missing columns."""
    from embeddinghub_spark.functions.profile import dataset_fingerprint

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, None), (3, "c")], ["k", "v"]
    )
    base = dataset_fingerprint(df).collect()[0]
    assert base["n_rows"] == 4

    rep = dataset_fingerprint(df.repartition(7)).collect()[0]
    assert (rep["n_rows"], rep["fingerprint"]) == (4, base["fingerprint"])

    changed = spark.createDataFrame(
        [(1, "a"), (2, None), (2, None), (3, "d")], ["k", "v"]
    )
    assert (
        dataset_fingerprint(changed).collect()[0]["fingerprint"]
        != base["fingerprint"]
    )

    # duplicates do NOT cancel (sum, not xor): dropping one dup changes it
    dedup = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], ["k", "v"]
    )
    assert (
        dataset_fingerprint(dedup).collect()[0]["fingerprint"]
        != base["fingerprint"]
    )

    # empty frame fingerprints to 0 with 0 rows
    empty = dataset_fingerprint(df.limit(0)).collect()[0]
    assert (empty["n_rows"], empty["fingerprint"]) == (0, "0")


def test_dataset_fingerprint_union_additivity(spark):
    """The merge law that makes the digest scale: fingerprint(A ∪ B)
    equals the integer SUM of the parts' fingerprints — shards can be
    fingerprinted independently and combined driver-side without
    rescanning the union."""
    from embeddinghub_spark.functions.profile import dataset_fingerprint

    a = spark.createDataFrame([(i, f"v{i}") for i in range(50)], ["k", "v"])
    b = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50, 80)], ["k", "v"]
    )
    fa = dataset_fingerprint(a).collect()[0]
    fb = dataset_fingerprint(b).collect()[0]
    fu = dataset_fingerprint(a.unionByName(b)).collect()[0]
    assert int(fu["fingerprint"]) == int(fa["fingerprint"]) + int(
        fb["fingerprint"]
    )
    assert fu["n_rows"] == fa["n_rows"] + fb["n_rows"] == 80


def test_fingerprint_by_totals_to_whole_table(spark):
    """Per-group fingerprints name a diverging shard and their
    integer SUM equals the whole-table digest over the same content
    columns (the additivity law, grouped form)."""
    from embeddinghub_spark.functions.profile import (
        dataset_fingerprint,
        dataset_fingerprint_by,
    )

    df = spark.createDataFrame(
        [(g, i, f"v{i}") for g in ("x", "y") for i in range(g == "y", 30)],
        ["grp", "k", "v"],
    )
    per = {
        r["grp"]: (r["n_rows"], int(r["fingerprint"]))
        for r in dataset_fingerprint_by(df, ["grp"]).collect()
    }
    whole = dataset_fingerprint(df, ["k", "v"]).collect()[0]
    assert sum(n for n, _ in per.values()) == whole["n_rows"]
    assert sum(f for _, f in per.values()) == int(whole["fingerprint"])

    # a one-row change moves exactly ONE group's digest
    df2 = spark.createDataFrame(
        [(g, i, "CHANGED" if (g, i) == ("y", 5) else f"v{i}")
         for g in ("x", "y") for i in range(g == "y", 30)],
        ["grp", "k", "v"],
    )
    per2 = {
        r["grp"]: int(r["fingerprint"])
        for r in dataset_fingerprint_by(df2, ["grp"]).collect()
    }
    assert per2["x"] == per["x"][1] and per2["y"] != per["y"][1]


def _py_pack_sequences(rows, max_seq_len):
    """Pure-Python replica: exclusive prefix sum over the given order,
    GPT concat-and-chunk slicing. rows = [(id, order_key, n_tokens)]."""
    out, cursor = [], 0
    for did, _k, n in sorted(rows, key=lambda r: (r[1], r[0])):
        if n <= 0:
            continue
        st, en = cursor, cursor + n
        cursor = en
        for seq in range(st // max_seq_len, (en - 1) // max_seq_len + 1):
            lo = max(st, seq * max_seq_len)
            hi = min(en, (seq + 1) * max_seq_len)
            out.append((did, seq, lo - seq * max_seq_len, lo - st, hi - lo))
    return sorted(out)


def test_pack_sequences_matches_python_replica(spark):
    from embeddinghub_spark.functions.text import pack_sequences

    rows = [
        (1, "c", 30), (2, "a", 130), (3, "b", 100), (4, "d", 1),
        (5, "e", 299), (6, "f", 0),  # zero-token doc drops
    ]
    df = spark.createDataFrame(rows, ["doc_id", "ord", "n_tokens"])
    got = sorted(
        (r["doc_id"], r["seq_id"], r["seq_offset"], r["doc_offset"],
         r["slice_len"])
        for r in pack_sequences(
            df, order_cols=["ord", "doc_id"], n_tokens_col="n_tokens",
            max_seq_len=128,
        ).collect()
    )
    assert got == _py_pack_sequences(rows, 128)
    # repartition invariance: the C5 offset machinery must not depend
    # on the incoming layout
    got9 = sorted(
        (r["doc_id"], r["seq_id"], r["seq_offset"], r["doc_offset"],
         r["slice_len"])
        for r in pack_sequences(
            df.repartition(9), order_cols=["ord", "doc_id"],
            n_tokens_col="n_tokens", max_seq_len=128, num_partitions=5,
        ).collect()
    )
    assert got9 == got


def test_pack_sequences_tiling_invariants(spark):
    """Every sequence is tiled [0, L) exactly (last may be short);
    every document is tiled [0, n_tokens) exactly."""
    from collections import defaultdict

    from embeddinghub_spark.functions.text import pack_sequences

    rows = [(i, f"{i:03d}", (i * 37) % 200 + 1) for i in range(1, 40)]
    df = spark.createDataFrame(rows, ["doc_id", "ord", "n_tokens"])
    L = 100
    slices = pack_sequences(
        df, order_cols=["ord", "doc_id"], n_tokens_col="n_tokens",
        max_seq_len=L,
    ).collect()
    by_seq, by_doc = defaultdict(list), defaultdict(list)
    for r in slices:
        assert 1 <= r["slice_len"] <= L
        by_seq[r["seq_id"]].append((r["seq_offset"], r["slice_len"]))
        by_doc[r["doc_id"]].append((r["doc_offset"], r["slice_len"]))
    total = sum(n for _i, _o, n in rows)
    assert set(by_seq) == set(range((total + L - 1) // L))
    for seq, parts in by_seq.items():
        parts.sort()
        pos = 0
        for off, ln in parts:
            assert off == pos, (seq, parts)
            pos += ln
        assert pos == (L if seq < total // L else total % L or L)
    for did, parts in by_doc.items():
        parts.sort()
        pos = 0
        for off, ln in parts:
            assert off == pos, (did, parts)
            pos += ln
        assert pos == dict((i, n) for i, _o, n in rows)[did]


def test_pack_sequences_contracts(spark):
    import pytest as _pt
    from pyspark.sql import functions as _F

    from embeddinghub_spark.functions.text import pack_sequences

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None)], ["doc_id", "ord", "n_tokens"]
    )
    with _pt.raises(Exception, match="contains NULL"):
        pack_sequences(
            df, order_cols=["ord", "doc_id"], n_tokens_col="n_tokens",
            max_seq_len=8,
        ).collect()
    ok = df.filter(_F.col("n_tokens").isNotNull())
    with _pt.raises(ValueError, match="max_seq_len"):
        pack_sequences(
            ok, order_cols=["ord"], n_tokens_col="n_tokens", max_seq_len=0
        )
    with _pt.raises(ValueError, match="order_cols"):
        pack_sequences(
            ok, order_cols=[], n_tokens_col="n_tokens", max_seq_len=8
        )
    with _pt.raises(ValueError, match="reserved"):
        pack_sequences(
            ok.withColumn("seq_id", _F.lit(1)), order_cols=["ord"],
            n_tokens_col="n_tokens", max_seq_len=8,
        )


def test_pack_sequences_rejects_negative_tokens_and_reserved_helpers(spark):
    """Review find: negative token counts raise (they would silently
    shift every later offset), and the helper columns the packer
    injects are all reserved."""
    import pytest
    from pyspark.sql import functions as F

    from embeddinghub_spark.functions.text import pack_sequences

    bad = spark.createDataFrame(
        [(1, 5), (2, -1)], "doc_id long, n_tokens int"
    )
    with pytest.raises(Exception, match="NULL or negative"):
        pack_sequences(
            bad, order_cols=["doc_id"], n_tokens_col="n_tokens",
            max_seq_len=8,
        ).collect()
    ok = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens int")
    for helper in ("_start", "_end", "_sbase", "_from", "_to"):
        with pytest.raises(ValueError, match="reserved"):
            pack_sequences(
                ok.withColumn(helper, F.lit(1)),
                order_cols=["doc_id"], n_tokens_col="n_tokens",
                max_seq_len=8,
            )


def test_bigram_tf_shared_cache_is_keyed_and_reused(spark):
    """VERDICT r13 #7 consolidation: the LM pair (bigram_logprob /
    kn_bigram_logprob) shares ONE eager localCheckpoint of the
    bigram_tf upstream. Same (app, sf_dir) → the identical cached
    frame (no rebuild); a different sf_dir evicts and rebuilds (at
    most one corpus held); injected tf_df produces results identical
    to the self-built path."""
    import __spark_entry__ as m
    from embeddinghub_spark.functions.text import (
        bigram_logprob,
        kn_bigram_logprob,
    )

    m._BIGRAM_TF_CACHE.clear()
    a = m._bigram_tf_shared(spark, "/root/testdata/sf0.001")
    b = m._bigram_tf_shared(spark, "/root/testdata/sf0.001")
    assert a is b
    assert len(m._BIGRAM_TF_CACHE) == 1
    c = m._bigram_tf_shared(spark, "/root/testdata/sf0.01")
    assert c is not a
    assert len(m._BIGRAM_TF_CACHE) == 1  # old corpus evicted
    m._BIGRAM_TF_CACHE.clear()

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "c c d"), (3, "x")], ["doc_id", "text"]
    )
    from embeddinghub_spark.functions.text import bigram_tf

    tfb = bigram_tf(docs).localCheckpoint(eager=True)
    for fn in (bigram_logprob, kn_bigram_logprob):
        self_built = {
            (r["doc_id"], r["n_bigrams"], r["logprob"])
            for r in fn(docs).collect()
        }
        injected = {
            (r["doc_id"], r["n_bigrams"], r["logprob"])
            for r in fn(docs, tf_df=tfb).collect()
        }
        assert injected == self_built and len(self_built) == 2
