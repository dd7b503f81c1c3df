"""Exact edit-distance similarity join (q-gram prefix filter + verify)."""

import itertools

from pyspark.sql import Row
from pyspark.sql import functions as F

from embeddinghub_spark.functions.fuzzy import fuzzy_pairs


def _py_lev(a, b):
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


def _brute(rows, k):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        if sa is None or sb is None:
            continue
        d = _py_lev(sa, sb)
        if d <= k:
            lo, hi = min(ia, ib), max(ia, ib)
            out.add((lo, hi, d))
    return out


def test_fuzzy_pairs_basic(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, s="hello"),
            Row(id=2, s="hallo"),  # dist 1
            Row(id=3, s="help"),  # dist 2 from hello
            Row(id=4, s="world"),
            Row(id=5, s=None),
        ]
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=2).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 2)}  # lev(hallo, help) = 3


def test_fuzzy_pairs_short_strings_covered(spark):
    # strings below the pigeonhole bound must still pair up
    df = spark.createDataFrame(
        [
            Row(id=1, s=""),
            Row(id=2, s="a"),
            Row(id=3, s="b"),
            Row(id=4, s="ab"),
        ]
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=1).collect()
    }
    assert got == {
        (1, 2, 1),
        (1, 3, 1),
        (2, 3, 1),
        (2, 4, 1),
        (3, 4, 1),  # "b" -> "ab" is one insertion
    }


def test_fuzzy_pairs_duplicate_grams_and_exact_dupes(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, s="aaaaaaa"),
            Row(id=2, s="aaaaaaa"),  # dist 0
            Row(id=3, s="aaabaaa"),  # dist 1
            Row(id=4, s="bbbbbbb"),
        ]
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=1).collect()
    }
    assert got == {(1, 2, 0), (1, 3, 1), (2, 3, 1)}


def test_fuzzy_pairs_equals_bruteforce_on_real_names(spark, sf_dir):
    """Lossless-filter pin: the prefix-filtered join returns EXACTLY
    the brute-force pair set on real customer names."""
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").alias("id"), F.col("c_name").alias("s")
        )
        .filter(F.col("id") < 120)
    )
    rows = [(r.id, r.s) for r in cust.collect()]
    for k in (1, 2):
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_pairs(cust, "id", "s", max_dist=k).collect()
        }
        assert got == _brute(rows, k), f"mismatch at k={k}"


def test_fuzzy_pairs_validation(spark):
    import pytest

    df = spark.createDataFrame([Row(id=1, s="x")])
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "s", max_dist=0)
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "s", q=1)


def test_fuzzy_clusters_transitive_and_singletons(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.fuzzy import fuzzy_clusters

    df = spark.createDataFrame(
        [
            Row(id=1, s="alpha"),
            Row(id=2, s="alphb"),  # 1 from alpha
            Row(id=3, s="alphc"),  # 1 from alphb, 2 from alpha -> transitive
            Row(id=4, s="omega"),  # singleton
            Row(id=5, s=None),  # null text -> singleton
        ]
    )
    out = {
        r.id: r.canonical_id
        for r in fuzzy_clusters(df, "id", "s", max_dist=1).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
