"""CDC operators: ordered changelog apply and SCD2 dimension build."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from embeddinghub_spark.operators.cdc import cdc_apply, scd2_build


def _snap(spark):
    return spark.createDataFrame(
        [Row(k=1, val="a", n=10), Row(k=2, val="b", n=20), Row(k=3, val="c", n=30)]
    )


def test_cdc_apply_insert_update_delete(spark):
    log = spark.createDataFrame(
        [
            Row(k=2, val="b2", n=21, seq=1, op="U"),
            Row(k=3, val=None, n=None, seq=2, op="D"),
            Row(k=4, val="d", n=40, seq=3, op="I"),
        ]
    )
    out = cdc_apply(_snap(spark), log, ["k"]).orderBy("k").collect()
    assert [(r.k, r.val, r.n) for r in out] == [
        (1, "a", 10),  # untouched passes through
        (2, "b2", 21),  # updated
        (4, "d", 40),  # inserted; k=3 deleted
    ]


def test_cdc_apply_latest_seq_wins_and_resurrect(spark):
    # k=2: U(seq1) then D(seq5) -> gone; k=3: D(seq1) then U(seq2)
    # -> resurrected with the later values.
    log = spark.createDataFrame(
        [
            Row(k=2, val="b2", n=21, seq=1, op="U"),
            Row(k=2, val=None, n=None, seq=5, op="D"),
            Row(k=3, val=None, n=None, seq=1, op="D"),
            Row(k=3, val="c9", n=99, seq=2, op="U"),
        ]
    )
    out = cdc_apply(_snap(spark), log, ["k"]).orderBy("k").collect()
    assert [(r.k, r.val, r.n) for r in out] == [(1, "a", 10), (3, "c9", 99)]


def test_cdc_apply_seq_tie_update_beats_delete(spark):
    log = spark.createDataFrame(
        [
            Row(k=1, val="a1", n=11, seq=7, op="U"),
            Row(k=1, val=None, n=None, seq=7, op="D"),
        ]
    )
    out = cdc_apply(_snap(spark), log, ["k"]).orderBy("k").collect()
    assert (out[0].k, out[0].val, out[0].n) == (1, "a1", 11)


def test_cdc_apply_schema_and_validation(spark):
    snap = _snap(spark)
    log = spark.createDataFrame([Row(k=1, val="x", n=1, seq=1, op="U")])
    out = cdc_apply(snap, log, ["k"])
    assert out.columns == snap.columns
    # column ORDER is preserved even when the key is NOT leading
    # (position-sensitive consumers: parquet append, schema hashes)
    snap2 = snap.select("val", "n", "k")
    out2 = cdc_apply(snap2, log, ["k"])
    assert out2.columns == ["val", "n", "k"]
    import pytest

    with pytest.raises(ValueError):
        cdc_apply(snap, log, [])
    with pytest.raises(ValueError):
        cdc_apply(snap, log.drop("seq"), ["k"])
    with pytest.raises(ValueError):
        cdc_apply(snap, log.drop("n"), ["k"])


def _ts(day):
    return dt.datetime(2024, 1, day)


def test_scd2_build_collapse_and_intervals(spark):
    ch = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(1), city="SF", tier="gold"),
            Row(k=1, ts=_ts(2), city="SF", tier="gold"),  # no-op -> collapsed
            Row(k=1, ts=_ts(3), city="NY", tier="gold"),
            Row(k=1, ts=_ts(5), city="NY", tier="silver"),
            Row(k=2, ts=_ts(4), city="LA", tier=None),
        ]
    )
    out = scd2_build(ch, ["k"], "ts").orderBy("k", "version").collect()
    k1 = [r for r in out if r.k == 1]
    assert [(r.city, r.tier, r.valid_from, r.valid_to, r.version, r.is_current)
            for r in k1] == [
        ("SF", "gold", _ts(1), _ts(3), 1, False),
        ("NY", "gold", _ts(3), _ts(5), 2, False),
        ("NY", "silver", _ts(5), None, 3, True),
    ]
    k2 = [r for r in out if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].tier is None


def test_scd2_build_null_transition_not_collapsed(spark):
    ch = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(1), city=None),
            Row(k=1, ts=_ts(2), city=None),  # NULL -> NULL collapses
            Row(k=1, ts=_ts(3), city="SF"),  # NULL -> SF is a change
        ]
    )
    out = scd2_build(ch, ["k"], "ts").orderBy("version").collect()
    assert [(r.city, r.version) for r in out] == [(None, 1), ("SF", 2)]


def test_scd2_build_no_collapse_keeps_every_change(spark):
    ch = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(1), city="SF"),
            Row(k=1, ts=_ts(2), city="SF"),
        ]
    )
    out = scd2_build(ch, ["k"], "ts", collapse=False).collect()
    assert len(out) == 2
    assert sorted(r.version for r in out) == [1, 2]


def test_scd2_intervals_cover_and_chain(spark, sf_dir):
    """On real event data: per-key intervals chain exactly (valid_to
    == next valid_from), exactly one current version per key, and the
    version sequence is gapless."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id") < 50
    )
    dim = scd2_build(
        ev.select("user_id", "ts", "event_type"), ["user_id"], "ts"
    ).cache()
    cur = dim.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur"),
        F.max("version").alias("max_v"),
        F.count("*").alias("n"),
    )
    bad = cur.filter((F.col("n_cur") != 1) | (F.col("max_v") != F.col("n")))
    assert bad.count() == 0
    # chaining: valid_to equals the next version's valid_from
    a = dim.alias("a")
    b = dim.alias("b")
    chained = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.version") + 1 == F.col("b.version")),
    ).filter(F.col("a.valid_to") != F.col("b.valid_from"))
    assert chained.count() == 0
    dim.unpersist()


def test_scd2_lookup_as_of_semantics(spark):
    from embeddinghub_spark.operators.cdc import scd2_lookup

    dim = scd2_build(
        spark.createDataFrame(
            [
                Row(k=1, ts=_ts(2), city="SF"),
                Row(k=1, ts=_ts(5), city="NY"),
                Row(k=1, ts=_ts(8), city=None),  # NULL attr version
            ]
        ),
        ["k"],
        "ts",
    )
    facts = spark.createDataFrame(
        [
            Row(fid=10, k=1, fts=_ts(1)),  # before first version
            Row(fid=11, k=1, fts=_ts(2)),  # exactly at valid_from
            Row(fid=12, k=1, fts=_ts(4)),  # inside v1
            Row(fid=13, k=1, fts=_ts(5)),  # boundary -> v2
            Row(fid=14, k=1, fts=_ts(9)),  # in the NULL-attr version
            Row(fid=15, k=2, fts=_ts(3)),  # key with no dim at all
        ]
    )
    out = {
        r.fid: (r.dim_city, r.version)
        for r in scd2_lookup(facts, dim, ["k"], "fts").collect()
    }
    assert out == {
        10: (None, None),
        11: ("SF", 1),
        12: ("SF", 1),
        13: ("NY", 2),
        14: (None, 3),  # NULL attr must NOT fall back to v2's NY
        15: (None, None),
    }


def test_scd2_lookup_row_count_preserved(spark, sf_dir):
    from pyspark.sql import functions as F

    from embeddinghub_spark.operators.cdc import scd2_lookup
    from embeddinghub_spark.sources.readers import read_file

    ev = read_file(spark, f"{sf_dir}/events.parquet").filter(
        F.col("user_id") < 40
    )
    dim = scd2_build(ev.select("user_id", "ts", "event_type"), ["user_id"], "ts")
    out = scd2_lookup(
        ev.select("event_id", "user_id", "ts", "value"), dim, ["user_id"], "ts"
    )
    assert out.count() == ev.count()
    # every fact lands in some version (facts and changes share ts)
    assert out.filter(F.col("version").isNull()).count() == 0


def test_scd2_merge_equals_full_rebuild_in_order(spark):
    from embeddinghub_spark.operators.cdc import scd2_merge

    old = [
        Row(k=1, ts=_ts(1), city="SF"),
        Row(k=1, ts=_ts(2), city="SF"),  # collapsed no-op
        Row(k=1, ts=_ts(3), city="NY"),
        Row(k=2, ts=_ts(2), city="LA"),
    ]
    new = [
        Row(k=1, ts=_ts(5), city="NY"),  # no-op vs last -> collapses
        Row(k=1, ts=_ts(6), city="TX"),
        Row(k=3, ts=_ts(4), city="CH"),  # brand-new key
    ]
    dim = scd2_build(spark.createDataFrame(old), ["k"], "ts")
    got = sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_merge(
            dim, spark.createDataFrame(new), ["k"], "ts"
        ).collect()
    )
    want = sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_build(
            spark.createDataFrame(old + new), ["k"], "ts"
        ).collect()
    )
    assert got == want
    # untouched key 2 still present with its original version
    assert any(t[0] == 2 and t[4] == 1 for t in got)


def test_scd2_merge_rejects_late_data_and_can_drop_it(spark):
    import pytest

    from embeddinghub_spark.operators.cdc import scd2_merge

    dim = scd2_build(
        spark.createDataFrame(
            [Row(k=1, ts=_ts(2), city="SF"), Row(k=1, ts=_ts(6), city="NY")]
        ),
        ["k"],
        "ts",
    )
    late = spark.createDataFrame([Row(k=1, ts=_ts(4), city="LA")])
    with pytest.raises(ValueError, match="late"):
        scd2_merge(dim, late, ["k"], "ts")
    # drop mode: the late row is discarded, dimension unchanged
    out = sorted(
        (r.k, r.city, r.version)
        for r in scd2_merge(dim, late, ["k"], "ts", on_late="drop").collect()
    )
    assert out == [(1, "SF", 1), (1, "NY", 2)] or out == sorted(
        [(1, "SF", 1), (1, "NY", 2)]
    )
