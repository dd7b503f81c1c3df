from datetime import datetime

from pyspark.sql import functions as F

from embeddinghub_spark.operators.materialize import (
    chunk,
    materialize,
    materialize_no_ts,
    num_chunks,
    with_global_row_number,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_materialize_latest_per_entity(spark):
    df = spark.createDataFrame(
        [
            ("a", 1.0, _ts("2024-01-01T00:00:00")),
            ("a", 2.0, _ts("2024-01-02T00:00:00")),
            ("a", 3.0, _ts("2024-01-01T12:00:00")),
            ("b", 9.0, _ts("2024-01-01T00:00:00")),
        ],
        ["entity", "value", "ts"],
    )
    out = {r["entity"]: (r["value"], r["ts"]) for r in materialize(df).collect()}
    assert out["a"] == (2.0, _ts("2024-01-02T00:00:00"))
    assert out["b"] == (9.0, _ts("2024-01-01T00:00:00"))


def test_materialize_ts_tie_picks_max_value(spark):
    t = _ts("2024-01-01T00:00:00")
    df = spark.createDataFrame(
        [("a", 1.0, t), ("a", 5.0, t), ("a", 3.0, t)], ["entity", "value", "ts"]
    )
    [row] = materialize(df).collect()
    assert row["value"] == 5.0


def test_materialize_no_ts_epoch_zero(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["entity", "value"])
    rows = materialize_no_ts(df).collect()
    assert all(r["ts"] == datetime(1970, 1, 1) for r in rows)
    assert {r["entity"]: r["value"] for r in rows} == {"a": 1.0, "b": 2.0}


def test_materialize_no_ts_dedup_with_tiebreak(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 7.0), ("b", 2.0)], ["entity", "value"]
    )
    out = materialize_no_ts(df, tiebreak_cols=["value"])
    assert {r["entity"]: r["value"] for r in out.collect()} == {"a": 7.0, "b": 2.0}


def test_global_row_number_matches_sort_order(spark):
    df = spark.range(0, 1000).withColumn("k", F.expr("id * 7919 % 1000"))
    numbered = with_global_row_number(df, ["k"], num_partitions=7)
    rows = numbered.orderBy("k").collect()
    assert [r["row_number"] for r in rows] == list(range(1, 1001))


def test_chunking(spark):
    df = spark.range(0, 250).withColumn("k", F.col("id"))
    numbered = with_global_row_number(df, ["k"], num_partitions=4)
    assert num_chunks(250, 100) == 3
    c0 = chunk(numbered, 0, 100)
    c2 = chunk(numbered, 2, 100)
    assert c0.count() == 100
    assert c2.count() == 50
    total = sum(chunk(numbered, i, 100).count() for i in range(3))
    assert total == 250
