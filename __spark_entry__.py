"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs an embeddinghub_spark operator (SURVEY.md
§2) against the driver's parquet tables; ``oracle_sql()`` holds the
DuckDB-equivalent SQL with IDENTICAL column names/aliases. Float
aggregates are computed via DECIMAL(38,9) partial sums (exact,
associative → bit-identical across engines) and cast back to DOUBLE.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from embeddinghub_spark.catalog import Catalog, FeatureLag
from embeddinghub_spark.operators.batch import batch_features
from embeddinghub_spark.operators.materialize import (
    chunk,
    materialize,
    materialize_no_ts,
    with_global_row_number,
)
from embeddinghub_spark.operators.split import with_split
from embeddinghub_spark.sources.readers import read_incremental

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    cat = Catalog(spark)
    for t in TABLES:
        cat.register_file(t, "default", os.path.join(sf_dir, f"{t}.parquet"))
    return cat


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embeddinghub_spark.sources.readers import read_file

    return read_file(spark, os.path.join(sf_dir, "events.parquet"))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# C1: SQL transformation ({{name.variant}} templating) — TPC-H Q1 shape
# --------------------------------------------------------------------------

_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,9))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,9))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,9))) AS DOUBLE) AS sum_disc_price,
  COUNT(*) AS count_order
FROM {{lineitem.default}}
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_c1_sql_transformation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark, sf_dir)
    cat.sql_transformation("q1", "v1", _Q1_SQL)
    return cat.dataframe("q1", "v1")


_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,9))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,9))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,9))) AS DOUBLE) AS sum_disc_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# C2: DF transformation (user Python fn over DataFrames)
# --------------------------------------------------------------------------

def q_c2_df_transformation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark, sf_dir)

    def user_fn(orders: DataFrame, customer: DataFrame) -> DataFrame:
        return (
            orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(38,9)"))
                .cast("double")
                .alias("total_price"),
            )
        )

    cat.df_transformation(
        "seg", "v1", user_fn, [("orders", "default"), ("customer", "default")]
    )
    return cat.dataframe("seg", "v1")


_C2_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,9))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# C3/C4: materialization (latest value per entity)
# --------------------------------------------------------------------------

def q_c3_materialize_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return materialize(_events(spark, sf_dir), "user_id", "value", "ts")


_C3_ORACLE = """
WITH evt AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)
SELECT user_id AS entity, value, ts
FROM (SELECT user_id, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
      FROM evt)
WHERE rn = 1
"""


def q_c4_materialize_no_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return materialize_no_ts(
        _t(spark, sf_dir, "customer"), "c_custkey", "c_acctbal", tiebreak_cols=["c_acctbal"]
    )


_C4_ORACLE = """
SELECT c_custkey AS entity, c_acctbal AS value, TIMESTAMP '1970-01-01 00:00:00' AS ts
FROM (SELECT c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_custkey ORDER BY c_acctbal DESC) AS rn
      FROM customer)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# C5/V2: global row numbering + chunked serve segment
# --------------------------------------------------------------------------

def q_c5_chunked_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    numbered = with_global_row_number(orders, ["o_orderkey"])
    return chunk(numbered, 3, 1000).select("o_orderkey", "o_totalprice", "row_number")


_C5_ORACLE = """
SELECT o_orderkey, o_totalprice, rn AS row_number
FROM (SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM orders)
WHERE rn BETWEEN 3001 AND 4000
"""


# --------------------------------------------------------------------------
# C6: point-in-time (ASOF) training-set join — label=purchases, feature=clicks
# --------------------------------------------------------------------------

def _pit_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    cat = _catalog(spark, sf_dir)
    cat.sql_transformation(
        "clicks", "v1",
        "SELECT user_id, value, ts FROM {{events.default}} WHERE event_type = 'click'",
    )
    cat.sql_transformation(
        "purchases", "v1",
        "SELECT user_id, value, ts FROM {{events.default}} WHERE event_type = 'purchase'",
    )
    cat.register_feature("click_value", "v1", ("clicks", "v1"), "user_id", "value", "ts")
    cat.register_label("purchase", "v1", ("purchases", "v1"), "user_id", "value", "ts")
    return cat


def q_c6_pit_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _pit_catalog(spark, sf_dir)
    cat.register_training_set("ts_pit", "v1", ("purchase", "v1"), [("click_value", "v1")])
    return cat.training_set_dataframe("ts_pit", "v1")


_C6_ORACLE = """
WITH evt AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events),
     l AS (SELECT DISTINCT user_id AS entity, value, ts
           FROM evt WHERE event_type = 'purchase'),
     f AS (SELECT user_id, value, ts FROM evt WHERE event_type = 'click'),
     j AS (SELECT l.entity, l.value, l.ts, f.value AS fv,
                  row_number() OVER (PARTITION BY l.entity, l.value, l.ts
                                     ORDER BY f.ts DESC, f.value DESC) AS rn
           FROM l LEFT JOIN f ON f.user_id = l.entity AND f.ts <= l.ts)
SELECT entity, fv AS feature__click_value__v1, value AS label, ts AS label_ts
FROM j WHERE rn = 1
"""


# --------------------------------------------------------------------------
# C8: feature has ts, label does not → feature collapses to latest overall
# --------------------------------------------------------------------------

def q_c8_pit_label_no_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark, sf_dir)
    cat.sql_transformation(
        "ev", "v1", "SELECT user_id, value, ts FROM {{events.default}}"
    )
    cat.register_feature("ev_latest", "v1", ("ev", "v1"), "user_id", "value", "ts")
    cat.register_label(
        "balance", "v1", ("customer", "default"), "c_custkey", "c_acctbal"
    )
    cat.register_training_set("ts_c8", "v1", ("balance", "v1"), [("ev_latest", "v1")])
    return cat.training_set_dataframe("ts_c8", "v1")


_C8_ORACLE = """
WITH evt AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events),
     m AS (SELECT user_id, value
           FROM (SELECT user_id, value,
                        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
                 FROM evt)
           WHERE rn = 1),
     l AS (SELECT DISTINCT c_custkey AS entity, c_acctbal FROM customer)
SELECT l.entity, m.value AS feature__ev_latest__v1, l.c_acctbal AS label,
       TIMESTAMP '1970-01-01 00:00:00' AS label_ts
FROM l LEFT JOIN m ON m.user_id = l.entity
"""


# --------------------------------------------------------------------------
# C9: feature has no ts → plain left join on entity
# --------------------------------------------------------------------------

def q_c9_pit_feature_no_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark, sf_dir)
    cat.register_feature(
        "bal", "v1", ("customer", "default"), "c_custkey", "c_acctbal"
    )
    cat.register_label(
        "order_price", "v1", ("orders", "default"), "o_custkey", "o_totalprice", "o_orderdate"
    )
    cat.register_training_set("ts_c9", "v1", ("order_price", "v1"), [("bal", "v1")])
    return cat.training_set_dataframe("ts_c9", "v1")


_C9_ORACLE = """
WITH l AS (SELECT DISTINCT o_custkey AS entity, o_totalprice, o_orderdate FROM orders)
SELECT l.entity, c.c_acctbal AS feature__bal__v1, l.o_totalprice AS label,
       l.o_orderdate AS label_ts
FROM l LEFT JOIN customer c ON c.c_custkey = l.entity
"""


# --------------------------------------------------------------------------
# C11: lag features — click value as of label_ts minus 1 hour
# --------------------------------------------------------------------------

def q_c11_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _pit_catalog(spark, sf_dir)
    cat.register_training_set(
        "ts_lag", "v1", ("purchase", "v1"), [("click_value", "v1")],
        lags=[FeatureLag("click_value", "v1", timedelta(hours=1), alias="click_lag_1h")],
    )
    return cat.training_set_dataframe("ts_lag", "v1")


_C11_ORACLE = """
WITH evt AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events),
     l AS (SELECT DISTINCT user_id AS entity, value, ts
           FROM evt WHERE event_type = 'purchase'),
     f AS (SELECT user_id, value, ts FROM evt WHERE event_type = 'click'),
     j AS (SELECT l.entity, l.value, l.ts, f.value AS fv,
                  row_number() OVER (PARTITION BY l.entity, l.value, l.ts
                                     ORDER BY f.ts DESC, f.value DESC) AS rn
           FROM l LEFT JOIN f ON f.user_id = l.entity AND f.ts <= l.ts),
     jl AS (SELECT l.entity, l.value, l.ts, f.value AS fv,
                   row_number() OVER (PARTITION BY l.entity, l.value, l.ts
                                      ORDER BY f.ts DESC, f.value DESC) AS rn
            FROM l LEFT JOIN f ON f.user_id = l.entity
                              AND f.ts + INTERVAL 1 HOUR <= l.ts)
SELECT j.entity, j.fv AS feature__click_value__v1, jl.fv AS click_lag_1h,
       j.value AS label, j.ts AS label_ts
FROM (SELECT * FROM j WHERE rn = 1) j
JOIN (SELECT * FROM jl WHERE rn = 1) jl
  ON j.entity = jl.entity AND j.value = jl.value AND j.ts = jl.ts
"""


# --------------------------------------------------------------------------
# C14: batch features — full-outer join of materializations, COALESCE key
# --------------------------------------------------------------------------

def q_c14_batch_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = materialize(_events(spark, sf_dir), "user_id", "value", "ts")
    bal = materialize_no_ts(
        _t(spark, sf_dir, "customer"), "c_custkey", "c_acctbal",
        tiebreak_cols=["c_acctbal"],
    )
    return batch_features({"ev_latest": ev, "acct_balance": bal})


_C14_ORACLE = """
WITH evt AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events),
     m1 AS (SELECT user_id AS entity, value
            FROM (SELECT user_id, value,
                         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
                  FROM evt)
            WHERE rn = 1),
     m2 AS (SELECT c_custkey AS entity, c_acctbal AS value FROM customer)
SELECT COALESCE(m1.entity, m2.entity) AS entity,
       m1.value AS ev_latest, m2.value AS acct_balance
FROM m1 FULL OUTER JOIN m2 ON m1.entity = m2.entity
"""


# --------------------------------------------------------------------------
# C15: deterministic train/test split (md5-hash shuffled order)
# --------------------------------------------------------------------------

def q_c15_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return with_split(orders, test_size=0.25, seed=42, key_cols=["o_orderkey"]).select(
        "o_orderkey", "is_test"
    )


_C15_ORACLE = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY md5(concat(CAST(o_orderkey AS VARCHAR), '|', '42')), o_orderkey)
            <= (SELECT FLOOR(COUNT(*) * 0.25) FROM orders) AS INTEGER) AS is_test
FROM orders
"""


# --------------------------------------------------------------------------
# C16: resource registration — (entity, value, ts) projection
# --------------------------------------------------------------------------

def q_c16_resource_registration(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = _catalog(spark, sf_dir)
    cat.register_feature("ev", "v1", ("events", "default"), "user_id", "value", "ts")
    return cat.feature_table("ev", "v1")


_C16_ORACLE = "WITH evt AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) SELECT user_id AS entity, value, ts FROM evt"


# --------------------------------------------------------------------------
# S5: watermark-incremental scan (filter pushed to parquet)
# --------------------------------------------------------------------------

def q_s5_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return read_incremental(ev, "ts", datetime(2024, 1, 20))


_S5_ORACLE = "WITH evt AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events) SELECT * FROM evt WHERE ts > TIMESTAMP '2024-01-20 00:00:00'"


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the PIT training set on sf0.001."""
    return q_c6_pit_training_set(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "c1_sql_transformation": q_c1_sql_transformation,
        "c2_df_transformation": q_c2_df_transformation,
        "c3_materialize_latest": q_c3_materialize_latest,
        "c4_materialize_no_ts": q_c4_materialize_no_ts,
        "c5_chunked_segment": q_c5_chunked_segment,
        "c6_pit_training_set": q_c6_pit_training_set,
        "c8_pit_label_no_ts": q_c8_pit_label_no_ts,
        "c9_pit_feature_no_ts": q_c9_pit_feature_no_ts,
        "c11_lag_features": q_c11_lag_features,
        "c14_batch_features": q_c14_batch_features,
        "c15_train_test_split": q_c15_train_test_split,
        "c16_resource_registration": q_c16_resource_registration,
        "s5_incremental_read": q_s5_incremental_read,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "c1_sql_transformation": _Q1_ORACLE,
        "c2_df_transformation": _C2_ORACLE,
        "c3_materialize_latest": _C3_ORACLE,
        "c4_materialize_no_ts": _C4_ORACLE,
        "c5_chunked_segment": _C5_ORACLE,
        "c6_pit_training_set": _C6_ORACLE,
        "c8_pit_label_no_ts": _C8_ORACLE,
        "c9_pit_feature_no_ts": _C9_ORACLE,
        "c11_lag_features": _C11_ORACLE,
        "c14_batch_features": _C14_ORACLE,
        "c15_train_test_split": _C15_ORACLE,
        "c16_resource_registration": _C16_ORACLE,
        "s5_incremental_read": _S5_ORACLE,
    }
