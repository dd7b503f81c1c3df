"""Catalog-table sinks: CTAS, create-or-replace, MERGE upsert
(SURVEY §2.1 S10/S12, §2.2 C17).

Reference:
  - C17 transformation-as-table: ``provider/sql.go:1941-1945``
    (``CREATE TABLE t AS SELECT * FROM (<user query>)``), exercised by
    ``provider/offline_test.go``'s transformation suite.
  - S10 Iceberg/Delta table sink: ``offline_store_spark_runner.py:
    920-949`` (``createOrReplace``).
  - S12 MERGE upsert: ``offline_store_spark_runner.py:688-765``
    (``IcebergMaterializationTable.merge_in`` — feature columns merged
    into a wide entity table keyed by entity).
  - Atomic swap-on-refresh: ``provider/sql.go:1858-1882``
    (``atomicUpdate``: build tmp table → drop target → rename).

Spark-first mapping: CTAS/createOrReplace are ``saveAsTable``
(``writeTo(...).createOrReplace()`` where a v2 catalog — Delta or
Iceberg — is installed); MERGE is ``MERGE INTO`` when the catalog
supports it, else a join+union rebuild committed via the reference's
own tmp-table/rename transaction, so the table is never observable in
a half-written state.

Scale notes: the rebuild path shuffles once on the merge keys (the
anti-join); at 100 TB the right physical strategy is (a) broadcast the
update side when it is a small delta — the common case for
materialization refreshes — which Spark picks automatically under
AQE, or (b) a real Delta MERGE (file-pruned by key stats) when the
connector is present. Both live behind the same call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _qualify(table: str) -> str:
    return ".".join(f"`{p}`" for p in table.split("."))


def create_table_as(
    df: DataFrame,
    table_name: str,
    mode: str = "errorifexists",
    fmt: str = "parquet",
    path: str | None = None,
) -> str:
    """C17: CREATE TABLE AS SELECT — persist a DataFrame as a catalog
    table (provider/sql.go:1941-1945). ``path`` makes it an external
    table (location-pinned; survives session restarts against the same
    warehouse). Returns the table name.
    """
    writer = df.write.format(fmt).mode(mode)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    return table_name


def create_or_replace_table(
    df: DataFrame, table_name: str, fmt: str = "parquet", path: str | None = None
) -> str:
    """S10: createOrReplace table sink (runner :920-949).

    Prefers the V2 ``writeTo(...).createOrReplace()`` path (atomic for
    Delta/Iceberg catalogs); session-catalog parquet tables don't
    support REPLACE TABLE, so fall back to ``saveAsTable(overwrite)``.
    """
    try:
        df.writeTo(table_name).using(fmt).createOrReplace()
        return table_name
    except Exception:
        return create_table_as(df, table_name, mode="overwrite", fmt=fmt, path=path)


def merge_upsert_table(
    spark: SparkSession,
    target_table: str,
    source: DataFrame,
    key_cols: list[str],
    fmt: str = "parquet",
) -> str:
    """S12: MERGE upsert into a catalog table keyed by ``key_cols``.

    Semantics (runner merge_in :755-765): WHEN MATCHED → UPDATE SET
    all source columns; WHEN NOT MATCHED → INSERT. Tries a real
    ``MERGE INTO`` first (works on Delta/Iceberg tables); plain
    parquet session-catalog tables don't support row-level MERGE, so
    the fallback rebuilds target←(target ▷ source) ∪ source and
    commits it with the reference's tmp-table swap transaction
    (provider/sql.go:1858-1882) — the target is replaced atomically
    from the catalog's point of view.
    """
    tgt = _qualify(target_table)
    source_cols = source.columns
    view = f"_merge_src_{abs(hash(target_table)) % 10**8}"
    source.createOrReplaceTempView(view)
    try:
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key_cols)
        sets = ", ".join(f"t.`{c}` = s.`{c}`" for c in source_cols if c not in key_cols)
        ins_cols = ", ".join(f"`{c}`" for c in source_cols)
        ins_vals = ", ".join(f"s.`{c}`" for c in source_cols)
        spark.sql(
            f"MERGE INTO {tgt} t USING {view} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )
        return target_table
    except Exception:
        pass  # no row-level-op support in this catalog → rebuild below
    finally:
        spark.catalog.dropTempView(view)

    target_df = spark.table(target_table)
    merged = merge_upsert_df(target_df, source, key_cols)
    # reference atomicUpdate transaction: tmp table → drop → rename
    tmp = target_table + "__ff_tmp"
    merged.write.format(fmt).mode("overwrite").saveAsTable(tmp)
    spark.sql(f"DROP TABLE IF EXISTS {tgt}")
    spark.sql(f"ALTER TABLE {_qualify(tmp)} RENAME TO {tgt}")
    return target_table


def merge_upsert_df(
    target: DataFrame, source: DataFrame, key_cols: list[str]
) -> DataFrame:
    """MERGE as a pure DataFrame expression: rows of ``target`` whose
    key has no update survive (left_anti), every ``source`` row lands
    (update or insert). Column set follows the target; source must
    carry all target columns (wide-table merge contract, runner
    :688-765)."""
    survivors = target.join(source.select(*key_cols).distinct(), key_cols, "left_anti")
    return survivors.unionByName(source.select(*target.columns))


def merge_upsert_dir(
    spark: SparkSession,
    target_dir: str,
    source: DataFrame,
    key_cols: list[str],
) -> str:
    """S12 on a parquet dir (the path-based world every other sink
    lives in): read current snapshot (empty on first run), merge, and
    commit via the single-syscall symlink flip in
    ``sinks.atomic_update``. The new version is written to a fresh
    dir, so the read-while-write hazard of overwriting in place never
    arises. This is C20's distributed snapshot path — the per-batch
    merge a streaming materialization commits (no driver dict).
    """
    import os

    from embeddinghub_spark.sources.sinks import atomic_update

    if os.path.exists(target_dir):
        current = spark.read.parquet(target_dir)
        merged = merge_upsert_df(current, source, key_cols)
    else:
        merged = source
    return atomic_update(merged, target_dir)


def merge_materialization_dir(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    entity_col: str = "entity",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """Newest-wins merge of a latest-value materialization delta into
    a snapshot dir: like ``merge_upsert_dir`` but a matched entity is
    only replaced when the update's ts is newer (ties: larger value —
    the C3 tiebreak). Idempotent per (entity, ts, value): replaying a
    batch converges to the same snapshot, which is what makes the
    streaming path exactly-once in effect (runner merge_in :688-765
    has the same guard through Iceberg's MERGE condition).
    """
    import os

    from embeddinghub_spark.operators.materialize import materialize
    from embeddinghub_spark.sources.sinks import atomic_update

    if os.path.exists(target_dir):
        current = spark.read.parquet(target_dir)
        merged = materialize(
            current.unionByName(updates.select(*current.columns)),
            entity_col,
            value_col,
            ts_col,
        )
    else:
        merged = materialize(updates, entity_col, value_col, ts_col)
    return atomic_update(merged, target_dir)
