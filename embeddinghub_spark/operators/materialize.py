"""Materialization: latest value per entity (SURVEY §2.2 C3-C5).

Reference: SQL template ``provider/queries/materialize_ts.sql:1-10``
(MAX-ts subquery), runner window version ``LatestFeaturesTransform``
``offline_store_spark_runner.py:672-685``, no-ts variant
``provider/queries/materialize_no_ts.sql:1-36``, global row numbering
for chunked serve ``provider/sql.go:1683-1690``.

Semantic pins (SURVEY §4 "traps"):
  - ts ties: the SQL template keeps all tied rows, the runner's window
    keeps one arbitrary row. We pin the window behavior with a
    deterministic tiebreaker (value DESC after ts DESC).
  - no-ts: the reference relies on implicit row order
    (materialize_no_ts.sql:2-4 comment). We pin last-wins by file
    order via monotonically_increasing_id, or a caller-supplied
    deterministic tiebreak column.

Scale notes: C3 is ONE hash aggregate on entity — ``max(struct(ts,
value))`` picks the same winner as the reference's row_number window
(struct ordering is field-major: ts first, then the value tiebreak)
but partial-aggregates map-side, so the exchange carries one row per
(partition, entity) instead of every input row: at 100 TB the shuffle
is |entities|-sized, not |events|-sized, and a hot entity collapses
to one row per map task before the exchange (no AQE skew handling
needed — the skew never reaches the wire). No global sort anywhere
except C5's explicit serve-ordering, which is implemented as
range-partition + per-partition numbering + prefix-sum offsets
instead of a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _latest_by_struct(
    df: DataFrame,
    entity_col: str,
    order_cols: list,
    value_col: str,
    ts_out,
) -> DataFrame:
    """One-pass latest-per-entity: ``max(struct(order..., value))``.

    Equivalent to ``row_number() OVER (PARTITION BY entity ORDER BY
    order... DESC) = 1``: struct comparison is field-major, Spark's
    ordering for max() ranks NULL lowest and NaN highest — exactly the
    DESC NULLS LAST window order. Unlike the window, the aggregate
    partial-combines map-side (shuffle ∝ |entities|, skew-immune).
    """
    fields = [c.alias(f"_o{i}") for i, c in enumerate(order_cols)]
    fields.append(F.col(value_col).alias("_v"))
    return (
        df.groupBy(F.col(entity_col).alias("entity"))
        .agg(F.max(F.struct(*fields)).alias("_w"))
        .select(
            "entity",
            F.col("_w._v").alias("value"),
            ts_out.alias("ts"),
        )
    )


def materialize(
    df: DataFrame,
    entity_col: str = "entity",
    value_col: str = "value",
    ts_col: str | None = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """C3: latest ``(entity, value, ts)`` row per entity.

    Same winner as the runner's window (:679-683, ts DESC with the
    value-DESC tiebreak pinned) computed as a map-side-combining hash
    aggregate — see _latest_by_struct. Output: entity, value, ts.
    """
    order = [F.col(ts_col), F.col(value_col)]
    for c in tiebreak_cols or []:
        order.append(F.col(c))
    return _latest_by_struct(
        df, entity_col, order, value_col, F.col("_w._o0")
    )


def materialize_refresh(
    spark,
    delta_df: DataFrame,
    target_dir: str,
    entity_col: str = "entity",
    value_col: str = "value",
    ts_col: str = "ts",
    keep_versions: int = 2,
) -> str:
    """Incremental C3 refresh: fold ONLY the new rows into the
    previous snapshot and commit through the C18 atomic swap —
    refresh cost O(|delta| + |entities|) instead of re-aggregating
    the full history every run (at 100 TB the history rescan IS the
    materialization bill; the reference schedules exactly this kind
    of periodic update). Feed ``delta_df`` from the S5 incremental
    read (``read_incremental`` + the overwrite-detection state).

    Semantics are EXACTLY full-rebuild ``materialize`` over
    everything ever folded (pinned by test, late deltas included):
    the previous snapshot already holds each entity's winning
    ``(ts, value)``, and the max-struct aggregate over
    ``snapshot ∪ materialize(delta)`` re-picks the same winner the
    full history would — a late-arriving older row cannot overwrite
    a newer snapshot value, and ties break value-DESC like C3. The
    delta is pre-collapsed per entity before the union, so the fold
    aggregate sees ≤ |entities| + |delta entities| rows.

    First call (no snapshot yet) bootstraps from the delta alone.
    Returns ``target_dir`` (readable via ``read_version``; previous
    snapshots remain for time travel per ``keep_versions``).
    """
    from embeddinghub_spark.sources.sinks import (
        atomic_update,
        list_versions,
        read_version,
    )

    delta_snap = materialize(delta_df, entity_col, value_col, ts_col)
    if not list_versions(target_dir):
        snap = delta_snap
    else:
        prev = read_version(spark, target_dir, 0)
        snap = materialize(prev.unionByName(delta_snap))
    return atomic_update(snap, target_dir, keep_versions=keep_versions)


def materialize_no_ts(
    df: DataFrame,
    entity_col: str = "entity",
    value_col: str = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """C4: one row per entity when no timestamp exists; ts pinned to
    epoch-0 (``CAST(0 AS TIMESTAMP)`` — provider/spark.go:118-129).

    Keep-last semantics: with ``tiebreak_cols`` the winner is the max
    by those columns (deterministic, oracle-checkable); without, the
    last row in file order (monotonically_increasing_id — pinned
    replacement for the reference's implicit ordering).
    """
    if tiebreak_cols:
        order = [F.col(c) for c in tiebreak_cols]
    else:
        df = df.withColumn("_file_order", F.monotonically_increasing_id())
        order = [F.col("_file_order")]
    return _latest_by_struct(
        df,
        entity_col,
        order,
        value_col,
        F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
    )


def with_global_row_number_counted(
    df: DataFrame,
    order_cols: list[str],
    row_col: str = "row_number",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """C5: deterministic global 1-based row numbering for chunked serve
    (``row_number() OVER (ORDER BY ...)`` — provider/sql.go:1683-1690).
    Returns ``(numbered_df, total_row_count)`` — the total falls out of
    the prefix-sum for free, so callers needing both (C15 split) don't
    run a second count job.

    A plain global-order window collapses to ONE partition — fatal at
    100 TB. Instead: range-partition on the order key, number within
    each partition, then add the exclusive prefix sum of partition
    counts (a tiny driver-side list, broadcast back). Same result,
    fully parallel. ``order_cols`` must be a total order (include a
    unique key) for determinism.
    """
    spark = df.sparkSession
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # localCheckpoint pins the ranged layout: the counts job and the
    # final join MUST see the identical partitioning (AQE may otherwise
    # coalesce the range exchange differently per job, shifting
    # partition ids and corrupting the offsets). Unlike persist(), the
    # blocks are released by the ContextCleaner when the plan is GC'd —
    # no unpersist contract needed from callers.
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols]).localCheckpoint(
        eager=True
    )
    part = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    numbered = part.withColumn("_local_rn", F.row_number().over(w))
    counts = (
        part.groupBy("_pid").count().orderBy("_pid").collect()
    )  # one tiny row per partition — driver-safe at any scale
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    # fold the offsets into the plan as a literal array lookup — no
    # join at all (an n_partitions-sized literal is trivially small
    # next to even a broadcast-join exchange)
    offset_arr = F.array(
        *[F.lit(offsets.get(i, 0)).cast("bigint") for i in range(n)]
    )
    out = (
        numbered.withColumn(
            row_col, F.col("_local_rn") + F.element_at(offset_arr, F.col("_pid") + 1)
        )
        .drop("_pid", "_local_rn")
    )
    return out, acc


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    row_col: str = "row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """C5 numbering without the count (see _counted variant)."""
    out, _ = with_global_row_number_counted(df, order_cols, row_col, num_partitions)
    return out


def chunk(df_with_rn: DataFrame, chunk_idx: int, rows_per_chunk: int = 100_000,
          row_col: str = "row_number") -> DataFrame:
    """V2 segment read: ``row_number BETWEEN lo AND hi`` (provider/
    sql.go:1786-1789); default chunk size 100k (provider/offline.go:41)."""
    lo = chunk_idx * rows_per_chunk + 1
    hi = (chunk_idx + 1) * rows_per_chunk
    return df_with_rn.filter(F.col(row_col).between(lo, hi))


def num_chunks(row_count: int, rows_per_chunk: int = 100_000) -> int:
    """NumChunks = ceil(rows/chunk) — provider/offline.go:41."""
    return -(-row_count // rows_per_chunk)


def grouped_prefix(
    df,
    group_cols: list[str],
    order_exprs: list,
    *,
    out_col: str,
    value_col: str | None = None,
    num_partitions: int | None = None,
):
    """Generalized per-GROUP C5 prefix aggregate: the running
    count (``value_col=None``) or running sum of ``value_col`` within
    each ``group_cols`` combination, ordered by ``order_exprs``
    (Columns, directions included) — without ever putting a whole
    group on one task.

    Mechanics (the C5 discipline, per-group): one range exchange on
    ``(group_cols ASC, *order_exprs)`` so a HEAD group splits across
    partitions (web-crawl mixtures are head-heavy; a naive
    ``PARTITION BY group`` window would put the whole head group on
    one task), a per-(partition, group) window for local prefixes,
    and a (partitions × groups)-row subtotal frame whose exclusive
    per-group prefix rides a broadcast join back — never a
    driver-side literal. ``localCheckpoint`` pins the ranged layout
    (AQE may otherwise coalesce the exchange differently per job,
    shifting partition ids and corrupting the offsets — the
    with_global_row_number_counted note).

    Shared by ``functions/selection.py``'s budget / interleave /
    bucketing family (review find r12: four diverging copies of this
    ~30-line idiom); ``order_exprs`` must make the order total WITHIN
    each group (tie-break with a unique key).
    """
    # Guard the helper's OWN internal names (ADVICE r12: callers'
    # _require_absent tuples still reserved the pre-extraction names
    # _local_cum/_local_rn, so an input carrying _local passed their
    # guard and was silently clobbered then dropped here). The helper
    # checks what the helper injects — callers need not track it.
    clash = sorted({"_pid", "_local", "_off", "_t"} & set(df.columns))
    if clash:
        raise ValueError(
            f"grouped_prefix reserves internal column(s) {clash}; "
            "rename them on the input first"
        )
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(
        n, *[F.col(g).asc() for g in group_cols], *order_exprs
    ).localCheckpoint(eager=True)
    part = ranged.withColumn("_pid", F.spark_partition_id())
    w = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    val = F.count(F.lit(1)) if value_col is None else F.sum(value_col)
    local = part.withColumn("_local", val.over(w))
    offw = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    agg = (
        F.count(F.lit(1)) if value_col is None else F.sum(value_col)
    ).alias("_t")
    offsets = (
        part.groupBy("_pid", *group_cols)
        .agg(agg)
        .withColumn("_off", F.coalesce(F.sum("_t").over(offw), F.lit(0)))
        .select("_pid", *group_cols, "_off")
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_local", "_off")
    )
