"""Streaming grouped distinct counts: HyperLogLog registers merged
across micro-batches.

``functions/profile.hll_distinct_by`` answers "distinct users per
source" in one batch pass; an ingest pipeline needs the ONLINE form —
the count so far, updated per micro-batch, without keeping the
distinct values anywhere. The HLL register sketch is ALGEBRAIC
(registers merge by element-wise max), so the streaming form is
exact-by-construction: merging per-batch registers into a persistent
register table yields bit-identical registers — and therefore
bit-identical estimates — to running the batch sketch over the whole
stream's union, however the stream is sliced (pinned by test). This
is the same exactly-once-in-effect argument as the C20 snapshot: the
merge is idempotent (max(a, a) = a), so an at-least-once replayed
batch converges to the identical state.

State: one parquet register table of at most ``|groups| × 2^p`` rows
(a few thousand rows for catalog-sized group counts) — the whole
point of the sketch is that this does NOT grow with the data, so the
read-merge-rewrite per batch is a bounded, tiny job; no driver-side
state, no unbounded streaming aggregation (Spark cannot chain the
two stateful aggregates the estimator needs in one streaming query —
foreachBatch with an algebraic on-disk state is the standard shape).
Commits are atomic via the repo's symlink-flip protocol, so readers
always see a complete register set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _registers(df: DataFrame, group_col: str, value_col: str, p: int) -> DataFrame:
    """(group, bucket, max_rho) registers for one batch — the shared
    ``profile.hll_register_frame`` build (one protocol definition)."""
    from embeddinghub_spark.functions.profile import hll_register_frame

    return hll_register_frame(
        df.select(F.col(group_col).alias("grp"), F.col(value_col)),
        ["grp"],
        value_col,
        p,
    )


def merge_registers_dir(
    spark: SparkSession,
    state_dir: str,
    batch_registers: DataFrame,
) -> None:
    """Max-merge a batch's registers into the on-disk register table
    (atomic symlink-flip commit, the C18 protocol). The table is
    ≤ |groups| × 2^p rows, so the full rewrite is a bounded tiny job
    at ANY stream length."""

    layers = [batch_registers]
    if os.path.islink(state_dir) or os.path.isdir(state_dir):
        layers.append(spark.read.parquet(state_dir))
    merged = layers[0]
    for other in layers[1:]:
        merged = merged.unionByName(other)
    merged = merged.groupBy("grp", "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
    from embeddinghub_spark.streaming._state import (
        commit_version_dir,
        new_version_dir,
    )

    phys = new_version_dir(state_dir)
    merged.coalesce(1).write.parquet(phys)
    commit_version_dir(state_dir, phys)


def read_distinct_estimates(
    spark: SparkSession, state_dir: str, p: int = 9
) -> DataFrame:
    """Current per-group estimates from the register table — the
    ``hll_distinct_by`` estimator applied to merged registers.
    Output: (grp, approx_ndv, n_empty_buckets)."""
    from embeddinghub_spark.functions.profile import _HLL_RHO_CAP, _hll_alpha

    m = 1 << p
    registers = spark.read.parquet(state_dir)
    per_group = registers.groupBy("grp").agg(
        F.sum(
            F.expr(f"shiftleft(1L, {_HLL_RHO_CAP} - max_rho)")
        ).alias("_s_used"),
        F.count(F.lit(1)).alias("_used"),
    )
    c1 = _hll_alpha(m) * m * m * float(1 << _HLL_RHO_CAP)
    s_total = F.col("_s_used") + (F.lit(m) - F.col("_used")) * F.lit(
        1 << _HLL_RHO_CAP
    ).cast("bigint")
    empties = (F.lit(m) - F.col("_used")).cast("bigint")
    raw = F.lit(c1) / s_total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (empties > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empties.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        "grp",
        F.round(est, 3).alias("approx_ndv"),
        empties.alias("n_empty_buckets"),
    )


def streaming_distinct_by(
    stream_df: DataFrame,
    state_dir: str,
    group_col: str,
    value_col: str,
    p: int = 9,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming grouped-distinct sketch: per micro-batch,
    build the batch's HLL registers (one bounded aggregate — the
    exchange carries ≤ |groups| × 2^p rows however large the batch
    is) and max-merge them into ``state_dir``. Read estimates any
    time with ``read_distinct_estimates`` — bit-identical to the
    batch ``hll_distinct_by`` over everything ingested so far."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        regs = _registers(batch_df, group_col, value_col, p)
        merge_registers_dir(batch_df.sparkSession, state_dir, regs)

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
