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
    """(group, bucket, max_rho) registers for one batch — the
    ``hll_distinct_by`` register build, shared protocol."""
    from embeddinghub_spark.functions.profile import (
        _HLL_BUCKET_HEX,
        _HLL_RHO_CAP,
        _HLL_VALUE_BITS,
        _HLL_VALUE_HEX,
    )

    m = 1 << p
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            F.md5(F.col(value_col).cast("string")).alias("_h"),
        )
        .select(
            "grp",
            F.expr(
                f"pmod(cast(conv(substr(_h, 1, {_HLL_BUCKET_HEX}), 16, 10)"
                f" as bigint), {m})"
            ).alias("bucket"),
            F.expr(
                f"cast(conv(substr(_h, {_HLL_BUCKET_HEX + 1},"
                f" {_HLL_VALUE_HEX}), 16, 10) as bigint)"
            ).alias("_v"),
        )
        .select(
            "grp",
            "bucket",
            F.when(F.col("_v") == 0, F.lit(_HLL_RHO_CAP))
            .otherwise(F.lit(_HLL_VALUE_BITS + 1) - F.length(F.bin("_v")))
            .alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("max_rho"))
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
    import uuid

    layers = [batch_registers]
    if os.path.islink(state_dir) or os.path.isdir(state_dir):
        layers.append(spark.read.parquet(state_dir))
    merged = layers[0]
    for other in layers[1:]:
        merged = merged.unionByName(other)
    merged = merged.groupBy("grp", "bucket").agg(
        F.max("max_rho").alias("max_rho")
    )
    phys = state_dir + ".v-" + uuid.uuid4().hex[:8]
    merged.coalesce(1).write.parquet(phys)
    tmp = state_dir + ".link-" + uuid.uuid4().hex[:8]
    os.symlink(phys, tmp)
    prev = os.path.realpath(state_dir) if os.path.islink(state_dir) else None
    os.replace(tmp, state_dir)
    if prev and os.path.isdir(prev):
        import shutil

        shutil.rmtree(prev, ignore_errors=True)


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
