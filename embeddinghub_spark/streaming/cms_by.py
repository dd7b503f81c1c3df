"""Streaming heavy-hitter counts: count-min sketch counters merged
across micro-batches — the frequency companion to
``streaming/distinct_by.py``'s grouped HLL, and the module where the
TWO streaming-merge disciplines meet:

- HLL registers merge by MAX, which is IDEMPOTENT — an at-least-once
  replayed batch converges to the identical state for free;
- CMS counters merge by +, which is NOT — a replayed batch
  double-counts. The standard remedy is the transactional
  foreachBatch pattern: the state commit records the micro-batch id
  it folded in, and a batch whose id is already committed is SKIPPED
  (Spark replays whole micro-batches with the same id after recovery,
  so id-level dedup restores exactly-once effects on top of
  at-least-once delivery).

State: one parquet counter table of at most ``depth × width`` rows +
a meta sidecar carrying the committed-batch watermark. Like the HLL
register table, it does NOT grow with the stream — the
read-merge-rewrite per batch is a bounded tiny job; commits are
atomic symlink flips so readers always see a consistent (counters,
watermark) pair.

Estimates: ``read_cms_estimates`` probes any candidate token list
against the merged counters (min over depth rows — estimate >= exact
always, the CMS guarantee); after the stream drains the counters are
bit-identical to the batch sketch over the whole input (pinned by
test, including a simulated replay).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_META = "_cms_meta.json"


def _batch_counters(df: DataFrame, text_col: str, depth: int, width: int) -> DataFrame:
    """(row, bucket, c) counters for one batch — the ``cms_topk``
    sketch build, shared md5 protocol."""
    from embeddinghub_spark.functions.dedup import _md5_long
    from embeddinghub_spark.functions.text import tokens

    def bucket(d: int, tok):
        return _md5_long(F.concat(F.lit(f"{d}:"), tok)) % width

    return (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .select(
            F.posexplode(
                F.array(*[bucket(d, F.col("tok")) for d in range(depth)])
            ).alias("row", "bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("c"))
    )


def _committed_batch(state_dir: str) -> int:
    real = os.path.realpath(state_dir)
    path = os.path.join(real, _META)
    if os.path.isfile(path):
        with open(path) as fh:
            return int(json.load(fh)["committed_batch"])
    return -1


def merge_counters_dir(
    spark: SparkSession,
    state_dir: str,
    batch_counters: DataFrame,
    batch_id: int,
) -> bool:
    """Transactionally +-merge a batch's counters: SKIPS (returns
    False) if ``batch_id`` is already committed — the exactly-once
    gate that idempotent max-merge state does not need. Atomic
    symlink-flip commit of (counters, watermark) together."""

    exists = os.path.islink(state_dir) or os.path.isdir(state_dir)
    if exists and batch_id <= _committed_batch(state_dir):
        return False
    layers = [batch_counters]
    if exists:
        prior = spark.read.parquet(state_dir)
        layers.append(prior.select("row", "bucket", "c"))
    merged = layers[0]
    for other in layers[1:]:
        merged = merged.unionByName(other)
    merged = merged.groupBy("row", "bucket").agg(F.sum("c").alias("c"))
    from embeddinghub_spark.streaming._state import (
        commit_version_dir,
        new_version_dir,
    )

    phys = new_version_dir(state_dir)
    merged.coalesce(1).write.parquet(phys)
    commit_version_dir(state_dir, phys, batch_id, _META)
    return True


def read_cms_estimates(
    spark: SparkSession,
    state_dir: str,
    candidates: list[str],
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Probe candidate tokens against the merged counters:
    estimate = min over depth rows (>= exact count always). Output:
    (token, cms_estimate)."""
    from embeddinghub_spark.functions.dedup import _md5_long

    sketch = spark.read.parquet(state_dir)
    cand = spark.createDataFrame([(t,) for t in candidates], ["token"])

    def bucket(d: int, tok):
        return _md5_long(F.concat(F.lit(f"{d}:"), tok)) % width

    probe = cand.select(
        "token",
        F.posexplode(
            F.array(*[bucket(d, F.col("token")) for d in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        sketch.join(F.broadcast(probe), ["row", "bucket"])
        .groupBy("token")
        .agg(F.min("c").cast("bigint").alias("cms_estimate"))
    )


def streaming_cms(
    stream_df: DataFrame,
    state_dir: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming CMS: per micro-batch, one bounded counter
    aggregate (exchange ≤ depth×width rows however large the batch)
    transactionally +-merged into ``state_dir``. After the stream
    drains, counters equal the batch sketch over the whole input."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        counters = _batch_counters(batch_df, text_col, depth, width)
        merge_counters_dir(batch_df.sparkSession, state_dir, counters, batch_id)

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
