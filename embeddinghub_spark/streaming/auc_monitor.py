"""Streaming ROC-AUC monitor: per-score counts merged across
micro-batches — the EVAL companion to ``streaming/psi_monitor.py``
(drift watches the features; this watches the model's discrimination
as labeled events arrive, e.g. click/convert feedback joining scores
hours later).

The sufficient statistic for tie-aware rank-sum AUC is exactly the
distinct-score table ``(score, n, n_pos)`` that ``metrics.binary_auc``
builds — and with in-op quantization that table is BOUNDED
(≤ 10^quantize + 1 rows for [0,1] scorers), so streaming AUC is just:
per micro-batch, one bounded count aggregate (exchange ≤ grid rows
however large the batch), +-merged into an on-disk state table.
Counts merge by +, which is NOT idempotent, so the merge uses the
``streaming/cms_by.py`` transactional discipline: the state commit
records the folded micro-batch id, a replayed batch id is SKIPPED
(exactly-once effects on at-least-once delivery), and commits are
atomic symlink flips.

``read_auc`` computes the exact tie-aware AUC from the merged state
at any moment — after the stream drains it equals ``binary_auc`` over
the whole input (pinned by test, including a simulated replay).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_META = "_auc_meta.json"


def _batch_score_counts(
    df: DataFrame, score_col: str, label_col: str, quantize: int
) -> DataFrame:
    """(s, n, p) per distinct quantized score for one batch — the
    ``binary_auc`` collapse, clamped to [0,1] so the state stays on a
    closed bounded grid."""
    s = F.round(
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(1.0), F.col(score_col).cast("double")),
        ),
        quantize,
    )
    return (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(s.alias("s"), F.col(label_col).cast("int").alias("_y"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("p"))
    )


def _committed_batch(state_dir: str) -> int:
    real = os.path.realpath(state_dir)
    path = os.path.join(real, _META)
    if os.path.isfile(path):
        with open(path) as fh:
            return int(json.load(fh)["committed_batch"])
    return -1


def merge_score_counts_dir(
    spark: SparkSession,
    state_dir: str,
    batch_counts: DataFrame,
    batch_id: int,
) -> bool:
    """Transactionally +-merge a batch's (s, n, p) counts: SKIPS
    (returns False) when ``batch_id`` is already committed. Atomic
    symlink-flip commit of (counts, watermark) together — the
    ``cms_by.merge_counters_dir`` discipline on the AUC state."""

    exists = os.path.islink(state_dir) or os.path.isdir(state_dir)
    if exists and batch_id <= _committed_batch(state_dir):
        return False
    layers = [batch_counts]
    if exists:
        prior = spark.read.parquet(state_dir)
        layers.append(prior.select("s", "n", "p"))
    merged = layers[0]
    for other in layers[1:]:
        merged = merged.unionByName(other)
    merged = merged.groupBy("s").agg(
        F.sum("n").alias("n"), F.sum("p").alias("p")
    )
    from embeddinghub_spark.streaming._state import (
        commit_version_dir,
        new_version_dir,
    )

    phys = new_version_dir(state_dir)
    merged.coalesce(1).write.parquet(phys)
    commit_version_dir(state_dir, phys, batch_id, _META)
    return True


def read_auc(spark: SparkSession, state_dir: str) -> DataFrame:
    """Exact tie-aware AUC from the merged state — the ``binary_auc``
    doubled-integer rank-sum over the (bounded) distinct-score table;
    the window partitions trivially (grid ≤ 10^q+1 rows). Output: one
    row (auc, n_pos, n_neg), AUC NULL while either class is empty."""
    ps = spark.read.parquet(state_dir).select("s", "n", "p")
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = ps.withColumn("_cum", F.sum("n").over(w)).withColumn(
        "_cb", F.col("_cum") - F.col("n")
    )
    agg = ranked.agg(
        F.sum(
            F.col("p") * (F.lit(2) * F.col("_cb") + F.col("n") + F.lit(1))
        ).alias("_s2"),
        F.sum("p").alias("n_pos"),
        F.sum(F.col("n") - F.col("p")).alias("n_neg"),
    )
    auc = (
        (F.col("_s2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
        / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
    )
    return agg.select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0), F.round(auc, 9)
        ).alias("auc"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
    )


def streaming_auc(
    stream_df: DataFrame,
    state_dir: str,
    score_col: str = "score",
    label_col: str = "label",
    quantize: int = 4,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming AUC monitor: per micro-batch, one bounded
    distinct-score aggregate transactionally +-merged into
    ``state_dir``; ``read_auc`` serves the gate number at any time.
    After the stream drains the state equals the batch ``binary_auc``
    collapse over the whole input."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        counts = _batch_score_counts(batch_df, score_col, label_col, quantize)
        merge_score_counts_dir(
            batch_df.sparkSession, state_dir, counts, batch_id
        )

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
