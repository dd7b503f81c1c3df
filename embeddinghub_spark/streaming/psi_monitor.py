"""Streaming drift monitor: Population Stability Index of a live
stream against a frozen reference distribution.

Composes ``operators/batch.py psi_drift``'s math with the
transactional foreachBatch discipline of ``streaming/cms_by.py``:

- at setup, the REFERENCE histogram (bin grid from the reference's
  min/max, bin counts) freezes on disk — the serving-time monitor
  never rescans training data;
- each micro-batch bins its rows on that fixed grid (map-only; one
  bounded ≤ n_bins-row aggregate per batch) and +-merges into the
  current-side counter table behind a symlink-flip commit carrying
  the committed-batch watermark — counts are not idempotent under
  replay, so replayed micro-batch ids are SKIPPED (exactly-once
  effects on at-least-once delivery, the CMS pattern);
- ``read_psi`` computes the index from (reference, current) counters
  — a few-row driver-side read, safe to poll from an alerting loop.

After the stream drains, the PSI equals the batch ``psi_drift`` over
everything ingested, however the stream was sliced — pinned by test,
including a simulated replay.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_META = "_psi_meta.json"
_REF = "reference"
_CUR = "current"


def freeze_reference(
    ref: DataFrame, state_dir: str, value_col: str, n_bins: int = 10
) -> None:
    """Materialize the reference histogram: (lo, hi) grid bounds from
    the reference min/max plus per-bin counts. One bounded aggregate
    pass; the result is a ≤ n_bins-row table."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    c = F.col(value_col).cast("double")
    mm = ref.agg(F.min(c).alias("_lo"), F.max(c).alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    counts = (
        ref.filter(c.isNotNull())
        .crossJoin(F.broadcast(mm))
        .select(
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.lit(n_bins - 1),
                        F.floor((c - F.col("_lo")) / width).cast("int"),
                    ),
                )
            )
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(mm))
        .select("bin", "n", F.col("_lo").alias("lo"), F.col("_hi").alias("hi"))
    )
    counts.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, _REF)
    )


def _committed_batch(cur_dir: str) -> int:
    path = os.path.join(os.path.realpath(cur_dir), _META)
    if os.path.isfile(path):
        with open(path) as fh:
            return int(json.load(fh)["committed_batch"])
    return -1


def merge_batch_bins(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    value_col: str,
    n_bins: int = 10,
) -> bool:
    """Bin one micro-batch on the FROZEN reference grid and +-merge
    into the current-side counters; SKIP (False) when ``batch_id`` is
    already committed."""
    cur_dir = os.path.join(state_dir, _CUR)
    exists = os.path.islink(cur_dir) or os.path.isdir(cur_dir)
    if exists and batch_id <= _committed_batch(cur_dir):
        return False
    ref = spark.read.parquet(os.path.join(state_dir, _REF))
    grid = ref.select("lo", "hi").limit(1)
    c = F.col(value_col).cast("double")
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_bins))
    binned = (
        batch.filter(c.isNotNull())
        .crossJoin(F.broadcast(grid))
        .select(
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.greatest(
                    F.lit(0),
                    F.least(
                        F.lit(n_bins - 1),
                        F.floor((c - F.col("lo")) / width).cast("int"),
                    ),
                )
            )
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    layers = [binned]
    if exists:
        layers.append(spark.read.parquet(cur_dir).select("bin", "n"))
    merged = layers[0]
    for other in layers[1:]:
        merged = merged.unionByName(other)
    merged = merged.groupBy("bin").agg(F.sum("n").alias("n"))
    from embeddinghub_spark.streaming._state import (
        commit_version_dir,
        new_version_dir,
    )

    phys = new_version_dir(cur_dir)
    merged.coalesce(1).write.parquet(phys)
    commit_version_dir(cur_dir, phys, batch_id, _META)
    return True


def read_psi(
    spark: SparkSession, state_dir: str, n_bins: int = 10
) -> float:
    """Current PSI of everything ingested vs the frozen reference —
    same Laplace-smoothed formula as ``psi_drift`` (driver-side over
    ≤ 2·n_bins counter rows)."""
    ref = {
        r["bin"]: r["n"]
        for r in spark.read.parquet(os.path.join(state_dir, _REF)).collect()
    }
    cur_dir = os.path.join(state_dir, _CUR)
    cur = {}
    if os.path.islink(cur_dir) or os.path.isdir(cur_dir):
        cur = {
            r["bin"]: r["n"] for r in spark.read.parquet(cur_dir).collect()
        }
    rt = sum(ref.values())
    ct = sum(cur.values())
    psi = 0.0
    for b in range(n_bins):
        p = (ref.get(b, 0) + 0.5) / (rt + 0.5 * n_bins)
        q = (cur.get(b, 0) + 0.5) / (ct + 0.5 * n_bins)
        psi += (q - p) * math.log(q / p)
    return psi


def read_quantiles(
    spark: SparkSession,
    state_dir: str,
    quantiles: list[float],
    n_bins: int = 10,
) -> list[tuple[float, float]]:
    """Streaming quantiles of everything ingested so far, from the
    SAME monitor state PSI reads: the frozen reference grid plus the
    +-merged current bin counts. A live p50/p95 gate costs a
    ≤ n_bins-row driver read — no rescan, no extra stream.

    The math mirrors ``profile.histogram_quantiles`` bin-for-bin
    (cumulative counts on the grid, linear interpolation inside the
    hit bin, round 6), so after the stream drains the answers equal
    the batch sketch over the ingested rows — pinned by test — with
    one caveat: the grid froze on the REFERENCE min/max, so values
    outside it were clamped into the edge bins and estimates clamp to
    [lo, hi]. That is the monitoring contract (drift beyond the
    reference range saturates the edge, which PSI flags); for exact
    tails re-freeze on a wider reference.

    Output: ``(quantile, value)`` pairs ascending, empty if nothing
    has been ingested.
    """
    if not quantiles or not all(0.0 < q <= 1.0 for q in quantiles):
        raise ValueError("quantiles must be in (0, 1]")
    ref = spark.read.parquet(os.path.join(state_dir, _REF)).limit(1).collect()
    if not ref:
        return []
    lo, hi = float(ref[0]["lo"]), float(ref[0]["hi"])
    cur_dir = os.path.join(state_dir, _CUR)
    if not (os.path.islink(cur_dir) or os.path.isdir(cur_dir)):
        return []
    cnt = {r["bin"]: r["n"] for r in spark.read.parquet(cur_dir).collect()}
    n = sum(cnt.values())
    if n == 0:
        return []
    width = (hi - lo) / float(n_bins)
    out = []
    for q in sorted(float(q) for q in quantiles):
        t = q * float(n)
        cum = 0
        for b in range(n_bins):
            cum_before = cum
            cum += cnt.get(b, 0)
            if float(cum) >= t:
                if hi == lo:
                    est = lo
                else:
                    c = cnt.get(b, 0)
                    est = lo + float(b) * width
                    if c > 0:
                        est += (t - float(cum_before)) / float(c) * width
                    est = min(hi, est)
                out.append((q, round(est, 6)))
                break
    return out


def streaming_psi(
    stream_df: DataFrame,
    state_dir: str,
    value_col: str,
    n_bins: int = 10,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the monitor: requires ``freeze_reference`` to have run
    against ``state_dir`` first."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_bins(
            batch_df.sparkSession,
            state_dir,
            batch_df,
            batch_id,
            value_col,
            n_bins,
        )

    writer = stream_df.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
