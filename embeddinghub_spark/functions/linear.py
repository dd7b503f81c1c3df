"""Distributed linear-model training over feature-array columns.

The quality-classifier loop (fastText-style doc filters, relevance
gates) needs a trainable linear model ON the cluster — train on the
full corpus, not a driver-sized sample — without importing an ML
runtime. Batch gradient descent maps perfectly onto Spark's
aggregation model: ONE map-side-combined aggregate per iteration
computes the exact full-batch gradient (each executor reduces its
partition to a single dim-width row; the exchange is one row per
partition), and the dim-sized update runs driver-side. The data
never moves; only gradients do.

Reference parity: featureform exports training sets for external
trainers (serving/serving.go:57-123); build addendum per SURVEY §2.5
— this closes the loop for the linear/logistic family the pipeline's
own gates (quality filter thresholds, nb_classifier priors) feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(features_col: str, weights: list[float]):
    arr = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(F.col(features_col), arr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def logistic_regression_fit(
    df: DataFrame,
    features_col: str,
    label_col: str,
    dim: int,
    n_iters: int = 50,
    lr: float = 1.0,
    l2: float = 0.0,
    tol: float = 1e-6,
) -> dict:
    """Full-batch gradient-descent logistic regression on an
    ``array<double>`` feature column and a 0/1 label.

    Per iteration: margin ``w·x + b`` and residual ``σ(margin) − y``
    are computed JVM-side (``zip_with``/``aggregate`` — no Python in
    the row path), then ONE aggregate produces the exact full-batch
    gradient as ``dim + 2`` sums (per-component ``Σ r·xᵢ``, intercept
    ``Σ r``, and the log-loss for the history) — map-side combine
    reduces each partition to a single row, so the exchange per
    iteration is one dim-width row per partition regardless of row
    count. The driver applies ``w ← w − lr·(∇/n + l2·w)`` and stops
    early when ``max|∇/n| < tol``.

    Cost model: one Spark job per iteration over the CACHED prepared
    frame (persisted in-op, unpersisted on exit) — n_iters linear
    passes, the canonical batch-GD shape; for 100 TB corpora set
    n_iters modestly (logistic loss is convex; 20-100 full-batch
    steps with lr≈1 converge for standardized features) or fit on a
    `train_test_split` stratum. dim is the caller's feature width
    (validated against the data); gradients are exact doubles — sums
    over partitions, so runs are deterministic up to partial-
    aggregation order (~1e-12·n), NOT bit-pinned (documented; the
    oracle-protocol decimal trick does not apply to an iterative
    optimizer's internal state).

    Returns ``{"weights": [...], "intercept": b, "n_iters_run": k,
    "loss_history": [...], "n": rows}``.
    """
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    if dim < 1:
        raise ValueError("dim must be >= 1")
    t = df.filter(
        F.col(features_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(features_col).cast("array<double>").alias("_x"),
        F.col(label_col).cast("double").alias("_y"),
    )
    bad = t.filter(F.size("_x") != dim).limit(1).collect()
    if bad:
        raise ValueError(
            f"feature arrays must all have length dim={dim}; "
            f"found length {len(bad[0]['_x'])}"
        )
    t = t.persist()
    try:
        n = t.count()  # also materializes the cache
        if n == 0:
            raise ValueError("no rows to fit")
        w = [0.0] * dim
        b = 0.0
        history: list[float] = []
        iters_run = 0
        for _ in range(n_iters):
            margin = _dot("_x", w) + F.lit(b)
            # numerically-stable log-loss: log(1+e^-|m|) + max(m,0) - m*y
            resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) - F.col("_y")
            loss_term = (
                F.log(F.lit(1.0) + F.exp(-F.abs(margin)))
                + F.greatest(margin, F.lit(0.0))
                - margin * F.col("_y")
            )
            scored = t.select(
                F.col("_x"), resid.alias("_r"), loss_term.alias("_l")
            )
            agg = scored.agg(
                *[
                    F.sum(F.element_at("_x", i + 1) * F.col("_r")).alias(
                        f"_g{i}"
                    )
                    for i in range(dim)
                ],
                F.sum("_r").alias("_gb"),
                F.sum("_l").alias("_loss"),
            ).collect()[0]
            grad = [agg[f"_g{i}"] / n for i in range(dim)]
            gb = agg["_gb"] / n
            history.append(agg["_loss"] / n)
            iters_run += 1
            if max(max(abs(g) for g in grad), abs(gb)) < tol:
                break
            w = [wi - lr * (gi + l2 * wi) for wi, gi in zip(w, grad)]
            b -= lr * gb
        return {
            "weights": w,
            "intercept": b,
            "n_iters_run": iters_run,
            "loss_history": history,
            "n": n,
        }
    finally:
        t.unpersist()


def logistic_regression_predict(
    df: DataFrame,
    features_col: str,
    weights: list[float],
    intercept: float,
    score_col: str = "score",
) -> DataFrame:
    """Map-only scoring with a fitted linear model: appends
    ``σ(w·x + b)`` as ``score_col``. The weights travel as a plan
    literal (dim-sized — fine for linear models; this is NOT the path
    for million-dim embeddings), so scoring is pure codegen with zero
    exchanges and feeds straight into ``binary_auc`` /
    ``calibration_bins`` for the eval gate.
    """
    margin = _dot(features_col, weights) + F.lit(float(intercept))
    return df.withColumn(
        score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    )
