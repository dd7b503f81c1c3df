"""Vector / embedding operators (SURVEY §2.3 V5, V9; embeddinghub
semantics from ``embeddinghub/embeddingstore/index.cc:10-54`` — hnswlib
over L2 space; Redis path FT.CREATE HNSW ``provider/redis.go:226-293``).

Batch-first design per BASELINE.json: "Vector database for embeddings
could use Spark for batch index construction but online ANN serving
requires specialized engines." So:

- exact brute-force top-k (the oracle-checkable baseline): JVM-side
  ``F.aggregate``/``F.zip_with`` dot products — no Python in the hot
  path — then a per-query window top-k.
- LSH-bucketed approximate variant (the 100 TB path): random
  hyperplane signs partition vectors into buckets; queries probe only
  their bucket (and optionally neighbors), turning the O(N·Q) cross
  join into a bucket-local join. MLlib's BucketedRandomProjectionLSH
  offers the same for L2; we keep a DataFrame-native implementation so
  the plan stays joinable/broadcastable.

All distances accumulate in DOUBLE, sequentially left-to-right
(``F.aggregate`` folds in array order) — deterministic and
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a[i]*b[i], JVM-side, double accumulation in array order."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Embeddinghub's HNSW metric (index.cc L2 space)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    metric: str = "cosine",
) -> DataFrame:
    """V5 exact top-k: broadcast the (small) query set against the
    vector table, score JVM-side, keep k per query via window.

    Output: (query_id, neighbor_id, score, rank); rank 1 = best;
    deterministic tiebreak on neighbor_id. At 100 TB the vector table
    side stays partitioned (no shuffle: broadcast join + per-partition
    partial top-k before the window's single shuffle on query_id).
    """
    paired = vectors.join(F.broadcast(queries))
    if metric == "cosine":
        score = cosine_similarity(vec_col, query_vec_col)
        order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    elif metric == "l2":
        score = -l2_distance(vec_col, query_vec_col)
        order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    elif metric == "dot":
        score = dot(vec_col, query_vec_col)
        order = [F.col("score").desc(), F.col("neighbor_id").asc()]
    else:
        raise ValueError(f"unknown metric {metric}")
    scored = paired.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        score.alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy needed
    at plan-build time, reproducible across runs)."""
    state = seed & 0x7FFFFFFF
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            v.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(v)
    return planes


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    seed: int = 7,
    bucket_col: str = "lsh_bucket",
) -> Column | DataFrame:
    """Sign-random-projection LSH bucket id (0..2^n_planes-1).

    Same-bucket vectors are cosine-likely-similar; used to scope both
    ANN probing and near-duplicate candidate generation. JVM-side only:
    the hyperplanes are literal arrays folded into the plan.
    """
    bucket = F.lit(0)
    for i, plane in enumerate(random_hyperplanes(dim, n_planes, seed)):
        plane_lit = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(
            dot(F.col(vec_col), plane_lit) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return df.withColumn(bucket_col, bucket)


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket.

    Recall < 1 by construction (bucket boundaries); raise recall by
    lowering n_planes or multi-probing. The join is bucket-equi +
    broadcast → no N×Q explosion, scales linearly in N.
    """
    v = with_lsh_bucket(vectors, vec_col, dim, n_planes, seed)
    q = with_lsh_bucket(queries, query_vec_col, dim, n_planes, seed)
    paired = v.join(F.broadcast(q), "lsh_bucket")
    scored = paired.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        cosine_similarity(vec_col, query_vec_col).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
