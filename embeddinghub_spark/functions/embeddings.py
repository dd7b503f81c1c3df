"""Embedding-column transforms for training-data pipelines (beyond the
reference's vector surface — BASELINE.json north star; the reference's
embedding ops are store/lookup/kNN, `embeddinghub/embeddingstore/
embedding_store.cc:55-112` — these are the batch *preparation* steps a
Spark corpus pipeline needs before those stores are loaded).

All JVM-side. With ``dim`` known (the normal case — embedding columns
are fixed-dimension by contract, `provider/types/value_type.go:96-100`)
every element expression is unrolled into whole-stage codegen through
one parsed SQL string; the generic fallbacks use posexplode/aggregate.

Float protocol: arithmetic accumulates in DOUBLE, strictly
left-to-right where order matters (norms, projections), so results
replay bit-identically in any engine that parses the same expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from embeddinghub_spark.functions.vector import (
    _bq,
    _dot_lit_sql,
    random_hyperplanes,
)


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    dim: int | None = None,
    out_col: str = "centroid",
) -> DataFrame:
    """Per-group mean embedding (average pooling) — class prototypes
    for nearest-class-mean labeling, cluster summaries, topic vectors.

    With ``dim`` known: one hash aggregate computing ``dim`` per-group
    ``avg(vec[i])`` columns, reassembled into an array. Map-side
    partial aggregation collapses each task's rows before the
    exchange, so the shuffle carries O(groups × tasks) rows of ``dim``
    doubles — never the corpus. A whale group combines in-task exactly
    like C3's max(struct) rewrite; no skew handling needed.

    Unknown ``dim`` falls back to posexplode → (group, pos) avg →
    array_sort reassembly (the ``kmeans_centroids`` shape): two
    exchanges, still partial-aggregated, volume |rows|·dim scalars.

    Output: (group_col, n_members, out_col: array<double>).
    """
    if dim is not None:
        qv = _bq(vec_col)
        avgs = [
            F.expr(f"avg(cast({qv}[{i}] as double))").alias(f"_m{i}")
            for i in range(dim)
        ]
        agg = df.groupBy(group_col).agg(
            F.count("*").alias("n_members"), *avgs
        )
        return agg.select(
            group_col,
            "n_members",
            F.array(*[F.col(f"_m{i}") for i in range(dim)]).alias(out_col),
        )
    exploded = df.select(
        F.col(group_col), F.posexplode(vec_col).alias("pos", "x")
    )
    by_pos = exploded.groupBy(group_col, "pos").agg(
        F.avg(F.col("x").cast("double")).alias("m"),
        F.count("*").alias("n"),
    )
    return (
        by_pos.groupBy(group_col)
        .agg(
            F.max("n").alias("n_members"),
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ).alias("_pm"),
        )
        .select(
            group_col,
            "n_members",
            F.expr("transform(_pm, s -> s.m)").alias(out_col),
        )
    )


def normalize_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    out_col: str = "unit_vec",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """L2-normalize an embedding column (unit vectors turn cosine into
    dot product — the standard pre-index step). All-zero vectors map
    to NULL rather than NaN-filled arrays. Map-only projection via
    HOF fold + transform; ``dim`` is accepted for signature parity
    but unused — the round-4 A/B (4M rows × dim 64) measured the
    dim-unrolled norm/divide chain at ~6.2 s vs ~1.6 s for the fold
    (same finding as the vector.py metrics; see the module note
    there), so the fold is the only path."""
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != vec_col
    ]
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    unit = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / F.col("_nrm")
    )
    return (
        df.select(*keep, F.col(vec_col), nrm.alias("_nrm"))
        .select(*keep, F.when(F.col("_nrm") > 0, unit).alias(out_col))
    )


def quantize_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "qscale",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column —
    the 4× storage/bandwidth cut applied before parking a corpus'
    embeddings at rest (a 100 TB float32 embedding store becomes
    25 TB, and ANN candidate scans read a quarter of the bytes;
    two-stage kNN re-ranks survivors against the full-precision
    column).

    Per vector: ``scale = max(|x_i|)/127``; each element maps to
    ``floor(x_i/scale + 0.5)`` ∈ [-127, 127]. The rounding is the
    repo's engine-neutral ``floor(v + 0.5)`` protocol (identical in
    Spark and DuckDB; ``round()`` half-away/half-up conventions never
    enter), and all arithmetic is double — the quantized codes are
    EXACTLY replayable by the oracle, not just close. All-zero
    vectors (scale 0) yield NULL codes, the ``normalize_vectors``
    convention.

    Map-only projection (HOF fold for the max, transform for the
    codes): zero shuffles at any corpus size. Reconstruction
    (``dequantize_vectors``) error is ≤ scale/2 per element, pinned
    by test.

    Output: keep_cols + (scale_col DOUBLE, out_col ARRAY<INT> with
    int8-range values).
    """
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != vec_col
    ]
    mx = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda a, x: F.greatest(a, F.abs(x.cast("double"))),
    )
    codes = F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            x.cast("double") / F.col(scale_col) + F.lit(0.5)
        ).cast("int"),
    )
    return (
        df.select(*keep, F.col(vec_col), (mx / F.lit(127.0)).alias(scale_col))
        .select(
            *keep,
            scale_col,
            F.when(F.col(scale_col) > 0, codes).alias(out_col),
        )
    )


def dequantize_vectors(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
    out_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Inverse of ``quantize_vectors``: ``x̂_i = q_i · scale`` —
    map-only, per-element error ≤ scale/2. NULL code arrays (all-zero
    originals) reconstruct as NULL; callers treating them as zero
    vectors coalesce downstream."""
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c not in (qvec_col, scale_col)
    ]
    rec = F.transform(
        F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)
    )
    return df.select(*keep, rec.alias(out_col))


def random_projection(
    df: DataFrame,
    dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "projected",
    seed: int = 11,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: dim → out_dim via a
    deterministic pseudo-random plane matrix (the same LCG generator
    the LSH family uses, so the matrix is replayable anywhere from
    (dim, out_dim, seed)). Scaled by 1/sqrt(out_dim) — the JL scaling
    that preserves expected pairwise distances.

    Map-only: ``out_dim`` unrolled dot-against-literal expressions per
    row, zero shuffles — dimensionality reduction of a 100 TB corpus
    is embarrassingly parallel, and downstream stages (kNN, LSH,
    clustering) run on out_dim/dim of the bytes.
    """
    planes = random_hyperplanes(dim, out_dim, seed)
    scale = 1.0 / float(out_dim) ** 0.5
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != vec_col
    ]
    proj = [
        F.expr(f"({_dot_lit_sql(vec_col, p, dim)}) * {scale!r}D").alias(
            f"_p{j}"
        )
        for j, p in enumerate(planes)
    ]
    staged = df.select(*keep, *proj)
    return staged.select(
        *keep,
        F.array(*[F.col(f"_p{j}") for j in range(out_dim)]).alias(out_col),
    )


def embedding_clusters(
    df: DataFrame,
    dim: int,
    k: int = 3,
    min_cosine: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 2,
) -> DataFrame:
    """Semantic grouping by kNN-graph components: build the
    approximate k-NN graph (`vector.knn_join` — banded-LSH candidate
    pairs, exact-cosine top-k per vector) keeping edges with
    cosine >= ``min_cosine``, then label connected components with
    `dedup.connected_components` (alternating large-star/small-star).
    The standard corpus-structure pass: topic islands, near-dup
    families beyond pairwise threshold, mixture-weight discovery.

    One row per vector: ``(vec_id, cluster_id)``; isolated vectors
    (no surviving edge) form singleton clusters labeled by their own
    id. Scale shape = knn_join's (band-bounded self-join, per-source
    top-k) + CC's O(log n) bucketed rounds; vectors never enter the
    CC iteration — only (src, dst) id pairs do.
    """
    from embeddinghub_spark.functions.dedup import connected_components
    from embeddinghub_spark.functions.vector import knn_join

    edges = (
        knn_join(
            df, k=k, dim=dim, id_col=id_col, vec_col=vec_col,
            n_planes=n_planes, bands=bands,
        )
        .filter(F.col("cosine") >= min_cosine)
        .select(F.col(id_col).alias("id_a"), F.col("neighbor_id").alias("id_b"))
    )
    comp = connected_components(edges)
    return (
        df.select(F.col(id_col))
        .join(comp, F.col(id_col) == F.col("node"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
):
    """Exact PCA fit over an embedding column: returns
    ``(mean, components, explained_variance)`` — ``components`` is a
    k×dim list of orthonormal principal axes, variance-descending.

    The data pass is ONE Arrow-batched ``mapInPandas`` emitting per
    batch the sufficient statistics (n, Σx, ΣxxT as a flattened
    dim² array — numpy matmul per batch, never per row), reduced by a
    posexplode + groupBy(pos) SUM whose exchange is dim²+dim rows per
    task regardless of corpus size; the dim×dim covariance then
    eigendecomposes DRIVER-side (numpy ``eigh`` — a bounded scalar
    step, like the IVF centroid solve). Sign convention: each
    component's largest-|value| entry is made positive, so the fit is
    deterministic across runs and replicas.

    Unlike ``random_projection`` (data-oblivious JL), PCA spends one
    corpus pass to put the axes where the variance actually is — the
    right trade when the projection is reused by many consumers.
    """
    import numpy as np

    if k < 1:
        raise ValueError("k must be >= 1")
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty input")
    dim = first["d"]
    if k > dim:
        raise ValueError(f"k={k} exceeds dim={dim}")

    out_schema = "n BIGINT, sx ARRAY<DOUBLE>, sxx ARRAY<DOUBLE>"

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            yield pd.DataFrame(
                {
                    "n": [X.shape[0]],
                    "sx": [X.sum(axis=0).tolist()],
                    "sxx": [(X.T @ X).ravel().tolist()],
                }
            )

    stats = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(partials, out_schema)
    )
    # fixed-width reduction: (pos, val) partial sums, dim²+dim+1 keys
    reduced = (
        stats.select(
            F.col("n"),
            F.posexplode(F.concat(F.col("sx"), F.col("sxx"))).alias(
                "pos", "val"
            ),
        )
        .groupBy("pos")
        .agg(F.sum("val").alias("s"), F.sum("n").alias("nn"))
        .collect()
    )
    if not reduced:
        raise ValueError("empty input")
    total_n = None
    flat = [0.0] * (dim + dim * dim)
    for r in reduced:
        flat[r["pos"]] = r["s"]
        total_n = r["nn"]  # every pos row sums each batch's n once
    n = float(total_n)
    sx = np.array(flat[:dim])
    sxx = np.array(flat[dim:]).reshape(dim, dim)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    evs = []
    for idx in order:
        v = vecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
        evs.append(float(max(vals[idx], 0.0)))
    return [float(x) for x in mean], comps, evs


def pca_project(
    df: DataFrame,
    mean: list,
    components: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project embeddings onto fitted PCA axes: map-only JVM-side HOF
    folds (``zip_with`` multiply + ``aggregate`` sum per component —
    the repo's literal-dot protocol), no Python in the hot path, no
    shuffle at any corpus size. Output: (id, pca ARRAY<DOUBLE>)."""
    centered_dots = []
    for comp in components:
        lit_comp = F.array(*[F.lit(float(c)) for c in comp])
        lit_mean = F.array(*[F.lit(float(m)) for m in mean])
        centered = F.zip_with(
            F.col(vec_col), lit_mean, lambda x, m: x.cast("double") - m
        )
        prod = F.zip_with(centered, lit_comp, lambda x, c: x * c)
        centered_dots.append(
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        )
    return df.select(F.col(id_col), F.array(*centered_dots).alias("pca"))
