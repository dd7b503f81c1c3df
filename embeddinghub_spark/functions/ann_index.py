"""Persistent on-disk IVF index: the vector twin of the incremental
MinHash band index (functions/dedup.py gram/band indexes).

``ivf_index_build`` materializes the inverted file as a parquet
layout PARTITIONED BY CELL, with the quantizer (centroids) as a
sidecar table. ``ivf_index_probe`` then answers queries by reading
ONLY the probed cell partitions — the cell filter lands in the scan's
``PartitionFilters`` (pinned by test), so a probe touches
``nprobe/n_cells`` of the index BYTES on disk, not just of the rows
in memory. That file-skipping is the point of persisting the index:
the in-memory ``knn_ivf`` pays a full corpus scan per session; the
disk index pays it once at build.

``ivf_index_append`` adds new vectors by writing ONLY the partitions
their cells land in (dynamic partition overwrite is not needed —
parquet append into a partitioned layout creates/extends just those
cell directories), mirroring the band-index append discipline.

Probe results are IDENTICAL to ``knn_ivf`` with the same quantizer
(assignment, probe ordering, scoring, and tie-breaks all mirror it),
which is what lets the entry reuse the knn_ivf SQL oracle verbatim.

Ref parity: embeddinghub serves vectors from an on-disk store with an
ANN index sidecar (embeddingstore/embedding_store.cc); this is the
batch-Spark form of that persisted-index idea.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from embeddinghub_spark.functions.vector import (
    _collect_cells,
    _topk_per_query,
    assign_ivf_cells,
    dot,
    norm,
)

_CELLS = "cells"
_CENTROIDS = "centroids"


def default_centroids(
    vectors: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The deterministic quantizer knn_ivf defaults to: first
    ``n_cells`` vectors by id, cell = 1-based rank. Swap in
    ``kmeans_centroids`` for production recall — every downstream
    step is unchanged."""
    return (
        vectors.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("centroid"))
        .withColumn(
            "cell", F.row_number().over(Window.orderBy(F.col("_cid").asc()))
        )
        .select("cell", "centroid")
    )


def ivf_index_build(
    vectors: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
) -> None:
    """Build the on-disk inverted file: assign every vector to its
    nearest cell (map-only literal-fold argmax — zero exchanges; see
    assign_ivf_cells) and write parquet partitioned by ``cell``, plus
    the centroid sidecar. The partitioned write is the index's one
    shuffle-free clustering pass; every probe after it is file-
    skipping."""
    if centroids is None:
        centroids = default_centroids(vectors, n_cells, id_col, vec_col)
    cents = _collect_cells(centroids, "cell", "centroid")
    assigned = assign_ivf_cells(
        vectors, centroids, id_col, vec_col, dim=dim, cells=cents
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(index_dir, _CELLS)
    )
    centroids.write.mode("overwrite").parquet(
        os.path.join(index_dir, _CENTROIDS)
    )


def ivf_index_append(
    vectors: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Append new vectors: assign with the STORED quantizer and
    parquet-append — only the touched cell directories gain files;
    untouched cells are never rewritten (the band-index append
    discipline)."""
    spark = vectors.sparkSession
    centroids = spark.read.parquet(os.path.join(index_dir, _CENTROIDS))
    cents = _collect_cells(centroids, "cell", "centroid")
    assigned = assign_ivf_cells(
        vectors, centroids, id_col, vec_col, dim=dim, cells=cents
    )
    assigned.write.mode("append").partitionBy("cell").parquet(
        os.path.join(index_dir, _CELLS)
    )


def ivf_index_probe(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Probe the disk index: each query's ``nprobe`` nearest cells
    (score desc, cell asc — knn_ivf's ordering) are unioned into a
    driver-side cell list (bounded by n_cells), and the index scan
    carries ``cell IN (...)`` as a PARTITION filter — unprobed cells'
    files are never opened. Candidates score exactly (cosine, norms
    hoisted once) and reduce via the two-stage top-k. Output:
    (query_id, neighbor_id, score, rank) — identical to knn_ivf with
    the same quantizer."""
    centroids = spark.read.parquet(os.path.join(index_dir, _CENTROIDS))

    qpaired = queries.join(F.broadcast(centroids))
    qscored = qpaired.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.col("cell"),
        dot(query_vec_col, "centroid", dim).alias("_qscore"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_qscore").desc(), F.col("cell").asc()
    )
    probes = (
        qscored.withColumn("_qrank", F.row_number().over(wq))
        .filter(F.col("_qrank") <= nprobe)
        .select(query_id_col, query_vec_col, "cell")
        .localCheckpoint(eager=False)
    )
    needed = sorted(
        r["cell"] for r in probes.select("cell").distinct().collect()
    )  # bounded by n_cells — the static partition-pruning list

    index = spark.read.parquet(os.path.join(index_dir, _CELLS)).filter(
        F.col("cell").isin(needed)
    )
    index = index.withColumn("_vn", norm(vec_col, dim))
    probes = probes.withColumn("_qn", norm(query_vec_col, dim))
    score = dot(vec_col, query_vec_col, dim) / (F.col("_vn") * F.col("_qn"))
    paired = index.join(F.broadcast(probes), "cell")
    scored = paired.select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        score.alias("score"),
    )
    return _topk_per_query(
        scored, k, [F.col("score").desc(), F.col("neighbor_id").asc()]
    )
