"""Embeddinghub spaces (SURVEY §1.3, §2.3 V9).

Reference: ``embeddinghub/embeddingstore/space.h:14-31`` (Space →
RocksDB-backed collection), ``version.h:18-44`` (immutable-able
embedding table of fixed dims + optional HNSW index), server ops
CreateSpace/FreezeSpace/Set/MultiSet/Get/MultiGet/NearestNeighbor/
Download ``embeddinghub/embeddingstore/server.cc:65-232``.

DataFrame-native equivalent: a Space version is a DataFrame
``(key string, embedding array<float>)``; Set/MultiSet are
upserts (union + keep-last dedup); NearestNeighbor is batch top-k
(exact; the HNSW-grade online path is out of scope per BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from embeddinghub_spark.functions.vector import knn_bruteforce

_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        # upsert ordering: later writes win
        StructField("_seq", LongType(), False),
    ]
)


class FrozenSpaceError(RuntimeError):
    pass


class Space:
    """A named embedding collection of fixed dimensionality."""

    def __init__(self, spark: SparkSession, name: str, dims: int):
        self.spark = spark
        self.name = name
        self.dims = dims
        self.frozen = False
        self._df = spark.createDataFrame([], _SCHEMA)
        self._seq = 0

    def _check_mutable(self):
        if self.frozen:
            raise FrozenSpaceError(f"space {self.name} is frozen")  # server.cc FreezeSpace

    def multiset(self, items: dict[str, list[float]]) -> None:
        """MultiSet upsert (server.cc:120-150); dim-checked."""
        self._check_mutable()
        for k, v in items.items():
            if len(v) != self.dims:
                raise ValueError(
                    f"embedding for {k!r} has dim {len(v)}, space expects {self.dims}"
                )
        self._seq += 1
        rows = [(k, [float(x) for x in v], self._seq) for k, v in items.items()]
        new = self.spark.createDataFrame(rows, _SCHEMA)
        self._df = self._df.unionByName(new)

    def set(self, key: str, embedding: list[float]) -> None:
        self.multiset({key: embedding})

    def _current(self) -> DataFrame:
        """Latest write per key (upsert resolution)."""
        w = Window.partitionBy("key").orderBy(F.col("_seq").desc())
        return (
            self._df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("key", "embedding")
        )

    def get(self, key: str) -> list[float] | None:
        rows = self._current().filter(F.col("key") == key).collect()
        return list(rows[0]["embedding"]) if rows else None

    def multiget(self, keys: list[str]) -> dict[str, list[float]]:
        rows = self._current().filter(F.col("key").isin(keys)).collect()
        return {r["key"]: list(r["embedding"]) for r in rows}

    def download(self) -> DataFrame:
        """Full scan (server.cc Download:200-232)."""
        return self._current()

    def freeze(self) -> None:
        self.frozen = True

    def nearest_neighbor(
        self, k: int, key: str | None = None, vector: list[float] | None = None
    ) -> list[str]:
        """NearestNeighbor (server.cc:152-198): L2 metric like the
        hnswlib index (index.cc L2 space); query by key or raw vector;
        a key query excludes itself like the reference's API."""
        if (key is None) == (vector is None):
            raise ValueError("provide exactly one of key / vector")
        if vector is None:
            vector = self.get(key)
            if vector is None:
                raise KeyError(key)
        cur = self._current()
        q = self.spark.createDataFrame([(0, [float(x) for x in vector])],
                                       ["query_id", "query_vec"])
        hits = knn_bruteforce(
            cur, q, k + (1 if key is not None else 0),
            id_col="key", vec_col="embedding", metric="l2",
        ).orderBy("rank")
        out = [r["neighbor_id"] for r in hits.collect()]
        if key is not None:
            out = [o for o in out if o != key][:k]
        return out


class EmbeddingHub:
    """Space registry (CreateSpace/DeleteSpace — server.cc:65-96)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._spaces: dict[str, Space] = {}

    def create_space(self, name: str, dims: int) -> Space:
        if name in self._spaces:
            raise ValueError(f"space {name} exists")
        s = Space(self.spark, name, dims)
        self._spaces[name] = s
        return s

    def get_space(self, name: str) -> Space:
        return self._spaces[name]

    def delete_space(self, name: str) -> None:
        del self._spaces[name]

    def freeze_space(self, name: str) -> None:
        self._spaces[name].freeze()
