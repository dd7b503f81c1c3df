"""Dataset iteration adapters (SURVEY §2.3 V1/V6/V7/V8).

Reference: training-set row iterator ``provider/offline.go:574-579``;
client-side ``Dataset`` adapters repeat/shuffle/batch
``client/src/featureform/serving.py:357-436``; ``dataframe()`` export
``serving.py:578-655``; source preview ``serving/serving.go:311-353``
(client caps at 2,000,000 records — client.py:129).

These are driver-side iterator utilities by design (they feed a local
training loop); the data-parallel path is the DataFrame itself.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

PREVIEW_DEFAULT_LIMIT = 2_000_000  # client/src/featureform/client.py:129


class Dataset:
    """Iterator pipeline over a training-set DataFrame: each item is
    ``(features: list, label)`` like the reference's proto rows."""

    def __init__(
        self,
        df: DataFrame,
        label_col: str = "label",
        feature_cols: list[str] | None = None,
    ):
        self._df = df
        self._label_col = label_col
        # reference training-set rows are (features..., label) ONLY
        # (serving.py:357-436): entity keys and label_ts are join/sort
        # plumbing, not features — excluded unless explicitly listed.
        # Only the EXACT key columns are excluded: 'entity' and the
        # composite-mapping convention 'entity__<name>' (register.py
        # EntityMappings); a feature ALIAS that merely starts with
        # "entity" (e.g. entity_score_lag) is a feature and is served.
        if feature_cols is None:
            feature_cols = [
                c
                for c in df.columns
                if c != label_col
                and c != "label_ts"
                and c != "entity"
                and not c.startswith("entity__")
            ]
        self._feature_cols = feature_cols
        self._repeat = 1
        self._shuffle_buffer = 0
        self._shuffle_seed: int | None = None
        self._batch = 0

    def repeat(self, n: int) -> "Dataset":
        """serving.py:357-380: iterate the dataset n+1 times total."""
        self._repeat = n + 1
        return self

    def shuffle(self, buffer_size: int, seed: int | None = None) -> "Dataset":
        """serving.py:382-410: buffered reservoir shuffle."""
        self._shuffle_buffer = buffer_size
        self._shuffle_seed = seed
        return self

    def batch(self, n: int) -> "Dataset":
        """serving.py:412-436: yield lists of n rows."""
        self._batch = n
        return self

    def dataframe(self) -> DataFrame:
        """V7: we're already Spark — identity."""
        return self._df

    def pandas(self):
        return self._df.toPandas()

    def _rows(self) -> Iterator[tuple[list[Any], Any]]:
        feature_cols = self._feature_cols
        for _ in range(self._repeat):
            it = (
                (
                    [row[c] for c in feature_cols],
                    row[self._label_col] if self._label_col in self._df.columns else None,
                )
                # prefetchPartitions overlaps the next partition's job
                # with client consumption (toLocalIterator is otherwise
                # one SEQUENTIAL job per partition)
                for row in self._df.toLocalIterator(prefetchPartitions=True)
            )
            if self._shuffle_buffer > 1:
                yield from _buffered_shuffle(it, self._shuffle_buffer, self._shuffle_seed)
            else:
                yield from it

    def __iter__(self):
        if self._batch > 1:
            return iter(_batched(self._rows(), self._batch))
        return self._rows()


def _buffered_shuffle(it: Iterator, buffer_size: int, seed: int | None) -> Iterator:
    rng = random.Random(seed)
    buf: list[Any] = []
    for item in it:
        if len(buf) < buffer_size:
            buf.append(item)
            continue
        idx = rng.randrange(buffer_size)
        yield buf[idx]
        buf[idx] = item
    rng.shuffle(buf)
    yield from buf


def _batched(it: Iterator, n: int) -> Iterator[list]:
    batch: list[Any] = []
    for item in it:
        batch.append(item)
        if len(batch) == n:
            yield batch
            batch = []
    if batch:
        yield batch


def preview(df: DataFrame, limit: int = PREVIEW_DEFAULT_LIMIT) -> DataFrame:
    """V8 source preview: LIMIT n (serving/serving.go:509-564)."""
    return df.limit(limit)


def to_arrow_batches(df: DataFrame, limit: int | None = None, batch_rows: int = 10_000):
    """The client-side slice of the reference's Arrow Flight streamer
    (streamer/iceberg_streamer.py:17-105: serve a table as Arrow
    record batches, row-limited): yield ``pyarrow.RecordBatch``es of
    at most ``batch_rows`` rows, optionally capped at ``limit`` total
    rows. The gRPC/Flight server itself is out of scope (BASELINE
    scoping); this is the same data path — Spark's Arrow collect —
    minus the wire.

    Rows stream driver-side batch by batch; the Spark job is bounded
    by ``limit`` when given (CollectLimit stops the scan)."""
    import pyarrow as pa

    capped = df.limit(limit) if limit is not None else df
    tbl = capped.toArrow()
    for batch in tbl.to_batches(max_chunksize=batch_rows):
        yield batch


def to_arrow(df: DataFrame, limit: int | None = None):
    """One-shot ``pyarrow.Table`` export (row-limited like the
    streamer's default cap); see ``to_arrow_batches`` for streaming."""
    capped = df.limit(limit) if limit is not None else df
    return capped.toArrow()
