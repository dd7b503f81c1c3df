"""C20 streaming materialization: after all batches, the snapshot must
equal batch C3 over the full input (FIXTURES F7 semantics), including
late rows arriving in a later batch."""

import os
import tempfile
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from embeddinghub_spark.operators.materialize import materialize
from embeddinghub_spark.streaming.kafka import kafka_records
from embeddinghub_spark.streaming.stream_materialize import (
    StreamingSnapshot,
    streaming_materialize,
)

SCHEMA = StructType(
    [
        StructField("entity", StringType()),
        StructField("value", DoubleType()),
        StructField("ts", TimestampNTZType()),
    ]
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_streaming_equals_batch_c3(spark):
    batches = [
        [("a", 1.0, _ts("2024-01-01T00:00:00")), ("b", 5.0, _ts("2024-01-01T01:00:00"))],
        [("a", 2.0, _ts("2024-01-02T00:00:00")), ("c", 7.0, _ts("2024-01-01T00:00:00"))],
        # batch 3 contains a LATE row for a (ts < batch 2's) — must not win
        [("a", 99.0, _ts("2024-01-01T12:00:00")), ("b", 6.0, _ts("2024-01-02T00:00:00"))],
    ]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in")
        os.makedirs(src)
        snapshot = StreamingSnapshot()
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            stream = spark.readStream.schema(SCHEMA).parquet(src)
            q = streaming_materialize(
                stream, snapshot, checkpoint_dir=os.path.join(d, "ckpt")
            )
            q.awaitTermination(60)

        full = spark.createDataFrame(
            [r for b in batches for r in b], SCHEMA
        )
        batch_c3 = {
            r["entity"]: r["value"] for r in materialize(full).collect()
        }
        assert snapshot.items() == batch_c3
        assert snapshot.get("a") == 2.0  # late row did not overwrite


def test_kafka_record_parsing(spark):
    # kafka connector absent → exercise the value-parse plan on an
    # equivalent in-memory frame with kafka's (key, value, timestamp) shape
    raw = spark.createDataFrame(
        [
            (b"k1", b'{"entity": "a", "value": 1.5, "ts": "2024-01-01T00:00:00"}',
             _ts("2024-01-01T00:00:01")),
            (b"k2", b'not json at all', _ts("2024-01-01T00:00:02")),
        ],
        StructType([
            StructField("key", BinaryType()),
            StructField("value", BinaryType()),
            StructField("timestamp", TimestampNTZType()),
        ]),
    )
    recs = kafka_records(raw, SCHEMA).collect()
    good = [r for r in recs if r["entity"] == "a"]
    assert len(good) == 1
    assert good[0]["value"] == 1.5
    assert good[0]["kafka_key"] == "k1"
    bad = [r for r in recs if r["entity"] is None]
    assert len(bad) == 1  # malformed JSON → nulls, row preserved
