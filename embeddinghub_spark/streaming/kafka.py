"""S7: Kafka primary source (SURVEY §2.1).

Reference: Kafka oneof in PrimaryData (metadata.proto:651-653) and the
runner's KafkaClient (offline_store_spark_runner.py:271-416), which
consumes JSON/avro messages into entity/value/ts records.

Spark-native: ``spark.readStream.format("kafka")`` with JSON value
parsing into a declared schema. The kafka connector JAR is not bundled
in this environment, so ``.load()`` is left to the caller on a real
cluster; everything up to the parse plan is built here and unit-tested
against an equivalent in-memory frame via ``parse_kafka_value``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_reader(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
):
    """Configured readStream builder for a Kafka topic (caller runs
    ``.load()`` where the kafka connector is on the classpath)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )


def parse_kafka_value(value_col: Column, schema: StructType) -> Column:
    """Kafka ``value`` bytes → typed struct via JSON (the runner's
    message decode, offline_store_spark_runner.py:337-416)."""
    return F.from_json(value_col.cast("string"), schema)


def kafka_records(
    raw: DataFrame, schema: StructType, on_corrupt: str = "null"
) -> DataFrame:
    """Project a raw kafka frame (key/value/timestamp/...) into the
    declared record schema + kafka metadata columns.

    Corrupt/partial payloads (``from_json`` → null struct) are a
    semantic CHOICE the runner makes at decode time (:337-416), so it
    is pinned explicitly here rather than inherited silently:

      - ``"null"`` (default): the row survives with null record
        fields — downstream sees the gap and the kafka metadata
        (key/ts/offset) needed to trace the bad message;
      - ``"drop"``: corrupt rows are filtered out;
      - ``"fail"``: the first corrupt payload fails the batch
        (``FAILFAST`` — poison-message stop-the-line).

    TOMBSTONES (null ``value`` — Kafka's deletion marker on compacted
    topics) are NOT corrupt in any mode: they survive as rows with
    null record fields in every mode, including ``fail`` (FAILFAST
    never fires on a null input) and ``drop`` (a deletion marker is
    signal, not noise — dropping it would hide the delete).
    """
    if on_corrupt not in ("null", "drop", "fail"):
        raise ValueError(f"on_corrupt must be null|drop|fail, got {on_corrupt!r}")
    # PERMISSIVE from_json yields an all-null STRUCT for corrupt input
    # (not a null struct), so corruption is only detectable through a
    # columnNameOfCorruptRecord field carried in the parse schema. All
    # three modes share this ONE classification — FAILFAST parse mode
    # would disagree with it on edge inputs (null/empty payloads).
    from pyspark.sql.types import StringType, StructField

    probe = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    parsed = raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.col("value").isNull().alias("_tombstone"),
        F.from_json(
            F.col("value").cast("string"), probe,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("rec"),
        F.col("timestamp").alias("kafka_ts"),
    )
    # corrupt = NON-TOMBSTONE bytes that failed to parse: either the
    # parser kept the raw text in _corrupt_record, or it gave up with
    # a null struct (e.g. empty payload) — but a null VALUE is a
    # deletion marker, not noise, in every mode
    corrupt = ~F.col("_tombstone") & (
        F.col("rec").isNull() | F.col("rec._corrupt_record").isNotNull()
    )
    if on_corrupt == "drop":
        parsed = parsed.filter(~corrupt)
    elif on_corrupt == "fail":
        parsed = parsed.filter(
            F.when(
                corrupt,
                F.raise_error(
                    F.concat(
                        F.lit("corrupt kafka payload (on_corrupt=fail), key="),
                        F.coalesce(F.col("kafka_key"), F.lit("<null>")),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    out_cols = [f.name for f in schema.fields]
    return parsed.select(
        "kafka_key", "kafka_ts", *[F.col(f"rec.{c}").alias(c) for c in out_cols]
    )
