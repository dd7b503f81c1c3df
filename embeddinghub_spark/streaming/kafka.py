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
    """
    if on_corrupt not in ("null", "drop", "fail"):
        raise ValueError(f"on_corrupt must be null|drop|fail, got {on_corrupt!r}")
    if on_corrupt == "fail":
        parsed = raw.select(
            F.col("key").cast("string").alias("kafka_key"),
            F.from_json(
                F.col("value").cast("string"), schema, {"mode": "FAILFAST"}
            ).alias("rec"),
            F.col("timestamp").alias("kafka_ts"),
        )
        return parsed.select("kafka_key", "kafka_ts", "rec.*")
    # PERMISSIVE from_json yields an all-null STRUCT for corrupt input
    # (not a null struct), so corruption is only detectable through a
    # columnNameOfCorruptRecord field carried in the parse schema
    from pyspark.sql.types import StringType, StructField

    probe = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    parsed = raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.from_json(
            F.col("value").cast("string"), probe,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("rec"),
        F.col("timestamp").alias("kafka_ts"),
    )
    corrupt = F.col("rec").isNull() | F.col("rec._corrupt_record").isNotNull()
    if on_corrupt == "drop":
        parsed = parsed.filter(~corrupt)
    out_cols = [f.name for f in schema.fields]
    return parsed.select(
        "kafka_key", "kafka_ts", *[F.col(f"rec.{c}").alias(c) for c in out_cols]
    )
