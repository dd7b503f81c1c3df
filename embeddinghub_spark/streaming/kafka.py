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


def kafka_records(raw: DataFrame, schema: StructType) -> DataFrame:
    """Project a raw kafka frame (key/value/timestamp/...) into the
    declared record schema + kafka metadata columns."""
    parsed = raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        parse_kafka_value(F.col("value"), schema).alias("rec"),
        F.col("timestamp").alias("kafka_ts"),
    )
    return parsed.select("kafka_key", "kafka_ts", "rec.*")
