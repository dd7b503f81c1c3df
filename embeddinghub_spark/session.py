"""SparkSession factory with scale-oriented defaults.

The reference's Spark runner sets its session configs in
``provider/scripts/spark/offline_store_spark_runner.py:1393-1406``
(vectorized reader *disabled*, TIMESTAMP_MILLIS output, rebase
CORRECTED). We re-enable vectorization (modern Spark handles the type
issues that motivated the disable) and keep millisecond parquet output
for byte-parity with reference exports — see SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "embeddinghub_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults are sized by env: ``SPARK_GRAFT_CPUS`` (local cores).
    On a real cluster the same code runs unchanged — AQE picks
    shuffle parallelism at runtime, so ``shuffle_partitions`` is only
    the pre-AQE ceiling.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # Connector opt-in (S3/S4/S10/S12 primary branches + S7 Kafka):
    # EH_SPARK_CONNECTOR_PACKAGES holds Maven coordinates that Spark
    # resolves at session start, e.g.
    #   EH_SPARK_CONNECTOR_PACKAGES="io.delta:delta-spark_2.13:4.0.0,org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0"
    # With it set, connector_support() lights up and the conditional
    # tests (test_real_connector_paths) run instead of skipping — the
    # real createOrReplace / MERGE INTO / Kafka .load() paths execute.
    # Unset (the default in JAR-less sandboxes) nothing changes.
    packages = os.environ.get("EH_SPARK_CONNECTOR_PACKAGES", "").strip()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r16 optimization round): shuffled-hash-join preference
        # (preferSortMergeJoin=false + AQE localMap rewrite), a 64 MB
        # broadcast threshold, and a 256 MB advisory partition size
        # were each A/B'd and are deliberately NOT set. A fixed-order
        # A/B first showed SHJ -14%; a strict ALTERNATING-order rerun
        # (8 reps, join-heavy set) showed dead-even medians and mins
        # (8.90 vs 8.95 s / 5.99 vs 6.01 s) — the "win" was box drift
        # correlated with config order, as were the apparent wins for
        # the other two (both measured WORSE once alternated: +23%,
        # +11%). Defaults stay; see OPTIMIZATION_r16.md.
        # Arrow for any pandas-UDF path (the only sanctioned Python hot path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Reference writes TIMESTAMP_MILLIS parquet (runner :1399-1404);
        # keep for export parity. We *read* at full precision.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        # UTC everywhere: the reference normalizes to UTC at ingest.
        .config("spark.sql.session.timeZone", "UTC")
        # 128 MB scan splits — matches the reference's 128 MB partition
        # sizing heuristic (runner :617-660) and parquet row-group norms.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if packages:
        builder = builder.config("spark.jars.packages", packages)
        if "delta" in packages:
            # Delta needs its Catalyst extension + catalog wired at
            # session build time; set only when the JAR is coming so
            # JAR-less sessions never reference a missing class
            builder = builder.config(
                "spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension",
            ).config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
