"""Connector availability probe — which catalog/stream connectors
this Spark runtime can actually drive.

The S3/S4/S10/S12 primary branches (Iceberg/Delta catalog scans,
``writeTo().createOrReplace()``, real ``MERGE INTO``) and the S7
Kafka ``.load()`` all need connector JARs that a sandbox may not
ship. Rather than hard-coding the sandbox's absence, every branch is
env-gated at call time AND this probe makes the gate observable as a
single startup answer: it asks the JVM for each connector's
entry-point class, so the moment an environment provides the JAR
(``--packages io.delta:delta-spark...``, a bundled distro, a real
cluster), the primary branches run and the conditional tests
(tests/test_tables.py::test_real_connector_paths) stop skipping — no
code change needed.

Class lookup goes through ``readers.connector_available`` (Spark's
own ``Utils.classForName``, which sees the MutableURLClassLoader that
``--packages`` jars live on — a plain ``Class.forName`` would
false-negative the standard install path). Probing is by class
lookup, not by attempting a write: cheap, side-effect free, and
exactly what Spark itself checks before dispatch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from embeddinghub_spark.sources.readers import (
    _CONNECTOR_PROBE_CLASSES,
    connector_available,
)

_KAFKA_PROBE_CLASS = "org.apache.spark.sql.kafka010.KafkaSourceProvider"


def _kafka_available(spark: SparkSession) -> bool:
    jvm = spark._jvm  # noqa: SLF001
    for probe in (
        lambda: jvm.org.apache.spark.util.Utils.classForName(
            _KAFKA_PROBE_CLASS, False, False
        ),
        lambda: jvm.java.lang.Class.forName(_KAFKA_PROBE_CLASS),
    ):
        try:
            probe()
            return True
        except TypeError:
            continue  # overload mismatch → next probe style
        except Exception:
            return False
    return False


def connector_support(spark: SparkSession) -> dict[str, bool]:
    """{"delta": bool, "iceberg": bool, "kafka": bool} for this
    session's classpath. Memoized per session (test suites call this
    often; the classpath cannot shrink mid-JVM)."""
    cache = getattr(spark, "_eh_connector_support", None)
    if cache is None:
        cache = {
            fmt: connector_available(spark, fmt)
            for fmt in _CONNECTOR_PROBE_CLASSES
        }
        cache["kafka"] = _kafka_available(spark)
        try:
            spark._eh_connector_support = cache
        except Exception:
            pass
    return cache
