"""Primary-data scans (SURVEY §2.1 S1-S5).

Reference: ``offline_store_spark_runner.py:1009-1026`` (CSV/parquet),
``:965-987`` (catalog tables), ``:1049-1109`` (incremental).

All readers return plain DataFrames; predicate pushdown / column
pruning / partition pruning are Catalyst's job — we never pre-collect.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark's reader
    rejects those outright (PARQUET_TYPE_ILLEGAL), so we must read
    them as longs and convert. Footer sniff via pyarrow (same trick
    the reference uses for schema inference, provider/iterators.go:30-91)."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = path
        if os.path.isdir(p):
            cands = sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
            if not cands:
                return []
            p = cands[0]
        sch = pq.read_schema(p)
        return [
            n
            for n in sch.names
            if pa.types.is_timestamp(sch.field(n).type) and sch.field(n).type.unit == "ns"
        ]
    except Exception:
        return []


def _parse_ts_ms(raw: str) -> int:
    """timestampAsOf value → epoch millis: a digit string is epoch
    millis verbatim; anything else parses as an ISO timestamp read as
    UTC (naive timestamps get UTC attached — commit times are absolute
    and a session-tz-dependent parse would resolve to different
    versions on different boxes)."""
    from datetime import datetime, timezone

    s = str(raw).strip()
    if s.isdigit():
        return int(s)
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def read_file(
    spark: SparkSession, path: str, fmt: str = "parquet", **options: str
) -> DataFrame:
    """S1/S2: file scan, header'd CSV, corrupt-file tolerant, recursive
    (runner :1009-1026).

    Parquet TIMESTAMP(NANOS) columns are read via the nanosAsLong
    escape hatch and truncated to microseconds (Spark's native
    timestamp precision) — semantics identical to a ns→us cast.
    """
    fmt = fmt.lower()
    if fmt == "delta":
        # S4 path form: with the connector, the format reader (so
        # versionAsOf/timestampAsOf apply); without it, the NATIVE
        # transaction-log replay (sources/delta_log.py — the public
        # PROTOCOL.md read side, versionAsOf AND timestampAsOf
        # supported, the latter by commit-file mtime per the plain-
        # table protocol rule) instead of
        # silently misreading the directory as bare parquet (which
        # would resurrect removed files and drop partition columns).
        from embeddinghub_spark.observability import record_branch

        if connector_available(spark, "delta"):
            reader = spark.read.format("delta")
            for k, v in options.items():
                reader = reader.option(k, v)
            record_branch("read_file", "format_delta", path)
            return reader.load(path)
        from embeddinghub_spark.sources.delta_log import (
            delta_version_at,
            read_delta,
        )

        version = options.get("versionAsOf")
        ts_raw = options.get("timestampAsOf")
        unsupported = sorted(
            set(options) - {"versionAsOf", "timestampAsOf"}
        )
        if unsupported:
            raise ValueError(
                f"native delta log reader supports versionAsOf/"
                f"timestampAsOf only; got {unsupported} (install the "
                "delta-spark connector for the full option surface)"
            )
        if version is not None and ts_raw is not None:
            raise ValueError(
                "pass versionAsOf or timestampAsOf, not both"
            )
        if ts_raw is not None:
            # epoch millis, or an ISO timestamp read as UTC (the
            # protocol stamps commits in absolute time; a session-tz
            # dependent parse would time-travel differently per box)
            version = delta_version_at(path, _parse_ts_ms(ts_raw))
        record_branch("read_file", "native_delta_log", path)
        return read_delta(
            spark, path, None if version is None else int(version)
        )
    if fmt == "iceberg":
        # S3 path form, same dispatch discipline as Delta: connector
        # if present (full option surface), else the NATIVE metadata/
        # manifest replay (sources/iceberg_meta.py — the public table
        # spec read side, snapshot-id / as-of-timestamp supported)
        # instead of silently misreading the directory as bare parquet
        # (which would read dead files from every historical snapshot).
        from embeddinghub_spark.observability import record_branch

        if connector_available(spark, "iceberg"):
            reader = spark.read.format("iceberg")
            for k, v in options.items():
                reader = reader.option(k, v)
            record_branch("read_file", "format_iceberg", path)
            return reader.load(path)
        from embeddinghub_spark.sources.iceberg_meta import read_iceberg

        snap_id = options.get("snapshot-id")
        as_of = options.get("as-of-timestamp")
        branch = options.get("branch") or options.get("tag")
        unsupported = sorted(
            set(options)
            - {"snapshot-id", "as-of-timestamp", "branch", "tag"}
        )
        if unsupported:
            raise ValueError(
                f"native iceberg reader supports snapshot-id/"
                f"as-of-timestamp/branch/tag only; got {unsupported} "
                "(install the "
                "iceberg-spark connector for the full option surface)"
            )
        record_branch("read_file", "native_iceberg_meta", path)
        return read_iceberg(
            spark,
            path,
            None if snap_id is None else int(snap_id),
            None if as_of is None else int(as_of),
            ref=branch,
        )
    if fmt == "parquet":
        ns_cols = _nanos_ts_columns(path)
        if ns_cols:
            # scope the legacy conf to this read: the DataFrame's scan
            # captures the conf at analysis time, so restoring after
            # the reader is built leaves other parquet reads unaffected
            prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            try:
                df = (
                    spark.read.option("recursiveFileLookup", "true")
                    .option("ignoreCorruptFiles", "true")
                    .parquet(path)
                )
            finally:
                if prev is None:
                    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
                else:
                    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
            for c in ns_cols:
                # pure NTZ arithmetic: wall-clock-preserving under ANY
                # session timezone (timestamp_micros() would interpret
                # the long as a UTC instant and shift the rendering).
                df = df.withColumn(
                    c,
                    F.expr(
                        f"timestampadd(MICROSECOND, `{c}` DIV 1000, "
                        f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                    ),
                )
            return df
    reader = spark.read
    if fmt == "csv":
        reader = (
            reader.option("header", options.pop("header", "true"))
            .option("inferSchema", options.pop("inferSchema", "true"))
            .option("recursiveFileLookup", "true")
            .option("ignoreCorruptFiles", "true")
            .option("mode", "PERMISSIVE")
        )
    elif fmt == "json":
        # json is a first-class PrimaryData file format in the
        # reference (filestore/filepath.go:37-43); same tolerance
        # posture as csv — malformed records land in PERMISSIVE's
        # corrupt-record column instead of failing the scan
        reader = (
            reader.option("recursiveFileLookup", "true")
            .option("ignoreCorruptFiles", "true")
            .option("mode", "PERMISSIVE")
        )
    elif fmt in ("parquet", "orc"):
        # orc is Spark-native (no connector JAR) — same tolerance
        # posture as parquet; rounds out the columnar file formats a
        # data-lake PrimaryData pointer can name
        reader = reader.option("recursiveFileLookup", "true").option(
            "ignoreCorruptFiles", "true"
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def read_table(
    spark: SparkSession, table: str, fmt: str | None = None, **options: str
) -> DataFrame:
    """S3/S4: catalog table scan (runner :965-987 Iceberg, :981-987
    Delta).

    With ``fmt`` in {"iceberg", "delta"} and the connector installed
    (spark.jars.packages + catalog extension), the format reader is
    used so format options apply — e.g. time travel
    (``snapshot-id``/``as-of-timestamp`` for Iceberg,
    ``versionAsOf``/``timestampAsOf`` for Delta — the basis of the S5
    CDF path). Without the connector, falls back to the session catalog,
    which resolves any table its extensions know about; plain tables
    always work.
    """
    from embeddinghub_spark.observability import record_branch

    if fmt in ("iceberg", "delta"):
        # format(...).table(...) resolves lazily through the catalog and
        # does NOT fail when the connector JAR is missing — it silently
        # reads the session-catalog table, dropping the format options.
        # Probe the connector class explicitly so the branch taken is
        # the branch reported.
        if connector_available(spark, fmt):
            reader = spark.read.format(fmt)
            for k, v in options.items():
                reader = reader.option(k, v)
            record_branch("read_table", f"format_{fmt}", table)
            return reader.table(table)
        record_branch(
            "read_table", "session_catalog",
            f"{table}: {fmt} connector JAR absent — format options "
            f"({', '.join(options) or 'none'}) IGNORED",
        )
    else:
        record_branch("read_table", "session_catalog", table)
    return spark.table(table)


_CONNECTOR_PROBE_CLASSES = {
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
}


def connector_available(spark: SparkSession, fmt: str) -> bool:
    """True iff the connector's DataSource class is loadable.

    Probes through Spark's own ``Utils.classForName`` (context-or-Spark
    classloader) first: jars installed the normal way — ``--packages``/
    ``spark.jars`` — live on Spark's MutableURLClassLoader, which the
    system classloader that backs a plain ``Class.forName`` cannot see
    (a plain probe would false-negative exactly the standard install
    path; found in review). Falls back to ``Class.forName`` only if
    the internal API moves."""
    cls = _CONNECTOR_PROBE_CLASSES.get(fmt)
    if cls is None:
        return False
    jvm = spark._jvm  # noqa: SLF001
    try:
        jvm.org.apache.spark.util.Utils.classForName(cls, False, False)
        return True
    except TypeError:
        pass  # overload mismatch on this Spark build → plain probe
    except Exception:
        return False
    try:
        jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def read_primary(spark: SparkSession, src) -> DataFrame:
    """Dispatch a SourceVariant's PrimaryData oneof (metadata.proto:631-655)."""
    if src.path is not None:
        return read_file(spark, src.path, src.fmt, **dict(src.options))
    if src.table is not None:
        fmt = src.fmt if src.fmt in ("iceberg", "delta") else None
        return read_table(spark, src.table, fmt, **dict(src.options))
    raise ValueError(f"source {src.name}.{src.variant} has no primary location")


def read_incremental(
    df: DataFrame, timestamp_column: str, last_run_ts
) -> DataFrame:
    """S5: watermark-incremental read — only rows strictly after the
    previous high-watermark.

    The reference uses Delta CDF (runner :1049-1109,
    ``get_incremental_delta_records``) and errors on overwrites; the
    engine-native equivalent is a high-watermark filter, which Catalyst
    pushes into the parquet scan (shows up as PushedFilters), so an
    incremental run touches only row groups with newer stats.

    CAVEAT: if ``df`` came through ``read_file``'s TIMESTAMP(NANOS)
    escape hatch, the timestamp column is a DERIVED expression and the
    predicate cannot reach the scan — use ``read_incremental_path``
    for those sources (it filters in raw int64 space first).
    """
    if last_run_ts is None:
        return df
    return df.filter(F.col(timestamp_column) > F.lit(last_run_ts))


def read_incremental_path(
    spark: SparkSession,
    path: str,
    timestamp_column: str,
    last_run_ts,
    fmt: str = "parquet",
    **options: str,
) -> DataFrame:
    """S5 with guaranteed pushdown for TIMESTAMP(NANOS) parquet: the
    watermark comparison happens on the raw int64 nanos BEFORE the
    ns→us conversion, so it lands in PushedFilters and prunes row
    groups by column stats — the property that makes an incremental
    run touch only new data at 100 TB. Non-nanos sources defer to the
    plain filter (which pushes on its own).
    """
    if last_run_ts is None:
        return read_file(spark, path, fmt, **options)
    ns_cols = _nanos_ts_columns(path) if fmt.lower() == "parquet" else []
    if timestamp_column not in ns_cols:
        return read_incremental(
            read_file(spark, path, fmt, **options), timestamp_column, last_run_ts
        )
    import calendar
    from datetime import datetime

    if isinstance(last_run_ts, datetime):
        wm_ns = int(
            calendar.timegm(last_run_ts.timetuple()) * 1_000_000_000
            + last_run_ts.microsecond * 1_000
        )
    else:
        wm_ns = int(last_run_ts)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        raw = (
            spark.read.option("recursiveFileLookup", "true")
            .option("ignoreCorruptFiles", "true")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    # Raw-nanos predicate: lands in PushedFilters → row-group pruning.
    # It is deliberately conservative — a row with nanos in
    # (wm, wm+999] passes here yet truncates to exactly the watermark
    # microsecond, which would violate the `ts > last_run_ts` contract
    # on the returned (microsecond) frame — so an exact post-conversion
    # filter is ANDed below. Pruning still comes from this one.
    filtered = raw.filter(F.col(timestamp_column) > F.lit(wm_ns))
    for c in ns_cols:
        filtered = filtered.withColumn(
            c,
            F.expr(
                f"timestampadd(MICROSECOND, `{c}` DIV 1000, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    # exact boundary: compare at Spark's native microsecond precision
    wm_us = wm_ns // 1000
    filtered = filtered.filter(
        F.col(timestamp_column)
        > F.expr(
            f"timestampadd(MICROSECOND, {wm_us}, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
    )
    return filtered


def high_watermark(df: DataFrame, timestamp_column: str):
    """Current watermark for the next incremental run (max ts)."""
    row = df.agg(F.max(timestamp_column).alias("wm")).collect()[0]
    return row["wm"]


# -- S5 incremental run state + overwrite detection ---------------------------


class OverwriteDetected(RuntimeError):
    """The source regressed between incremental runs. The reference's
    CDF path raises when the Delta log shows an overwrite/delete
    commit (runner :1049-1109 — incremental semantics are only sound
    over append-only history); the path-native equivalent detects the
    same condition from recorded (row_count, high_watermark)."""


def incremental_run_state(df: DataFrame, timestamp_column: str) -> dict:
    """One-pass state snapshot to persist after an incremental run."""
    row = df.agg(
        F.count("*").alias("n"), F.max(timestamp_column).alias("wm")
    ).collect()[0]
    wm = row["wm"]
    return {
        "row_count": row["n"],
        "high_watermark": None if wm is None else wm.isoformat(),
    }


def check_incremental_state(df: DataFrame, timestamp_column: str, prev: dict) -> dict:
    """Validate append-only history against the previous run's state
    and return the new state. Raises OverwriteDetected when rows
    disappeared or the watermark moved BACKWARD — both impossible
    under append-only writes, both silently corrupting incremental
    consumers if ignored (rows in the rewritten range would never be
    re-delivered)."""
    from datetime import datetime

    cur = incremental_run_state(df, timestamp_column)
    if prev:
        if cur["row_count"] < prev.get("row_count", 0):
            raise OverwriteDetected(
                f"source shrank: {prev['row_count']} -> {cur['row_count']} rows; "
                "incremental reads require append-only history"
            )
        prev_wm = prev.get("high_watermark")
        if prev_wm and (
            cur["high_watermark"] is None
            or datetime.fromisoformat(cur["high_watermark"])
            < datetime.fromisoformat(prev_wm)
        ):
            raise OverwriteDetected(
                f"high watermark regressed: {prev_wm} -> {cur['high_watermark']}"
            )
    return cur
