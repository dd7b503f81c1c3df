"""Native Delta Lake READ path — no connector JAR required.

S4's primary branch needs the delta-spark connector on the classpath
(`sources/readers.py:read_table`); this module implements the read
side of the PUBLIC Delta transaction-log protocol
(delta-io/delta PROTOCOL.md) directly, so a Delta table AT REST is
readable — including version time travel — in any environment:

- `_delta_log/NNN…N.json` commit files hold one JSON action per line
  (`add` / `remove` / `metaData` / `protocol` / `commitInfo`);
- `NNN…N.checkpoint.parquet` files hold the same actions as parquet
  struct columns, with `_last_checkpoint` pointing at the newest one;
- the table state at version V is the replay of actions ≤ V: active
  files = adds minus later removes (keyed by file path), latest
  `metaData` wins, `schemaString` is a Spark StructType JSON verbatim;
- partition column values live in `add.partitionValues` (serialized
  strings per the spec), NOT in the data files — the reader attaches
  them as typed literal columns per partition group.

Scope (honestly bounded, checked at read time):
- READ-only. Writes still need the connector (or this repo's own
  S10/S12 table fallbacks, which commit via the tmp-rename protocol).
- Reader feature gates: `columnMapping` metadata and
  `deletionVector`-carrying files raise ``NotImplementedError`` — a
  silent wrong read is worse than a loud gap. Everything a
  minReaderVersion=1 table can express is supported.
- Log listing and replay are DRIVER-side (a file-count-bounded dict —
  the exact state the real connector's Snapshot holds); checkpoint
  parquet is read via pyarrow. Local/DBFS-style filesystem paths.

Reference parity anchor: the reference reads Delta through Spark's
connector in `offline_store_spark_runner.py:981-987`; this module is
the connector-less fallback the sandbox gate reports as
`native_delta_log` (`sources/readers.py:read_file`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint(\.\d+\.\d+)?\.parquet$")


class DeltaProtocolError(NotImplementedError):
    """A table uses a reader feature this native path does not
    implement (column mapping, deletion vectors, …). Read it with the
    real connector instead."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def is_delta_table(path: str) -> bool:
    """True iff ``path`` carries a Delta transaction log with at least
    one commit or checkpoint."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return False
    return any(
        _COMMIT_RE.match(f) or _CHECKPOINT_RE.match(f) for f in os.listdir(d)
    )


def delta_versions(path: str) -> list[int]:
    """All commit versions present in the log (ascending). Checkpoint
    versions count even when their JSON commit was vacuumed."""
    d = _log_dir(path)
    vs: set[int] = set()
    for f in os.listdir(d):
        m = _COMMIT_RE.match(f) or _CHECKPOINT_RE.match(f)
        if m:
            vs.add(int(m.group(1)))
    return sorted(vs)


def _read_checkpoint(files: list[str]) -> list[dict]:
    """Checkpoint parquet → the same {action: payload} dicts the JSON
    commits carry (only the action kinds the replay consumes)."""
    import pyarrow.parquet as pq

    actions: list[dict] = []
    for f in sorted(files):
        tbl = pq.read_table(f)
        for row in tbl.to_pylist():
            for kind in ("metaData", "protocol", "add", "remove"):
                payload = row.get(kind)
                if payload is not None:
                    # pyarrow renders map<string,string> as a list of
                    # (key, value) tuples; normalize to dicts
                    for mk in ("partitionValues", "configuration"):
                        mv = payload.get(mk)
                        if isinstance(mv, list):
                            payload[mk] = dict(mv)
                    actions.append({kind: payload})
    return actions


def delta_snapshot(path: str, version: int | None = None) -> dict:
    """Replay the log up to ``version`` (default: latest) and return
    the snapshot state:

    ``{"version": int, "schema": StructType, "partition_columns":
    [str], "files": [{"path": str, "partitionValues": {str: str|None}}]}``

    Raises ``DeltaProtocolError`` on column mapping / deletion
    vectors, ``ValueError`` on an unknown or vacuumed-away version.
    """
    d = _log_dir(path)
    if not os.path.isdir(d):
        raise ValueError(f"not a Delta table (no _delta_log): {path}")
    commits: dict[int, str] = {}
    checkpoints: dict[int, list[str]] = {}
    for f in os.listdir(d):
        m = _COMMIT_RE.match(f)
        if m:
            commits[int(m.group(1))] = os.path.join(d, f)
            continue
        m = _CHECKPOINT_RE.match(f)
        if m:
            checkpoints.setdefault(int(m.group(1)), []).append(
                os.path.join(d, f)
            )
    if not commits and not checkpoints:
        raise ValueError(f"empty Delta log: {path}")
    latest = max(list(commits) + list(checkpoints))
    target = latest if version is None else int(version)
    if target < 0 or target > latest:
        raise ValueError(
            f"version {target} out of range [0, {latest}] for {path}"
        )
    ckpt_version = max(
        (v for v in checkpoints if v <= target), default=None
    )
    replay_from = 0 if ckpt_version is None else ckpt_version + 1
    missing = [
        v for v in range(replay_from, target + 1) if v not in commits
    ]
    if missing:
        raise ValueError(
            f"log is missing commits {missing} for version {target} "
            f"(vacuumed past the last checkpoint?): {path}"
        )

    meta: dict | None = None
    protocol: dict | None = None
    adds: dict[str, dict] = {}

    def apply(action: dict) -> None:
        nonlocal meta, protocol
        if "metaData" in action and action["metaData"]:
            meta = action["metaData"]
        elif "protocol" in action and action["protocol"]:
            protocol = action["protocol"]
        elif "add" in action and action["add"]:
            a = action["add"]
            adds[a["path"]] = a
        elif "remove" in action and action["remove"]:
            adds.pop(action["remove"]["path"], None)

    if ckpt_version is not None:
        for action in _read_checkpoint(checkpoints[ckpt_version]):
            apply(action)
    for v in range(replay_from, target + 1):
        with open(commits[v], encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    apply(json.loads(line))

    if meta is None:
        raise ValueError(f"no metaData action in log: {path}")
    conf = meta.get("configuration") or {}
    cm = conf.get("delta.columnMapping.mode")
    if cm and cm != "none":
        raise DeltaProtocolError(
            f"columnMapping mode {cm!r} not supported by the native "
            "log reader — use the delta-spark connector"
        )
    for a in adds.values():
        if a.get("deletionVector"):
            raise DeltaProtocolError(
                "table carries deletion vectors — use the delta-spark "
                "connector"
            )
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    return {
        "version": target,
        "schema": schema,
        "partition_columns": list(meta.get("partitionColumns") or []),
        "files": [
            {
                "path": a["path"],
                "partitionValues": dict(a.get("partitionValues") or {}),
            }
            for a in adds.values()
        ],
        "protocol": protocol or {},
    }


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table at rest via the native log replay (module
    docstring). ``version`` is `versionAsOf` time travel.

    Plan shape: one parquet scan per PARTITION GROUP (files sharing a
    partitionValues assignment read in a single multi-path scan with
    the partition columns attached as typed literals), unioned. An
    unpartitioned table is exactly one scan — identical to the
    connector's plan. Partition-heavy tables fan out one scan per
    partition; filters on partition literals constant-fold, so
    Catalyst prunes unselected partitions to empty scans.
    """
    snap = delta_snapshot(path, version)
    schema: T.StructType = snap["schema"]
    pcols: list[str] = snap["partition_columns"]
    data_schema = T.StructType(
        [f for f in schema.fields if f.name not in pcols]
    )
    ptypes = {f.name: f.dataType for f in schema.fields if f.name in pcols}
    if not snap["files"]:
        return spark.createDataFrame([], schema)

    groups: dict[tuple, list[str]] = {}
    for f in snap["files"]:
        key = tuple(
            sorted(f["partitionValues"].items(), key=lambda t: t[0])
        )
        groups.setdefault(key, []).append(os.path.join(path, f["path"]))

    out: DataFrame | None = None
    # None-safe deterministic group order (a NULL partition value is
    # legal and must not crash the tuple sort)
    for key, files in sorted(groups.items(), key=lambda kv: str(kv[0])):
        part = spark.read.schema(data_schema).parquet(*sorted(files))
        for col, val in key:
            lit = (
                F.lit(None) if val is None else F.lit(val)
            ).cast(ptypes[col])
            part = part.withColumn(col, lit)
        part = part.select(*[f.name for f in schema.fields])
        out = part if out is None else out.unionByName(part)
    return out
