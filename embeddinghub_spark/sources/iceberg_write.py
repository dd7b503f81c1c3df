"""Native Apache Iceberg table WRITE path — no connector JAR required.

The write-side twin of ``sources/iceberg_meta.py`` (S10-Iceberg; the
reference writes Iceberg through Spark's connector,
``offline_store_spark_runner.py:920-949``), built the way the native
Delta writer was: everything here is the PUBLIC Iceberg table spec
(iceberg.apache.org/spec), format version 2, filesystem catalog.

What a commit writes:
- data files staged by Spark's parquet writer, moved into
  ``data/`` under fresh uuid names (record counts/sizes from the
  parquet footers);
- one MANIFEST (Avro) of ADDED entries — the spec's v2
  ``manifest_entry`` record with Iceberg's exact ``field-id``
  annotations in the Avro schema, null entry sequence numbers
  (ADDED entries inherit the manifest-list row's sequence number),
  and the required header metadata (``schema``, ``partition-spec``,
  ``partition-spec-id``, ``content``, ``format-version``);
- one MANIFEST LIST (Avro): the previous snapshot's rows carried
  forward (append) or dropped (overwrite) plus the new manifest's row
  with the snapshot's sequence number;
- a new ``v<N>.metadata.json`` committed PUT-IF-ABSENT (staged file +
  ``os.link`` — the same local-FS atomicity discipline as the Delta
  writer; losing a race re-reads and retries), then
  ``version-hint.text`` advances (best-effort — readers fall back to
  the max metadata version).

Interop posture: data files are written WITHOUT parquet field-id
metadata (Spark's writer doesn't emit it), so every commit publishes
the ``schema.name-mapping.default`` table property mapping each
field-id to its column name — the spec's sanctioned way to read
field-id-free files; this repo's reader resolves renames through the
same property. Cross-validation against the real iceberg-spark
connector needs the JAR and is environment-gated (the Avro layer
itself is cross-validated against the Java Avro library in tests).

Partitioning: IDENTITY transforms are in scope — ``partition_by``
writes one identity spec field per column, stages through Spark's
``partitionBy`` (hive layout; the stripped source columns are
recovered by the spec's column projection rule from the manifest
entry's TYPED partition struct — ``read_iceberg`` implements it, and
manifest-level partition pruning keys on the same values). Honest
bounds (raise, never silently miswrite): non-identity transforms
(bucket/truncate/days/…) and float/double/temporal partition columns
gate toward the connector; flat schemas of primitives, decimals and
lists-of-primitives (struct/map columns gate); append, overwrite and
file-grain copy-on-write (``carry_files`` — what ``merge_iceberg``
uses to rewrite only the files a source key touches).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from embeddinghub_spark.sources.avro_io import read_avro_file, write_avro_file
from embeddinghub_spark.sources.parquet_stats import column_bounds
from embeddinghub_spark.sources.iceberg_meta import (
    _OBJ_META_RE,
    _V_META_RE,
    IcebergProtocolError,
    encode_bound,
    is_iceberg_table,
)


# the spec's write.metadata.metrics.default = truncate(16): manifest
# string bounds store at most this many code points (lower = prefix,
# upper = prefix incremented)
_MANIFEST_STRING_PREFIX = 16


def _max_metadata_version(meta_dir: str) -> tuple[int, str] | None:
    """(version, abs path) of the HIGHEST metadata file present —
    commit attempts derive the next version from this, never from
    ``version-hint.text`` (a racing writer can leave the hint stale,
    and a stale base would make every retry re-claim the same taken
    version)."""
    best: tuple[int, str] | None = None
    for f in os.listdir(meta_dir):
        m = _V_META_RE.match(f) or _OBJ_META_RE.match(f)
        if m:
            key = (int(m.group(1)), f)
            if best is None or key > best:
                best = key
    if best is None:
        return None
    return best[0], os.path.join(meta_dir, best[1])


class IcebergWriteError(RuntimeError):
    """A commit attempt failed permanently (schema mismatch, lost
    race beyond retries, unsupported shape)."""


# --------------------------------------------------------------- type mapping

_SPARK_TO_ICE: dict[str, str] = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "string": "string",
    "binary": "binary",
    "timestamp_ntz": "timestamp",   # wall clock, no zone
    "timestamp": "timestamptz",     # instant
}


def _ice_type(dt: T.DataType, next_id: list[int]) -> Any:
    """Spark → Iceberg type (the inverse of iceberg_meta._to_spark_type
    for the supported subset). ``next_id`` is the running column-id
    counter (list element ids consume one)."""
    name = dt.typeName()
    if name in _SPARK_TO_ICE:
        return _SPARK_TO_ICE[name]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        if isinstance(dt.elementType, (T.ArrayType, T.MapType, T.StructType)):
            raise IcebergProtocolError(
                "nested non-primitive list elements not supported by "
                "the native Iceberg writer — use the connector"
            )
        eid = next_id[0]
        next_id[0] += 1
        return {
            "type": "list",
            "element-id": eid,
            "element": _ice_type(dt.elementType, next_id),
            "element-required": not dt.containsNull,
        }
    raise IcebergProtocolError(
        f"Spark type {dt.simpleString()} not supported by the native "
        "Iceberg writer — use the connector"
    )


def _ice_schema(schema: T.StructType, schema_id: int = 0) -> dict:
    """Iceberg struct schema with field-ids 1..N assigned in column
    order (list element ids follow after the top-level block)."""
    next_id = [len(schema.fields) + 1]
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        fields.append(
            {
                "id": i,
                "name": f.name,
                "required": not f.nullable,
                "type": _ice_type(f.dataType, next_id),
            }
        )
    return {
        "type": "struct",
        "schema-id": schema_id,
        "fields": fields,
        "_last_column_id": next_id[0] - 1,
    }


def _type_sans_ids(t: Any) -> Any:
    """A type json with its embedded ids stripped — the structural
    identity two schema versions must share for a column name to keep
    its field-id (only flat lists carry a nested id here: the writer
    gates out nested structs/maps)."""
    if isinstance(t, dict):
        return {k: v for k, v in t.items() if k != "element-id"}
    return t


def _name_mapping_json(ice_schema: dict) -> str:
    return json.dumps(
        [
            {"field-id": f["id"], "names": [f["name"]]}
            for f in ice_schema["fields"]
        ]
    )


# ------------------------------------------------------- spec Avro schemas

_ICE_TO_AVRO: dict[str, str] = {
    "long": "long",
    "int": "int",
    "string": "string",
    "boolean": "boolean",
    "double": "double",
    "float": "float",
}


def _bounds_avro_field(name: str, fid: int, kid: int, vid: int) -> dict:
    """Iceberg encodes map<int, binary> bound maps as Avro ARRAYS of
    key/value records (the spec's non-string-key map form)."""
    return {
        "name": name,
        "field-id": fid,
        "default": None,
        "type": [
            "null",
            {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": f"k{kid}_v{vid}",
                    "fields": [
                        {"name": "key", "type": "int", "field-id": kid},
                        {"name": "value", "type": "bytes",
                         "field-id": vid},
                    ],
                },
            },
        ],
    }


def _manifest_entry_schema(partition_fields: list | None = None) -> dict:
    """The v2 ``manifest_entry`` Avro record with the spec's exact
    field-id annotations (spec §Manifests) for the fields this writer
    emits — including the ``lower_bounds``/``upper_bounds`` stat maps
    (125-127 / 128-130) that manifest-level range pruning keys on;
    other optional stats columns are omitted (nullable in the spec,
    absent fields simply don't appear in the schema).
    ``partition_fields`` — [(name, iceberg_primitive, field_id)] —
    types the partition struct for identity-partitioned tables; the
    default is the spec's empty struct (unpartitioned)."""
    part_fields = [
        {"name": n, "type": ["null", _ICE_TO_AVRO[t]],
         "default": None, "field-id": fid}
        for n, t, fid in (partition_fields or [])
    ]
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int",
                         "field-id": 134},
                        {"name": "file_path", "type": "string",
                         "field-id": 100},
                        {"name": "file_format", "type": "string",
                         "field-id": 101},
                        {
                            "name": "partition",
                            "field-id": 102,
                            # unpartitioned: the spec's empty struct
                            "type": {"type": "record", "name": "r102",
                                     "fields": part_fields},
                        },
                        {"name": "record_count", "type": "long",
                         "field-id": 103},
                        {"name": "file_size_in_bytes", "type": "long",
                         "field-id": 104},
                        _bounds_avro_field("lower_bounds", 125, 126, 127),
                        _bounds_avro_field("upper_bounds", 128, 129, 130),
                        {"name": "equality_ids",
                         "type": ["null", {"type": "array",
                                           "items": "int",
                                           "element-id": 136}],
                         "default": None, "field-id": 135},
                    ],
                },
            },
        ],
    }


def _manifest_list_schema() -> dict:
    """The v2 ``manifest_file`` Avro record (spec §Manifest Lists),
    required fields only, exact field-ids."""
    return {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long",
             "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int",
             "field-id": 505},
            {"name": "deleted_files_count", "type": "int",
             "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long",
             "field-id": 513},
            {"name": "deleted_rows_count", "type": "long",
             "field-id": 514},
        ],
    }


# ------------------------------------------------------------ atomic commit

def _atomic_put(final_path: str, payload: str) -> bool:
    """Put-if-absent via staged write + ``os.link`` (the Delta
    writer's local-FS atomicity discipline): True on claim, False if
    another writer owns the path."""
    tmp = f"{final_path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(payload)
    try:
        os.link(tmp, final_path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


# ----------------------------------------------------------------- the writer

def write_iceberg(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    partition_by: list[str] | None = None,
    properties: dict[str, str] | None = None,
    max_commit_retries: int = 10,
    expected_snapshot_id: int | None = None,
    carry_files: list[dict] | None = None,
    merge_schema: bool = False,
    operation: str | None = None,
    position_deletes: list[tuple] | None = None,
    equality_deletes: list[tuple] | None = None,
    trust_required: bool = False,
) -> int:
    """Commit ``df`` to an Iceberg v2 table at ``path`` (filesystem
    catalog). Returns the committed SNAPSHOT ID. See the module
    docstring for the protocol pieces and honest bounds; appends
    validate the schema against the table's current schema by
    name+type and raise on mismatch (never silently widen).

    ``partition_by`` writes an IDENTITY-partitioned table: the spec
    gets one identity field per column, data files stage through
    Spark's ``partitionBy`` (hive layout — the partition source
    columns are stripped from the files, which the spec's column
    projection rule sanctions: readers recover identity values from
    the manifest entry's TYPED partition struct, exactly what
    ``read_iceberg`` does — and what manifest-level pruning keys on).
    Identity transforms only; long/int/string/boolean partition
    column types (hive dir values round-trip losslessly); the
    partition spec of an existing table must match.

    ``expected_snapshot_id`` is the optimistic-concurrency handle for
    READ-MODIFY-WRITE callers (``merge_iceberg``): when set, a commit
    attempt against any other current snapshot raises
    ``IcebergWriteError`` instead of retrying — a retried overwrite
    built from a stale snapshot would drop the concurrent writer's
    rows (the same hazard ``merge_delta`` guards with
    ``expected_version``).

    ``carry_files`` (overwrite only) is the FILE-GRAIN copy-on-write
    handle (``merge_iceberg``): each dict ({path, rows, size,
    partition, bounds, seq, snapshot_id}) becomes an EXISTING entry in
    the new snapshot's manifest — same data file, original sequence
    number carried explicitly per the spec, bounds re-encoded — so the
    commit's data writes are proportional to the REWRITTEN files, not
    the table.

    ``merge_schema=True`` (append only) is Spark's ``mergeSchema`` on
    the spec's own terms: NEW nullable columns join the schema with
    FRESH field-ids above everything the table ever issued (ids are
    permanent), the commit appends a new schema version + advances
    ``current-schema-id`` + republishes the name mapping, and the
    DataFrame may OMIT nullable table columns (files read missing
    columns as NULL by name). Shared names must match by type; adding
    a non-nullable column, or omitting a REQUIRED table column,
    raises."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if carry_files is not None and mode != "overwrite":
        raise ValueError("carry_files requires mode='overwrite'")
    if equality_deletes is not None:
        # the CDC upsert handle (upsert_iceberg_cdc): each tuple is
        # (abs_path, rows, size, partition_dict, equality_field_ids)
        # of an equality-delete parquet, committed as content=2
        # entries of the same delete manifest the append carries —
        # the delete (seq S, kills data seq < S) and the new rows
        # (seq S, survive their own commit) land atomically
        if mode != "append":
            raise ValueError(
                "equality_deletes requires mode='append'"
            )
        if expected_snapshot_id is None:
            raise ValueError(
                "equality_deletes requires expected_snapshot_id"
            )
    if position_deletes is not None:
        # the MoR UPDATE handle (update_iceberg(strategy="mor")): each
        # tuple is (abs_path, rows, size, partition_dict) of a sorted
        # position-delete parquet already on disk; the commit appends
        # ONE content=1 delete manifest alongside the staged data —
        # atomically, because two commits would expose the updated
        # rows twice
        if mode != "append":
            raise ValueError("position_deletes requires mode='append'")
        if expected_snapshot_id is None:
            raise ValueError(
                "position_deletes requires expected_snapshot_id "
                "(row-deltas are read-modify-write by construction)"
            )
    if carry_files is not None and expected_snapshot_id is None:
        # ADVICE r15: an unpinned carry commit computed against a stale
        # snapshot could re-reference files a concurrent writer removed
        # — the same hazard write_delta guards by requiring
        # expected_version with replace_paths. Enforce the invariant
        # rather than trusting every caller to remember it.
        raise ValueError(
            "carry_files requires expected_snapshot_id (pin the "
            "snapshot the carry list was computed from)"
        )
    if operation is not None and operation not in (
        "append", "replace", "overwrite", "delete"
    ):
        raise ValueError(
            "operation must be one of the spec's snapshot operations "
            f"(append|replace|overwrite|delete), got {operation!r}"
        )
    partition_by = list(partition_by or [])
    path = os.path.realpath(os.path.abspath(path))
    meta_dir = os.path.join(path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    ice_schema = _ice_schema(df.schema)
    last_column_id = ice_schema.pop("_last_column_id")
    fid_by_name = {f["name"]: f["id"] for f in ice_schema["fields"]}
    type_by_name = {f["name"]: f["type"] for f in ice_schema["fields"]}
    for c in partition_by:
        if c not in fid_by_name:
            raise ValueError(f"partition_by column {c!r} not in DataFrame")
        t = type_by_name[c]
        if not (
            isinstance(t, str)
            and t in _ICE_TO_AVRO
            and t not in ("double", "float")
        ):
            raise IcebergProtocolError(
                f"partition column {c!r} of type {type_by_name[c]!r} "
                "not supported by the native writer (long/int/string/"
                "boolean round-trip hive dir values losslessly) — use "
                "the connector"
            )
    # the hive staging layout collapses '' and NULL into the same dir
    # (the write_delta hazard): raise before staging
    str_pcols = [c for c in partition_by if type_by_name[c] == "string"]
    if str_pcols:
        from functools import reduce

        from pyspark.sql import functions as F

        probe = reduce(
            lambda a, b: a | b, [F.col(c) == "" for c in str_pcols]
        )
        if df.filter(probe).take(1):
            raise ValueError(
                "empty-string value in string partition column(s) "
                f"{str_pcols}: hive staging collapses '' to NULL and "
                "the value is unrecoverable — normalize before "
                "write_iceberg"
            )

    def _typed_pval(col: str, raw: str | None):
        if raw is None:
            return None
        t = type_by_name[col]
        if t == "long" or t == "int":
            return int(raw)
        if t == "boolean":
            return raw.lower() == "true"
        return raw  # string (unquoted by the caller)

    # ---- stage data files with Spark's parquet writer, move to data/
    stage = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage)
    import pyarrow.parquet as pq

    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    # (abs, rows, bytes, {partition col: typed value})
    data_files: list[tuple[str, int, int, dict]] = []
    from urllib.parse import unquote

    for root, _dirs, fnames in sorted(os.walk(stage)):
        for f in sorted(fnames):
            if not f.endswith(".parquet"):
                continue
            src = os.path.join(root, f)
            rel_dir = os.path.relpath(root, stage)
            pvals: dict = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, _, v = seg.partition("=")
                    pvals[k] = _typed_pval(
                        k,
                        None if v == "__HIVE_DEFAULT_PARTITION__"
                        else unquote(v),
                    )
            sub = os.path.join(data_dir, rel_dir) if rel_dir != "." \
                else data_dir
            os.makedirs(sub, exist_ok=True)
            dst = os.path.join(sub, f"{uuid.uuid4().hex}.parquet")
            os.rename(src, dst)
            meta = pq.read_metadata(dst)
            data_files.append(
                (dst, meta.num_rows, os.path.getsize(dst), pvals,
                 column_bounds(meta))
            )
    shutil.rmtree(stage, ignore_errors=True)

    for _attempt in range(max_commit_retries):
        # ---- current table state (re-read per attempt: commit races;
        # the base version comes from the max metadata file present,
        # never the hint — see _max_metadata_version)
        latest = (
            _max_metadata_version(meta_dir)
            if is_iceberg_table(path) else None
        )
        if latest is not None:
            prev_version, mfile = latest
            with open(mfile, encoding="utf-8") as fh:
                prev_meta = json.load(fh)
        else:
            prev_meta, prev_version = None, 0

        if expected_snapshot_id is not None:
            cur_sid = (prev_meta or {}).get("current-snapshot-id")
            if cur_sid in (None, -1):
                cur_sid = None
            if cur_sid != expected_snapshot_id:
                raise IcebergWriteError(
                    f"table advanced to snapshot {cur_sid} (expected "
                    f"{expected_snapshot_id}): {path}"
                )
        if prev_meta is not None:
            if int(prev_meta.get("format-version", 1)) != 2:
                raise IcebergProtocolError(
                    "native writer only commits to format-version 2 "
                    "tables"
                )
            specs = prev_meta.get("partition-specs") or []
            cur_spec = next(
                (s for s in specs
                 if s.get("spec-id") == prev_meta.get("default-spec-id", 0)),
                specs[0] if specs else {"spec-id": 0, "fields": []},
            )
            # the table's spec must be identity-only and match
            # partition_by by SOURCE COLUMN NAME, in order
            cur_schemas0 = prev_meta.get("schemas") or []
            tbl_cur = next(
                (s for s in cur_schemas0
                 if s.get("schema-id")
                 == prev_meta.get("current-schema-id")),
                None,
            )
            tbl_ids = {
                int(f["id"]): f["name"]
                for f in (tbl_cur or {}).get("fields") or []
            }
            spec_src_names = []
            for pf in cur_spec.get("fields") or []:
                if pf.get("transform") != "identity":
                    raise IcebergProtocolError(
                        f"partition transform {pf.get('transform')!r} "
                        "not supported by the native writer — use the "
                        "connector"
                    )
                spec_src_names.append(
                    tbl_ids.get(int(pf.get("source-id", -1)))
                )
            if spec_src_names != partition_by:
                raise IcebergWriteError(
                    f"partition_by {partition_by} does not match the "
                    f"table's partition spec columns {spec_src_names}"
                )
            if mode == "append" and merge_schema:
                cur_schemas = prev_meta.get("schemas") or []
                cur = next(
                    (s for s in cur_schemas
                     if s.get("schema-id")
                     == prev_meta.get("current-schema-id")),
                    None,
                ) or {"fields": []}
                theirs_by_name = {f["name"]: f for f in cur["fields"]}
                ours_by_name = {f["name"]: f for f in ice_schema["fields"]}
                clash = [
                    n for n in set(ours_by_name) & set(theirs_by_name)
                    if _type_sans_ids(ours_by_name[n]["type"])
                    != _type_sans_ids(theirs_by_name[n]["type"])
                ]
                if clash:
                    raise IcebergWriteError(
                        f"merge_schema type mismatch on {sorted(clash)}"
                    )
                missing_required = sorted(
                    n for n, f in theirs_by_name.items()
                    if n not in ours_by_name and f.get("required")
                )
                if missing_required:
                    raise IcebergWriteError(
                        "merge_schema append omits REQUIRED table "
                        f"columns {missing_required}"
                    )
                weakened = sorted(
                    n for n in set(ours_by_name) & set(theirs_by_name)
                    if theirs_by_name[n].get("required")
                    and not ours_by_name[n]["required"]
                )
                if weakened:
                    raise IcebergWriteError(
                        f"append schema mismatch: columns {weakened} "
                        "are REQUIRED in the table but nullable in "
                        "the DataFrame"
                    )
                new_required = sorted(
                    f["name"] for f in ice_schema["fields"]
                    if f["name"] not in theirs_by_name and f["required"]
                )
                if new_required:
                    raise IcebergWriteError(
                        "merge_schema cannot add non-nullable columns "
                        f"{new_required}: existing files carry no "
                        "values for them"
                    )
                adds_new = [
                    f for f in ice_schema["fields"]
                    if f["name"] not in theirs_by_name
                ]
                if not adds_new:
                    ice_schema = cur
                    last_column_id = int(
                        prev_meta.get("last-column-id", last_column_id)
                    )
                else:
                    issued = [int(prev_meta.get("last-column-id", 0))]
                    for s in cur_schemas:
                        for f in s.get("fields") or []:
                            issued.append(int(f["id"]))
                            t = f["type"]
                            if isinstance(t, dict):
                                for k in ("element-id", "key-id",
                                          "value-id"):
                                    if k in t:
                                        issued.append(int(t[k]))
                    next_free = max(issued) + 1
                    evolved = []
                    for f in adds_new:
                        fid = next_free
                        next_free += 1
                        t = f["type"]
                        if isinstance(t, dict):
                            t = dict(t, **{"element-id": next_free})
                            next_free += 1
                        evolved.append(dict(f, id=fid, type=t))
                    new_sid = max(
                        [int(s.get("schema-id", 0))
                         for s in cur_schemas],
                        default=-1,
                    ) + 1
                    ice_schema = {
                        "type": "struct",
                        "schema-id": new_sid,
                        "fields": list(cur["fields"]) + evolved,
                    }
                    last_column_id = next_free - 1
            elif mode == "append":
                cur_schemas = prev_meta.get("schemas") or []
                cur = next(
                    (s for s in cur_schemas
                     if s.get("schema-id")
                     == prev_meta.get("current-schema-id")),
                    None,
                )
                ours = [
                    (f["name"], json.dumps(f["type"], sort_keys=True),
                     f["required"])
                    for f in ice_schema["fields"]
                ]
                theirs = [
                    (f["name"], json.dumps(f["type"], sort_keys=True),
                     bool(f.get("required", False)))
                    for f in (cur or {}).get("fields") or []
                ]
                # ids may differ between our fresh assignment and the
                # table's; names+types must match exactly, and a
                # NULLABLE DataFrame column must not append into a
                # REQUIRED table column (its NULLs would violate the
                # snapshot schema; required->nullable stays legal)
                if [o[0] for o in ours] != [t[0] for t in theirs] or [
                    o[1] for o in ours
                ] != [t[1] for t in theirs]:
                    raise IcebergWriteError(
                        f"append schema mismatch: table has {theirs}, "
                        f"DataFrame has {ours}"
                    )
                weakened = [
                    o[0] for o, t in zip(ours, theirs)
                    if t[2] and not o[2]
                ]
                if weakened and not trust_required:
                    # trust_required=True is the internal MoR DML
                    # escape hatch: Spark marks every file-scan /
                    # createDataFrame column nullable even when the
                    # rows provably carry no NULLs, and the row-delta
                    # writers verify that explicitly before asking
                    raise IcebergWriteError(
                        f"append schema mismatch: columns {weakened} "
                        "are REQUIRED in the table but nullable in "
                        "the DataFrame"
                    )
                # reuse the TABLE's schema + name mapping so field-ids
                # stay stable across appends
                ice_schema = cur
                last_column_id = int(
                    prev_meta.get("last-column-id", last_column_id)
                )
            else:
                # overwrite may change the schema, but field-ids are
                # FOREVER (spec: ids are never reassigned — and the
                # partition spec's source-ids resolve against the
                # CURRENT schema, so a fresh 1..N assignment on a
                # reordered overwrite would silently repoint the spec
                # at the wrong columns; ADVICE r14). Remap our fresh
                # assignment through the union of the table's
                # historical name→field definitions: a known name
                # keeps its id (and its list element-id, verbatim), a
                # new name takes fresh ids above every id the table
                # has ever issued. A known name with a structurally
                # different type would corrupt old snapshots'
                # projections — raise; type evolution needs the
                # connector.
                seen_fields: dict[str, dict] = {}
                issued: list[int] = [
                    int(prev_meta.get("last-column-id", 0))
                ]
                for s in prev_meta.get("schemas") or []:
                    for f in s.get("fields") or []:
                        seen_fields.setdefault(f["name"], f)
                        issued.append(int(f["id"]))
                        t = f["type"]
                        if isinstance(t, dict):
                            # historical schemas may carry types this
                            # writer gates (struct/map, from a
                            # connector) — collect whatever nested ids
                            # they expose, never assume list shape
                            for k in ("element-id", "key-id",
                                      "value-id"):
                                if k in t:
                                    issued.append(int(t[k]))
                next_free = max(issued) + 1
                remapped = []
                for f in ice_schema["fields"]:
                    old = seen_fields.get(f["name"])
                    if old is not None:
                        if _type_sans_ids(old["type"]) != _type_sans_ids(
                            f["type"]
                        ):
                            raise IcebergWriteError(
                                "overwrite changes the type of column "
                                f"{f['name']!r} ({old['type']!r} -> "
                                f"{f['type']!r}): field-ids are "
                                "permanent, type evolution needs the "
                                "connector"
                            )
                        remapped.append(
                            dict(f, id=int(old["id"]), type=old["type"])
                        )
                    else:
                        fid = next_free
                        next_free += 1
                        t = f["type"]
                        if isinstance(t, dict):
                            t = dict(t, **{"element-id": next_free})
                            next_free += 1
                        remapped.append(dict(f, id=fid, type=t))
                ice_schema = dict(ice_schema, fields=remapped)
                last_column_id = next_free - 1

        prev_snaps = (prev_meta or {}).get("snapshots") or []
        if carry_files is not None:
            if prev_meta is None:
                raise ValueError(
                    "carry_files on a table that does not exist"
                )
            # carried files keep serving under the NEW snapshot's
            # schema by-name: a changed schema would silently read
            # them as NULLs for renamed/retyped columns — require
            # name+type equality with the current schema (the append
            # contract; merge_iceberg always satisfies it)
            cur0 = next(
                (s for s in cur_schemas0
                 if s.get("schema-id")
                 == prev_meta.get("current-schema-id")),
                None,
            )
            ours0 = [
                (f["name"],
                 json.dumps(_type_sans_ids(f["type"]), sort_keys=True))
                for f in ice_schema["fields"]
            ]
            theirs0 = [
                (f["name"],
                 json.dumps(_type_sans_ids(f["type"]), sort_keys=True))
                for f in (cur0 or {}).get("fields") or []
            ]
            if ours0 != theirs0:
                raise IcebergWriteError(
                    "carry_files requires the DataFrame schema to "
                    f"match the table's current schema: table has "
                    f"{theirs0}, DataFrame has {ours0}"
                )
            # a live DELETE manifest scopes rows out of the carried
            # files; the overwrite manifest list references only our
            # new data manifest, so carrying files past their delete
            # files would silently RESURRECT deleted rows. Loud gate;
            # merge_iceberg routes delete-bearing tables to the full
            # rebuild before ever reaching here.
            cur_snap0 = next(
                (s for s in prev_snaps
                 if s["snapshot-id"]
                 == prev_meta.get("current-snapshot-id")),
                None,
            )
            if cur_snap0 is not None and cur_snap0.get("manifest-list"):
                import re as _re

                ml0 = _re.sub(
                    r"^file:/*", "/", cur_snap0["manifest-list"]
                )
                _, ml0_rows = read_avro_file(ml0)
                if any(int(r.get("content") or 0) == 1
                       for r in ml0_rows):
                    raise IcebergProtocolError(
                        "carry_files over a snapshot with live DELETE "
                        "manifests would resurrect deleted rows — "
                        "apply the deletes first (full-rebuild "
                        "overwrite) or use the connector"
                    )
        snapshot_id = max(
            [int(s["snapshot-id"]) for s in prev_snaps], default=0
        ) + 1
        seq = int((prev_meta or {}).get("last-sequence-number", 0)) + 1
        now_ms = int(time.time() * 1000)

        # ---- the partition spec (existing verbatim, or fresh)
        cur_fid_by_name = {
            f["name"]: int(f["id"]) for f in ice_schema["fields"]
        }
        if prev_meta is not None:
            spec = cur_spec
            # spec field name -> source column name (manifests key
            # partition values by spec FIELD name)
            pname_by_col = {
                tbl_ids.get(int(pf["source-id"])): pf["name"]
                for pf in spec.get("fields") or []
            }
        else:
            spec = {
                "spec-id": 0,
                "fields": [
                    {
                        "name": c,
                        "transform": "identity",
                        "source-id": cur_fid_by_name[c],
                        "field-id": 1000 + i,
                    }
                    for i, c in enumerate(partition_by)
                ],
            }
            pname_by_col = {c: c for c in partition_by}
        spec_field_defs = [
            (pf["name"], type_by_name.get(
                next((col for col, pn in pname_by_col.items()
                      if pn == pf["name"]), ""), "string"),
             int(pf["field-id"]))
            for pf in spec.get("fields") or []
        ]

        # ---- manifest of ADDED entries (sequence numbers inherit)
        man_name = f"m-{uuid.uuid4().hex}.avro"
        man_path = os.path.join(meta_dir, man_name)
        fid_map = {
            f["name"]: int(f["id"]) for f in ice_schema["fields"]
        }
        ice_types = {
            f["name"]: f["type"] for f in ice_schema["fields"]
            if isinstance(f["type"], str)
        }

        def _bound_rows(bounds: dict, idx: int) -> list | None:
            from embeddinghub_spark.sources.parquet_stats import (
                truncated_lower,
                truncated_upper,
            )

            rows_ = []
            for cname, pair in sorted(bounds.items()):
                t = ice_types.get(cname)
                if t is None or cname not in fid_map:
                    continue
                v = pair[idx]
                if isinstance(v, str):
                    # the spec's truncate(16) metrics contract: lower
                    # bounds truncate, upper bounds truncate-and-
                    # increment (or drop — under-prune only). Already-
                    # short values pass through, so re-encoding carried
                    # bounds is idempotent.
                    v = (
                        truncated_lower(v, _MANIFEST_STRING_PREFIX)
                        if idx == 0
                        else truncated_upper(v, _MANIFEST_STRING_PREFIX)
                    )
                    if v is None:
                        continue
                enc = encode_bound(t, v)
                if enc is not None:
                    rows_.append({"key": fid_map[cname], "value": enc})
            return rows_ or None

        carried = list(carry_files or [])
        write_avro_file(
            man_path,
            _manifest_entry_schema(spec_field_defs),
            [
                {
                    "status": 1,  # ADDED
                    "snapshot_id": snapshot_id,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": f"file://{fp}",
                        "file_format": "PARQUET",
                        "partition": {
                            pname_by_col[c]: v for c, v in pvals.items()
                        },
                        "record_count": rows,
                        "file_size_in_bytes": size,
                        "lower_bounds": _bound_rows(bounds, 0),
                        "upper_bounds": _bound_rows(bounds, 1),
                        "equality_ids": None,
                    },
                }
                for fp, rows, size, pvals, bounds in data_files
            ]
            + [
                {
                    # EXISTING: same data file carried forward at file
                    # grain; the spec requires its ORIGINAL sequence
                    # number explicitly (inheritance is for ADDED)
                    "status": 0,
                    "snapshot_id": cf.get("snapshot_id"),
                    "sequence_number": int(cf["seq"]),
                    "file_sequence_number": int(cf["seq"]),
                    "data_file": {
                        "content": 0,
                        "file_path": f"file://{cf['path']}",
                        "file_format": "PARQUET",
                        "partition": dict(cf.get("partition") or {}),
                        "record_count": int(cf["rows"]),
                        "file_size_in_bytes": int(cf["size"]),
                        "lower_bounds": _bound_rows(
                            cf.get("bounds") or {}, 0
                        ),
                        "upper_bounds": _bound_rows(
                            cf.get("bounds") or {}, 1
                        ),
                        "equality_ids": None,
                    },
                }
                for cf in carried
            ],
            metadata={
                "schema": json.dumps(
                    {k: v for k, v in ice_schema.items()
                     if k != "schema-id"}
                ),
                "partition-spec": json.dumps(spec.get("fields") or []),
                "partition-spec-id": str(spec.get("spec-id", 0)),
                "format-version": "2",
                "content": "data",
            },
        )
        new_row = {
            "manifest_path": f"file://{man_path}",
            "manifest_length": os.path.getsize(man_path),
            "partition_spec_id": int(spec.get("spec-id", 0)),
            "content": 0,  # data
            "sequence_number": seq,
            "min_sequence_number": min(
                [seq] + [int(cf["seq"]) for cf in carried]
            ),
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(data_files),
            "existing_files_count": len(carried),
            "deleted_files_count": 0,
            "added_rows_count": sum(r for _, r, _, _, _ in data_files),
            "existing_rows_count": sum(
                int(cf["rows"]) for cf in carried
            ),
            "deleted_rows_count": 0,
        }
        rows_out = [new_row]
        if position_deletes or equality_deletes:
            del_man_path = os.path.join(
                meta_dir, f"m-{uuid.uuid4().hex}.avro"
            )
            write_avro_file(
                del_man_path,
                _manifest_entry_schema(spec_field_defs),
                [
                    {
                        "status": 1,  # ADDED
                        "snapshot_id": snapshot_id,
                        "sequence_number": None,
                        "file_sequence_number": None,
                        "data_file": {
                            "content": 1,  # POSITION_DELETES
                            "file_path": f"file://{dfp}",
                            "file_format": "PARQUET",
                            "partition": dict(dpart or {}),
                            "record_count": int(drows),
                            "file_size_in_bytes": int(dsize),
                            "lower_bounds": None,
                            "upper_bounds": None,
                            "equality_ids": None,
                        },
                    }
                    for dfp, drows, dsize, dpart
                    in (position_deletes or [])
                ]
                + [
                    {
                        "status": 1,  # ADDED
                        "snapshot_id": snapshot_id,
                        "sequence_number": None,
                        "file_sequence_number": None,
                        "data_file": {
                            "content": 2,  # EQUALITY_DELETES
                            "file_path": f"file://{dfp}",
                            "file_format": "PARQUET",
                            "partition": dict(dpart or {}),
                            "record_count": int(drows),
                            "file_size_in_bytes": int(dsize),
                            "lower_bounds": None,
                            "upper_bounds": None,
                            "equality_ids": [int(i) for i in eq_ids],
                        },
                    }
                    for dfp, drows, dsize, dpart, eq_ids
                    in (equality_deletes or [])
                ],
                metadata={
                    "schema": json.dumps(
                        {k: v for k, v in ice_schema.items()
                         if k != "schema-id"}
                    ),
                    "partition-spec": json.dumps(
                        spec.get("fields") or []
                    ),
                    "partition-spec-id": str(spec.get("spec-id", 0)),
                    "format-version": "2",
                    "content": "deletes",
                },
            )
            _n_del_files = len(position_deletes or []) + len(
                equality_deletes or []
            )
            _n_del_rows = sum(
                int(r) for _, r, _, _ in (position_deletes or [])
            ) + sum(
                int(r) for _, r, _, _, _ in (equality_deletes or [])
            )
            rows_out.append({
                "manifest_path": f"file://{del_man_path}",
                "manifest_length": os.path.getsize(del_man_path),
                "partition_spec_id": int(spec.get("spec-id", 0)),
                "content": 1,  # deletes
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": _n_del_files,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": _n_del_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            })
        if mode == "append" and prev_snaps:
            cur_snap = next(
                (s for s in prev_snaps
                 if s["snapshot-id"]
                 == prev_meta.get("current-snapshot-id")),
                None,
            )
            if cur_snap is not None:
                prev_ml = cur_snap["manifest-list"]
                prev_ml_path = prev_ml
                if prev_ml_path.startswith("file:"):
                    import re as _re

                    prev_ml_path = _re.sub(r"^file:/*", "/", prev_ml_path)
                _, prev_rows = read_avro_file(prev_ml_path)
                for r in prev_rows:
                    rows_out.append(
                        {
                            "manifest_path": r["manifest_path"],
                            "manifest_length": int(r["manifest_length"]),
                            "partition_spec_id": int(
                                r.get("partition_spec_id") or 0
                            ),
                            "content": int(r.get("content") or 0),
                            "sequence_number": int(
                                r.get("sequence_number") or 0
                            ),
                            "min_sequence_number": int(
                                r.get("min_sequence_number") or 0
                            ),
                            "added_snapshot_id": int(
                                r.get("added_snapshot_id") or 0
                            ),
                            "added_files_count": int(
                                r.get("added_files_count") or 0
                            ),
                            "existing_files_count": int(
                                r.get("existing_files_count") or 0
                            ),
                            "deleted_files_count": int(
                                r.get("deleted_files_count") or 0
                            ),
                            "added_rows_count": int(
                                r.get("added_rows_count") or 0
                            ),
                            "existing_rows_count": int(
                                r.get("existing_rows_count") or 0
                            ),
                            "deleted_rows_count": int(
                                r.get("deleted_rows_count") or 0
                            ),
                        }
                    )
        ml_name = f"snap-{snapshot_id}-{uuid.uuid4().hex}.avro"
        ml_path = os.path.join(meta_dir, ml_name)
        write_avro_file(
            ml_path,
            _manifest_list_schema(),
            rows_out,
            metadata={
                "snapshot-id": str(snapshot_id),
                "sequence-number": str(seq),
                "format-version": "2",
            },
        )

        # ---- new table metadata
        added_rows = sum(r for _, r, _, _, _ in data_files)
        added_bytes = sum(sz for _, _, sz, _, _ in data_files)
        # totals cover the WHOLE snapshot: every manifest-list row,
        # including previous manifests an append carries forward —
        # counting only this commit's manifest would under-report
        # total-records on every append (review find r15)
        # totals count DATA manifests only (content=0): a delete
        # manifest's rows are retractions, not data records
        total_files = sum(
            int(r["added_files_count"]) + int(r["existing_files_count"])
            for r in rows_out
            if int(r.get("content") or 0) == 0
        )
        total_rows = sum(
            int(r["added_rows_count"]) + int(r["existing_rows_count"])
            for r in rows_out
            if int(r.get("content") or 0) == 0
        )
        snapshot = {
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "manifest-list": f"file://{ml_path}",
            # the spec's summary: operation (caller-overridable —
            # compaction commits "replace" so readers know the data
            # set is unchanged) + the standard counters connectors
            # surface in table history UIs (string-valued per spec)
            "summary": {
                # a row-delta (position_deletes) is the spec's
                # "overwrite" snapshot unless the caller overrides
                "operation": operation or (
                    "overwrite"
                    if (position_deletes or equality_deletes) else mode
                ),
                "added-data-files": str(len(data_files)),
                "added-records": str(added_rows),
                "added-files-size": str(added_bytes),
                "total-data-files": str(total_files),
                "total-records": str(total_rows),
                **(
                    {
                        "added-delete-files": str(
                            len(position_deletes or [])
                            + len(equality_deletes or [])
                        ),
                        "added-position-deletes": str(sum(
                            int(r)
                            for _, r, _, _ in (position_deletes or [])
                        )),
                        "added-equality-deletes": str(sum(
                            int(r)
                            for _, r, _, _, _ in (equality_deletes or [])
                        )),
                    }
                    if (position_deletes or equality_deletes) else {}
                ),
            },
            "schema-id": ice_schema.get("schema-id", 0),
        }
        pcur = (prev_meta or {}).get("current-snapshot-id")
        if pcur is not None and pcur != -1:
            snapshot["parent-snapshot-id"] = pcur
        props = dict((prev_meta or {}).get("properties") or {})
        props["schema.name-mapping.default"] = _name_mapping_json(
            ice_schema
        )
        props.update(properties or {})
        schemas = list((prev_meta or {}).get("schemas") or [])
        if not any(
            s.get("schema-id") == ice_schema.get("schema-id", 0)
            and s == ice_schema
            for s in schemas
        ):
            if prev_meta is not None and mode == "overwrite":
                # overwrite may change the schema: new schema-id
                new_sid = max(
                    [int(s.get("schema-id", 0)) for s in schemas],
                    default=-1,
                ) + 1
                existing = next(
                    (s for s in schemas
                     if [f["name"] for f in s["fields"]]
                     == [f["name"] for f in ice_schema["fields"]]
                     and [json.dumps(f["type"], sort_keys=True)
                          for f in s["fields"]]
                     == [json.dumps(f["type"], sort_keys=True)
                         for f in ice_schema["fields"]]),
                    None,
                )
                if existing is not None:
                    ice_schema = existing
                    snapshot["schema-id"] = existing.get("schema-id", 0)
                    props["schema.name-mapping.default"] = (
                        _name_mapping_json(existing)
                    )
                else:
                    ice_schema = dict(ice_schema, **{"schema-id": new_sid})
                    snapshot["schema-id"] = new_sid
                    schemas.append(ice_schema)
                    props["schema.name-mapping.default"] = (
                        _name_mapping_json(ice_schema)
                    )
            else:
                schemas.append(ice_schema)
        # START from the previous metadata so fields this writer does
        # not manage (refs/branches, statistics, a connector's sort
        # orders, snapshot-log history, ...) survive the commit —
        # rebuilding from scratch silently deleted them (review find
        # r14); then override exactly what this commit changes.
        meta_out = dict(prev_meta or {})
        meta_out.update({
            "format-version": 2,
            "table-uuid": (prev_meta or {}).get(
                "table-uuid", str(uuid.uuid4())
            ),
            "location": f"file://{path}",
            "last-sequence-number": seq,
            "last-updated-ms": now_ms,
            "last-column-id": max(
                last_column_id,
                int((prev_meta or {}).get("last-column-id", 0)),
            ),
            "schemas": schemas,
            "current-schema-id": snapshot["schema-id"],
            "partition-specs": (
                prev_meta.get("partition-specs")
                if prev_meta is not None and prev_meta.get("partition-specs")
                else [spec]
            ),
            "default-spec-id": int(spec.get("spec-id", 0)),
            "last-partition-id": max(
                [999] + [int(pf["field-id"])
                         for pf in spec.get("fields") or []]
            ),
            "properties": props,
            "current-snapshot-id": snapshot_id,
            "snapshots": prev_snaps + [snapshot],
            "snapshot-log": list(
                (prev_meta or {}).get("snapshot-log") or []
            ) + [{"timestamp-ms": now_ms, "snapshot-id": snapshot_id}],
        })
        # refs.main must track current-snapshot-id — Iceberg's
        # TableMetadata parser REJECTS metadata whose main branch
        # points elsewhere ('Current snapshot ID does not match main
        # branch'), so carrying a connector-created table's refs
        # forward verbatim would brick it for the Java/PyIceberg side
        # (ADVICE r14). Other refs (tags, user branches) pass through.
        refs = dict((prev_meta or {}).get("refs") or {})
        refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
        meta_out["refs"] = refs
        meta_out.setdefault("sort-orders", [{"order-id": 0,
                                             "fields": []}])
        meta_out.setdefault("default-sort-order-id", 0)
        version = prev_version + 1
        final = os.path.join(meta_dir, f"v{version}.metadata.json")
        if _atomic_put(final, json.dumps(meta_out)):
            hint_tmp = os.path.join(
                meta_dir, f"version-hint.{uuid.uuid4().hex}.tmp"
            )
            with open(hint_tmp, "w", encoding="utf-8") as fh:
                fh.write(str(version))
            os.replace(hint_tmp, os.path.join(meta_dir,
                                              "version-hint.text"))
            return snapshot_id
        # lost the race: clean our manifest/manifest-list and retry
        for p in (man_path, ml_path):
            try:
                os.unlink(p)
            except OSError:
                pass
    raise IcebergWriteError(
        f"lost the commit race {max_commit_retries} times: {path}"
    )


def create_iceberg_ref(
    path: str,
    name: str,
    snapshot_id: int | None = None,
    *,
    ref_type: str = "tag",
) -> None:
    """Mint a named TAG or BRANCH ref pointing at ``snapshot_id``
    (default: the current snapshot) — a metadata-only commit, the
    connector's ``ALTER TABLE … CREATE TAG/BRANCH``. Tags are how a
    training run pins the exact dataset snapshot it consumed:
    ``read_iceberg(ref="run-2024-07")`` reproduces the read forever,
    and ``expire_iceberg_snapshots`` PROTECTS ref'd snapshots (r15),
    so the pin survives retention. ``main`` is reserved — it always
    tracks current-snapshot-id. Re-creating an existing name
    retargets it (the connector's REPLACE semantics).

    Branches minted here are READ-ONLY PINS (ADVICE r15): this
    writer commits exclusively to ``main`` — every commit re-points
    ``refs.main`` and passes other refs through verbatim — so a
    ``ref_type="branch"`` ref never advances and is functionally a
    tag that real engines may later write to (e.g. the connector's
    ``writeTo(...).branch(name)``). Writing to a non-main branch
    through THIS writer is not supported; re-create or drop the ref
    to move it."""
    if name == "main":
        raise ValueError("'main' is reserved: it tracks the current "
                         "snapshot")
    if ref_type not in ("tag", "branch"):
        raise ValueError(f"ref_type must be tag|branch, got {ref_type!r}")
    path = os.path.realpath(os.path.abspath(path))
    meta_dir = os.path.join(path, "metadata")
    latest = _max_metadata_version(meta_dir)
    if latest is None:
        raise ValueError(f"not an Iceberg table: {path}")
    prev_version, mfile = latest
    with open(mfile, encoding="utf-8") as fh:
        meta = json.load(fh)
    known = {int(s["snapshot-id"]) for s in meta.get("snapshots") or []}
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise ValueError(f"table has no current snapshot: {path}")
    snapshot_id = int(snapshot_id)
    if snapshot_id not in known:
        raise ValueError(
            f"snapshot {snapshot_id} not in table {sorted(known)}"
        )
    meta_out = dict(meta)
    refs = dict(meta.get("refs") or {})
    refs[name] = {"snapshot-id": snapshot_id, "type": ref_type}
    meta_out["refs"] = refs
    version = prev_version + 1
    final = os.path.join(meta_dir, f"v{version}.metadata.json")
    if not _atomic_put(final, json.dumps(meta_out)):
        raise IcebergWriteError(
            f"lost the ref commit race at version {version}: {path}"
        )
    hint_tmp = os.path.join(meta_dir, f"version-hint.{uuid.uuid4().hex}.tmp")
    with open(hint_tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))


def drop_iceberg_ref(path: str, name: str) -> None:
    """Remove a named tag/branch — metadata-only commit. Dropping a
    tag releases its snapshot back to normal retention (the next
    ``expire_iceberg_snapshots`` may prune it). ``main`` cannot be
    dropped; unknown names raise."""
    if name == "main":
        raise ValueError("'main' cannot be dropped")
    path = os.path.realpath(os.path.abspath(path))
    meta_dir = os.path.join(path, "metadata")
    latest = _max_metadata_version(meta_dir)
    if latest is None:
        raise ValueError(f"not an Iceberg table: {path}")
    prev_version, mfile = latest
    with open(mfile, encoding="utf-8") as fh:
        meta = json.load(fh)
    refs = dict(meta.get("refs") or {})
    if name not in refs:
        raise ValueError(
            f"ref {name!r} not in table refs {sorted(refs)}"
        )
    del refs[name]
    meta_out = dict(meta)
    meta_out["refs"] = refs
    version = prev_version + 1
    final = os.path.join(meta_dir, f"v{version}.metadata.json")
    if not _atomic_put(final, json.dumps(meta_out)):
        raise IcebergWriteError(
            f"lost the ref commit race at version {version}: {path}"
        )
    hint_tmp = os.path.join(meta_dir, f"version-hint.{uuid.uuid4().hex}.tmp")
    with open(hint_tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))


def expire_iceberg_snapshots(
    path: str,
    *,
    keep_last: int = 1,
    dry_run: bool = False,
) -> dict:
    """Expire all but the newest ``keep_last`` snapshots (the current
    snapshot always survives): commit a new metadata version with the
    pruned snapshot list (the same put-if-absent discipline as
    ``write_iceberg``), then delete the manifest lists, manifests and
    DATA FILES no retained snapshot references. Time travel to an
    expired snapshot raises by construction (it is no longer in the
    metadata) — the connector's ``expireSnapshots`` contract.

    Returns ``{"expired": [snapshot ids], "deleted": [paths]}``;
    ``dry_run`` reports without committing or deleting."""
    from embeddinghub_spark.sources.iceberg_meta import (
        _latest_metadata_file,
        _resolve,
        iceberg_snapshot,
    )

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    path = os.path.realpath(os.path.abspath(path))
    meta_dir = os.path.join(path, "metadata")
    latest = _max_metadata_version(meta_dir)
    if latest is None:
        raise ValueError(f"not an Iceberg table: {path}")
    prev_version, mfile = latest
    with open(mfile, encoding="utf-8") as fh:
        meta = json.load(fh)
    snaps = list(meta.get("snapshots") or [])
    if len(snaps) <= keep_last:
        return {"expired": [], "deleted": []}
    ordered = sorted(snaps, key=lambda s: int(s.get("sequence-number",
                                                    s["snapshot-id"])))
    cur_id = meta.get("current-snapshot-id")
    retained = ordered[-keep_last:]
    if cur_id not in {s["snapshot-id"] for s in retained}:
        retained.append(
            next(s for s in snaps if s["snapshot-id"] == cur_id)
        )
    # snapshots referenced by refs (tags, user branches) are PROTECTED
    # from expiry — the connector's expireSnapshots contract, and the
    # only way the surviving metadata keeps every ref resolvable
    # (Iceberg's TableMetadata parser rejects a ref whose snapshot is
    # gone; ADVICE r14). refs.main tracks cur_id, already retained.
    known = {s["snapshot-id"] for s in snaps}
    for ref in (meta.get("refs") or {}).values():
        rid = ref.get("snapshot-id")
        if rid in known and rid not in {
            s["snapshot-id"] for s in retained
        }:
            retained.append(
                next(s for s in snaps if s["snapshot-id"] == rid)
            )
    retained_ids = {s["snapshot-id"] for s in retained}
    expired = sorted(
        s["snapshot-id"] for s in snaps
        if s["snapshot-id"] not in retained_ids
    )

    def _referenced(snapshot_ids) -> set[str]:
        refs: set[str] = set()
        location = meta.get("location")
        for sid in snapshot_ids:
            snap = iceberg_snapshot(path, sid)
            refs.update(snap["files"])
            refs.update(snap["position_deletes"])
            refs.update(d["path"] for d in snap["equality_deletes"])
            s = next(x for x in snaps if x["snapshot-id"] == sid)
            ml = _resolve(s["manifest-list"], path, location)
            refs.add(ml)
            _, mrows = read_avro_file(ml)
            for m in mrows:
                refs.add(_resolve(m["manifest_path"], path, location))
        return refs

    keep_refs = _referenced(sorted(retained_ids))
    dead_refs = _referenced(expired) - keep_refs
    victims = sorted(dead_refs)
    if dry_run:
        return {"expired": expired, "deleted": victims}

    meta_out = dict(meta)
    # retained snapshots may reference an expired parent-snapshot-id;
    # the spec allows that (readers treat lineage as advisory) and the
    # connector's expireSnapshots leaves them dangling the same way
    meta_out["snapshots"] = [
        s for s in snaps if s["snapshot-id"] in retained_ids
    ]
    # the snapshot-log must not point at expired snapshots — Iceberg's
    # TableMetadata parser REJECTS a log entry whose snapshot is gone
    # (review find r14), so prune it the way expireSnapshots does
    if meta_out.get("snapshot-log"):
        meta_out["snapshot-log"] = [
            e for e in meta_out["snapshot-log"]
            if e.get("snapshot-id") in retained_ids
        ]
    version = prev_version + 1
    final = os.path.join(meta_dir, f"v{version}.metadata.json")
    if not _atomic_put(final, json.dumps(meta_out)):
        raise IcebergWriteError(
            f"lost the expire commit race at version {version}: {path}"
        )
    hint_tmp = os.path.join(meta_dir, f"version-hint.{uuid.uuid4().hex}.tmp")
    with open(hint_tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    for fp in victims:
        try:
            os.unlink(fp)
        except OSError:
            pass
    return {"expired": expired, "deleted": victims}


def remove_orphan_iceberg_files(
    path: str,
    *,
    retain_ms: int = 3 * 24 * 3600 * 1000,
    now_ms: int | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete data files under ``data/`` that NO snapshot in the
    table metadata references and whose modification time is older
    than the retention window — the connector's
    ``removeOrphanFiles`` (crashed writers and lost commit races
    leave staged-and-moved files behind; the retention default, 3
    days like the connector's, protects an in-flight writer whose
    files exist but whose commit hasn't landed yet). Returns the
    deleted (or with ``dry_run`` the would-be-deleted) paths.
    Metadata files are never touched."""
    import time as _time

    from embeddinghub_spark.sources.iceberg_meta import (
        _latest_metadata_file,
        iceberg_snapshot,
    )

    path = os.path.realpath(os.path.abspath(path))
    mfile = _latest_metadata_file(path)
    with open(mfile, encoding="utf-8") as fh:
        meta = json.load(fh)
    refs: set[str] = set()
    for s in meta.get("snapshots") or []:
        snap = iceberg_snapshot(path, s["snapshot-id"])
        refs.update(snap["files"])
        refs.update(snap["position_deletes"])
        refs.update(d["path"] for d in snap["equality_deletes"])
    now = _time.time() * 1000 if now_ms is None else now_ms
    cutoff = now - retain_ms
    victims: list[str] = []
    data_dir = os.path.join(path, "data")
    for root, _dirs, files in os.walk(data_dir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.realpath(os.path.join(root, fn))
            if fp in refs:
                continue
            try:
                if os.stat(fp).st_mtime * 1000 >= cutoff:
                    continue
            except OSError:
                continue
            victims.append(fp)
    # crashed writers' staging dirs: a writer that died before its
    # move loop leaves _staging_<hex>/ with full parquet output that
    # no snapshot can ever reference — the exact leak this function's
    # contract names (review find r14); same retention guard
    stale_stages: list[str] = []
    for entry in os.listdir(path):
        if not entry.startswith("_staging_"):
            continue
        sdir = os.path.join(path, entry)
        if not os.path.isdir(sdir):
            continue
        try:
            newest = max(
                (os.stat(os.path.join(r, f)).st_mtime
                 for r, _d, fs in os.walk(sdir) for f in fs),
                default=os.stat(sdir).st_mtime,
            )
        except OSError:
            continue
        if newest * 1000 < cutoff:
            stale_stages.append(sdir)
            for r, _d, fs in os.walk(sdir):
                for f in fs:
                    victims.append(
                        os.path.realpath(os.path.join(r, f))
                    )
    victims.sort()
    if not dry_run:
        for fp in victims:
            try:
                os.unlink(fp)
            except OSError:
                pass
        for sdir in stale_stages:
            shutil.rmtree(sdir, ignore_errors=True)
    return victims


def merge_iceberg(
    spark,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    *,
    strategy: str = "cow",
    max_mor_rows: int = 1_000_000,
) -> int:
    """MERGE upsert into a native Iceberg table — S12 semantics (WHEN
    MATCHED → UPDATE all source columns, WHEN NOT MATCHED → INSERT;
    ``tables.merge_upsert_df`` is the shared DataFrame expression)
    committed as ONE overwrite snapshot, so readers see the old
    snapshot or the new one, never a gap — the Iceberg twin of
    ``merge_delta``. Returns the committed snapshot id; the pre-merge
    state stays time-travelable at the previous snapshot.

    FILE-PRUNED copy-on-write (VERDICT r14 #3): only the data files
    that can contain a source key are rewritten; every other live file
    carries forward as an EXISTING manifest entry with its original
    sequence number (``write_iceberg(carry_files=…)``), so a 0.1%
    upsert writes ~0.1% of the table. Two-stage pruning, the exact
    twin of ``merge_delta``'s: (1) manifest column bounds vs the
    source's key range (files without bounds are always candidates —
    under-pruning only); (2) an exact probe semi-joining the candidate
    scan against the distinct source keys via ``_metadata.file_path``.
    The probe guarantees untouched files hold NO source key, so the
    file-local merge is output-identical to the full rebuild (pinned).
    Tables with merge-on-read DELETES fall back to the full rebuild —
    rewriting a subset of files cannot carry delete files whose scope
    spans both subsets.

    Read-modify-write safety: the commit pins ``expected_snapshot_id``
    to the snapshot the merge was computed against — a concurrent
    commit in between raises ``IcebergWriteError`` (re-invoke to
    retry against the new state) instead of silently dropping the
    winner's rows."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import (
        _scan_parquet,
        iceberg_snapshot,
        read_iceberg,
    )
    from embeddinghub_spark.sources.scan_prune import (
        decoded_file_path_col,
        range_excluded,
    )
    from embeddinghub_spark.sources.tables import merge_upsert_df

    if strategy not in ("cow", "mor"):
        raise ValueError(f"strategy must be cow|mor, got {strategy!r}")
    # same as merge_delta: the source subtree feeds the key-range agg,
    # the exact probe, and merge_upsert_df (twice) — compute it once
    source = source.localCheckpoint(eager=False)
    snap = iceberg_snapshot(path)
    # derive partition_by from the table's CURRENT identity spec —
    # defaulting to unpartitioned made MERGE into any partitioned
    # table raise, and only after the merged files were staged
    # (ADVICE r14). Non-identity transforms gate loudly HERE, before
    # any data file is written.
    ctx = _iceberg_table_context(path, snap)
    partition_by = ctx["partition_by"]
    # strategy="mor" STACKS on existing MoR deletes (a redundant
    # delete position for an already-dead row is a no-op for the
    # anti-join read, and source rows never resurrect anything —
    # they are new images by definition); evolved-spec tables still
    # raise inside _merge_iceberg_mor. The COW path must keep the
    # full-rebuild reroute: a partial rewrite cannot carry delete
    # files whose scope spans both subsets.
    if ctx["full_rewrite"] and strategy != "mor":
        # MoR deletes scope across the touched/untouched split, and a
        # carried file from an EVOLVED spec cannot be re-expressed in
        # the current spec's manifest partition struct; the full
        # rebuild applies/compacts both away
        target = read_iceberg(
            spark, path, snapshot_id=snap["snapshot_id"]
        )
        merged = merge_upsert_df(target, source, key_cols)
        return write_iceberg(
            merged,
            path,
            mode="overwrite",
            partition_by=partition_by,
            expected_snapshot_id=snap["snapshot_id"],
        )

    files = list(snap["files"])
    bounds = snap.get("file_bounds") or {}
    # stage 1: source key ranges (one tiny agg job) prune by the
    # manifests' column bounds
    rng_row = source.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in key_cols],
        *[F.max(c).alias(f"_hi_{c}") for c in key_cols],
    ).collect()[0]
    # numbers, strings and dates are all usable against the decoded
    # manifest bounds (decode_bound returns matching python kinds);
    # VERDICT r15 #2 — string keys previously dropped out here and
    # forced a full-candidate probe scan
    from embeddinghub_spark.sources.scan_prune import _kind

    usable = {
        c: (rng_row[f"_lo_{c}"], rng_row[f"_hi_{c}"])
        for c in key_cols
        if _kind(rng_row[f"_lo_{c}"]) is not None
        and _kind(rng_row[f"_lo_{c}"]) == _kind(rng_row[f"_hi_{c}"])
    }
    candidates = (
        [f for f in files
         if not range_excluded(bounds.get(f) or {}, usable)]
        if usable else files
    )
    if strategy == "mor":
        # MoR needs the matched ROW POSITIONS anyway, and any file with
        # >= 1 matched position is by definition a touched file — so the
        # exact probe and the position probe are ONE candidate scan
        # (r17; the split form scanned the candidates twice per merge)
        return _merge_iceberg_mor(
            spark, path, snap, candidates, source, key_cols,
            partition_by, max_mor_rows,
        )
    # stage 2: exact probe — which candidates really hold a source key
    touched: list[str] = []
    if candidates:
        probe = _scan_parquet(spark, snap, candidates, with_meta=True)
        hits = {
            r["_fp"]
            for r in probe.select(
                decoded_file_path_col(F.col("_raw_fp")).alias("_fp"),
                *key_cols,
            )
            .join(source.select(*key_cols).distinct(), key_cols,
                  "left_semi")
            .select("_fp").distinct().collect()
        }
        touched = [f for f in candidates if f in hits]
    target = (
        _scan_parquet(spark, snap, touched)
        if touched
        else spark.createDataFrame([], snap["schema"])
    )
    merged = merge_upsert_df(target, source, key_cols)
    carry = _iceberg_carry(snap, set(touched))
    return write_iceberg(
        merged,
        path,
        mode="overwrite",
        partition_by=partition_by,
        expected_snapshot_id=snap["snapshot_id"],
        carry_files=carry,
    )


def _merge_iceberg_mor(
    spark,
    path: str,
    snap: dict,
    candidates: list[str],
    source: DataFrame,
    key_cols: list[str],
    partition_by: list[str],
    max_mor_rows: int,
) -> int:
    """Row-delta MERGE commit (``merge_iceberg(strategy="mor")``):
    position-delete the matched TARGET rows and append EVERY source
    row (updated image or insert) as new data files, in one atomic
    ``write_iceberg(position_deletes=…)`` append — MERGE's "source
    wins" semantics make the new rows exactly ``source`` projected to
    the table columns, so bytes written ∝ |source| + |matched rows|.
    An insert-only merge degenerates to a plain pinned append. The
    spec restrictions of ``delete_iceberg(strategy="mor")`` apply
    (matched files must sit in the current spec).

    ``candidates`` is the stats-pruned file set: ONE scan of it both
    decides which files are touched (>= 1 matched position) and
    yields the positions themselves."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import _scan_parquet
    from embeddinghub_spark.sources.scan_prune import (
        decoded_file_path_col,
    )

    path = os.path.realpath(os.path.abspath(path))
    meta = snap["metadata"]
    cols = [f.name for f in snap["schema"].fields]
    src_rows = source.select(*cols)
    _assert_no_nulls_in_required(src_rows, snap["schema"])
    if not candidates:
        return write_iceberg(
            src_rows, path, mode="append", partition_by=partition_by,
            expected_snapshot_id=snap["snapshot_id"],
            trust_required=True,
        )
    specs = meta.get("partition-specs") or [{"spec-id": 0, "fields": []}]
    cur_spec = next(
        (s for s in specs
         if s.get("spec-id") == meta.get("default-spec-id", 0)),
        specs[0],
    )
    cur_spec_id = int(cur_spec.get("spec-id", 0))
    fparts = snap.get("file_partitions") or {}
    probe = _scan_parquet(spark, snap, candidates, with_meta=True).join(
        source.select(*key_cols).distinct(), key_cols, "left_semi"
    ).select(
        decoded_file_path_col(F.col("_raw_fp")).alias("_fp"),
        F.col("_pos"),
    )
    hits_pdf = probe.limit(max_mor_rows + 1).toPandas()
    if len(hits_pdf) > max_mor_rows:
        raise ValueError(
            f"MoR MERGE matches more than max_mor_rows="
            f"{max_mor_rows} rows — use strategy='cow'"
        )
    touched = sorted(set(hits_pdf["_fp"])) if len(hits_pdf) else []
    for f in touched:
        sid = int((fparts.get(f) or (cur_spec_id, {}))[0])
        if sid != cur_spec_id:
            raise IcebergProtocolError(
                f"touched file under spec {sid} != current "
                f"{cur_spec_id} — use strategy='cow' for evolved-spec "
                "tables"
            )
    by_part: dict[tuple, list[tuple[str, int]]] = {}
    if touched:
        part_keys = {
            f: tuple(sorted(
                dict((fparts.get(f) or (cur_spec_id, {}))[1]).items()
            ))
            for f in touched
        }
        fps = hits_pdf["_fp"].tolist()
        poss = hits_pdf["_pos"].tolist()
        for fp, pos in zip(fps, poss):
            by_part.setdefault(part_keys[fp], []).append(
                (f"file://{fp}", int(pos))
            )
    if not by_part:
        return write_iceberg(
            src_rows, path, mode="append", partition_by=partition_by,
            expected_snapshot_id=snap["snapshot_id"],
            trust_required=True,
        )
    delete_files = _write_position_delete_files(path, by_part)
    return write_iceberg(
        src_rows,
        path,
        mode="append",
        partition_by=partition_by,
        expected_snapshot_id=snap["snapshot_id"],
        position_deletes=delete_files,
        operation="overwrite",
        trust_required=True,
    )


def upsert_iceberg_cdc(
    spark,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    *,
    properties: dict[str, str] | None = None,
    checkpoint_source: bool = True,
) -> int:
    """Streaming-shaped UPSERT via EQUALITY DELETE writes — the Flink
    CDC writer's upsert mode, natively: ONE commit appends the source
    rows AND an equality-delete file naming the source keys (spec
    content=2, ``equality_ids`` = the key columns' field ids), so
    every pre-existing row with a source key dies (its data sequence
    number is strictly below the delete's) while the appended rows
    survive their own commit. ZERO table reads: unlike
    ``merge_iceberg`` there is no probe, no stats pruning, no touched
    files — commit cost is O(|source| + manifest-list rows), which is
    what a per-micro-batch streaming sink needs at 100 TB.

    The cost moves to READ time (every scan anti-joins the
    accumulated delete files) — run ``compact_iceberg`` or any COW
    DML periodically to fold them, exactly like Flink deployments
    schedule rewrite_data_files. Source keys must be non-null
    (equality NULL semantics differ across engines — raise instead of
    miswriting); the batch must be KEY-UNIQUE (raises — resolving
    which duplicate is latest needs an ordering column the caller
    owns); the table must be UNPARTITIONED (a partitioned
    spec's equality deletes are partition-scoped — grouping source
    keys needs the partition columns inside the key; use
    ``merge_iceberg`` there). ``properties`` merge into the table
    properties IN THE SAME COMMIT — the atomic watermark hook the
    streaming sink uses for exactly-once batch application. Returns
    the committed snapshot id."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import (
        iceberg_snapshot,
    )

    path = os.path.realpath(os.path.abspath(path))
    # the source subtree feeds the key-contract aggregate, the staged
    # write and the required-null probe; compute it once — bytes cached
    # ∝ |source|. checkpoint_source=False is the streaming-sink handle
    # (the sink already checkpointed the batch).
    if checkpoint_source:
        source = source.localCheckpoint(eager=False)
    snap = iceberg_snapshot(path)
    if snap["snapshot_id"] is None:
        raise IcebergWriteError(
            "upsert_iceberg_cdc needs an existing snapshot — "
            "write_iceberg the first batch"
        )
    meta = snap["metadata"]
    ctx = _iceberg_table_context(path, snap)
    if ctx["partition_by"]:
        raise IcebergProtocolError(
            "equality-delete upsert on a PARTITIONED table — the "
            "spec scopes equality deletes to their partition; use "
            "merge_iceberg"
        )
    cols = [f.name for f in snap["schema"].fields]
    missing = sorted(set(key_cols) - set(cols))
    if missing:
        raise ValueError(f"key columns {missing} not in table schema")
    src_rows = source.select(*cols)
    # ONE aggregate job yields the distinct keys (needed below for the
    # equality-delete file anyway) AND the two batch-contract probes —
    # the null-key and duplicate-key checks used to be two extra
    # actions each re-executing the source subtree (r17):
    # - non-null keys regardless of schema nullability (see
    #   docstring): checked FIRST so a null key gets its message;
    # - KEY-UNIQUE batch: duplicate-key rows would BOTH land and BOTH
    #   survive (same sequence number), silently violating upsert
    #   semantics — which duplicate is "latest" needs an ordering
    #   column this function does not have, so the caller resolves it
    #   (review find r16).
    keys_pdf = (
        source.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(*key_cols)
        .toPandas()
    )
    if keys_pdf[key_cols].isna().any().any():
        raise IcebergWriteError(
            f"NULL in key column(s) {key_cols} — equality deletes "
            "cannot name NULL keys portably"
        )
    dups = keys_pdf[keys_pdf["_n"] > 1]
    if len(dups):
        raise IcebergWriteError(
            f"duplicate keys in the upsert batch (e.g. "
            f"{[dups.iloc[0][c] for c in key_cols]}) — resolve to one "
            "row per key before upsert_iceberg_cdc"
        )
    keys_pdf = keys_pdf.drop(columns=["_n"])
    _assert_no_nulls_in_required(src_rows, snap["schema"])

    # ---- the equality-delete parquet: DISTINCT source keys with the
    # table's field-ids on the key columns (how real engines map them)
    cur_schema = next(
        (s for s in meta.get("schemas") or []
         if s.get("schema-id") == meta.get("current-schema-id")),
        (meta.get("schemas") or [{}])[0],
    )
    fid_by_name = {
        f["name"]: int(f["id"]) for f in cur_schema.get("fields") or []
    }
    eq_ids = [fid_by_name[c] for c in key_cols]
    tbl = pa.Table.from_pandas(keys_pdf, preserve_index=False)
    fields = []
    for i, c in enumerate(key_cols):
        f = tbl.schema.field(tbl.schema.get_field_index(c))
        fields.append(f.with_metadata(
            {b"PARQUET:field_id": str(eq_ids[i]).encode()}
        ))
    tbl = tbl.cast(pa.schema(fields))
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    del_fp = os.path.join(
        data_dir, f"eq-delete-{uuid.uuid4().hex}.parquet"
    )
    pq.write_table(tbl, del_fp)
    eq_files = [(
        del_fp, len(keys_pdf), os.path.getsize(del_fp), {}, eq_ids
    )]
    return write_iceberg(
        src_rows,
        path,
        mode="append",
        expected_snapshot_id=snap["snapshot_id"],
        equality_deletes=eq_files,
        operation="overwrite",
        trust_required=True,
        properties=properties,
    )


def _iceberg_table_context(path: str, snap: dict) -> dict:
    """Shared DML planning facts: current identity partition_by,
    whether any file left the current spec, and whether MoR deletes
    are live — the conditions that route a row-level op to the full
    rewrite instead of the file-pruned path."""
    meta = snap["metadata"]
    specs = meta.get("partition-specs") or []
    cur_spec = next(
        (s for s in specs
         if s.get("spec-id") == meta.get("default-spec-id", 0)),
        specs[0] if specs else {"spec-id": 0, "fields": []},
    )
    cur_schema = next(
        (s for s in meta.get("schemas") or []
         if s.get("schema-id") == meta.get("current-schema-id")),
        {"fields": []},
    )
    name_by_id = {
        int(f["id"]): f["name"] for f in cur_schema.get("fields") or []
    }
    partition_by = []
    for pf in cur_spec.get("fields") or []:
        if pf.get("transform") != "identity":
            raise IcebergProtocolError(
                f"partition transform {pf.get('transform')!r} not "
                "supported by the native writer — use the connector"
            )
        partition_by.append(name_by_id[int(pf["source-id"])])
    fparts = snap.get("file_partitions") or {}
    cur_spec_id = int(cur_spec.get("spec-id", 0))
    multi_spec = any(
        int((fparts.get(f) or (cur_spec_id, {}))[0]) != cur_spec_id
        for f in snap["files"]
    )
    mor = bool(snap["position_deletes"] or snap["equality_deletes"])
    return {
        "partition_by": partition_by,
        "full_rewrite": mor or multi_spec,
        "fparts": fparts,
    }


def _iceberg_carry(snap: dict, exclude: set) -> list[dict]:
    """carry_files entries for every live file NOT in ``exclude``.
    ``snapshot_id`` is the file's ORIGINAL adding snapshot (resolved
    through v2 inheritance by iceberg_snapshot) so the EXISTING
    manifest entry keeps attributing the file to the commit that
    added it — a null there would resolve to the NEW commit's id
    under inheritance, corrupting provenance (ADVICE r15)."""
    fparts = snap.get("file_partitions") or {}
    bounds = snap.get("file_bounds") or {}
    fsids = snap.get("file_snapshot_ids") or {}
    return [
        {
            "path": f,
            "rows": snap["file_rows"].get(f, 0),
            "size": snap["file_sizes"].get(f, 0),
            "partition": (fparts.get(f) or (None, {}))[1],
            "bounds": bounds.get(f) or {},
            "seq": snap["file_seqs"].get(f, 0),
            "snapshot_id": fsids.get(f),
        }
        for f in snap["files"]
        if f not in exclude
    ]


def _iceberg_touched_by_condition(
    spark, snap: dict, cond, range_filter: dict | None
) -> tuple[list[str], "object"]:
    """Iceberg twin of delta_log._touched_by_condition: manifest
    column bounds prune from the caller's ``range_filter`` AND bounds
    auto-derived from simple equality/range conjuncts of a SQL-string
    condition (VERDICT r15 #3 — a bare ``delete_iceberg(spark, p,
    "id = 7")`` is file-pruned by default); the exact probe keeps only
    files actually holding a matching row."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import _scan_parquet
    from embeddinghub_spark.sources.scan_prune import (
        bounds_from_condition,
        decoded_file_path_col,
        range_excluded,
        validate_range_filter,
    )

    if isinstance(cond, str):
        derived = bounds_from_condition(
            cond, [f.name for f in snap["schema"].fields],
            date_as="date",
        )
        if derived:
            merged = dict(derived)
            merged.update(range_filter or {})
            range_filter = merged
    cond = F.expr(cond) if isinstance(cond, str) else cond
    files = list(snap["files"])
    if range_filter:
        validate_range_filter(
            range_filter, [f.name for f in snap["schema"].fields]
        )
        bounds = snap.get("file_bounds") or {}
        files = [
            f for f in files
            if not range_excluded(bounds.get(f) or {}, range_filter)
        ]
    touched: list[str] = []
    if files:
        probe = _scan_parquet(spark, snap, files, with_meta=True)
        hits = {
            r["_fp"]
            for r in probe.filter(cond)
            .select(decoded_file_path_col(F.col("_raw_fp")).alias("_fp"))
            .distinct().collect()
        }
        touched = [f for f in files if f in hits]
    return touched, cond


def delete_iceberg(
    spark,
    path: str,
    condition,
    *,
    range_filter: dict | None = None,
    strategy: str = "cow",
    max_mor_rows: int = 1_000_000,
) -> int | None:
    """Row-level DELETE WHERE ``condition``.

    ``strategy="cow"`` (default) — copy-on-write at file grain, the
    Iceberg twin of ``delete_delta``: only files actually holding a
    matching row rewrite (kept rows = condition false or NULL); every
    other file carries forward as an EXISTING manifest entry with its
    original sequence number. Tables with live MoR deletes or an
    evolved spec take the full purge rewrite.

    ``strategy="mor"`` — merge-on-read via native POSITION DELETE
    files (the spec's content=1 delete manifests, r16 — the Delta
    twin is ``delete_delta(strategy="mor")``): no data file is
    rewritten; the matched (file_path, pos) pairs land in one sorted
    position-delete parquet per partition (field-ids 2147483546/
    2147483545 per the spec), committed through a delete manifest
    appended to the carried manifest list — bytes written ∝ the
    DELETED ROWS. The read path (and any real engine) applies them as
    the position-delete anti-join. Matched positions collect to the
    driver; ``max_mor_rows`` caps the collect and raises toward
    ``cow`` for mass deletes. Tables whose touched files left the
    current spec raise toward ``cow`` (one delete manifest carries
    one partition spec).

    Returns the committed snapshot id, or None when nothing
    matched."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import (
        _scan_parquet,
        iceberg_snapshot,
        read_iceberg,
    )

    if strategy not in ("cow", "mor"):
        raise ValueError(f"strategy must be cow|mor, got {strategy!r}")
    snap = iceberg_snapshot(path)
    if strategy == "mor":
        return _delete_iceberg_mor(
            spark, path, snap, condition, range_filter, max_mor_rows
        )
    ctx = _iceberg_table_context(path, snap)
    if ctx["full_rewrite"]:
        cond = (
            F.expr(condition) if isinstance(condition, str) else condition
        )
        rows = read_iceberg(
            spark, path, snapshot_id=snap["snapshot_id"]
        ).filter(~F.coalesce(cond, F.lit(False)))
        return write_iceberg(
            rows, path, mode="overwrite",
            partition_by=ctx["partition_by"],
            expected_snapshot_id=snap["snapshot_id"],
        )
    # the RAW condition goes through: a SQL string lets stage-1 derive
    # its own pruning bounds (bounds_from_condition)
    touched, cond = _iceberg_touched_by_condition(
        spark, snap, condition, range_filter
    )
    if not touched:
        return None
    kept = _scan_parquet(spark, snap, touched).filter(
        ~F.coalesce(cond, F.lit(False))
    )
    return write_iceberg(
        kept, path, mode="overwrite",
        partition_by=ctx["partition_by"],
        expected_snapshot_id=snap["snapshot_id"],
        carry_files=_iceberg_carry(snap, set(touched)),
    )


def _assert_no_nulls_in_required(df, schema) -> None:
    """Loud runtime twin of the append nullability rule for the MoR
    DML writers: the staged rows must carry NO NULL in any column the
    TABLE schema marks required (their Spark-side nullability flag is
    meaningless — file scans and createDataFrame mark everything
    nullable). One short-circuit take(1)."""
    from pyspark.sql import functions as F

    required = [f.name for f in schema.fields if not f.nullable]
    present = [c for c in required if c in df.columns]
    if not present:
        return
    cond = None
    for c in present:
        piece = F.col(c).isNull()
        cond = piece if cond is None else cond | piece
    if df.filter(cond).take(1):
        raise IcebergWriteError(
            f"staged rows carry NULL in REQUIRED column(s) {present}"
        )


def _collect_position_hits(
    probe, max_mor_rows: int, op: str, fparts: dict, cur_spec_id: int
) -> dict:
    """Collect a ``(_fp, _pos)`` probe frame via Arrow (`toPandas`)
    and group ``(file uri, pos)`` pairs by partition tuple — the
    driver-side half of every MoR commit. Raises when the matched
    row count exceeds ``max_mor_rows``. (r17: the row-based
    ``collect()`` decoded churn-sized hit lists one py4j Row at a
    time — seconds per commit at sf1.)"""
    pdf = probe.limit(max_mor_rows + 1).toPandas()
    if len(pdf) > max_mor_rows:
        raise ValueError(
            f"MoR {op} matches more than max_mor_rows="
            f"{max_mor_rows} rows — use strategy='cow'"
        )
    by_part: dict[tuple, list[tuple[str, int]]] = {}
    if not len(pdf):
        return by_part
    part_keys = {
        fp: tuple(sorted(
            dict((fparts.get(fp) or (cur_spec_id, {}))[1]).items()
        ))
        for fp in set(pdf["_fp"])
    }
    for fp, pos in zip(pdf["_fp"].tolist(), pdf["_pos"].tolist()):
        by_part.setdefault(part_keys[fp], []).append(
            (f"file://{fp}", int(pos))
        )
    return by_part


def _write_position_delete_files(
    path: str, by_part: dict
) -> list[tuple]:
    """One SORTED position-delete parquet per touched partition
    (``by_part``: {sorted partition-tuple items: [(file_path_uri,
    pos), …]}) with the spec's reserved field-ids 2147483546/
    2147483545 — what a content=1 delete manifest entry references.
    Returns [(abs_path, rows, size, partition_dict), …]. Shared by
    the MoR DELETE and MoR UPDATE commit builders."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    pos_schema = pa.schema([
        pa.field("file_path", pa.string(), nullable=False,
                 metadata={b"PARQUET:field_id": b"2147483546"}),
        pa.field("pos", pa.int64(), nullable=False,
                 metadata={b"PARQUET:field_id": b"2147483545"}),
    ])
    delete_files: list[tuple] = []
    for key in sorted(by_part):
        pairs = sorted(by_part[key])
        fp = os.path.join(data_dir, f"delete-{uuid.uuid4().hex}.parquet")
        pq.write_table(
            pa.table(
                {"file_path": [p for p, _ in pairs],
                 "pos": [p for _, p in pairs]},
                schema=pos_schema,
            ),
            fp,
        )
        delete_files.append(
            (fp, len(pairs), os.path.getsize(fp), dict(key))
        )
    return delete_files


def _delete_iceberg_mor(
    spark,
    path: str,
    snap: dict,
    condition,
    range_filter: dict | None,
    max_mor_rows: int,
) -> int | None:
    """Position-delete commit (see ``delete_iceberg(strategy="mor")``).

    The commit is the APPEND shape: every previous manifest-list row
    carries forward verbatim and ONE new content=1 (deletes) manifest
    joins it, holding one sorted position-delete parquet per touched
    partition — data manifests are untouched, so commit cost is
    O(deleted rows + manifest-list rows). Probing does NOT apply
    existing deletes: re-deleting an already-dead (file, pos) writes a
    redundant pair, which the anti-join read treats as a no-op —
    sound, and it keeps the probe one scan. delete file_path values
    record ``file://<resolved path>``, the exact string this writer's
    manifests carry for data files (connector-relocated tables rebase
    through the reader's location logic)."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import _scan_parquet
    from embeddinghub_spark.sources.scan_prune import (
        decoded_file_path_col,
    )

    path = os.path.realpath(os.path.abspath(path))
    meta = snap["metadata"]
    if int(meta.get("format-version", 1)) != 2:
        raise IcebergProtocolError(
            "position-delete writes need a format-version 2 table"
        )
    touched, cond = _iceberg_touched_by_condition(
        spark, snap, condition, range_filter
    )
    if not touched:
        return None
    # one delete manifest carries ONE spec: touched files must all sit
    # in the current spec (evolved-spec leftovers route to cow)
    specs = meta.get("partition-specs") or [{"spec-id": 0, "fields": []}]
    cur_spec = next(
        (s for s in specs
         if s.get("spec-id") == meta.get("default-spec-id", 0)),
        specs[0],
    )
    cur_spec_id = int(cur_spec.get("spec-id", 0))
    fparts = snap.get("file_partitions") or {}
    for f in touched:
        sid = int((fparts.get(f) or (cur_spec_id, {}))[0])
        if sid != cur_spec_id:
            raise IcebergProtocolError(
                f"touched file under spec {sid} != current "
                f"{cur_spec_id} — use strategy='cow' for evolved-spec "
                "tables"
            )
    probe = _scan_parquet(spark, snap, touched, with_meta=True).filter(
        cond
    ).select(
        decoded_file_path_col(F.col("_raw_fp")).alias("_fp"),
        F.col("_pos"),
    )
    by_part = _collect_position_hits(
        probe, max_mor_rows, "DELETE", fparts, cur_spec_id
    )
    if not by_part:
        return None

    delete_files = _write_position_delete_files(path, by_part)

    # ---- commit: new delete manifest + carried manifest list
    meta_dir = os.path.join(path, "metadata")
    latest = _max_metadata_version(meta_dir)
    if latest is None:
        raise IcebergWriteError(f"not an Iceberg table: {path}")
    prev_version, mfile = latest
    with open(mfile, encoding="utf-8") as fh:
        prev_meta = json.load(fh)
    cur_sid = prev_meta.get("current-snapshot-id")
    if cur_sid != snap["snapshot_id"]:
        raise IcebergWriteError(
            f"table advanced to snapshot {cur_sid} (expected "
            f"{snap['snapshot_id']}): {path}"
        )
    prev_snaps = list(prev_meta.get("snapshots") or [])
    snapshot_id = max(
        [int(s["snapshot-id"]) for s in prev_snaps], default=0
    ) + 1
    seq = int(prev_meta.get("last-sequence-number", 0)) + 1
    now_ms = int(time.time() * 1000)
    cur_schema = next(
        (s for s in prev_meta.get("schemas") or []
         if s.get("schema-id") == prev_meta.get("current-schema-id")),
        {"fields": [], "schema-id": 0},
    )
    type_by_id = {
        int(f["id"]): f["type"] for f in cur_schema.get("fields") or []
        if isinstance(f.get("type"), str)
    }
    spec_field_defs = [
        (pf["name"], type_by_id.get(int(pf["source-id"]), "string"),
         int(pf["field-id"]))
        for pf in cur_spec.get("fields") or []
    ]
    man_path = os.path.join(meta_dir, f"m-{uuid.uuid4().hex}.avro")
    write_avro_file(
        man_path,
        _manifest_entry_schema(spec_field_defs),
        [
            {
                "status": 1,  # ADDED (sequence number inherits)
                "snapshot_id": snapshot_id,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 1,  # POSITION_DELETES
                    "file_path": f"file://{fp}",
                    "file_format": "PARQUET",
                    "partition": part,
                    "record_count": rows,
                    "file_size_in_bytes": size,
                    "lower_bounds": None,
                    "upper_bounds": None,
                    "equality_ids": None,
                },
            }
            for fp, rows, size, part in delete_files
        ],
        metadata={
            "schema": json.dumps(
                {k: v for k, v in cur_schema.items()
                 if k != "schema-id"}
            ),
            "partition-spec": json.dumps(cur_spec.get("fields") or []),
            "partition-spec-id": str(cur_spec_id),
            "format-version": "2",
            "content": "deletes",
        },
    )
    rows_out = [{
        "manifest_path": f"file://{man_path}",
        "manifest_length": os.path.getsize(man_path),
        "partition_spec_id": cur_spec_id,
        "content": 1,  # deletes
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(delete_files),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(r for _, r, _, _ in delete_files),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }]
    cur_snap_rec = next(
        (s for s in prev_snaps
         if s["snapshot-id"] == prev_meta.get("current-snapshot-id")),
        None,
    )
    if cur_snap_rec is not None:
        import re as _re

        prev_ml_path = _re.sub(
            r"^file:/*", "/", cur_snap_rec["manifest-list"]
        )
        _, prev_rows = read_avro_file(prev_ml_path)
        for r in prev_rows:
            rows_out.append({
                k: int(r.get(k) or 0)
                for k in (
                    "manifest_length", "partition_spec_id", "content",
                    "sequence_number", "min_sequence_number",
                    "added_snapshot_id", "added_files_count",
                    "existing_files_count", "deleted_files_count",
                    "added_rows_count", "existing_rows_count",
                    "deleted_rows_count",
                )
            } | {"manifest_path": r["manifest_path"]})
    ml_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-{uuid.uuid4().hex}.avro"
    )
    write_avro_file(
        ml_path,
        _manifest_list_schema(),
        rows_out,
        metadata={
            "snapshot-id": str(snapshot_id),
            "sequence-number": str(seq),
            "format-version": "2",
        },
    )
    n_deleted = sum(r for _, r, _, _ in delete_files)
    snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": f"file://{ml_path}",
        "summary": {
            "operation": "delete",
            "added-delete-files": str(len(delete_files)),
            "added-position-deletes": str(n_deleted),
            "added-data-files": "0",
            "added-records": "0",
            "total-data-files": str(len(snap["files"])),
            "total-records": str(sum(
                snap["file_rows"].get(f, 0) for f in snap["files"]
            )),
        },
        "schema-id": cur_schema.get("schema-id", 0),
        "parent-snapshot-id": prev_meta.get("current-snapshot-id"),
    }
    meta_out = dict(prev_meta)
    meta_out.update({
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "current-snapshot-id": snapshot_id,
        "snapshots": prev_snaps + [snapshot],
        "snapshot-log": list(prev_meta.get("snapshot-log") or [])
        + [{"timestamp-ms": now_ms, "snapshot-id": snapshot_id}],
    })
    refs = dict(prev_meta.get("refs") or {})
    refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
    meta_out["refs"] = refs
    version = prev_version + 1
    final = os.path.join(meta_dir, f"v{version}.metadata.json")
    if not _atomic_put(final, json.dumps(meta_out)):
        for p in (man_path, ml_path):
            try:
                os.unlink(p)
            except OSError:
                pass
        raise IcebergWriteError(
            f"lost the commit race at version {version}: {path}"
        )
    hint_tmp = os.path.join(
        meta_dir, f"version-hint.{uuid.uuid4().hex}.tmp"
    )
    with open(hint_tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
    return snapshot_id


def _update_iceberg_mor(
    spark,
    path: str,
    snap: dict,
    condition,
    assignments: dict,
    range_filter: dict | None,
    max_mor_rows: int,
) -> int | None:
    """Row-delta UPDATE commit (see ``update_iceberg(
    strategy="mor")``): position-delete the matched rows' old
    positions and stage their updated images as new data files, in
    ONE ``write_iceberg(position_deletes=…)`` append. The matched set
    is computed twice over the same immutable files (one driver
    collect for positions, one staged write for the images) —
    parquet row_index is deterministic at rest, so the two reads
    agree by construction. Updated images round-trip through a
    staging parquet read under the SNAPSHOT schema so required
    columns stay required for the append validation; assigning NULL
    into a required column raises loudly first."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import _scan_parquet
    from embeddinghub_spark.sources.scan_prune import (
        decoded_file_path_col,
    )

    path = os.path.realpath(os.path.abspath(path))
    meta = snap["metadata"]
    ctx = _iceberg_table_context(path, snap)
    types = {f.name: f.dataType for f in snap["schema"].fields}
    unknown = sorted(set(assignments) - set(types))
    if unknown:
        raise ValueError(f"UPDATE assigns unknown columns {unknown}")
    moved = sorted(set(assignments) & set(ctx["partition_by"]))
    if moved:
        raise ValueError(
            f"UPDATE of partition columns {moved} moves rows between "
            "partitions — rewrite via merge_iceberg instead"
        )
    touched, cond = _iceberg_touched_by_condition(
        spark, snap, condition, range_filter
    )
    if not touched:
        return None
    specs = meta.get("partition-specs") or [{"spec-id": 0, "fields": []}]
    cur_spec = next(
        (s for s in specs
         if s.get("spec-id") == meta.get("default-spec-id", 0)),
        specs[0],
    )
    cur_spec_id = int(cur_spec.get("spec-id", 0))
    fparts = snap.get("file_partitions") or {}
    for f in touched:
        sid = int((fparts.get(f) or (cur_spec_id, {}))[0])
        if sid != cur_spec_id:
            raise IcebergProtocolError(
                f"touched file under spec {sid} != current "
                f"{cur_spec_id} — use strategy='cow' for evolved-spec "
                "tables"
            )
    if snap["equality_deletes"]:
        # applying equality-delete semantics inside the probe needs
        # the sequence-number join — the cow full rewrite owns that
        raise IcebergProtocolError(
            "MoR UPDATE over live equality deletes — use "
            "strategy='cow'"
        )
    scan = _scan_parquet(spark, snap, touched, with_meta=True)
    # DEAD rows must not re-match: an updated image of a position-
    # deleted row would RESURRECT it in the new data file (unlike
    # delete/merge, where a redundant delete position is a no-op).
    # Apply existing position deletes to the probe exactly like
    # read_iceberg does.
    scan = scan.withColumn(
        "_fpn", decoded_file_path_col(F.col("_raw_fp"))
    )
    if snap["position_deletes"]:
        location = meta.get("location")
        loc_plain = (
            re.sub(r"^file:/*", "/", location).rstrip("/")
            if location else None
        )
        dcol = decoded_file_path_col(F.col("file_path"))
        if loc_plain and loc_plain != path:
            pref = loc_plain + "/"
            dcol = F.when(
                dcol.startswith(pref),
                F.concat(
                    F.lit(path + "/"),
                    F.substring(dcol, len(pref) + 1, 2_000_000_000),
                ),
            ).otherwise(dcol)
        dels = spark.read.parquet(
            *sorted(snap["position_deletes"])
        ).select(
            dcol.alias("_dfp"),
            F.col("pos").cast("long").alias("_dpos"),
        )
        scan = scan.join(
            dels,
            (scan["_fpn"] == dels["_dfp"])
            & (scan["_pos"] == dels["_dpos"]),
            "left_anti",
        )
    scan = scan.filter(cond)
    by_part = _collect_position_hits(
        scan.select(F.col("_fpn").alias("_fp"), F.col("_pos")),
        max_mor_rows, "UPDATE", fparts, cur_spec_id,
    )
    if not by_part:
        return None
    delete_files = _write_position_delete_files(path, by_part)

    # updated images of exactly the matched rows, assignments against
    # the PRE-update row in one projection
    sel = []
    for fld in snap["schema"].fields:
        if fld.name in assignments:
            e = assignments[fld.name]
            e = F.expr(e) if isinstance(e, str) else e
            sel.append(e.cast(types[fld.name]).alias(fld.name))
        else:
            sel.append(F.col(fld.name))
    updated = scan.select(*sel)
    required_assigned = [
        f.name for f in snap["schema"].fields
        if f.name in assignments and not f.nullable
    ]
    if required_assigned:
        bad = updated.filter(
            F.greatest(*[
                F.col(c).isNull().cast("int")
                for c in required_assigned
            ] + [F.lit(0)]) > 0
        ).take(1)
        if bad:
            raise IcebergWriteError(
                "UPDATE assigns NULL into REQUIRED column(s) "
                f"{required_assigned}"
            )
    # nullability: Spark marks every file-scan column nullable, but
    # the rows can't be NULL in required columns (checked above for
    # assigned ones; unassigned come from files that satisfied
    # required) — verified at runtime, then trust_required lets the
    # append validation through without an RDD round-trip
    _assert_no_nulls_in_required(updated, snap["schema"])
    return write_iceberg(
        updated,
        path,
        mode="append",
        partition_by=ctx["partition_by"],
        expected_snapshot_id=snap["snapshot_id"],
        position_deletes=delete_files,
        operation="overwrite",
        trust_required=True,
    )


def update_iceberg(
    spark,
    path: str,
    condition,
    assignments: dict,
    *,
    range_filter: dict | None = None,
    strategy: str = "cow",
    max_mor_rows: int = 1_000_000,
) -> int | None:
    """Row-level UPDATE ... SET ``assignments`` WHERE ``condition``.

    ``strategy="cow"`` (default) — the Iceberg twin of
    ``update_delta``: touched files rewrite with the assignments
    applied to exactly the matching rows, evaluated against the
    PRE-update row in one projection; untouched files carry forward
    with original sequence numbers.

    ``strategy="mor"`` — the ROW-DELTA shape (r16, the spec's
    "overwrite" snapshot): the matched rows' old positions land in
    per-partition position-delete files and their UPDATED images
    stage as new data files, committed atomically through ONE
    ``write_iceberg(position_deletes=…)`` append — bytes written ∝
    the MATCHED ROWS, not the touched files. ``max_mor_rows`` gates
    mass updates toward ``cow``; evolved-spec leftovers raise toward
    ``cow`` (one delete manifest carries one spec).

    Assigned columns must exist, partition columns are immutable here
    (an update that moves rows between partitions belongs on
    ``merge_iceberg``), and expressions cast back to the column's
    exact table type. Returns the committed snapshot id, or None when
    nothing matched."""
    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import (
        _scan_parquet,
        iceberg_snapshot,
        read_iceberg,
    )

    if strategy not in ("cow", "mor"):
        raise ValueError(f"strategy must be cow|mor, got {strategy!r}")
    snap = iceberg_snapshot(path)
    if strategy == "mor":
        return _update_iceberg_mor(
            spark, path, snap, condition, assignments, range_filter,
            max_mor_rows,
        )
    ctx = _iceberg_table_context(path, snap)
    types = {f.name: f.dataType for f in snap["schema"].fields}
    unknown = sorted(set(assignments) - set(types))
    if unknown:
        raise ValueError(f"UPDATE assigns unknown columns {unknown}")
    moved = sorted(set(assignments) & set(ctx["partition_by"]))
    if moved:
        raise ValueError(
            f"UPDATE of partition columns {moved} moves rows between "
            "partitions — rewrite via merge_iceberg instead"
        )
    cond = F.expr(condition) if isinstance(condition, str) else condition

    def _apply(rows):
        hit_col = "__hit"
        while hit_col in rows.columns:
            hit_col += "_"
        rows = rows.withColumn(hit_col, F.coalesce(cond, F.lit(False)))
        sel = []
        for f in snap["schema"].fields:
            if f.name in assignments:
                e = assignments[f.name]
                e = F.expr(e) if isinstance(e, str) else e
                sel.append(
                    F.when(F.col(hit_col), e.cast(types[f.name]))
                    .otherwise(F.col(f.name)).alias(f.name)
                )
            else:
                sel.append(F.col(f.name))
        return rows.select(*sel)

    if ctx["full_rewrite"]:
        rows = _apply(read_iceberg(
            spark, path, snapshot_id=snap["snapshot_id"]
        ))
        return write_iceberg(
            rows, path, mode="overwrite",
            partition_by=ctx["partition_by"],
            expected_snapshot_id=snap["snapshot_id"],
        )
    # the RAW condition goes through: a SQL string lets stage-1 derive
    # its own pruning bounds (bounds_from_condition); _apply reads the
    # rebound Column via its closure
    touched, cond = _iceberg_touched_by_condition(
        spark, snap, condition, range_filter
    )
    if not touched:
        return None
    rows = _apply(_scan_parquet(spark, snap, touched))
    return write_iceberg(
        rows, path, mode="overwrite",
        partition_by=ctx["partition_by"],
        expected_snapshot_id=snap["snapshot_id"],
        carry_files=_iceberg_carry(snap, set(touched)),
    )


def compact_iceberg(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 << 20,
    min_files: int = 2,
    sort_by: list[str] | None = None,
) -> int | None:
    """rewriteDataFiles — bin-pack small data files into
    ~``target_file_bytes`` files in ONE snapshot (the connector's
    ``rewriteDataFiles``): every live file smaller than the target is
    rewritten; larger files carry forward as EXISTING manifest entries
    with their ORIGINAL sequence numbers (``write_iceberg
    (carry_files=…)``), so bytes written ∝ the small-file backlog.

    ``sort_by`` range-clusters the rewritten rows so their manifest
    column bounds come out tight and mostly disjoint — what
    ``read_iceberg(range_filter=…)`` manifest pruning keys on
    (pre-compute ``functions.zorder_key`` for multi-column locality).

    Tables with live MoR deletes or files from an EVOLVED partition
    spec take a FULL rewrite through the MoR-applying reader instead
    — that is the real ``rewriteDataFiles``'s delete-compaction job:
    the new snapshot carries no delete manifests because the deletes
    are materialized into the rewritten files.

    Returns the committed snapshot id, or None when there is nothing
    to do. Concurrency: pins ``expected_snapshot_id``; a concurrent
    commit raises ``IcebergWriteError`` (re-invoke)."""
    import math

    from pyspark.sql import functions as F

    from embeddinghub_spark.sources.iceberg_meta import (
        _scan_parquet,
        iceberg_snapshot,
        read_iceberg,
    )

    snap = iceberg_snapshot(path)
    ctx = _iceberg_table_context(path, snap)
    partition_by = ctx["partition_by"]
    sizes = snap.get("file_sizes") or {}

    def _shape(rows_df, n_out: int):
        if sort_by:
            return rows_df.repartitionByRange(
                n_out, *[F.col(c) for c in sort_by]
            ).sortWithinPartitions(*sort_by)
        return rows_df.repartition(n_out)

    if ctx["full_rewrite"]:
        # full purge rewrite: deletes materialize into the new files,
        # evolved-spec files re-express under the current spec
        rows = read_iceberg(spark, path,
                            snapshot_id=snap["snapshot_id"])
        total = sum(int(sizes.get(f) or 0) for f in snap["files"])
        n_out = max(1, math.ceil(total / int(target_file_bytes)))
        return write_iceberg(
            _shape(rows, n_out),
            path,
            mode="overwrite",
            partition_by=partition_by,
            expected_snapshot_id=snap["snapshot_id"],
            operation="replace",
        )

    small = [
        f for f in snap["files"]
        if int(sizes.get(f) or 0) < int(target_file_bytes)
    ]
    if len(small) < max(2, int(min_files)):
        return None
    rows = _scan_parquet(spark, snap, small)
    total = sum(int(sizes.get(f) or 0) for f in small)
    n_out = max(1, math.ceil(total / int(target_file_bytes)))
    carry = _iceberg_carry(snap, set(small))
    return write_iceberg(
        _shape(rows, n_out),
        path,
        mode="overwrite",
        partition_by=partition_by,
        expected_snapshot_id=snap["snapshot_id"],
        carry_files=carry,
        operation="replace",
    )
