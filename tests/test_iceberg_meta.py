"""sources/iceberg_meta.py + sources/avro_io.py — native Iceberg read.

Tables are constructed BY HAND per the public Iceberg table spec
(metadata JSON, Avro manifest lists, Avro manifests; parquet data via
pyarrow). No connector JAR anywhere — that absence is exactly what the
module exists for (S3 fallback; readers.py:read_file dispatch).

The Avro layer is cross-validated BOTH directions against the real
Java Avro library bundled with Spark (org.apache.avro via py4j), so
the pure-Python codec cannot drift into a self-consistent dialect.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embeddinghub_spark.sources.avro_io import (
    AvroError,
    read_avro_file,
    write_avro_file,
)
from embeddinghub_spark.sources.iceberg_meta import (
    IcebergProtocolError,
    is_iceberg_table,
    iceberg_snapshot,
    read_iceberg,
)

# ------------------------------------------------------------------ avro layer

_XVAL_SCHEMA = {
    "type": "record",
    "name": "entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snap", "type": ["null", "long"]},
        {"name": "path", "type": "string"},
        {"name": "ratio", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "tags", "type": {"type": "map", "values": "string"}},
        {"name": "ids", "type": {"type": "array", "items": "long"}},
    ],
}
_XVAL_ROWS = [
    {"status": 1, "snap": 5_000_000_000, "path": "a/b.parquet",
     "ratio": 1.25, "ok": True, "tags": {"k": "v"}, "ids": [1, -2, 3]},
    {"status": 2, "snap": None, "path": "", "ratio": -0.5, "ok": False,
     "tags": {}, "ids": []},
]


def test_avro_roundtrip_python_both_codecs(tmp_path):
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"rt_{codec}.avro")
        write_avro_file(p, _XVAL_SCHEMA, _XVAL_ROWS, codec=codec)
        meta, rows = read_avro_file(p)
        assert rows == _XVAL_ROWS
        assert meta["codec"] == codec
    with pytest.raises(AvroError, match="not an Avro container"):
        bad = str(tmp_path / "bad.avro")
        open(bad, "wb").write(b"PAR1nope")
        read_avro_file(bad)


def test_avro_crossvalidated_against_java_avro(spark, tmp_path):
    """Java Avro writes -> Python reads, and Python writes -> Java
    Avro reads, same rows both ways (deflate codec — what Iceberg
    manifests use)."""
    jvm = spark.sparkContext._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(_XVAL_SCHEMA)
    )

    # Java -> Python
    jpath = str(tmp_path / "java.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(schema, jvm.java.io.File(jpath))
    for row in _XVAL_ROWS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("status", row["status"])
        rec.put(
            "snap",
            None if row["snap"] is None else jvm.java.lang.Long(row["snap"]),
        )
        rec.put("path", row["path"])
        rec.put("ratio", row["ratio"])
        rec.put("ok", row["ok"])
        tags = jvm.java.util.HashMap()
        for k, v in row["tags"].items():
            tags.put(k, v)
        rec.put("tags", tags)
        ids = jvm.java.util.ArrayList()
        for i in row["ids"]:
            ids.add(jvm.java.lang.Long(i))
        rec.put("ids", ids)
        writer.append(rec)
    writer.close()
    _, rows = read_avro_file(jpath)
    assert rows == _XVAL_ROWS

    # Python -> Java
    ppath = str(tmp_path / "python.avro")
    write_avro_file(ppath, _XVAL_SCHEMA, _XVAL_ROWS, codec="deflate")
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(ppath),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append(
            {
                "status": rec.get("status"),
                "snap": rec.get("snap"),
                "path": str(rec.get("path")),
                "ratio": rec.get("ratio"),
                "ok": rec.get("ok"),
                "tags": {
                    str(k): str(v)
                    for k, v in dict(rec.get("tags")).items()
                },
                "ids": list(rec.get("ids")),
            }
        )
    reader.close()
    assert got == _XVAL_ROWS


# --------------------------------------------------------- iceberg table layer

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                ],
            },
        },
    ],
}

_ICE_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": True, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "string"},
        {"id": 3, "name": "lang", "required": False, "type": "string"},
    ],
}


def _data_file(table, rel, ids, vs, langs):
    p = os.path.join(table, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "v": pa.array(vs, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        ),
        p,
    )
    return p


def _manifest(table, name, entries):
    p = os.path.join(table, "metadata", name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    write_avro_file(
        p,
        _MANIFEST_SCHEMA,
        [
            {
                "status": st,
                "snapshot_id": None,
                "data_file": {
                    "content": c,
                    "file_path": fp,
                    "file_format": fmt,
                    "record_count": 1,
                },
            }
            for st, c, fp, fmt in entries
        ],
    )
    return p


def _manifest_list(table, name, manifests):
    p = os.path.join(table, "metadata", name)
    write_avro_file(
        p,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": c,
                "added_snapshot_id": None,
            }
            for mp, c in manifests
        ],
    )
    return p


def _metadata(table, version, snapshots, current):
    meta = {
        "format-version": 2,
        "table-uuid": "0000-uuid",
        "location": f"file://{table}",
        "schemas": [_ICE_SCHEMA],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "current-snapshot-id": current,
        "snapshots": snapshots,
    }
    d = os.path.join(table, "metadata")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"v{version}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(d, "version-hint.text"), "w") as fh:
        fh.write(str(version))


@pytest.fixture()
def ice_table(tmp_path):
    """Two snapshots: s1 adds f1; s2 adds f2 (f1 existing)."""
    t = str(tmp_path / "ice")
    f1 = _data_file(t, "data/f1.parquet", [1, 2], ["a", "b"], ["en", "fr"])
    f2 = _data_file(t, "data/f2.parquet", [3], ["c"], ["de"])
    m1 = _manifest(t, "m1.avro", [(1, 0, f"file://{f1}", "PARQUET")])
    m2 = _manifest(t, "m2.avro", [(1, 0, f"file://{f2}", "PARQUET")])
    ml1 = _manifest_list(t, "ml1.avro", [(m1, 0)])
    ml2 = _manifest_list(t, "ml2.avro", [(m1, 0), (m2, 0)])
    s1 = {"snapshot-id": 101, "timestamp-ms": 1000,
          "manifest-list": f"file://{ml1}", "schema-id": 0}
    s2 = {"snapshot-id": 202, "timestamp-ms": 2000,
          "manifest-list": f"file://{ml2}", "schema-id": 0}
    _metadata(t, 2, [s1, s2], 202)
    return t


def test_read_latest_and_time_travel(spark, ice_table):
    assert is_iceberg_table(ice_table)
    cur = read_iceberg(spark, ice_table)
    assert cur.columns == ["id", "v", "lang"]
    got = {(r["id"], r["v"], r["lang"]) for r in cur.collect()}
    assert got == {(1, "a", "en"), (2, "b", "fr"), (3, "c", "de")}
    old = {
        (r["id"], r["v"])
        for r in read_iceberg(spark, ice_table, snapshot_id=101).collect()
    }
    assert old == {(1, "a"), (2, "b")}
    asof = {
        (r["id"], r["v"])
        for r in read_iceberg(
            spark, ice_table, as_of_timestamp_ms=1500
        ).collect()
    }
    assert asof == {(1, "a"), (2, "b")}
    with pytest.raises(ValueError, match="not in"):
        iceberg_snapshot(ice_table, snapshot_id=999)
    with pytest.raises(ValueError, match="at or before"):
        iceberg_snapshot(ice_table, as_of_timestamp_ms=500)
    with pytest.raises(ValueError, match="ONE of"):
        iceberg_snapshot(ice_table, snapshot_id=101, as_of_timestamp_ms=1500)


def test_deleted_entries_and_dead_files_are_invisible(spark, tmp_path):
    """A status=2 (DELETED) manifest entry is not part of the snapshot;
    the file vanishes even though it is still on disk."""
    t = str(tmp_path / "del")
    f1 = _data_file(t, "data/f1.parquet", [1], ["a"], ["en"])
    f2 = _data_file(t, "data/f2.parquet", [2], ["b"], ["fr"])
    m = _manifest(
        t, "m.avro",
        [(0, 0, f"file://{f1}", "PARQUET"), (2, 0, f"file://{f2}", "PARQUET")],
    )
    ml = _manifest_list(t, "ml.avro", [(m, 0)])
    s = {"snapshot-id": 7, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _metadata(t, 1, [s], 7)
    got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
    assert got == {(1, "a")}


def test_protocol_gates_raise(spark, tmp_path):
    # equality delete entries (data_file.content=2) -> loud gap
    # (position deletes, content=1, are natively applied — see
    # test_position_deletes_applied_exactly)
    t = str(tmp_path / "dv")
    f1 = _data_file(t, "data/f1.parquet", [1], ["a"], ["en"])
    dm = _manifest(t, "dm.avro", [(1, 2, f"file://{f1}", "PARQUET")])
    ml = _manifest_list(t, "ml.avro", [(dm, 1)])
    s = {"snapshot-id": 7, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _metadata(t, 1, [s], 7)
    with pytest.raises(IcebergProtocolError, match="equality delete"):
        iceberg_snapshot(t)

    # non-parquet data file
    t2 = str(tmp_path / "orc")
    f2 = _data_file(t2, "data/f1.parquet", [1], ["a"], ["en"])
    m2 = _manifest(t2, "m.avro", [(1, 0, f"file://{f2}", "ORC")])
    ml2 = _manifest_list(t2, "ml.avro", [(m2, 0)])
    s2 = {"snapshot-id": 7, "timestamp-ms": 1,
          "manifest-list": f"file://{ml2}", "schema-id": 0}
    _metadata(t2, 1, [s2], 7)
    with pytest.raises(IcebergProtocolError, match="ORC"):
        iceberg_snapshot(t2)

    # uuid column type has no faithful native reading
    from embeddinghub_spark.sources.iceberg_meta import _to_spark_type

    with pytest.raises(IcebergProtocolError, match="uuid"):
        _to_spark_type("uuid")


def test_empty_table_and_snapshotless_metadata(spark, tmp_path):
    t = str(tmp_path / "empty")
    _metadata(t, 1, [], None)
    out = read_iceberg(spark, t)
    assert out.count() == 0 and out.columns == ["id", "v", "lang"]
    assert not is_iceberg_table(str(tmp_path / "nope"))


def test_relocated_table_paths_rebase(spark, ice_table, tmp_path):
    """Manifest/data URIs record the WRITE-time location; a moved
    table must rebase them onto the actual root."""
    import shutil

    moved = str(tmp_path / "moved")
    shutil.copytree(ice_table, moved)
    shutil.rmtree(ice_table)
    got = {(r["id"], r["v"]) for r in read_iceberg(spark, moved).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_read_file_dispatches_to_native_iceberg(spark, ice_table):
    from embeddinghub_spark.sources.readers import read_file

    got = {(r["id"], r["v"]) for r in read_file(
        spark, ice_table, "iceberg"
    ).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    old = {(r["id"], r["v"]) for r in read_file(
        spark, ice_table, "iceberg", **{"snapshot-id": "101"}
    ).collect()}
    assert old == {(1, "a"), (2, "b")}
    with pytest.raises(ValueError, match="snapshot-id/as-of-timestamp"):
        read_file(spark, ice_table, "iceberg", somethingElse="1")


def test_schema_type_mapping():
    from pyspark.sql import types as T

    from embeddinghub_spark.sources.iceberg_meta import _to_spark_type

    got = _to_spark_type(
        {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "a", "required": True, "type": "int"},
                {"id": 2, "name": "b", "required": False,
                 "type": "decimal(10, 2)"},
                {"id": 3, "name": "c", "required": False, "type": "fixed[8]"},
                {"id": 4, "name": "d", "required": False,
                 "type": "timestamp"},
                {"id": 5, "name": "e", "required": False,
                 "type": "timestamptz"},
                {"id": 6, "name": "f", "required": False,
                 "type": {"type": "list", "element-id": 7,
                          "element": "long", "element-required": True}},
                {"id": 8, "name": "g", "required": False,
                 "type": {"type": "map", "key-id": 9, "key": "string",
                          "value-id": 10, "value": "double",
                          "value-required": False}},
            ],
        }
    )
    assert got["a"].dataType == T.IntegerType()
    assert not got["a"].nullable
    assert got["b"].dataType == T.DecimalType(10, 2)
    assert got["c"].dataType == T.BinaryType()
    assert got["d"].dataType == T.TimestampNTZType()
    assert got["e"].dataType == T.TimestampType()
    assert got["f"].dataType == T.ArrayType(T.LongType(), False)
    assert got["g"].dataType == T.MapType(
        T.StringType(), T.DoubleType(), True
    )


def test_avro_union_branch_picked_by_value_type(tmp_path):
    """Review find r13: the encoder used to write the FIRST non-null
    union branch regardless of value type. Branches are now selected
    by the value's Python type and a mismatch raises."""
    schema = {
        "type": "record", "name": "u",
        "fields": [{"name": "f", "type": ["null", "string", "long"]}],
    }
    p = str(tmp_path / "u.avro")
    rows = [{"f": None}, {"f": "txt"}, {"f": 42}]
    write_avro_file(p, schema, rows, codec="null")
    _, got = read_avro_file(p)
    assert got == rows
    with pytest.raises(AvroError, match="no union branch"):
        write_avro_file(p, schema, [{"f": 1.5}], codec="null")


def test_resolve_never_reads_relative_paths_from_cwd(tmp_path, monkeypatch):
    """Review find r13: a bare relative recorded path must anchor at
    the table root, never the process CWD — an unrelated CWD file with
    the same relative name used to win silently."""
    from embeddinghub_spark.sources.iceberg_meta import _resolve

    table = tmp_path / "tbl"
    (table / "data").mkdir(parents=True)
    (table / "data" / "f.parquet").write_bytes(b"right")
    decoy = tmp_path / "cwd"
    (decoy / "data").mkdir(parents=True)
    (decoy / "data" / "f.parquet").write_bytes(b"wrong")
    monkeypatch.chdir(decoy)
    got = _resolve("data/f.parquet", str(table), None)
    assert open(got, "rb").read() == b"right"


def _pos_delete_file(table, rel, pairs):
    """A position delete parquet: (file_path, pos) rows."""
    p = os.path.join(table, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(
        pa.table({
            "file_path": pa.array([fp for fp, _ in pairs], pa.string()),
            "pos": pa.array([pos for _, pos in pairs], pa.int64()),
        }),
        p,
    )
    return p


def test_position_deletes_applied_exactly(spark, tmp_path):
    """v2 merge-on-read, position grain: delete files name
    (file_path, pos); the reader removes exactly those rows via
    _metadata.row_index — across files, across path spellings
    (file:// vs bare), leaving all other rows intact."""
    t = str(tmp_path / "mor")
    f1 = _data_file(t, "data/f1.parquet", [1, 2, 3], ["a", "b", "c"],
                    ["en", "fr", "de"])
    f2 = _data_file(t, "data/f2.parquet", [4, 5], ["d", "e"],
                    ["it", "es"])
    # delete f1 pos 1 (id=2, recorded file://-style) and f2 pos 0
    # (id=4, recorded as a bare absolute path)
    pd1 = _pos_delete_file(t, "data/del1.parquet",
                           [(f"file://{f1}", 1), (f2, 0)])
    m = _manifest(
        t, "m.avro",
        [(1, 0, f"file://{f1}", "PARQUET"),
         (1, 0, f"file://{f2}", "PARQUET")],
    )
    dm = _manifest(t, "dm.avro", [(1, 1, f"file://{pd1}", "PARQUET")])
    ml = _manifest_list(t, "ml.avro", [(m, 0), (dm, 1)])
    s = {"snapshot-id": 9, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _metadata(t, 1, [s], 9)
    snap = iceberg_snapshot(t)
    assert len(snap["position_deletes"]) == 1
    got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
    assert got == {(1, "a"), (3, "c"), (5, "e")}
    # carry_files over a snapshot with live delete manifests would
    # resurrect the deleted rows — the write-level gate is loud
    # (merge_iceberg routes delete-bearing tables to the full rebuild
    # before reaching it)
    from embeddinghub_spark.sources.iceberg_write import write_iceberg

    df = spark.createDataFrame([(9, "z", "en")], "id long, v string, lang string")
    with pytest.raises(IcebergProtocolError, match="resurrect"):
        write_iceberg(df, t, mode="overwrite", carry_files=[],
                      expected_snapshot_id=9)


def test_equality_deletes_still_raise(spark, tmp_path):
    t = str(tmp_path / "eq")
    f1 = _data_file(t, "data/f1.parquet", [1], ["a"], ["en"])
    ed = _data_file(t, "data/ed.parquet", [1], ["a"], ["en"])
    m = _manifest(t, "m.avro", [(1, 0, f"file://{f1}", "PARQUET")])
    dm = _manifest(t, "dm.avro", [(1, 2, f"file://{ed}", "PARQUET")])
    ml = _manifest_list(t, "ml.avro", [(m, 0), (dm, 1)])
    s = {"snapshot-id": 9, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _metadata(t, 1, [s], 9)
    with pytest.raises(IcebergProtocolError, match="equality delete"):
        iceberg_snapshot(t)


_MANIFEST_SCHEMA_V2 = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2v2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "equality_ids",
                     "type": ["null",
                              {"type": "array", "items": "int"}]},
                ],
            },
        },
    ],
}


def _manifest_v2(table, name, entries):
    """entries: (status, content, file_path, fmt, seq, equality_ids)."""
    p = os.path.join(table, "metadata", name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    write_avro_file(
        p,
        _MANIFEST_SCHEMA_V2,
        [
            {
                "status": st,
                "snapshot_id": None,
                "sequence_number": seq,
                "data_file": {
                    "content": c,
                    "file_path": fp,
                    "file_format": fmt,
                    "record_count": 1,
                    "equality_ids": eq,
                },
            }
            for st, c, fp, fmt, seq, eq in entries
        ],
    )
    return p


def test_equality_deletes_respect_sequence_numbers(spark, tmp_path):
    """The spec's MoR sequencing: an equality delete at sequence S
    removes matching rows only from data files with sequence < S — a
    row re-inserted at a LATER sequence survives the delete."""
    t = str(tmp_path / "eqseq")
    fa = _data_file(t, "data/a.parquet", [1, 2], ["a", "b"], ["en", "fr"])
    fb = _data_file(t, "data/b.parquet", [2], ["b2"], ["fr"])
    ed = os.path.join(t, "data/ed.parquet")
    pq.write_table(pa.table({"id": pa.array([2], pa.int64())}), ed)
    m = _manifest_v2(
        t, "m.avro",
        [
            (1, 0, f"file://{fa}", "PARQUET", 1, None),   # data, seq 1
            (1, 0, f"file://{fb}", "PARQUET", 3, None),   # re-insert, seq 3
            (1, 2, f"file://{ed}", "PARQUET", 2, [1]),    # eq-del id=2 @ seq 2
        ],
    )
    ml = _manifest_list(t, "ml.avro", [(m, 0)])
    s = {"snapshot-id": 5, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _metadata(t, 1, [s], 5)
    snap = iceberg_snapshot(t)
    assert snap["equality_deletes"] == [
        {"path": ed, "seq": 2, "equality_cols": ["id"], "scope": None}
    ]
    got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
    # (2, 'b') @ seq 1 dies to the seq-2 delete; (2, 'b2') @ seq 3 lives
    assert got == {(1, "a"), (2, "b2")}


def test_equality_delete_unknown_field_ids_raise(spark, tmp_path):
    t = str(tmp_path / "eqbad")
    fa = _data_file(t, "data/a.parquet", [1], ["a"], ["en"])
    ed = os.path.join(t, "data/ed.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), ed)
    m = _manifest_v2(
        t, "m.avro",
        [
            (1, 0, f"file://{fa}", "PARQUET", 1, None),
            (1, 2, f"file://{ed}", "PARQUET", 2, [99]),
        ],
    )
    ml = _manifest_list(t, "ml.avro", [(m, 0)])
    s = {"snapshot-id": 5, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _metadata(t, 1, [s], 5)
    with pytest.raises(IcebergProtocolError, match="equality_ids"):
        iceberg_snapshot(t)


def test_iceberg_table_registers_as_catalog_source(spark, ice_table):
    """End-to-end coherence: a native Iceberg table registers as a
    primary source (fmt='iceberg') and flows through the catalog's
    resolution + SQL templating like any parquet source — the S3
    sibling of the Delta catalog test."""
    from embeddinghub_spark.catalog import Catalog

    cat = Catalog(spark)
    cat.register_file("isrc", "v1", ice_table, fmt="iceberg")
    assert cat.dataframe("isrc", "v1").count() == 3
    cat.sql_transformation(
        "by_lang", "v1",
        "SELECT lang, COUNT(*) AS n FROM {{isrc.v1}} GROUP BY lang",
    )
    got = {(r["lang"], r["n"])
           for r in cat.dataframe("by_lang", "v1").collect()}
    assert got == {("en", 1), ("fr", 1), ("de", 1)}


def test_read_iceberg_increment_append_only(spark, ice_table, tmp_path):
    """Incremental rows between snapshots = exactly the files added in
    range; non-append ranges (removed files, delete files) raise."""
    from embeddinghub_spark.sources.iceberg_meta import (
        read_iceberg_increment,
    )

    inc = {(r["id"], r["v"])
           for r in read_iceberg_increment(spark, ice_table, 101, 202)
           .collect()}
    assert inc == {(3, "c")}
    # empty range
    assert read_iceberg_increment(spark, ice_table, 202, 202).count() == 0

    # a removed file in range raises
    t = str(tmp_path / "shrunk")
    f1 = _data_file(t, "data/f1.parquet", [1], ["a"], ["en"])
    f2 = _data_file(t, "data/f2.parquet", [2], ["b"], ["fr"])
    m1 = _manifest(t, "m1.avro", [(1, 0, f"file://{f1}", "PARQUET"),
                                  (1, 0, f"file://{f2}", "PARQUET")])
    m2 = _manifest(t, "m2.avro", [(0, 0, f"file://{f1}", "PARQUET")])
    ml1 = _manifest_list(t, "ml1.avro", [(m1, 0)])
    ml2 = _manifest_list(t, "ml2.avro", [(m2, 0)])
    s1 = {"snapshot-id": 1, "timestamp-ms": 1,
          "manifest-list": f"file://{ml1}", "schema-id": 0}
    s2 = {"snapshot-id": 2, "timestamp-ms": 2,
          "manifest-list": f"file://{ml2}", "schema-id": 0}
    _metadata(t, 2, [s1, s2], 2)
    # the hand-built snapshots carry no parent links and no summary,
    # so the removal routes to the chain walk, which raises loudly
    with pytest.raises(
        ValueError,
        match="not.*append-only|removed in range|not an ancestor",
    ):
        read_iceberg_increment(spark, t, 1, 2)


_MANIFEST_SCHEMA_V2P = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2v2p",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition",
                     "type": {"type": "record", "name": "r102p",
                              "fields": [{"name": "lang",
                                          "type": ["null", "string"]}]}},
                    {"name": "record_count", "type": "long"},
                    {"name": "equality_ids",
                     "type": ["null",
                              {"type": "array", "items": "int"}]},
                ],
            },
        },
    ],
}


def _manifest_v2p(table, name, entries):
    """entries: (status, content, file_path, seq, equality_ids, lang)."""
    p = os.path.join(table, "metadata", name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    write_avro_file(
        p,
        _MANIFEST_SCHEMA_V2P,
        [
            {
                "status": st,
                "snapshot_id": None,
                "sequence_number": seq,
                "data_file": {
                    "content": c,
                    "file_path": fp,
                    "file_format": "PARQUET",
                    "partition": {"lang": lang},
                    "record_count": 1,
                    "equality_ids": eq,
                },
            }
            for st, c, fp, seq, eq, lang in entries
        ],
    )
    return p


def _partitioned_metadata(table, snapshots, current, transform="identity"):
    meta = {
        "format-version": 2,
        "table-uuid": "0000-uuid",
        "location": f"file://{table}",
        "schemas": [_ICE_SCHEMA],
        "current-schema-id": 0,
        "partition-specs": [{
            "spec-id": 0,
            "fields": [{"name": "lang", "transform": transform,
                        "source-id": 3, "field-id": 1000}],
        }],
        "current-snapshot-id": current,
        "snapshots": snapshots,
    }
    d = os.path.join(table, "metadata")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(d, "version-hint.text"), "w") as fh:
        fh.write("1")


def test_partition_scoped_equality_delete_applies_in_partition_only(
    spark, tmp_path
):
    """VERDICT r14 #2: an equality delete written under an
    identity-partitioned spec scopes to ITS partition (same spec-id +
    same partition tuple — DeleteFileIndex semantics). The same key in
    another partition must SURVIVE, and the strictly-less-than
    sequence rule still applies inside the partition (a later
    re-insert survives). This is the Flink-CDC-on-partitioned-v2
    shape the r13/r14 gate refused to read."""
    t = str(tmp_path / "eqscope")
    fa = _data_file(t, "data/en.parquet", [1, 2], ["a", "b"],
                    ["en", "en"])
    fb = _data_file(t, "data/fr.parquet", [2, 3], ["c", "d"],
                    ["fr", "fr"])
    fc = _data_file(t, "data/en2.parquet", [2], ["e"], ["en"])
    ed = os.path.join(t, "data/ed.parquet")
    pq.write_table(pa.table({"id": pa.array([2], pa.int64())}), ed)
    m = _manifest_v2p(
        t, "m.avro",
        [
            (1, 0, f"file://{fa}", 1, None, "en"),   # data, en, seq 1
            (1, 0, f"file://{fb}", 1, None, "fr"),   # data, fr, seq 1
            (1, 0, f"file://{fc}", 3, None, "en"),   # re-insert, seq 3
            (1, 2, f"file://{ed}", 2, [1], "en"),    # eq-del id=2 @ en
        ],
    )
    ml = _manifest_list(t, "ml.avro", [(m, 0)])
    s = {"snapshot-id": 5, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _partitioned_metadata(t, [s], 5)
    snap = iceberg_snapshot(t)
    assert snap["equality_deletes"] == [
        {"path": ed, "seq": 2, "equality_cols": ["id"],
         "scope": (0, {"lang": "en"})}
    ]
    got = {(r["id"], r["v"], r["lang"])
           for r in read_iceberg(spark, t).collect()}
    # (2,'b',en) @ seq 1 dies to the en-scoped seq-2 delete;
    # (2,'c',fr) SURVIVES (the over-delete the old gate prevented);
    # (2,'e',en) @ seq 3 survives the seq rule
    assert got == {(1, "a", "en"), (2, "c", "fr"), (3, "d", "fr"),
                   (2, "e", "en")}


def test_partition_scoped_equality_delete_gates(spark, tmp_path):
    """The honest remainder of the ADVICE r13 gate: a partitioned-spec
    equality delete whose manifest entry carries NO partition tuple,
    or whose spec uses a NON-IDENTITY transform, still raises loudly
    (scoping needs the tuple / the transform's comparators)."""
    # (a) no partition tuple in the delete entry
    t = str(tmp_path / "eqnopart")
    fa = _data_file(t, "data/a.parquet", [1, 2], ["a", "b"],
                    ["en", "fr"])
    ed = os.path.join(t, "data/ed.parquet")
    pq.write_table(pa.table({"id": pa.array([2], pa.int64())}), ed)
    m = _manifest_v2(
        t, "m.avro",
        [
            (1, 0, f"file://{fa}", "PARQUET", 1, None),
            (1, 2, f"file://{ed}", "PARQUET", 2, [1]),
        ],
    )
    ml = _manifest_list(t, "ml.avro", [(m, 0)])
    s = {"snapshot-id": 5, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _partitioned_metadata(t, [s], 5)
    with pytest.raises(IcebergProtocolError, match="no.*partition tuple"):
        iceberg_snapshot(t)

    # (b) non-identity transform
    t2 = str(tmp_path / "eqbucket")
    fa2 = _data_file(t2, "data/a.parquet", [1], ["a"], ["en"])
    ed2 = os.path.join(t2, "data/ed.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), ed2)
    m2 = _manifest_v2p(
        t2, "m.avro",
        [
            (1, 0, f"file://{fa2}", 1, None, "en"),
            (1, 2, f"file://{ed2}", 2, [1], "en"),
        ],
    )
    ml2 = _manifest_list(t2, "ml.avro", [(m2, 0)])
    s2 = {"snapshot-id": 5, "timestamp-ms": 1,
          "manifest-list": f"file://{ml2}", "schema-id": 0}
    _partitioned_metadata(t2, [s2], 5, transform="bucket[4]")
    with pytest.raises(IcebergProtocolError, match="non-identity"):
        iceberg_snapshot(t2)


def test_mor_path_identity_relative_root_and_spaces(spark, tmp_path,
                                                    monkeypatch):
    """ADVICE r13 (low): merge-on-read path identity must survive a
    RELATIVE table root and URI-escaped characters (a space reads back
    as %20 in _metadata.file_path). Before the fix the equality
    sequence join dropped every data row and the position-delete
    anti-join resurrected deleted rows — both silent. Both grains in
    one table, read through a relative path under a spaced directory."""
    base = tmp_path / "ice dir"
    t = str(base / "mor")
    fa = _data_file(t, "data/a.parquet", [1, 2, 3], ["a", "b", "c"],
                    ["en", "fr", "de"])
    ed = os.path.join(t, "data/ed.parquet")
    pq.write_table(pa.table({"id": pa.array([3], pa.int64())}), ed)
    pd1 = _pos_delete_file(t, "data/del1.parquet", [(f"file://{fa}", 1)])
    m = _manifest_v2(
        t, "m.avro",
        [
            (1, 0, f"file://{fa}", "PARQUET", 1, None),
            (1, 2, f"file://{ed}", "PARQUET", 2, [1]),  # eq-del id=3
            (1, 1, f"file://{pd1}", "PARQUET", 2, None),  # pos-del idx 1
        ],
    )
    ml = _manifest_list(t, "ml.avro", [(m, 0)])
    s = {"snapshot-id": 9, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _metadata(t, 1, [s], 9)
    monkeypatch.chdir(tmp_path)
    rel = os.path.join("ice dir", "mor")
    got = {(r["id"], r["v"]) for r in read_iceberg(spark, rel).collect()}
    # pos-del kills (2, 'b'); eq-del @ seq 2 kills (3, 'c') @ seq 1
    assert got == {(1, "a")}


def _rename_fixture(tmp_path, with_mapping):
    """A table whose field-id 2 was renamed val -> v: f1 predates the
    rename (stores 'val', and no 'lang' — that column was added
    later); f2 is current-shape. Both schemas stay in the metadata's
    schema list, which is how the reader detects the rename history
    driver-cheap."""
    t = str(tmp_path / "renamed")
    f1 = os.path.join(t, "data/f1.parquet")
    os.makedirs(os.path.dirname(f1), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array([1], pa.int64()),
                  "val": pa.array(["a"], pa.string())}), f1)
    f2 = os.path.join(t, "data/f2.parquet")
    pq.write_table(
        pa.table({"id": pa.array([2], pa.int64()),
                  "v": pa.array(["b"], pa.string()),
                  "lang": pa.array(["fr"], pa.string())}), f2)
    m = _manifest(t, "m.avro", [(1, 0, f"file://{f1}", "PARQUET"),
                                (1, 0, f"file://{f2}", "PARQUET")])
    ml = _manifest_list(t, "ml.avro", [(m, 0)])
    s = {"snapshot-id": 7, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 1}
    schema0 = {
        "type": "struct", "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": True, "type": "long"},
            {"id": 2, "name": "val", "required": False, "type": "string"},
        ]}
    schema1 = {
        "type": "struct", "schema-id": 1,
        "fields": [
            {"id": 1, "name": "id", "required": True, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
            {"id": 3, "name": "lang", "required": False,
             "type": "string"},
        ]}
    meta = {
        "format-version": 2, "table-uuid": "0000-uuid",
        "location": f"file://{t}",
        "schemas": [schema0, schema1], "current-schema-id": 1,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "current-snapshot-id": 7, "snapshots": [s],
    }
    if with_mapping:
        meta["properties"] = {
            "schema.name-mapping.default": json.dumps([
                {"field-id": 1, "names": ["id"]},
                {"field-id": 2, "names": ["val", "v"]},
                {"field-id": 3, "names": ["lang"]},
            ])
        }
    d = os.path.join(t, "metadata")
    with open(os.path.join(d, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(d, "version-hint.text"), "w") as fh:
        fh.write("1")
    return t


def test_name_mapping_resolves_renamed_columns(spark, tmp_path):
    """VERDICT r13 #3: a rename-history table with the public
    schema.name-mapping.default property reads correctly — pre-rename
    files scan under their physical name ('val') and surface as the
    snapshot schema's 'v'; a column added after a file was written
    reads as NULL for that file's rows (spec column projection)."""
    t = _rename_fixture(tmp_path, with_mapping=True)
    got = {(r["id"], r["v"], r["lang"])
           for r in read_iceberg(spark, t).collect()}
    assert got == {(1, "a", None), (2, "b", "fr")}


def test_rename_history_without_mapping_raises(spark, tmp_path):
    """Without the mapping, a by-name scan would read every pre-rename
    file's renamed column as silent NULLs — the reader must refuse
    instead (loud gap over silent wrong read)."""
    t = _rename_fixture(tmp_path, with_mapping=False)
    with pytest.raises(IcebergProtocolError, match="rename history"):
        read_iceberg(spark, t).collect()


def test_footer_grouping_distributed_path_identical(
    spark, tmp_path, monkeypatch
):
    """VERDICT r14 #6: above the file-count threshold the
    name-signature footer scan runs as ONE Spark job instead of a
    driver loop; the two paths must produce identical reads. Forced
    here by dropping the threshold to 0 on a partitioned native table
    (the shape whose reads always take the footer-grouping path)."""
    import embeddinghub_spark.sources.iceberg_meta as im
    from embeddinghub_spark.sources.iceberg_write import write_iceberg

    t = str(tmp_path / "dfoot")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)],
        "id long, bucket int, v string",
    ).repartition(4)
    write_iceberg(df, t, partition_by=["bucket"])

    # driver path (default threshold)
    driver_rows = {(r["id"], r["bucket"], r["v"])
                   for r in read_iceberg(spark, t).collect()}
    # distributed path (threshold 0 → every read fans out)
    monkeypatch.setattr(im, "_FOOTER_GROUP_DISTRIBUTED_THRESHOLD", 0)
    dist_rows = {(r["id"], r["bucket"], r["v"])
                 for r in read_iceberg(spark, t).collect()}
    assert dist_rows == driver_rows
    assert dist_rows == {(i, i % 3, f"v{i}") for i in range(30)}
    # the helper itself agrees path-by-path
    snap = iceberg_snapshot(t)
    a = im._physical_name_sets(spark, snap["files"], threshold=10**9)
    b = im._physical_name_sets(spark, snap["files"], threshold=0)
    assert a == b


def test_compact_iceberg_purges_mor_deletes(spark, tmp_path):
    """compact_iceberg on a table with live MoR deletes takes the
    FULL purge rewrite: deletes materialize into the rewritten files
    and the new snapshot carries no delete manifests — the real
    rewriteDataFiles's delete-compaction job."""
    from embeddinghub_spark.sources.iceberg_write import compact_iceberg

    t = str(tmp_path / "morpurge")
    f1 = _data_file(t, "data/f1.parquet", [1, 2, 3], ["a", "b", "c"],
                    ["en", "fr", "de"])
    pd1 = _pos_delete_file(t, "data/del1.parquet", [(f"file://{f1}", 1)])
    m = _manifest(t, "m.avro", [(1, 0, f"file://{f1}", "PARQUET")])
    dm = _manifest(t, "dm.avro", [(1, 1, f"file://{pd1}", "PARQUET")])
    ml = _manifest_list(t, "ml.avro", [(m, 0), (dm, 1)])
    s = {"snapshot-id": 9, "timestamp-ms": 1,
         "manifest-list": f"file://{ml}", "schema-id": 0}
    _metadata(t, 1, [s], 9)
    assert len(iceberg_snapshot(t)["position_deletes"]) == 1

    sid = compact_iceberg(spark, t, target_file_bytes=10**9)
    after = iceberg_snapshot(t)
    assert after["snapshot_id"] == sid
    assert after["position_deletes"] == []
    assert after["equality_deletes"] == []
    got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
    assert got == {(1, "a"), (3, "c")}


def test_changelog_parity_under_mid_range_compaction(spark, tmp_path):
    """VERDICT r15 #6 property pin, Iceberg side: rewriteDataFiles
    (operation=replace) must be invisible to read_iceberg_changes —
    same randomized logical edits, one table compacted mid-range,
    identical changelog modulo snapshot-id numbering (dense-ranked by
    commit order)."""
    import random

    from embeddinghub_spark.sources.iceberg_meta import (
        read_iceberg_changes,
    )
    from embeddinghub_spark.sources.iceberg_write import (
        compact_iceberg,
        delete_iceberg,
        merge_iceberg,
        write_iceberg,
    )

    def _mk(seed):
        rng = random.Random(seed)
        script = []
        nxt = [200]

        def _rows(ids):
            return [(i, f"v{i}.{rng.randint(0, 9)}") for i in ids]

        for _ in range(3):
            op = rng.choice(["append", "merge", "delete"])
            if op == "append":
                ids = list(range(nxt[0], nxt[0] + rng.randint(5, 20)))
                nxt[0] += len(ids)
                script.append(("append", _rows(ids)))
            elif op == "merge":
                ids = rng.sample(range(0, nxt[0]), rng.randint(3, 10))
                script.append(("merge", _rows(ids)))
            else:
                lo = rng.randint(0, 150)
                script.append(("delete", (lo, lo + rng.randint(3, 12))))
        return script

    def _apply(t, step):
        kind, arg = step
        if kind == "append":
            write_iceberg(
                spark.createDataFrame(arg, "id long, v string"),
                t, mode="append",
            )
        elif kind == "merge":
            merge_iceberg(
                spark, t,
                spark.createDataFrame(arg, "id long, v string"),
                key_cols=["id"],
            )
        else:
            lo, hi = arg
            delete_iceberg(spark, t, f"id >= {lo} AND id < {hi}")

    def _normalized(t, first_sid):
        rows = read_iceberg_changes(
            spark, t, first_sid, key_cols=["id"]
        ).collect()
        meta = iceberg_snapshot(t)["metadata"]
        order = {
            s["snapshot-id"]: i
            for i, s in enumerate(meta["snapshots"])
        }
        by_s = {}
        for r in rows:
            by_s.setdefault(order[r["_snapshot_id"]], []).append(
                (r["_change_type"], r["id"], r["v"])
            )
        return [sorted(by_s[k]) for k in sorted(by_s)]

    for seed in (7, 21, 99):
        script = _mk(seed)
        plain = str(tmp_path / f"plain{seed}")
        comp = str(tmp_path / f"comp{seed}")
        base = spark.createDataFrame(
            [(i, f"v{i}.0") for i in range(200)], "id long, v string"
        ).repartitionByRange(4, "id")
        sids = {}
        for t in (plain, comp):
            sids[t] = write_iceberg(base, t)
        when = random.Random(seed ^ 1).randint(1, len(script) - 1)
        for i, step in enumerate(script):
            _apply(plain, step)
            _apply(comp, step)
            if i == when:
                assert compact_iceberg(spark, comp) is not None
        assert _normalized(plain, sids[plain]) == _normalized(
            comp, sids[comp]
        ), f"seed {seed}: changelog diverged under compaction"
