"""Minimal pure-Python Avro Object Container File codec.

Iceberg's table metadata layer stores manifest lists and manifests as
Avro OCF files (Iceberg table spec, "Manifests" / "Snapshots"); this
sandbox ships neither the spark-avro format module nor a Python avro
package, so the native Iceberg read path (`sources/iceberg_meta.py`)
decodes them with this module — the exact analogue of reading Delta
checkpoint parquet via pyarrow in `sources/delta_log.py`.

Implements the PUBLIC Avro 1.x specification (container file format +
binary encoding), decode and encode:

- OCF: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker, then data blocks
  (object count, byte size, payload, sync) — codecs ``null`` and
  ``deflate`` (raw zlib, per the spec);
- binary encoding for every core type: null, boolean, int/long
  (zigzag varint), float/double (LE IEEE), bytes/string
  (length-prefixed), records (field order), enums (index), arrays and
  maps (block series, negative counts carry a byte size), unions
  (branch index), fixed;
- decoding is WRITER-SCHEMA driven (the schema embedded in the file),
  which is all a metadata reader needs — no reader-schema resolution,
  no defaults; named-type redefinitions are resolved through a
  name registry, logical types are returned as their raw base type.

The encoder exists for fixtures and tests: the test suite
cross-validates BOTH directions against the real Java Avro library
bundled with Spark (org.apache.avro via py4j), so the Python codec
cannot drift into a self-consistent dialect.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

_MAGIC = b"Obj\x01"


class AvroError(ValueError):
    """Malformed Avro container or a schema feature outside the spec
    subset this module implements."""


# --------------------------------------------------------------------- decode


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("truncated Avro data")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        """Zigzag varint (int and long share the wire format)."""
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            raise AvroError("negative bytes length")
        return self.read(n)


def _decode(r: _Reader, schema: Any, names: dict) -> Any:
    if isinstance(schema, str):
        if schema in names:  # named-type reference
            return _decode(r, names[schema], names)
        t = schema
    elif isinstance(schema, list):  # union
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union branch {idx} out of range")
        return _decode(r, schema[idx], names)
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "record":
        _register(schema, names)
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(r, f["type"], names)
        return out
    if t == "enum":
        _register(schema, names)
        idx = r.read_long()
        symbols = schema["symbols"]
        if not 0 <= idx < len(symbols):
            raise AvroError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(r, schema["values"], names)
        return out
    if t == "fixed":
        _register(schema, names)
        return r.read(int(schema["size"]))
    # a wrapped primitive, e.g. {"type": "long", "logicalType": ...}
    if isinstance(schema, dict) and t in names:
        return _decode(r, names[t], names)
    raise AvroError(f"unsupported Avro type: {t!r}")


def _register(schema: dict, names: dict) -> None:
    name = schema.get("name")
    if name:
        ns = schema.get("namespace")
        names[name] = schema
        if ns:
            names[f"{ns}.{name}"] = schema


def _prewalk(schema: Any, names: dict) -> None:
    """Register every named type up front so forward/backward
    references by name resolve regardless of field order."""
    if isinstance(schema, list):
        for s in schema:
            _prewalk(s, names)
    elif isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            _register(schema, names)
        if t == "record":
            for f in schema.get("fields", []):
                _prewalk(f["type"], names)
        elif t == "array":
            _prewalk(schema.get("items"), names)
        elif t == "map":
            _prewalk(schema.get("values"), names)


def read_avro_file(path: str) -> tuple[dict, list[dict]]:
    """Decode an OCF: returns (metadata, rows). ``metadata`` includes
    the parsed ``schema`` (dict) and raw ``avro.*`` entries."""
    with open(path, "rb") as fh:
        data = fh.read()
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise AvroError(f"not an Avro container file: {path}")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(r, meta_schema, {})
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported Avro codec {codec!r}")
    names: dict = {}
    _prewalk(schema, names)
    rows: list[dict] = []
    while r.pos < len(r.buf):
        count = r.read_long()
        size = r.read_long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block = _Reader(payload)
        for _ in range(count):
            # one shared registry for the whole file: _prewalk already
            # registered every named type, and in-decode registrations
            # are idempotent (a per-row dict copy was pure waste on
            # many-thousand-row manifests — review find r13)
            rows.append(_decode(block, schema, names))
        if block.pos != len(block.buf):
            raise AvroError("trailing bytes in Avro block")
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch (torn write?)")
    return {"schema": schema, "codec": codec}, rows


# --------------------------------------------------------------------- encode


def _zigzag(n: int) -> bytes:
    acc = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _branch_matches(schema: Any, value: Any, names: dict) -> bool:
    """Does ``value``'s Python type fit this union branch?"""
    if isinstance(schema, str):
        if schema in names:
            return _branch_matches(names[schema], value, names)
        t = schema
    elif isinstance(schema, list):
        return any(_branch_matches(s, value, names) for s in schema)
    else:
        t = schema.get("type")
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t in ("record", "map"):
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    return False


def _encode(w: io.BytesIO, schema: Any, value: Any, names: dict) -> None:
    if isinstance(schema, str):
        if schema in names:
            return _encode(w, names[schema], value, names)
        t = schema
    elif isinstance(schema, list):  # union: pick the branch whose
        # Avro type matches the Python value's type (review find r13:
        # blindly taking the first non-null branch writes the wrong
        # branch for multi-branch unions); [null, X] — the shape all
        # Iceberg metadata unions take — degenerates to the old rule
        idx = next(
            (
                i
                for i, s in enumerate(schema)
                if _branch_matches(s, value, names)
            ),
            None,
        )
        if idx is None:
            raise AvroError(
                f"no union branch in {schema!r} matches value "
                f"{type(value).__name__}"
            )
        w.write(_zigzag(idx))
        return _encode(w, schema[idx], value, names)
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        w.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        w.write(_zigzag(int(value)))
    elif t == "float":
        w.write(struct.pack("<f", float(value)))
    elif t == "double":
        w.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        w.write(_zigzag(len(value)))
        w.write(bytes(value))
    elif t == "string":
        b = value.encode("utf-8")
        w.write(_zigzag(len(b)))
        w.write(b)
    elif t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            if f["name"] not in value:
                raise AvroError(f"record missing field {f['name']!r}")
            _encode(w, f["type"], value[f["name"]], names)
    elif t == "enum":
        _register(schema, names)
        w.write(_zigzag(schema["symbols"].index(value)))
    elif t == "array":
        if value:
            w.write(_zigzag(len(value)))
            for v in value:
                _encode(w, schema["items"], v, names)
        w.write(_zigzag(0))
    elif t == "map":
        if value:
            w.write(_zigzag(len(value)))
            for k, v in value.items():
                kb = k.encode("utf-8")
                w.write(_zigzag(len(kb)))
                w.write(kb)
                _encode(w, schema["values"], v, names)
        w.write(_zigzag(0))
    elif t == "fixed":
        _register(schema, names)
        if len(value) != int(schema["size"]):
            raise AvroError("fixed size mismatch")
        w.write(bytes(value))
    else:
        raise AvroError(f"unsupported Avro type: {t!r}")


def write_avro_file(
    path: str,
    schema: dict | str | list,
    rows: list[dict],
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    metadata: dict[str, str] | None = None,
) -> None:
    """Encode rows into an OCF at ``path`` (one block). Used by
    fixtures/tests and the native Iceberg writer; the suite
    cross-validates the output against the Java Avro library so the
    wire format is the real one. ``metadata`` adds extra header
    key→value pairs (Iceberg manifests carry ``schema`` /
    ``partition-spec`` / ``content`` there per the table spec)."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported Avro codec {codec!r}")
    names: dict = {}
    _prewalk(schema, names)
    body = io.BytesIO()
    for row in rows:
        _encode(body, schema, row, names)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    for k, v in (metadata or {}).items():
        meta[k] = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        out.write(_zigzag(len(kb)))
        out.write(kb)
        out.write(_zigzag(len(v)))
        out.write(v)
    out.write(_zigzag(0))
    out.write(sync)
    out.write(_zigzag(len(rows)))
    out.write(_zigzag(len(payload)))
    out.write(payload)
    out.write(sync)
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "wb") as fh:
        fh.write(out.getvalue())
    os.replace(tmp, path)
