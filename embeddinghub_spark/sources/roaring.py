"""Minimal pure-Python Roaring bitmap codec — Delta deletion vectors.

Delta Lake stores deletion vectors as a 64-bit "RoaringBitmapArray"
in the PORTABLE serialization format (delta-io PROTOCOL.md "Deletion
Vector Format" + the public RoaringBitmapArray portable spec): a
little-endian magic number, a bitmap count, and one STANDARD 32-bit
Roaring bitmap per high-32-bit key. The 32-bit layer is the public
Roaring format specification (RoaringFormatSpec): serial cookie
(12347 with run containers + container count in the high half, or
12346 without), descriptive headers (key, cardinality-1), an offset
table when required, then container payloads — array (uint16 LE),
bitset (8 KiB), or run (count + (start, length-1) pairs).

Decode is what the Delta read path needs (`sources/delta_log.py`
applies DVs as row-position anti-joins); encode exists for fixtures,
and the tests cross-validate the 32-bit layer BOTH directions against
the real org.roaringbitmap library bundled with Spark (via py4j), so
the codec cannot drift into a self-consistent dialect — the same
discipline as `sources/avro_io.py`'s Java-Avro cross-validation.

Container payloads encode/decode through NumPy (r17 optimization:
DVs hold one position per superseded row, so a streaming MoR upsert
decodes and re-encodes churn-sized bitmaps on the DRIVER — the
per-value Python set loops were seconds of driver CPU per merge at
sf1). The ``*_np`` entry points take/return sorted ``int64`` arrays;
the set-based API wraps them, so there is exactly one codec.
"""

from __future__ import annotations

import struct

import numpy as np

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
PORTABLE_MAGIC = 1681511377


class RoaringError(ValueError):
    """Malformed serialized Roaring data."""


def deserialize_roaring32_np(
    buf: bytes, pos: int = 0
) -> tuple[np.ndarray, int]:
    """Standard 32-bit Roaring → (uint32 ndarray in container order —
    ascending within and across containers for spec-conforming input —
    bytes consumed from ``pos``)."""
    start = pos
    if len(buf) - pos < 4:
        raise RoaringError("truncated roaring header")
    cookie = struct.unpack_from("<i", buf, pos)[0]
    pos += 4
    run_flags: list[bool]
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        bitset = buf[pos:pos + nbytes]
        pos += nbytes
        run_flags = [
            bool(bitset[i // 8] & (1 << (i % 8))) for i in range(n)
        ]
    elif cookie == SERIAL_COOKIE_NO_RUN:
        n = struct.unpack_from("<i", buf, pos)[0]
        pos += 4
        run_flags = [False] * n
    else:
        raise RoaringError(f"bad roaring cookie {cookie}")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    has_offsets = cookie == SERIAL_COOKIE_NO_RUN or n >= NO_OFFSET_THRESHOLD
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential reader
    parts: list[np.ndarray] = []
    for i, (key, card) in enumerate(headers):
        base = np.uint32(key << 16)
        if run_flags[i]:
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            runs = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).reshape(-1, 2)
            pos += 4 * n_runs
            for s, ln_m1 in runs:
                parts.append(
                    base
                    + np.arange(
                        int(s), int(s) + int(ln_m1) + 1, dtype=np.uint32
                    )
                )
        elif card > 4096:  # bitset container, fixed 8 KiB
            bits = np.unpackbits(
                np.frombuffer(buf, dtype=np.uint8, count=8192, offset=pos),
                bitorder="little",
            )
            pos += 8192
            parts.append(base + np.nonzero(bits)[0].astype(np.uint32))
        else:  # array container
            vals = np.frombuffer(buf, dtype="<u2", count=card, offset=pos)
            pos += 2 * card
            parts.append(base + vals.astype(np.uint32))
    arr = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return arr, pos - start


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[set[int], int]:
    """Standard 32-bit Roaring → (set of uint32 values, bytes consumed
    from ``pos``)."""
    arr, used = deserialize_roaring32_np(buf, pos)
    return set(arr.tolist()), used


def serialize_roaring32_np(vals: np.ndarray) -> bytes:
    """Standard 32-bit Roaring bytes for a SORTED UNIQUE uint32 array
    (array and bitset containers; the no-run cookie — what
    org.roaringbitmap emits for un-optimized bitmaps)."""
    vals = np.asarray(vals, dtype=np.uint32)
    keys16 = (vals >> np.uint32(16)).astype(np.uint32)
    uniq_keys, split_idx = np.unique(keys16, return_index=True)
    segments = np.split(vals.astype(np.uint32) & np.uint32(0xFFFF),
                        split_idx[1:])
    out = bytearray()
    out += struct.pack("<ii", SERIAL_COOKIE_NO_RUN, len(uniq_keys))
    for k, seg in zip(uniq_keys.tolist(), segments):
        out += struct.pack("<HH", k, len(seg) - 1)
    payloads = []
    for seg in segments:
        if len(seg) > 4096:
            bits = np.zeros(1 << 16, dtype=np.uint8)
            bits[seg] = 1
            payloads.append(
                np.packbits(bits, bitorder="little").tobytes()
            )
        else:
            payloads.append(seg.astype("<u2").tobytes())
    # offset table (required by the no-run cookie)
    off = len(out) + 4 * len(uniq_keys)
    for p in payloads:
        out += struct.pack("<i", off)
        off += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def serialize_roaring32(values: set[int]) -> bytes:
    """Standard 32-bit Roaring bytes for a set of uint32. Fixture-grade
    encode (see ``serialize_roaring32_np``)."""
    arr = np.fromiter(values, dtype=np.int64, count=len(values))
    if arr.size and (arr.min() < 0 or arr.max() > 0xFFFFFFFF):
        bad = arr[(arr < 0) | (arr > 0xFFFFFFFF)][0]
        raise RoaringError(f"value {bad} out of uint32 range")
    return serialize_roaring32_np(np.unique(arr).astype(np.uint32))


def deserialize_bitmap_array_np(buf: bytes) -> np.ndarray:
    """Delta's portable RoaringBitmapArray → sorted int64 ndarray of
    row indexes: ``<int32 magic LE><int64 count LE>`` then per bitmap
    ``<int32 high-key LE><standard 32-bit roaring>``."""
    if len(buf) < 12:
        raise RoaringError("truncated bitmap array")
    magic = struct.unpack_from("<i", buf, 0)[0]
    if magic != PORTABLE_MAGIC:
        raise RoaringError(f"bad portable magic {magic}")
    count = struct.unpack_from("<q", buf, 4)[0]
    pos = 12
    parts: list[np.ndarray] = []
    for _ in range(count):
        high = struct.unpack_from("<i", buf, pos)[0]
        pos += 4
        vals, used = deserialize_roaring32_np(buf, pos)
        pos += used
        parts.append((np.int64(high) << np.int64(32)) | vals.astype(np.int64))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(parts))


def deserialize_bitmap_array(buf: bytes) -> set[int]:
    """Delta's portable RoaringBitmapArray → set of int64 row indexes."""
    return set(deserialize_bitmap_array_np(buf).tolist())


def serialize_bitmap_array_np(values: np.ndarray) -> bytes:
    """Portable RoaringBitmapArray bytes for an int64 ndarray of row
    indexes (deduplicated and sorted here)."""
    arr = np.unique(np.asarray(values, dtype=np.int64))
    if arr.size and arr[0] < 0:
        raise RoaringError("row indexes are non-negative")
    highs = (arr >> np.int64(32)).astype(np.int64)
    uniq_highs, split_idx = np.unique(highs, return_index=True)
    segments = np.split((arr & np.int64(0xFFFFFFFF)).astype(np.uint32),
                        split_idx[1:])
    out = bytearray(struct.pack("<iq", PORTABLE_MAGIC, len(uniq_highs)))
    for high, seg in zip(uniq_highs.tolist(), segments):
        out += struct.pack("<i", high)
        out += serialize_roaring32_np(seg)
    return bytes(out)


def serialize_bitmap_array(values: set[int]) -> bytes:
    """Fixture-grade encode of Delta's portable RoaringBitmapArray."""
    arr = np.fromiter(values, dtype=np.int64, count=len(values))
    return serialize_bitmap_array_np(arr)
