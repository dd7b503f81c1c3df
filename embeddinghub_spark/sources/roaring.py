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
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4
PORTABLE_MAGIC = 1681511377


class RoaringError(ValueError):
    """Malformed serialized Roaring data."""


def deserialize_roaring32(buf: bytes, pos: int = 0) -> tuple[set[int], int]:
    """Standard 32-bit Roaring → (set of uint32 values, bytes consumed
    from ``pos``)."""
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
    out: set[int] = set()
    for i, (key, card) in enumerate(headers):
        base = key << 16
        if run_flags[i]:
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            for _ in range(n_runs):
                s, ln_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.update(base + v for v in range(s, s + ln_m1 + 1))
        elif card > 4096:  # bitset container, fixed 8 KiB
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    out.add(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:  # array container
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.update(base + v for v in vals)
    return out, pos - start


def serialize_roaring32(values: set[int]) -> bytes:
    """Standard 32-bit Roaring bytes for a set of uint32 (array and
    bitset containers; the no-run cookie — what org.roaringbitmap
    emits for un-optimized bitmaps). Fixture-grade encode."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        if not 0 <= v <= 0xFFFFFFFF:
            raise RoaringError(f"value {v} out of uint32 range")
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    out = bytearray()
    out += struct.pack("<ii", SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    payloads = []
    for k in keys:
        vals = by_key[k]
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
        else:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
    # offset table (required by the no-run cookie)
    off = len(out) + 4 * len(keys)
    for p in payloads:
        out += struct.pack("<i", off)
        off += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def deserialize_bitmap_array(buf: bytes) -> set[int]:
    """Delta's portable RoaringBitmapArray → set of int64 row indexes:
    ``<int32 magic LE><int64 count LE>`` then per bitmap
    ``<int32 high-key LE><standard 32-bit roaring>``."""
    if len(buf) < 12:
        raise RoaringError("truncated bitmap array")
    magic = struct.unpack_from("<i", buf, 0)[0]
    if magic != PORTABLE_MAGIC:
        raise RoaringError(f"bad portable magic {magic}")
    count = struct.unpack_from("<q", buf, 4)[0]
    pos = 12
    out: set[int] = set()
    for _ in range(count):
        high = struct.unpack_from("<i", buf, pos)[0]
        pos += 4
        vals, used = deserialize_roaring32(buf, pos)
        pos += used
        out.update((high << 32) | v for v in vals)
    return out


def serialize_bitmap_array(values: set[int]) -> bytes:
    """Fixture-grade encode of Delta's portable RoaringBitmapArray."""
    by_high: dict[int, set[int]] = {}
    for v in sorted(values):
        if v < 0:
            raise RoaringError("row indexes are non-negative")
        by_high.setdefault(v >> 32, set()).add(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", PORTABLE_MAGIC, len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<i", high)
        out += serialize_roaring32(by_high[high])
    return bytes(out)
