"""sources/roaring.py — pure-Python Roaring codec, cross-validated
BOTH directions against the real org.roaringbitmap library bundled
with Spark (the avro_io Java-cross-validation discipline)."""

from __future__ import annotations

import pytest

from embeddinghub_spark.sources.roaring import (
    RoaringError,
    deserialize_bitmap_array,
    deserialize_roaring32,
    serialize_bitmap_array,
    serialize_roaring32,
)

CASES = [
    {1, 5, 70000, 70001},                       # two array containers
    set(range(0, 9000)),                        # bitset container
    set(range(100000, 100003)) | {0xFFFFFFFF},  # high-key edge
    set(),
    set(range(0, 70000, 3)),                    # >4 containers
]


def test_roaring32_crossvalidated_against_java(spark):
    jvm = spark.sparkContext._jvm
    for i, vals in enumerate(CASES):
        rb = jvm.org.roaringbitmap.RoaringBitmap()
        for v in sorted(vals):
            rb.add(v - (1 << 32) if v >= (1 << 31) else v)
        baos = jvm.java.io.ByteArrayOutputStream()
        rb.serialize(jvm.java.io.DataOutputStream(baos))
        data = bytes(baos.toByteArray())
        got, used = deserialize_roaring32(data)
        assert used == len(data) and got == vals, f"java->py case {i}"
        bb = jvm.java.nio.ByteBuffer.wrap(
            bytearray(serialize_roaring32(vals))
        )
        rb2 = jvm.org.roaringbitmap.RoaringBitmap()
        rb2.deserialize(bb)
        assert {x & 0xFFFFFFFF for x in rb2.toArray()} == vals, \
            f"py->java case {i}"
    # run-container format (runOptimize'd java bitmap) decodes too
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    for v in range(1000, 2000):
        rb.add(v)
    for v in (5, 9, 65999):
        rb.add(v)
    rb.runOptimize()
    baos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(baos))
    got, _ = deserialize_roaring32(bytes(baos.toByteArray()))
    assert got == set(range(1000, 2000)) | {5, 9, 65999}


def test_bitmap_array_roundtrip_and_contracts():
    vals = {0, 1, 5, (3 << 32) | 7, (3 << 32) | 9}
    assert deserialize_bitmap_array(serialize_bitmap_array(vals)) == vals
    assert deserialize_bitmap_array(serialize_bitmap_array(set())) == set()
    with pytest.raises(RoaringError, match="magic"):
        deserialize_bitmap_array(b"\x00" * 12)
    with pytest.raises(RoaringError, match="truncated"):
        deserialize_bitmap_array(b"\x00")
    with pytest.raises(RoaringError, match="non-negative"):
        serialize_bitmap_array({-1})
    with pytest.raises(RoaringError, match="cookie"):
        deserialize_roaring32(b"\xff\xff\xff\xff")
