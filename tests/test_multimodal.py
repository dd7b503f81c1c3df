import pytest

from embeddinghub_spark.functions.multimodal import (
    extract_media_features,
    frame_sample,
    repartition_by_bytes,
    with_media_metadata,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\x89PNG fake image bytes " * 10, "image/png"),
        (2, b"RIFF fake wav bytes " * 50, "audio/wav"),
        (3, b"", "application/octet-stream"),
        (4, None, None),
    ]
    return spark.createDataFrame(rows, ["media_id", "media", "mime"])


def test_media_metadata(media_df):
    out = {r["media_id"]: r for r in with_media_metadata(media_df, "media", "mime").collect()}
    assert out[1]["media_size_bytes"] == 220
    assert out[3]["media_size_bytes"] == 0
    assert out[4]["media_size_bytes"] is None
    assert len(out[1]["media_md5"]) == 32
    assert out[2]["media_mime"] == "audio/wav"


def test_fake_feature_extraction_deterministic(media_df):
    out1 = {r["media_id"]: r["feature"] for r in
            extract_media_features(media_df, "media", ["media_id"], dim=16).collect()}
    out2 = {r["media_id"]: r["feature"] for r in
            extract_media_features(media_df, "media", ["media_id"], dim=16).collect()}
    assert out1 == out2
    assert all(len(v) == 16 for v in out1.values())
    assert all(-1.0 <= x < 1.0 for v in out1.values() for x in v)
    assert out1[1] != out1[2]
    assert out1[3] == out1[4]  # empty and NULL media map to the same stub


def test_real_extractor_is_stubbed(media_df):
    with pytest.raises(Exception) as exc_info:
        extract_media_features(media_df, "media", ["media_id"], extractor="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_shape(media_df):
    out = frame_sample(media_df.filter("media_id = 1"), "media", ["media_id"], n_frames=4)
    rows = out.collect()
    assert len(rows) == 4
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    # frames concatenate to a prefix of the original payload
    joined = b"".join(r["frame_bytes"] for r in rows)
    assert len(joined) == 220  # 220/4 divides evenly here


def test_repartition_by_bytes(media_df):
    df = with_media_metadata(media_df, "media", "mime")
    out = repartition_by_bytes(df, target_partition_bytes=500)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 4


def test_media_phash_deterministic_and_positive(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.multimodal import media_phash

    df = spark.createDataFrame(
        [Row(doc_id=1, media=b"hello"), Row(doc_id=2, media=b"hello"),
         Row(doc_id=3, media=b"world")]
    )
    out = {r.doc_id: r.phash for r in media_phash(df).collect()}
    assert out[1] == out[2] != out[3]
    assert all(v >= 0 for v in out.values())  # 60 bits -> never negative


def test_media_near_dup_finds_exact_dupes_only_with_stub(spark):
    from pyspark.sql import Row

    from embeddinghub_spark.functions.multimodal import media_near_dup_pairs

    rows = [Row(doc_id=i, media=f"media-{i % 3}".encode()) for i in range(9)]
    out = {
        (r.id_a, r.id_b): r.hamming
        for r in media_near_dup_pairs(spark.createDataFrame(rows)).collect()
    }
    # ids sharing i%3 are byte-identical -> hamming 0; stub hashes are
    # random 60-bit values so unrelated pairs stay far apart
    want = {
        (a, b)
        for a in range(9)
        for b in range(a + 1, 9)
        if a % 3 == b % 3
    }
    assert set(out) == want
    assert all(h == 0 for h in out.values())


def test_media_near_dup_bands_must_divide(spark):
    import pytest
    from pyspark.sql import Row

    from embeddinghub_spark.functions.multimodal import media_near_dup_pairs

    df = spark.createDataFrame([Row(doc_id=1, media=b"x")])
    with pytest.raises(ValueError):
        media_near_dup_pairs(df, bands=7)


def test_media_near_dup_radius_must_fit_bands(spark):
    """Pigeonhole recall only holds for hamming < bands: a radius >=
    bands must be rejected, not silently return incomplete pairs
    (ADVICE r5)."""
    import pytest
    from pyspark.sql import Row

    from embeddinghub_spark.functions.multimodal import media_near_dup_pairs

    df = spark.createDataFrame([Row(doc_id=1, media=b"x")])
    with pytest.raises(ValueError, match="max_hamming"):
        media_near_dup_pairs(df, max_hamming=5, bands=4)
    with pytest.raises(ValueError, match="max_hamming"):
        media_near_dup_pairs(df, max_hamming=4, bands=4)
    # widening bands legitimizes the radius (5 divides 60)
    media_near_dup_pairs(df, max_hamming=4, bands=5).collect()


def test_audio_windows_byte_math_and_overlap(spark):
    """Window slicing: exact byte offsets/sizes from the sample-rate
    math, overlapping hops, trailing partial window dropped, and
    too-short payloads filtered out entirely."""
    from pyspark.sql import Row

    from embeddinghub_spark.functions.multimodal import audio_windows

    # 100 samples/s x 2 B/sample -> 200 B/s; 1000 B payload = 5 s
    payload = bytes(range(250)) * 4
    df = spark.createDataFrame(
        [Row(doc_id=1, media=payload), Row(doc_id=2, media=b"xy")]
    )
    out = audio_windows(
        df, sample_rate=100, bytes_per_sample=2, window_ms=1000
    ).collect()
    # doc 2 (2 B) is shorter than one 200 B window -> dropped
    assert {r["doc_id"] for r in out} == {1}
    assert [r["window_idx"] for r in out] == [0, 1, 2, 3, 4]
    assert [r["start_ms"] for r in out] == [0, 1000, 2000, 3000, 4000]
    assert all(len(r["window_bytes"]) == 200 for r in out)
    assert bytes(out[0]["window_bytes"]) == payload[:200]
    assert bytes(out[3]["window_bytes"]) == payload[600:800]

    # 50% overlap: hop 500 ms = 100 B -> windows at 0,100,...,800
    ov = audio_windows(
        df, sample_rate=100, bytes_per_sample=2, window_ms=1000, hop_ms=500
    ).collect()
    assert len(ov) == 9
    assert bytes(ov[1]["window_bytes"]) == payload[100:300]
    assert ov[1]["start_ms"] == 500


def test_audio_windows_per_row_sample_rate(spark):
    """A sample_rate column drives per-row window byte sizes."""
    from pyspark.sql import Row

    from embeddinghub_spark.functions.multimodal import audio_windows

    df = spark.createDataFrame(
        [
            Row(doc_id=1, media=bytes(400), sr=100),  # 200 B windows
            Row(doc_id=2, media=bytes(400), sr=200),  # 400 B windows
        ]
    )
    out = {
        (r["doc_id"], r["window_idx"]): len(r["window_bytes"])
        for r in audio_windows(
            df, sample_rate_col="sr", bytes_per_sample=2, window_ms=1000
        ).collect()
    }
    assert out == {(1, 0): 200, (1, 1): 200, (2, 0): 400}
