"""Multimodal plumbing tests: binary columns + typed metadata through
Arrow-batched decode/resize/frame-sample stages. The decode itself is a
deterministic stub (no codecs in this environment); what's under test is the
Spark-side contract — schemas, batching, fan-out, partitioning."""

import pytest
from pyspark.sql import Row, functions as F

from scalding_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, content=b"img-one", mime="image/png",
            width=640, height=480, duration_ms=None),
        Row(media_id=2, content=b"img-two", mime="image/png",
            width=800, height=600, duration_ms=None),
        Row(media_id=3, content=b"vid-three", mime="video/mp4",
            width=1920, height=1080, duration_ms=3500),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_extract_image_features_schema_and_determinism(media):
    out = mm.extract_image_features(media.where(F.col("mime") == "image/png"))
    rows = {r.media_id: r.features for r in out.collect()}
    assert set(rows) == {1, 2}
    assert all(len(v) == 8 for v in rows.values())
    assert all(0.0 <= x <= 1.0 for v in rows.values() for x in v)
    again = {r.media_id: r.features for r in
             mm.extract_image_features(media.where(F.col("mime") == "image/png")).collect()}
    assert again == rows  # deterministic stub
    assert rows[1] != rows[2]


def test_resize_updates_metadata_and_content(media):
    out = mm.resize_images(media, 64, 64)
    rows = out.collect()
    assert all(r.width == 64 and r.height == 64 for r in rows)
    orig = {r.media_id: bytes(r.content) for r in media.collect()}
    resized = {r.media_id: bytes(r.content) for r in rows}
    assert all(resized[k] != orig[k] for k in orig)
    assert out.schema == media.schema  # binary→binary, same contract


def test_audio_features_window_count(media):
    out = mm.extract_audio_features(media, n_windows=6)
    assert all(len(r.energies) == 6 for r in out.collect())


def test_frame_sample_fanout(media):
    vid = media.where(F.col("mime") == "video/mp4")
    sampled = mm.frame_sample_plan(vid, every_ms=1000)
    ts = sorted(r.frame_ts_ms for r in sampled.collect())
    assert ts == [0, 1000, 2000, 3000]  # 3500ms clip, 1s sampling


def test_decode_sampled_frames_per_frame_features(media):
    vid = media.where(F.col("mime") == "video/mp4")
    out = mm.decode_sampled_frames(vid, every_ms=1000)
    rows = out.collect()
    assert len(rows) == 4
    feats = {r.frame_ts_ms: tuple(r.frame_features) for r in rows}
    assert len(set(feats.values())) == 4  # each frame decodes differently


def test_repartition_by_bytes(spark):
    big = spark.createDataFrame(
        [(i, bytes(1000)) for i in range(100)], "media_id long, content binary")
    out = mm.repartition_by_bytes(big, target_partition_bytes=20_000)
    assert out.rdd.getNumPartitions() == 6  # 100kB / 20kB + 1


def test_arrow_batching_respected(spark, media):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        out = mm.extract_image_features(media)
        assert out.count() == 3  # one row per batch still yields every row
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_decode_none_content_passes_through_null(spark):
    """NULL content (missing blob) yields NULL features instead of killing
    the job — the edge-corpus contract (one absent object in a 100 TB
    corpus must not fail the stage); decoders never see None."""
    df = spark.createDataFrame([Row(media_id=9, content=None, mime="image/png",
                                    width=1, height=1, duration_ms=None)],
                               mm.MEDIA_SCHEMA)
    rows = mm.extract_image_features(df).collect()
    assert len(rows) == 1 and rows[0].features is None


# -- real codec paths (feature-detected; r05 directive) ----------------------

def _pgm(w, h, fn):
    """Tiny binary PGM built by hand — decodable with zero codec libs."""
    px = bytes(fn(x, y) for y in range(h) for x in range(w))
    return b"P5\n# test\n%d %d\n255\n" % (w, h) + px


def _wav(samples, rate=8000):
    import io
    import struct
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_real_image_decode_pgm_through_spark(spark):
    # top half black, bottom half white → first bands ~0, last bands ~1
    img = _pgm(16, 16, lambda x, y: 0 if y < 8 else 255)
    df = spark.createDataFrame(
        [Row(media_id=1, content=img, mime="image/x-portable-graymap",
             width=16, height=16, duration_ms=None)], mm.MEDIA_SCHEMA)
    feats = mm.extract_image_features(df, decode=mm.decode_image_real) \
        .collect()[0].features
    assert len(feats) == 8
    assert feats[0] < 0.01 and feats[-1] > 0.99, feats


def test_real_image_resize_pgm(spark):
    img = _pgm(16, 16, lambda x, y: (x * 16) % 256)
    df = spark.createDataFrame(
        [Row(media_id=1, content=img, mime="image/x-portable-graymap",
             width=16, height=16, duration_ms=None)], mm.MEDIA_SCHEMA)
    out = mm.resize_images(df, 4, 4, resize=mm.resize_image_real).collect()[0]
    assert out.width == 4 and out.height == 4
    gray, w, h = mm._parse_pnm(bytes(out.content))
    assert (w, h) == (4, 4)


def test_real_audio_decode_wav_through_spark(spark):
    import math
    quiet = _wav([0] * 4000)
    loud = _wav([int(20000 * math.sin(i / 5)) for i in range(4000)])
    df = spark.createDataFrame(
        [Row(media_id=1, content=quiet, mime="audio/wav",
             width=None, height=None, duration_ms=500),
         Row(media_id=2, content=loud, mime="audio/wav",
             width=None, height=None, duration_ms=500)], mm.MEDIA_SCHEMA)
    rows = {r.media_id: r.energies for r in
            mm.extract_audio_features(df, decode=mm.decode_audio_real,
                                      n_windows=4).collect()}
    assert all(len(v) == 4 for v in rows.values())
    # amplitude 20000/32768 ≈ 0.61 → sine RMS ≈ 0.61/√2 ≈ 0.43
    assert max(rows[1]) < 0.001 and min(rows[2]) > 0.4, rows


def test_real_decoder_raises_on_unknown_format_without_pil(spark):
    if mm.CODECS["pil"]:
        pytest.skip("PIL installed — compressed formats decodable")
    with pytest.raises(NotImplementedError, match="no codec"):
        mm.decode_image_real(b"\x89PNG\r\n\x1a\nnot-actually-parsed")


@pytest.mark.skipif(not mm.CODECS["pil"], reason="PIL not installed")
def test_real_image_decode_png_with_pil(spark):
    import io
    img = mm._PILImage.new("L", (8, 8), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    feats = mm.decode_image_real(buf.getvalue())
    assert len(feats) == 8 and all(abs(f - 128 / 255) < 0.01 for f in feats)


def test_default_decoders_are_real():
    assert mm.default_image_decoder() is mm.decode_image_real
    assert mm.default_audio_decoder() is mm.decode_audio_real


def test_parse_pnm_malformed_inputs_raise_descriptive_errors():
    with pytest.raises(NotImplementedError, match="no codec"):
        mm._parse_pnm(b"\x89PNGnot-a-pnm")
    with pytest.raises(ValueError, match="truncated header"):
        mm._parse_pnm(b"P5")
    with pytest.raises(ValueError, match="non-numeric"):
        mm._parse_pnm(b"P5\nxx 4\n255\n")
    with pytest.raises(ValueError, match="pixel section truncated"):
        mm._parse_pnm(b"P5\n4 4\n255\nAB")
