"""Audio perceptual hashing + near-dup tier (multimodal.audio_ehash /
audio_neardup_pairs, r11 — the image tier's discipline on the time
axis): crafted near-identical clips must land within the hamming
budget, distinct clips far outside it, and the Spark operators must
match the pure-Python py_reference mirrors bit-for-bit (the all-integer
contract, across u8/i16/i32 sample widths and mono/stereo folds)."""

import random
import struct

import pytest
from pyspark.sql import functions as F

import py_reference as pr
from scalding_spark.functions import multimodal as mm


def _wav(samples, sw=1, nch=1, rate=8000):
    """Minimal PCM WAV: samples is a flat list (interleaved if nch>1);
    sw=1 → u8 values 0..255, sw=2/4 → signed ints."""
    if sw == 1:
        data = bytes(samples)
    elif sw == 2:
        data = b"".join(struct.pack("<h", v) for v in samples)
    else:
        data = b"".join(struct.pack("<i", v) for v in samples)
    n = len(data)
    return (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, nch, rate,
                          rate * nch * sw, nch * sw, 8 * sw)
            + b"data" + struct.pack("<I", n) + data)


AUDIO_SCHEMA = "media_id long, content binary"


def test_aehash_near_identical_clips_within_budget(spark):
    """One perturbed sample moves one window's energy → at most the two
    comparisons touching that window flip; a random other clip is far."""
    rng = random.Random(9)
    base = [rng.randrange(256) for _ in range(256)]
    tweaked = list(base)
    tweaked[0] = (tweaked[0] + 90) % 256        # window 0 only
    other = [rng.randrange(256) for _ in range(256)]
    rows = [(0, _wav(base)), (1, _wav(tweaked)), (2, _wav(other))]
    df = spark.createDataFrame(rows, AUDIO_SCHEMA)
    got = {(r.id_a, r.id_b): r.hamming
           for r in mm.audio_neardup_pairs(df, max_hamming=2).collect()}
    assert (0, 1) in got and got[(0, 1)] <= 2
    assert (0, 2) not in got and (1, 2) not in got


@pytest.mark.parametrize("sw,nch", [(1, 1), (2, 1), (2, 2), (4, 1)])
def test_aehash_matches_py_golden_across_widths(spark, sw, nch):
    """Bit-parity vs the pure-Python mirror over random clips at every
    sample width and a stereo fold — the numpy int64 path and the
    python-int path must agree exactly (including the i32 >> 16 trim)."""
    rng = random.Random(40 + sw + nch)
    lo, hi = {1: (0, 255), 2: (-32768, 32767),
              4: (-2**31, 2**31 - 1)}[sw]
    rows = []
    for i in range(40):
        n = rng.randrange(30, 400) * nch
        rows.append((i, _wav([rng.randint(lo, hi) for _ in range(n)],
                             sw=sw, nch=nch)))
    df = spark.createDataFrame(rows, AUDIO_SCHEMA)
    got = {r.id: r.aehash
           for r in mm.audio_ehash(df, content_col="content")
           .select(F.col("media_id").alias("id"), "aehash").collect()}
    for i, content in rows:
        expect = pr.golden_audio_ehash(content)
        signed = expect - (1 << 64) if expect >= (1 << 63) else expect
        assert got[i] == signed, (sw, nch, i)


def test_aehash_gain_invariant(spark):
    """Energies scale together under uniform gain, so no comparison
    flips: the same clip at half and double volume hashes identically
    (the perceptual property — image dHash's brightness rule)."""
    rng = random.Random(3)
    base = [rng.randint(-12000, 12000) for _ in range(300)]
    rows = [(0, _wav(base, sw=2)),
            (1, _wav([v // 2 for v in base], sw=2)),
            (2, _wav([v * 2 for v in base], sw=2))]
    df = spark.createDataFrame(rows, AUDIO_SCHEMA)
    hs = {r.id: r.aehash for r in mm.audio_ehash(df)
          .select(F.col("media_id").alias("id"), "aehash").collect()}
    # halving truncates toward zero (v//2) which can flip a knife-edge
    # comparison; doubling is exact — pin the exact case, bound the other
    assert hs[0] == hs[2]
    assert bin((hs[0] ^ hs[1]) & ((1 << 64) - 1)).count("1") <= 2


def test_null_content_and_bad_codec(spark):
    rows = [(0, _wav([1, 2, 3, 4])), (1, None)]
    df = spark.createDataFrame(rows, AUDIO_SCHEMA)
    got = {r.id: r.aehash for r in mm.audio_ehash(df)
           .select(F.col("media_id").alias("id"), "aehash").collect()}
    assert got[1] is None and got[0] is not None
    bad = spark.createDataFrame([(0, b"OggS-not-a-wav")], AUDIO_SCHEMA)
    with pytest.raises(Exception, match="WAV"):
        mm.audio_ehash(bad).collect()


def test_audio_neardup_gate_query_matches_golden(spark):
    """q_audio_neardup ≡ py_reference.golden_audio_neardup at sf0.001 —
    the driver's py-golden contract, asserted in-suite too."""
    import __spark_entry__ as e
    got = sorted((r.id_a, r.id_b, r.hamming) for r in
                 e.q_audio_neardup(spark, e.SF_SMOKE).collect())
    expect, _cols = pr.golden_audio_neardup(e.SF_SMOKE)
    assert got == sorted(expect)
    assert len(got) > 0  # families actually collide


def test_stream_ingest_phash_audio_method(spark, tmp_path):
    """The streaming tier ingests audio via method='aehash': identical
    clips dedup within batch, a near-dup of a STORED clip is dropped in
    a later epoch (hash-store probe — audio bytes never re-enter)."""
    from scalding_spark import streaming
    rng = random.Random(17)
    base = [rng.randrange(256) for _ in range(256)]
    near = list(base); near[0] = (near[0] + 90) % 256
    other = [rng.randrange(256) for _ in range(256)]
    src, corpus, store, ckpt = (str(tmp_path / p)
                                for p in ("as", "ac", "at", "ak"))

    def run(rows):
        spark.createDataFrame(rows, AUDIO_SCHEMA) \
            .write.mode("append").parquet(src)
        q = streaming.stream_ingest_phash(
            streaming.stream_from_parquet_dir(spark, src, AUDIO_SCHEMA),
            corpus_path=corpus, store_path=store, checkpoint=ckpt,
            content_col="content", id_col="media_id", method="aehash")
        q.awaitTermination(120)

    run([(0, _wav(base)), (1, _wav(base)), (2, _wav(other))])
    kept = sorted(r.media_id for r in spark.read.parquet(corpus).collect())
    assert kept == [0, 2]
    run([(10, _wav(near)), (11, _wav([rng.randrange(256)
                                      for _ in range(256)]))])
    kept = sorted(r.media_id for r in spark.read.parquet(corpus).collect())
    assert kept == [0, 2, 11]
