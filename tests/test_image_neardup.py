"""Image perceptual hashing + near-dup tier (multimodal.image_dhash /
image_ahash / image_neardup_pairs, r10 — VERDICT r09 #7): crafted
near-identical images must land within the hamming budget, distinct
images far outside it, and the Spark operators must match the pure-Python
py_reference mirrors bit-for-bit (the all-integer contract)."""

import random

import pytest
from pyspark.sql import functions as F

import py_reference as pr
from scalding_spark.functions import multimodal as mm


def _p5(w, h, pixels, maxval=255):
    return b"P5\n%d %d\n%d\n" % (w, h, maxval) + bytes(pixels)


def _p6(w, h, pixels, maxval=255):
    return b"P6\n%d %d\n%d\n" % (w, h, maxval) + bytes(pixels)


def _rand_img(rng, w=16, h=16):
    return _p5(w, h, [rng.randrange(256) for _ in range(w * h)])


def test_dhash_near_identical_images_within_budget(spark):
    """One perturbed pixel → dhash differs in at most the two comparisons
    that touch it; a random other image is far away."""
    rng = random.Random(3)
    base_px = [rng.randrange(256) for _ in range(256)]
    tweaked = list(base_px)
    tweaked[0] = (tweaked[0] + 40) % 256  # pixel (0,0), a sampled point
    rows = [(0, _p5(16, 16, base_px)), (1, _p5(16, 16, tweaked)),
            (2, _rand_img(rng))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {(r.id_a, r.id_b): r.hamming
           for r in mm.image_neardup_pairs(df, max_hamming=2).collect()}
    assert (0, 1) in got and got[(0, 1)] <= 2
    assert (0, 2) not in got and (1, 2) not in got


def test_dhash_matches_py_golden_on_random_pnms(spark):
    """Bit-parity vs the pure-Python mirror over random P5 AND P6 images
    (signed Spark bigint vs unsigned golden via the 2⁶⁴ mask)."""
    rng = random.Random(11)
    rows = []
    for i in range(20):
        if i % 2:
            rows.append((i, _p6(9, 7, [rng.randrange(256)
                                       for _ in range(9 * 7 * 3)])))
        else:
            rows.append((i, _p5(13, 10, [rng.randrange(256)
                                         for _ in range(130)])))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    for op, gold in ((mm.image_dhash, pr.golden_image_dhash),
                     (mm.image_ahash, pr.golden_image_ahash)):
        got = {r.media_id: r[1] for r in
               op(df, out_col="h").select("media_id", "h").collect()}
        for i, content in rows:
            assert got[i] & ((1 << 64) - 1) == gold(content), (op, i)


def test_dhash_sixteen_bit_pnm_and_small_grids(spark):
    """maxval ≥ 256 (2-byte samples) and hash_size < 8 parse/pack
    correctly on both sides."""
    rng = random.Random(5)
    px = []
    for _ in range(8 * 8):
        v = rng.randrange(65536)
        px += [v >> 8, v & 255]
    content = _p5(8, 8, px, maxval=65535)
    df = spark.createDataFrame([(0, content)],
                               "media_id long, content binary")
    got = mm.image_dhash(df, hash_size=4, out_col="h").first()["h"]
    assert got & ((1 << 64) - 1) == pr.golden_image_dhash(content,
                                                          hash_size=4)


def test_null_content_and_validation(spark):
    df = spark.createDataFrame([(0, None)], "media_id long, content binary")
    assert mm.image_dhash(df).first()["dhash"] is None
    # NULL-hash rows never reach the banding
    assert mm.image_neardup_pairs(df).count() == 0
    with pytest.raises(ValueError, match="hash_size"):
        mm.image_dhash(df, hash_size=9).collect()
    with pytest.raises(ValueError, match="method"):
        mm.image_neardup_pairs(df, method="ghash")


def test_unknown_magic_raises_not_implemented(spark):
    if mm.CODECS["pil"]:
        pytest.skip("PIL installed: non-PNM magics decode for real")
    df = spark.createDataFrame([(0, b"\x89PNG\r\n")],
                               "media_id long, content binary")
    with pytest.raises(Exception, match="no codec"):
        mm.image_dhash(df).collect()


def test_image_neardup_gate_query_matches_golden(spark):
    """q_image_neardup ≡ golden_image_neardup at sf0.001 — the driver's
    py-golden row, pinned here so a fabrication drift fails fast."""
    import __spark_entry__ as em
    sf = "/root/testdata/sf0.001"
    rows = [(r.id_a, r.id_b, r.hamming)
            for r in em.q_image_neardup(spark, sf).collect()]
    grows, gcols = pr.golden_image_neardup(sf)
    assert sorted(rows) == sorted(grows)
    assert len(rows) >= 1000  # 100 families × C(5,2) same-family pairs


def test_ahash_flat_image_all_zero_bits(spark):
    """A constant image has no pixel strictly above the mean (and no
    left>right edge): both hashes must be exactly 0."""
    content = _p5(8, 8, [7] * 64)
    df = spark.createDataFrame([(0, content)],
                               "media_id long, content binary")
    assert mm.image_dhash(df).first()["dhash"] == 0
    assert mm.image_ahash(df).first()["ahash"] == 0


def test_mixed_null_batch_hashes_stay_exact(spark):
    """A single Arrow batch holding BOTH bytes and NULL content must not
    round the hashes: pandas Series.map infers float64 for mixed
    int/None results, silently corrupting 64-bit hashes past 2⁵³ —
    caught via the streaming tier, fixed with an explicit object-dtype
    series."""
    import random
    rng = random.Random(21)
    content = _p5(16, 16, [rng.randrange(256) for _ in range(256)])
    want = pr.golden_image_dhash(content)
    assert want > 2**53, "regression needs a hash above the float53 edge"
    df = spark.createDataFrame(
        [(0, content), (1, None), (2, content)],
        "media_id long, content binary").coalesce(1)
    got = {r.media_id: r.dhash for r in mm.image_dhash(df).collect()}
    assert got[1] is None
    assert got[0] & ((1 << 64) - 1) == want
    assert got[2] & ((1 << 64) - 1) == want


def test_phash_keep_projection_matches_passthrough(spark):
    """keep=[...] must return exactly those columns + the hash, with
    values identical to the pass-through form — the near-dup/streaming
    tiers rely on it so media bytes cross the Arrow boundary once (in),
    never back out."""
    rng = random.Random(33)
    rows = [(i, f"x{i}", _rand_img(rng)) for i in range(6)] + [(6, "x6", None)]
    df = spark.createDataFrame(rows, "media_id long, tag string, content binary")
    full = {r.media_id: r.dhash for r in mm.image_dhash(df).collect()}
    kept = mm.image_dhash(df, keep=["media_id"])
    assert kept.columns == ["media_id", "dhash"]
    assert {r.media_id: r.dhash for r in kept.collect()} == full
    two = mm.image_dhash(df, keep=["tag", "media_id"])
    assert two.columns == ["tag", "media_id", "dhash"]
    with pytest.raises(ValueError, match="absent"):
        mm.image_dhash(df, keep=["nope"])
    # ADVICE r11 #2: duplicate output names must fail HERE, not as a
    # confusing downstream select error
    with pytest.raises(ValueError, match="collides"):
        mm.image_dhash(df, keep=["media_id", "tag"], out_col="tag")
    with pytest.raises(ValueError, match="duplicate keep"):
        mm.image_dhash(df, keep=["media_id", "media_id"])
    with pytest.raises(ValueError, match="collides"):
        mm.image_dhash(df.withColumn("dhash", F.lit(1)))
