"""Distinct-hash / distinct-signature-space banding (VERDICT r10 #2/#3).

A duplicate-heavy corpus used to pay C(n,2) band-join hits for n
byte-identical inputs (n identical hashes in every chunk bucket; n
identical MinHash signatures in every band bucket). The rewrites band
over DISTINCT hash values / DISTINCT shingle sets and recover id pairs
by an output-sized equi-join, so the candidate volume is a function of
the DISTINCT space only — these tests pin that with the stats counters
(quadratic→linear evidence) plus exact-output checks against brute
force (hamming banding is pigeonhole-EXACT, so brute force is the
oracle)."""

import itertools
import random

from pyspark.sql import functions as F

from scalding_spark.functions import dedup

M64 = (1 << 64) - 1


def _signed(v: int) -> int:
    v &= M64
    return v - (1 << 64) if v >= (1 << 63) else v


def _brute_hamming(hashes: dict, max_h: int) -> dict:
    out = {}
    for (a, ha), (b, hb) in itertools.combinations(sorted(hashes.items()), 2):
        d = bin((ha ^ hb) & M64).count("1")
        if d <= max_h:
            out[(a, b)] = d
    return out


def _hamming_df(spark, hashes: dict):
    rows = [(i, _signed(h)) for i, h in hashes.items()]
    return spark.createDataFrame(rows, "id long, h long")


def test_hamming_exact_vs_brute_force_with_duplicate_groups(spark):
    """Mixed corpus — a 60-id identical-hash group, near pairs, far
    hashes: output must equal brute force exactly (pigeonhole banding
    has perfect recall; the same-hash equi-join must re-create every
    within-group pair)."""
    rng = random.Random(11)
    hashes = {i: 0xDEADBEEFCAFE0000 for i in range(60)}  # one hot group
    base = rng.getrandbits(64)
    hashes[1000] = base
    hashes[1001] = base ^ 0b101           # hamming 2: a true pair
    hashes[1002] = base ^ (1 << 63)       # hamming 1 across the sign bit
    for i in range(1003, 1020):
        hashes[i] = rng.getrandbits(64)   # far away w.h.p.
    expect = _brute_hamming(hashes, 3)
    got = {(r.id_a, r.id_b): r.hamming
           for r in dedup.hamming_band_pairs(
               _hamming_df(spark, hashes), "id", "h", 3).collect()}
    assert got == expect
    assert sum(1 for d in got.values() if d == 0) >= 60 * 59 // 2


def test_hamming_candidates_independent_of_duplication(spark):
    """The quadratic→linear pin: growing an identical-hash group from
    60 to 240 ids must not move a single candidate counter — banding
    sees one distinct hash either way. (Before the rewrite the band
    join saw C(n,2)·(max_hamming+1) hits for the group alone.)"""
    rng = random.Random(7)
    distinct = {1000 + i: rng.getrandbits(64) for i in range(20)}

    def corpus(n_dupes):
        h = {i: 0x1234 for i in range(n_dupes)}
        h.update(distinct)
        return h

    stats_small, stats_big = {}, {}
    small = dedup.hamming_band_pairs(_hamming_df(spark, corpus(60)),
                                     "id", "h", 3, stats=stats_small)
    big = dedup.hamming_band_pairs(_hamming_df(spark, corpus(240)),
                                   "id", "h", 3, stats=stats_big)
    assert stats_small["distinct_hashes"] == 21
    assert stats_small == stats_big  # multiplicity never reaches the band join
    # the output pairs still scale with the answer: C(n,2) same-hash rows
    assert small.where("hamming = 0").count() == 60 * 59 // 2
    assert big.where("hamming = 0").count() == 240 * 239 // 2
    # and the candidate volume is bounded by the DISTINCT space
    assert stats_big["cross_hash_candidates"] <= 21 * 20 // 2 * 4


def test_hamming_hot_chunk_cap_trades_recall_for_bounded_candidates(spark):
    """max_chunk_freq drops chunk keys shared by too many DISTINCT
    hashes. A crafted corpus where 40 distinct hashes share one low
    chunk: the default (None) finds the one true pair whose only clean
    chunk is the hot one; the cap loses exactly that pair (documented
    recall trade) while same-hash pairs are unaffected."""
    # max_hamming=1 → two 32-bit chunks. 40 random high chunks (far
    # apart w.h.p., seed-fixed) all sharing the hot low chunk, plus one
    # crafted 1-bit-apart pair (ids 100/101) also in the hot chunk.
    rng = random.Random(5)
    hashes = {i: (rng.getrandbits(30) << 34) | 0xABC for i in range(40)}
    hi = rng.getrandbits(30) << 34
    hashes[100], hashes[101] = hi | 0xABC, (hi ^ (1 << 40)) | 0xABC
    n_distinct = len(set(hashes.values()))
    expect = _brute_hamming(hashes, 1)
    assert (100, 101) in expect  # the pair the hot chunk carries
    df = _hamming_df(spark, hashes)
    stats = {}
    full = {(r.id_a, r.id_b)
            for r in dedup.hamming_band_pairs(df, "id", "h", 1,
                                              stats=stats).collect()}
    assert full == set(expect)
    assert stats["max_chunk_distinct_hashes"] == n_distinct  # hot low chunk
    capped = {(r.id_a, r.id_b)
              for r in dedup.hamming_band_pairs(
                  df, "id", "h", 1, max_chunk_freq=10).collect()}
    assert capped == full - {(100, 101)}


def test_minhash_candidates_independent_of_duplication(spark):
    """The distinct-signature pin for minhash_lsh_pairs: duplicating one
    document 30× vs 90× must leave docs' distinct_sets and the band
    join's candidate_set_pairs IDENTICAL, while the output still carries
    the C(k+1,2) jaccard-1.0 pairs (the answer itself) and the
    non-duplicate portion of the result is unchanged."""
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango").split()
    rng = random.Random(3)
    base_texts = [" ".join(rng.choice(words) for _ in range(12))
                  for _ in range(9)]
    t0 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    texts = [t0] + base_texts  # ids 0..9

    def corpus(k):
        rows = [(i, t) for i, t in enumerate(texts)]
        rows += [(100 + j, t0) for j in range(k)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def run(k):
        stats = {}
        pairs = dedup.minhash_lsh_pairs(
            corpus(k), "text", "doc_id", num_hashes=16, bands=8,
            shingle_n=3, threshold=0.3, stats=stats).collect()
        return stats, {(r.id_a, r.id_b): r.jaccard for r in pairs}

    s30, p30 = run(30)
    s90, p90 = run(90)
    assert s30["distinct_sets"] == s90["distinct_sets"] == 10
    assert s30["candidate_set_pairs"] == s90["candidate_set_pairs"]
    assert s30["docs"] == 40 and s90["docs"] == 100
    # the t0 group {0, 100..} yields all C(k+1,2) pairs at exactly 1.0
    assert sum(1 for v in p30.values() if v == 1.0) == 31 * 30 // 2
    assert sum(1 for v in p90.values() if v == 1.0) == 91 * 90 // 2
    # the non-duplicated part of the answer is identical across k
    assert {k_: v for k_, v in p30.items() if k_[1] < 100} == \
           {k_: v for k_, v in p90.items() if k_[1] < 100}


def test_changed_operators_have_fresh_driver_rows_or_sit_in_window():
    """DURABLE changed-operator re-verification pin (the r11 distinct-
    space rewrites): each affected registry query must have a
    value-green CORRECTNESS row from round >= 11, OR sit in the current
    50-entry driver window (meaning the re-verification is scheduled
    for the upcoming driver run)."""
    import glob
    import json
    import os

    import __spark_entry__ as e

    changed = {"q_minhash_lsh_pairs", "q_simhash_pairs", "q_image_neardup",
               "q_neardup_against", "q_dedup_clusters"}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fresh = set()
    for fn in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(fn)[len("CORRECTNESS_r"):-len(".json")])
        if rnd < 11:
            continue
        for k, v in json.load(open(fn)).items():
            # green = value-verified (hash match) or the ledgered
            # rows-only contract for py-golden entries that ran clean
            if v.get("hash_match") or (v.get("err") == "no_oracle"
                                       and v.get("spark_rows") is not None):
                fresh.add(k)
    window = set(list(e.queries())[:50])
    missing = changed - fresh - window
    assert not missing, (
        f"changed operators neither re-verified since r11 nor scheduled "
        f"in the current window: {sorted(missing)}")


def test_duplicate_id_inputs_cannot_self_pair_or_duplicate(spark):
    """Self-review r11 pin: the membership expansion preserves the
    pre-r11 strict-inequality contract — an id carrying two hashes
    within budget yields no (X, X) row, and exact duplicate (id, hash)
    rows do not duplicate output pairs."""
    rows = [(7, 0b1), (7, 0b11),          # one id, two near hashes
            (8, 0b1), (8, 0b1),           # exact duplicate rows
            (9, 0x70F0F0F0F0F0F0F0)]      # genuinely far (many bits)
    df = spark.createDataFrame(rows, "id long, h long")
    got = [(r.id_a, r.id_b, r.hamming)
           for r in dedup.hamming_band_pairs(df, "id", "h", 2).collect()]
    assert all(a < b for a, b, _ in got)
    assert len(got) == len(set(got))      # no duplicated rows
    # (7,8) legitimately appears per distinct hash pair it satisfies
    assert set(got) == {(7, 8, 0), (7, 8, 1)}


def test_minhash_duplicate_id_inputs_cannot_self_pair(spark):
    """Same contract for the set-space expansion: an id appearing with
    two near-duplicate TEXTS joins two set groups whose verified pair
    must not expand to a self-row; duplicated (id, text) rows do not
    duplicate pairs."""
    t_a = "alpha bravo charlie delta echo foxtrot golf hotel"
    t_b = t_a + " india"                  # high-jaccard neighbor of t_a
    rows = [(1, t_a), (1, t_b),           # one id, two texts
            (2, t_a), (2, t_a),           # duplicate rows
            (3, "zulu yankee xray whiskey victor uniform tango sierra")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.id_a, r.id_b, r.jaccard)
           for r in dedup.minhash_lsh_pairs(
               df, "text", "doc_id", num_hashes=16, bands=8,
               threshold=0.2).collect()]
    assert all(a < b for a, b, _ in got)
    assert len(got) == len(set(got))
    assert (1, 2, 1.0) in got             # the same-set pair survives
