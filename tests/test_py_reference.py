"""Parity pins for py_reference (the Python-side oracles of the 8
non-SQL-expressible queries) against Spark's own primitives, plus the
regression pin for the MinHash seed-arity bug the py_oracle caught:
a 2-arg HOF lambda (`lambda h, s=s:`) makes PySpark bind the second
parameter to the ELEMENT INDEX, collapsing all minhash seeds into one
hash function.
"""

import pytest
from pyspark.sql import functions as F

import py_reference as pr


XXH_CASES = [
    (0, ""),
    (1, "hello"),
    (-42, "a"),
    (2**63 - 1, "abcdefg"),          # 7-byte tail
    (-(2**63), "abcdefgh"),          # exact 8-byte word
    (123456789, "x" * 31),           # just under the 32-byte stripe
    (-987654321, "y" * 32),          # exactly one stripe
    (42, "z" * 45),                  # stripe + word + int + byte tails
    (7, "the quick brown fox jumps over the lazy dog " * 4),
]


def test_xxhash64_matches_spark(spark):
    df = spark.createDataFrame(XXH_CASES, "l long, s string")
    got = df.select(
        F.xxhash64("l").alias("hl"),
        F.xxhash64("s").alias("hs"),
        F.xxhash64("l", F.lit(5)).alias("hli"),
        F.xxhash64("s", "l").alias("hsl"),
        F.xxhash64(F.array(F.col("l"), F.lit(11).cast("long")),
                   F.lit(3)).alias("ha"),
    ).collect()
    for (l, s), r in zip(XXH_CASES, got):
        assert pr.xxhash64(l) == r.hl
        assert pr.xxhash64(s) == r.hs
        assert pr.xxhash64(l, ("i32", 5)) == r.hli
        assert pr.xxhash64(s, l) == r.hsl
        assert pr.xxhash64([l, 11], ("i32", 3)) == r.ha


def test_round_half_up_matches_spark(spark):
    # dyadic fractions hit exact .5 boundaries where HALF_UP vs banker's
    # rounding (and exact-binary vs shortest-repr BigDecimal) diverge
    vals = [0.0000015, 1.0 / 128, 7.0 / 64, -0.0000015, -1.0 / 128,
            0.1234565, 123.4567895, 0.9, 0.0]
    got = (spark.createDataFrame([(v,) for v in vals], "v double")
           .select(F.round("v", 6).alias("r")).collect())
    for v, r in zip(vals, got):
        assert pr.round_half_up(v, 6) == r.r, v


def test_tokenize_and_shingles_match_spark(spark, sf_dir):
    from scalding_spark.functions.dedup import shingles
    from scalding_spark.functions.text import tokenize
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .where(F.col("doc_id") < 20)
    got = docs.select("doc_id", "text",
                      tokenize(F.col("text")).alias("toks"),
                      shingles(F.col("text"), 3).alias("shs")).collect()
    for r in got:
        assert pr.tokenize(r.text) == list(r.toks)
        assert pr.shingles(r.text, 3) == list(r.shs)


def test_minhash_seeds_actually_differ(spark):
    """Regression: every signature slot uses a DIFFERENT seeded hash.
    Before the r05 fix, `lambda h, s=s:` was a 2-arg callable, PySpark
    passed the element index as `s`, and all num_hashes slots collapsed
    to the identical function (signatures were one value repeated)."""
    from scalding_spark.functions.dedup import minhash_signatures
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    sig = list(minhash_signatures(df, "text", "doc_id", 16, 3)
               .collect()[0].sig)
    assert len(set(sig)) > 1, (
        "all minhash slots identical — per-seed lambda degenerated")
    # and each slot matches the independent Python reference
    shs = pr.shingles("one two three four five six seven eight nine ten", 3)
    h0 = [pr.xxhash64(s) for s in shs]
    expect = [min(pr.xxhash64(h, ("i32", s)) for h in h0) for s in range(16)]
    assert sig == expect


def test_hyperplanes_and_bucket_match_spark(spark):
    from scalding_spark.functions import similarity as sim
    planes = pr.random_hyperplanes(8, 6, seed=99)
    assert planes == sim.random_hyperplanes(8, 6, seed=99)
    vecs = [([float(i % 3) - 1.0 for i in range(j, j + 8)],) for j in range(5)]
    df = spark.createDataFrame(vecs, "v array<double>")
    got = df.select(sim.lsh_bucket(F.col("v"), planes).alias("b")).collect()
    for (v,), r in zip(vecs, got):
        assert pr.lsh_bucket(v, planes) == r.b


def test_py_oracle_map_covers_all_rows_only_queries():
    """Every queries() entry without a SQL oracle must have a py_oracle —
    driver_check then reports value-verified for all queries, rows-only
    for none."""
    import __spark_entry__ as e
    no_sql = set(e.queries()) - set(e.oracle_sql())
    assert no_sql == set(e.py_oracle()), (
        f"rows-only queries missing a py_oracle: "
        f"{no_sql - set(e.py_oracle())}; "
        f"py_oracle entries shadowing SQL oracles: "
        f"{set(e.py_oracle()) - no_sql}")


def test_winnow_matches_independent_python_mirror(spark):
    """winnow_fingerprints vs a from-scratch Python winnowing (md5-bucket
    gram hashes, rightmost-min tie-break): exact selection parity over a
    tiny-vocab random corpus — small vocab forces repeated grams, i.e.
    hash TIES inside windows, the subtle branch of the argmin."""
    import hashlib
    import random

    from scalding_spark.functions import dedup

    def py_winnow(text, k=5, window=4):
        toks = pr.tokenize(text)
        if len(toks) - k + 1 < 1:
            return set()
        grams = [int(hashlib.md5(" ".join(toks[i:i + k]).encode())
                     .hexdigest()[:8], 16)
                 for i in range(len(toks) - k + 1)]
        sel = set()
        for j in range(max(len(grams) - window + 1, 1)):
            win = grams[j:j + window]
            best_i, best = 0, win[0]
            for i, h in enumerate(win):
                if h <= best:          # rightmost minimum
                    best, best_i = h, i
            sel.add((j + best_i, best))
        return sel

    rng = random.Random(3)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 30))))
            for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in dedup.winnow_fingerprints(df, "text", "doc_id",
                                       k=5, window=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in rows:
        assert got.get(i, set()) == py_winnow(t), (i, t)


# --- r06: vectorized goldens vs the scalar spec (VERDICT r05 #2) -----------

def test_vector_hash_primitives_match_scalar():
    import numpy as np
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    seeds = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    vl = pr.xxh64_long_v(vals, 42)
    vi = pr.xxh64_int_v(13, seeds)
    vc = pr.xxh64_long_v(vals, seeds)          # array-seed chain
    for j in range(1000):
        assert int(vl[j]) == pr._xxh64_long(int(vals[j]), 42)
        assert int(vi[j]) == pr._xxh64_int(13, int(seeds[j]))
        assert int(vc[j]) == pr._xxh64_long(int(vals[j]), int(seeds[j]))


def test_dot_lr_is_sequential_left_to_right():
    """np.add.accumulate must reproduce the scalar left-to-right fold even
    where pairwise/SIMD summation (np.dot, np.sum) rounds differently —
    adversarial magnitudes make the difference visible."""
    import numpy as np
    a = np.array([[1e16, 1.0, -1e16, 1.0, 3.0, -3.0, 1e-8, 7.0]] * 4)
    b = np.array([[1.0, 1.0, 1.0, 1e-16, 1e8, 1e8, 1.0, 1e-3]] * 4)
    got = pr.dot_lr(a, b)
    for row in range(4):
        assert float(got[row]) == pr.dot(list(a[row]), list(b[row]))
    # and a construction where pairwise summation disagrees: sequential
    # absorbs the lone 1.0 into 1e16 then recovers the final 1.0, while
    # pairwise ((1e16+1)+(-1e16+1)) rounds -1e16+1 back to -1e16 → 0.0
    x = np.array([1e16, 1.0, -1e16, 1.0])
    y = np.ones(4)
    assert pr.dot_lr(x, y) == pr.dot(list(x), list(y)) == 1.0
    # 512 repeats push np.sum into its pairwise tree — the sequential fold
    # keeps the exact cancellation pattern, pairwise does not
    big = np.tile(x, 512)
    assert pr.dot_lr(big, np.ones(len(big))) == pr.dot(
        list(big), [1.0] * len(big))


@pytest.mark.parametrize("name", [
    "minhash_lsh_pairs", "simhash_pairs", "cosine_topk_lsh",
    "cosine_topk_ivf", "embedding_neardup", "kmeans", "semantic_dedup",
    "neardup_against"])
def test_vector_golden_equals_scalar_spec(sf_dir, name):
    vec = getattr(pr, f"golden_{name}")(sf_dir)
    sca = getattr(pr, f"golden_{name}_scalar")(sf_dir)
    assert vec == sca, f"golden_{name}: vectorized result diverged from spec"


def test_vector_kmeans_equals_scalar_kmeans_full_state(sf_dir):
    """Assignments AND centroids bit-equal — np.add.at accumulates in row
    order, the scalar loop's fold order."""
    emb = [r for r in pr._embeddings(sf_dir) if r[1] is not None]
    av, cv = pr.kmeans(emb)
    asc, cs = pr.kmeans_scalar(emb)
    assert av == asc
    assert cv == cs


def test_vector_kmeans_handles_fewer_vectors_than_k():
    """Single-row axis find: with n < k the init yields len(C) < k
    centroids; the vectorized update's count mask must size to len(C)
    (the scalar spec's range(k) loop tolerates it implicitly)."""
    one = [(7, [1.0, 2.0, 3.0], "x")]
    va, vc = pr.kmeans(one)
    sa, sc = pr.kmeans_scalar(one)
    assert va == sa == {7: 0}
    assert [list(map(float, c)) for c in sc] == vc
    three = [(1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "b"),
             (3, [5.0, 5.0], "c")]
    assert pr.kmeans(three)[0] == pr.kmeans_scalar(three)[0]
