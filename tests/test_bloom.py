"""Bloom-filter prefilter joins (functions/bloom.py): exactness against the
plain joins they replace, the no-false-negative contract, fp-rate sanity,
and the 100 TB plan contract (the bypass stream never shuffles)."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.functions import bloom
from scalding_spark.pipe import Pipe


@pytest.fixture(scope="module")
def big(spark):
    # ids 0..1999 with some payload; a handful of NULL keys to pin the
    # null-arbitration contract
    base = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("payload"))
    nulls = spark.createDataFrame([(None, -1), (None, -2)], "k long, payload long")
    return base.unionByName(nulls)


@pytest.fixture(scope="module")
def small(spark):
    # every third key in [0, 1500), with duplicates, plus one NULL
    dups = spark.range(0, 1500, 3).select(F.col("id").alias("k"))
    return dups.unionByName(dups.limit(50)).unionByName(
        spark.createDataFrame([(None,)], "k long"))


def _rows(df):
    # None-safe sort (null keys are part of the fixtures)
    return sorted(((r.k, r.payload) for r in df.collect()),
                  key=lambda t: tuple((v is None, v) for v in t))


def test_params_bits_per_key():
    m, k = bloom.bloom_params(1_000_000, 0.01)
    assert 9 <= m / 1_000_000 <= 10.5        # ~9.6 bits/key optimum
    assert k == 7
    m01, k01 = bloom.bloom_params(1_000_000, 0.1)
    assert m01 < m and k01 < k               # looser fpp → smaller/cheaper


def test_no_false_negatives(spark, small):
    bf = bloom.bloom_build(small.dropna(), "k", fpp=0.01)
    kept = bloom.bloom_filter_df(small.dropna(), "k", bf)
    assert kept.count() == small.dropna().count()   # every member passes


def test_fp_rate_bounded(spark):
    members = spark.range(1000).select(F.col("id").alias("k"))
    bf = bloom.bloom_build(members, "k", fpp=0.01)
    probes = spark.range(100_000, 120_000).select(F.col("id").alias("k"))
    fps = bloom.bloom_filter_df(probes, "k", bf).count()
    assert fps / 20_000 < 0.05               # 5× slack over fpp=0.01


def test_semi_join_exact(big, small):
    expect = _rows(big.join(small, on="k", how="left_semi"))
    got = _rows(bloom.bloom_semi_join(big, small, on="k"))
    assert got == expect
    assert got                                # non-trivial fixture


def test_anti_join_exact(big, small):
    expect = _rows(big.join(small, on="k", how="left_anti"))
    got = _rows(bloom.bloom_anti_join(big, small, on="k"))
    assert got == expect
    # null-key rows never equal anything → anti keeps them
    assert sum(1 for k, _ in got if k is None) == 2


def test_anti_join_high_fpp_still_exact(big, small):
    """fpp tunes shuffle volume, never results."""
    expect = _rows(big.join(small, on="k", how="left_anti"))
    got = _rows(bloom.bloom_anti_join(big, small, on="k", fpp=0.5))
    assert got == expect


def test_inner_and_left_join_exact(spark, big):
    dim = spark.range(0, 1500, 3).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("dim_attr"))
    def key(t):
        return tuple((v is None, v) for v in t)
    for how in ("inner", "left"):
        expect = sorted(map(tuple, big.join(dim, on="k", how=how).collect()), key=key)
        got = sorted(map(tuple, bloom.bloom_join(big, dim, on="k", how=how).collect()), key=key)
        assert got == expect, how
    with pytest.raises(ValueError):
        bloom.bloom_join(big, dim, on="k", how="full")


def test_multi_column_key(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 11), (2, "a", 12), (3, "c", 13)],
        "k1 int, k2 string, v int")
    right = spark.createDataFrame([(1, "a"), (3, "c"), (9, "z")],
                                  "k1 int, k2 string")
    expect = sorted(map(tuple, left.join(right, ["k1", "k2"], "left_semi").collect()))
    got = sorted(map(tuple, bloom.bloom_semi_join(left, right, ["k1", "k2"]).collect()))
    assert got == expect


def test_pipe_in_pipe_out(big, small):
    out = bloom.bloom_anti_join(Pipe(big), small, on="k")
    assert isinstance(out, Pipe)
    assert out.df.count() == big.join(small, "k", "left_anti").count()


def test_bypass_stream_never_shuffles(big, small):
    """The definite-new branch of bloom_anti_join must reach the output
    through broadcast + filter only — at 100 TB this is the point: most
    rows never touch an exchange. The suspects branch shuffles (it is the
    real anti join); the bypass branch must not."""
    bf = bloom.bloom_build(small.dropna().select(F.col("k").alias("__k")), "__k")
    bypass = (big.crossJoin(F.broadcast(bf.df))
              .where(~bf.contains(F.col("k"))).drop("__bloom_words"))
    p = bypass._jdf.queryExecution().executedPlan().toString()
    # the build already ran (eager collect); the probe stream is broadcast
    # + filter only — zero hash exchanges
    assert p.count("Exchange hashpartitioning") == 0
    assert "BroadcastExchange" in p          # the one-row filter rides here


def test_build_exchange_carries_words_not_keys(small):
    """The build's groupBy(word) must partial-aggregate: two HashAggregate
    levels around its exchange, so each map task emits ≤ m/64 rows no
    matter how many keys it saw."""
    wr = bloom._word_rows(small.dropna(), "k", m_bits=8192, k=7)
    p = wr._jdf.queryExecution().executedPlan().toString()
    first_ex = p.index("Exchange hashpartitioning")
    assert p[:first_ex].count("HashAggregate") >= 1   # map-side partial OR


def test_params_properties():
    """Sizing-formula properties over a broad random grid (pure Python)."""
    from hypothesis import given, settings, strategies as st
    from scalding_spark.functions import bloom

    @given(n=st.integers(1, 10**9), fpp=st.floats(0.0001, 0.5))
    @settings(max_examples=200, deadline=None)
    def check(n, fpp):
        m, k = bloom.bloom_params(n, fpp)
        assert m % 64 == 0 and m >= 64 and k >= 1
        # optimal k ≈ (m/n)·ln2 — never absurdly far off
        import math
        assert k <= max(1, int(m / n * math.log(2)) + 1)
        # tighter fpp never shrinks the filter
        m2, _ = bloom.bloom_params(n, min(0.5, fpp * 2))
        assert m2 <= m

    check()


def test_random_membership_parity(spark):
    """Seeded random key sets: zero false negatives at several sizes/fpps
    in one Spark pass each."""
    import random
    from scalding_spark.functions import bloom
    rnd = random.Random(11)
    for n, fpp in [(10, 0.01), (500, 0.1), (2000, 0.001)]:
        keys = rnd.sample(range(10**12), n)
        df = spark.createDataFrame([(x,) for x in keys], "k long")
        bf = bloom.bloom_build(df, "k", fpp=fpp)
        assert bloom.bloom_filter_df(df, "k", bf).count() == n, (n, fpp)


def test_bloom_joins_widen_integral_key_types(spark):
    # xxhash64 is type-sensitive; the joins must hash both sides through a
    # common (widened) type or every true match becomes a false negative
    from scalding_spark.functions.bloom import bloom_anti_join, bloom_semi_join
    big = spark.createDataFrame([(i,) for i in range(10)], "k int")
    small = spark.createDataFrame([(i,) for i in range(5)], "k long")
    assert bloom_semi_join(big, small, on="k").count() \
        == big.join(small, "k", "left_semi").count() == 5
    assert bloom_anti_join(big, small, on="k").count() \
        == big.join(small, "k", "left_anti").count() == 5


def test_bloom_joins_reject_incompatible_key_types(spark):
    from scalding_spark.functions.bloom import bloom_semi_join
    big = spark.createDataFrame([(1,)], "k int")
    small = spark.createDataFrame([("1",)], "k string")
    with pytest.raises(ValueError, match="mismatched types"):
        bloom_semi_join(big, small, on="k")


def test_bloom_build_k_follows_overridden_m_bits(spark):
    # a caller-squeezed m must not inherit the fpp-optimal k of a much
    # larger m (k=7 probes into 1 bit/key saturates the filter)
    from scalding_spark.functions.bloom import bloom_build
    keys = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    bf = bloom_build(keys, "k", n_items=1000, m_bits=1024)
    assert bf.k == 1, bf.k
