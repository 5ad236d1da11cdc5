"""Skew-join correctness: sampled skew join output must equal the plain
join's (the reference's own criterion, SkewJoinTest.scala:100-140), on data
with a deliberately hot key."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe
from scalding_spark import joins


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds 50% of the left side
    left = spark.range(0, 4000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("l_val"))
    right = spark.range(0, 500).select(
        (F.col("id") % 97).alias("k"), (F.col("id") * 10).alias("r_val"))
    return Pipe(left), Pipe(right)


def agg(df):
    return sorted(tuple(r) for r in
                  df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                      F.sum("l_val").alias("sl"),
                                      F.sum("r_val").alias("sr")).collect())


def test_skew_join_equals_plain(skewed):
    left, right = skewed
    plain = agg(left.df.join(right.df, on="k"))
    # high sample rate so the tiny test data actually samples the hot key;
    # small fragments so replication really kicks in
    sk = joins.skew_join(left, right, on=["k"], sample_rate=0.5,
                         rows_per_fragment=100)
    assert agg(sk.df) == plain


def test_salted_equals_plain(skewed):
    left, right = skewed
    plain = agg(left.df.join(right.df, on="k"))
    assert agg(joins.salted_skew_join(left, right, on=["k"], salt=8).df) == plain


@pytest.mark.parametrize("repl", [
    joins.SkewReplicationA(replication_factor=1),
    joins.SkewReplicationA(replication_factor=3),
    joins.SkewReplicationB(max_keys_in_memory=50, max_reducer_output=500),
    joins.SkewReplicationB(),  # production caps: cold path on tiny data
])
def test_skew_replication_strategies_equal_plain(skewed, repl):
    # the reference's own criterion (SkewJoinTest.scala:100-140): any
    # replication policy must reproduce the plain join exactly
    left, right = skewed
    plain = agg(left.df.join(right.df, on="k"))
    sk = joins.skew_join(left, right, on=["k"], sample_rate=0.5,
                         replication=repl, reducers=8)
    assert agg(sk.df) == plain


def test_skew_replication_formulas_match_reference(spark):
    # pin the A/B arithmetic itself against hand-computed reference values
    # (SkewReplication.scala:38-66), via a literal-count DataFrame
    rows = [(0, 0), (1, 0), (0, 1), (5, 200), (200, 5), (10**7, 10**6)]
    df = spark.createDataFrame(rows, "l_cnt: long, r_cnt: long")

    def run(strategy, reducers):
        lr, rr = strategy.replications(F.col("l_cnt"), F.col("r_cnt"), reducers)
        return [tuple(r) for r in
                df.select(lr.alias("l"), rr.alias("r")).collect()]

    def ref_a(l, r, n, rf=1):
        n = n if n > 0 else 100
        left, right = min(r * rf, n), min(l * rf, n)
        return (1 if left == 0 else left, 1 if right == 0 else right)

    def ref_b(l, r, n, mkim=10**6, mro=10**7):
        n = n if n > 0 else 100
        left = max(1, r // mkim)
        right = min(n, (l * r) // (mro * left))
        return (left, 1 if right == 0 else right)

    assert run(joins.SkewReplicationA(), 0) == [ref_a(l, r, 0) for l, r in rows]
    assert run(joins.SkewReplicationA(3), 16) == [ref_a(l, r, 16, 3) for l, r in rows]
    assert run(joins.SkewReplicationB(), 0) == [ref_b(l, r, 0) for l, r in rows]
    assert run(joins.SkewReplicationB(50, 500), 8) == \
        [ref_b(l, r, 8, 50, 500) for l, r in rows]
