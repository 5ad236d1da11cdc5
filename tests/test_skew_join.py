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
