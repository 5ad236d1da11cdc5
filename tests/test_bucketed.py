"""Bucketed-table contract: a join of two co-bucketed tables must not
shuffle either side."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.sources import bucketed


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    # warehouse dir is a static conf — use the session default location and
    # drop the tables afterwards
    left = spark.range(0, 1000).select(F.col("id").alias("k"),
                                       (F.col("id") * 2).alias("lv"))
    right = spark.range(0, 500).select(F.col("id").alias("k"),
                                       (F.col("id") * 3).alias("rv"))
    bucketed.write_bucketed(left, "bk_left", ["k"], 4, sort_by=["k"])
    bucketed.write_bucketed(right, "bk_right", ["k"], 4, sort_by=["k"])
    yield "bk_left", "bk_right"
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_join_no_shuffle(spark, tables):
    lt, rt = tables
    # force a non-broadcast join so the bucketed (shuffle-free) sort-merge
    # path is what's under test — at real scale both sides are huge anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed.bucketed_join(spark, lt, rt, on=["k"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_no_shuffle(spark, tables):
    lt, _ = tables
    agg = bucketed.read_bucketed(spark, lt).groupBy("k").agg(F.sum("lv"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
