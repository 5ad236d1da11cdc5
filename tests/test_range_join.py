"""range_join: bucketed point-in-interval join must equal the naive
non-equi join on every bucket-width choice (boundary spans, inclusive
endpoints, multi-match, key isolation)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from scalding_spark import joins


def _ts(minutes: float):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sides(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(9)), (1, _ts(10)), (1, _ts(25)), (2, _ts(9))],
        "k long, pt timestamp")
    ivals = spark.createDataFrame(
        [(1, 100, _ts(0), _ts(10)),    # inclusive both ends
         (1, 200, _ts(8), _ts(30)),    # overlaps the first
         (2, 300, _ts(40), _ts(50))],  # no points inside
        "k long, ival_id long, s timestamp, e timestamp")
    return points, ivals


def _naive(points, ivals):
    j = points.join(ivals, on="k").where(
        (F.col("pt") >= F.col("s")) & (F.col("pt") <= F.col("e")))
    return {(r.k, r.pt, r.ival_id) for r in j.collect()}


@pytest.mark.parametrize("width", [1, 60, 600, 3600])
def test_range_join_matches_naive(sides, width):
    points, ivals = sides
    got = {(r.k, r.pt, r.ival_id) for r in
           joins.range_join(points, ivals, "pt", "s", "e",
                            on=["k"], bucket_seconds=width).df.collect()}
    assert got == _naive(points, ivals)
    assert got  # non-trivial fixture


def test_range_join_inclusive_endpoints(sides):
    points, ivals = sides
    got = {(r.pt, r.ival_id) for r in
           joins.range_join(points, ivals, "pt", "s", "e",
                            on=["k"], bucket_seconds=60).df.collect()}
    assert (_ts(0), 100) in got   # start boundary
    assert (_ts(10), 100) in got  # end boundary
