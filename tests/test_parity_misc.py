"""Misc parity behaviors: using-resource lifecycle (SideEffectTest.scala),
cross-type integral joins (IntegralCompTest.scala), JsonLine round-trips,
map-side bounded top-k."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe
from scalding_spark.sources import files


def test_using_resource_setup_and_release(spark, tmp_path):
    """using(resource).map parity (RichPipe.scala:73-119, SideEffectTest):
    the resource is built per task and released afterwards."""
    log = tmp_path / "lifecycle.log"

    class Resource:
        def __init__(self):
            self.factor = 10
            with open(log, "a") as f:
                f.write("open\n")

        def release(self):
            with open(log, "a") as f:
                f.write("release\n")

    def fn(res, batches):
        for pdf in batches:
            pdf["scaled"] = pdf["v"] * res.factor
            yield pdf[["scaled"]]

    p = Pipe(spark.createDataFrame([(1.0,), (2.0,)], "v double").coalesce(1))
    out = p.map_partitions(fn, "scaled double", barrier_setup=Resource)
    assert sorted(r.scaled for r in out.df.collect()) == [10.0, 20.0]
    lines = log.read_text().splitlines()
    assert lines.count("open") == lines.count("release") >= 1


def test_cross_type_integral_join(spark):
    """IntegralComparator parity (IntegralCompTest.scala, Job.scala:186-189):
    Int keys join against Long keys — Spark's implicit casts give the
    reference's cross-type numeric equality for free."""
    ints = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    longs = spark.createDataFrame([(1, 10.0), (3, 30.0)], "k long, x double")
    out = ints.join(longs, on="k")
    assert [(r.k, r.s, r.x) for r in out.collect()] == [(1, "a", 10.0)]


def test_json_line_roundtrip(spark, tmp_path):
    p = str(tmp_path / "j")
    df = spark.createDataFrame([(1, "x", [1, 2]), (2, "y", [])],
                               "id long, s string, arr array<long>")
    Pipe(df).write_json(p)
    back = files.json_line(spark, p, schema="id long, s string, arr array<long>")
    assert sorted((r.id, r.s, list(r.arr)) for r in back.collect()) == \
        [(1, "x", [1, 2]), (2, "y", [])]


def test_sorted_take_bounded_topk(spark):
    p = Pipe(spark.createDataFrame(
        [("a", i, i * 1.0) for i in range(10)] + [("b", 1, 5.0)],
        "k string, rank long, v double"))
    out = (p.group_by("k")
           .sorted_take(["v", "rank"], k=3, reverse=True)
           .done())
    rows = {r.k: [(e.v, e.rank) for e in r.top] for r in out.df.collect()}
    assert rows["a"] == [(9.0, 9), (8.0, 8), (7.0, 7)]
    assert rows["b"] == [(5.0, 1)]
