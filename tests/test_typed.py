"""Typed-layer tests — the reference's TypedPipeTest.scala style: small
literal collections, golden values computed in Python."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.typed import TypedPipe


@pytest.fixture(scope="module")
def nums(spark):
    return TypedPipe.from_iterable(spark, range(1, 11), "long")


def test_map_filter_fusion(nums):
    out = (nums.map(lambda v: v * 2)
           .filter(lambda v: v > 10)
           .map(lambda v: v + 1)
           .collect())
    assert sorted(out) == [13, 15, 17, 19, 21]


def test_flat_map(spark):
    words = TypedPipe.from_iterable(spark, ["a b", "c"], "string")
    out = words.flat_map(lambda v: F.split(v, " ")).collect()
    assert sorted(out) == ["a", "b", "c"]


def test_map_py_escape_hatch(nums):
    out = nums.map_py(lambda x: x * x, "long").collect()
    assert sorted(out) == [i * i for i in range(1, 11)]


def test_group_sum_and_size(nums):
    g = nums.group_by(lambda v: v % 2)
    sums = {r.key: r.value for r in g.sum().collect()}
    assert sums == {0: 30, 1: 25}
    sizes = {r.key: r.value for r in g.size().collect()}
    assert sizes == {0: 5, 1: 5}


def test_group_reduce_and_fold(nums):
    g = nums.group_by(lambda v: v % 2)
    got = {r.key: r.value for r in
           g.reduce(lambda a, b: a + b).collect()}
    assert got == {0: 30, 1: 25}
    folded = {r.key: r.value for r in
              g.fold_left(100, lambda acc, x: acc + x).collect()}
    assert folded == {0: 130, 1: 125}


def test_sorted_take(nums):
    g = nums.group_by(lambda v: v % 2)
    top = sorted((r.key, r.value) for r in g.sorted_take(2, desc=True).collect())
    assert top == [(0, 8), (0, 10), (1, 7), (1, 9)]


def test_typed_join_and_hash_join(spark):
    a = TypedPipe.from_iterable(spark, [1, 2, 3], "long").group_by(lambda v: v % 2)
    b = TypedPipe.from_iterable(spark, [10, 21], "long").group_by(lambda v: v % 2)
    out = sorted((r.key, r._1, r._2) for r in a.join(b).collect())
    assert out == [(0, 2, 10), (1, 1, 21), (1, 3, 21)]
    out2 = sorted((r.key, r._1, r._2) for r in a.hash_join(b).collect())
    assert out2 == out


def test_cross_and_union(spark):
    a = TypedPipe.from_iterable(spark, [1, 2], "long")
    b = TypedPipe.from_iterable(spark, [10], "long")
    crossed = [(v["_1"], v["_2"]) for v in a.cross(b).collect()]
    assert sorted(crossed) == [(1, 10), (2, 10)]
    assert sorted((a + b).collect()) == [1, 2, 10]


def test_from_df_struct_values(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string")
    tp = TypedPipe.from_df(df)
    out = tp.map(lambda v: v["id"]).collect()
    assert sorted(out) == [1, 2]


def test_map_value_stream(spark):
    import pandas as pd
    tp = TypedPipe.from_iterable(spark, [1, 2, 3, 4], "long")
    g = tp.group_by(lambda v: v % 2)

    def span(pdf: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame([{"key": int(pdf["key"].iloc[0]),
                              "span": float(pdf["value"].max() - pdf["value"].min())}])

    out = {r.key: r.span for r in
           g.map_value_stream(span, "key long, span double").collect()}
    assert out == {0: 2.0, 1: 2.0}
