"""Regression tests for code-review findings: each test pins the previously
broken behavior."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe
from scalding_spark.functions.dates import Duration
from scalding_spark.sources import extras
from scalding_spark.typed import TypedPipe


@pytest.fixture()
def seq(spark):
    return Pipe(spark.createDataFrame(
        [("a", 1, "x1"), ("a", 2, "x2"), ("a", 3, "x3"), ("b", 7, "y7")],
        "k string, t long, s string"))


def test_last_respects_descending_sort(seq):
    """last() on a DESC stream must be the minimum, not head() again."""
    desc = seq.group_by("k").sort_by("t", reverse=True)
    assert {(r.k, r.t) for r in desc.head().df.collect()} == {("a", 3), ("b", 7)}
    assert {(r.k, r.t) for r in desc.last().df.collect()} == {("a", 1), ("b", 7)}


def test_fold_left_descending_order(seq):
    """Non-commutative fold must apply in the requested (descending) order."""
    out = (seq.group_by("k").sort_by("t", reverse=True)
           .fold_left("s", "", lambda acc, x: F.concat(acc, x), out="joined"))
    got = {r.k: r.joined for r in out.df.collect()}
    assert got == {"a": "x3x2x1", "b": "y7"}


def test_fold_left_rejects_sortorder_columns(seq):
    with pytest.raises(ValueError, match="plain sort columns"):
        (seq.group_by("k").sort_by(F.col("t").desc())
         .fold_left("s", "", lambda a, x: F.concat(a, x), out="j"))


def test_month_arithmetic_clamps_day():
    assert Duration("months", 1).add_to(datetime(2026, 1, 31)) == datetime(2026, 2, 28)
    assert Duration("months", 1).add_to(datetime(2024, 1, 31)) == datetime(2024, 2, 29)
    assert Duration("years", 1).add_to(datetime(2024, 2, 29)) == datetime(2025, 2, 28)


def test_add_trap_parameterized_types(spark, seq):
    from decimal import Decimal

    def fn(row):
        return {"k": row["k"], "amt": Decimal(row["t"]).quantize(Decimal("0.01"))}

    out = seq.add_trap(fn, "k string, amt decimal(10,2)")
    assert out.df.count() == 4
    assert [f.name for f in out.df.schema.fields] == ["k", "amt"]


def test_flat_map_flatten_idiom(spark):
    p = Pipe(spark.createDataFrame([(1, [10, 20])], "id long, tags array<long>"))
    out = p.flat_map(F.col("tags"), out="tags")
    assert out.df.columns == ["id", "tags"]
    assert sorted(r.tags for r in out.df.collect()) == [10, 20]


def test_typed_fold_string_accumulator(spark):
    tp = TypedPipe.from_iterable(spark, [1, 2, 3], "long")
    out = tp.group_all().fold_left(
        "", lambda acc, x: F.concat(acc, x.cast("string")))
    assert out.collect()[0].value == "123"


def test_codec_check_stable_across_actions(spark):
    raw = spark.createDataFrame([(b"1:a",), (b"bad",)], "bytes binary")

    def decode(b: bytes) -> dict:
        k, v = b.decode().split(":")
        return {"k": int(k), "v": v}

    out, check = extras.read_codec(spark, raw, decode, "k long, v string",
                                   max_failures=1)
    out.count()
    out.count()  # second action must not double the failure count
    assert check() == 1 and check() == 1


def test_glob_validation_requires_matches(spark, tmp_path):
    from scalding_spark.sources import files
    with pytest.raises(files.InvalidSourceException):
        files.text_line(spark, str(tmp_path / "*.txt"))
    (tmp_path / "a.txt").write_text("hello\n")
    assert files.text_line(spark, str(tmp_path / "*.txt")).count() == 1


def test_normalize_no_single_partition_window(spark):
    p = Pipe(spark.createDataFrame([(float(i),) for i in range(1, 5)], "v double"))
    out = p.normalize("v", "share")
    assert {r.share for r in out.df.collect()} == {0.1, 0.2, 0.3, 0.4}
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # broadcast cross join, not a 1-task window
