"""As-of join tests vs pandas merge_asof goldens."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe
from scalding_spark import joins

TRADES = [("A", 1.0, 100), ("A", 5.0, 101), ("A", 9.0, 102),
          ("B", 2.0, 200), ("B", 3.0, 201)]
QUOTES = [("A", 0.5, 9.9), ("A", 4.0, 10.1), ("A", 8.0, 10.5),
          ("B", 2.5, 20.0), ("C", 1.0, 30.0)]


@pytest.fixture(scope="module")
def sides(spark):
    t = Pipe(spark.createDataFrame(TRADES, "sym string, ts double, qty long"))
    q = Pipe(spark.createDataFrame(QUOTES, "sym string, qts double, px double"))
    return t, q


def golden(tolerance=None):
    t = pd.DataFrame(TRADES, columns=["sym", "ts", "qty"]).sort_values("ts")
    q = pd.DataFrame(QUOTES, columns=["sym", "qts", "px"]).sort_values("qts")
    m = pd.merge_asof(t, q, left_on="ts", right_on="qts", by="sym",
                      tolerance=tolerance)
    return {(r.sym, r.ts): (None if pd.isna(r.px) else r.px)
            for r in m.itertuples()}


def run(sides, **kw):
    t, q = sides
    out = joins.as_of_join(t, q, on=["sym"], left_ts="ts", right_ts="qts", **kw)
    return {(r.sym, r.ts): r.px for r in out.df.collect()}


def test_as_of_join_matches_merge_asof(sides):
    assert run(sides) == golden()


def test_as_of_join_tolerance(sides):
    assert run(sides, tolerance_seconds=1.5) == golden(tolerance=1.5)


def test_as_of_join_no_right_rows_for_key(sides):
    got = run(sides)
    assert got[("B", 2.0)] is None          # first B quote is at 2.5
    assert got[("B", 3.0)] == 20.0


def test_as_of_join_single_shuffle(sides):
    t, q = sides
    out = joins.as_of_join(t, q, on=["sym"], left_ts="ts", right_ts="qts")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan


def golden_dir(direction, tolerance=None):
    t = pd.DataFrame(TRADES, columns=["sym", "ts", "qty"]).sort_values("ts")
    q = pd.DataFrame(QUOTES, columns=["sym", "qts", "px"]).sort_values("qts")
    m = pd.merge_asof(t, q, left_on="ts", right_on="qts", by="sym",
                      direction=direction, tolerance=tolerance)
    return {(r.sym, r.ts): (None if pd.isna(r.px) else r.px)
            for r in m.itertuples()}


def test_as_of_join_forward_matches_merge_asof(sides):
    assert run(sides, direction="forward") == golden_dir("forward")


def test_as_of_join_nearest_matches_merge_asof(sides):
    assert run(sides, direction="nearest") == golden_dir("nearest")


def test_as_of_join_directions_with_tolerance(sides):
    for d in ("forward", "nearest"):
        assert run(sides, direction=d, tolerance_seconds=1.5) == \
            golden_dir(d, tolerance=1.5)


def test_as_of_join_direction_still_single_shuffle(sides):
    t, q = sides
    for d in ("forward", "nearest"):
        out = joins.as_of_join(t, q, on=["sym"], left_ts="ts",
                               right_ts="qts", direction=d)
        plan = out.df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, d
        assert "BroadcastNestedLoopJoin" not in plan


def test_as_of_join_rejects_bad_direction(sides):
    t, q = sides
    with pytest.raises(ValueError, match="direction"):
        joins.as_of_join(t, q, on=["sym"], left_ts="ts", right_ts="qts",
                         direction="sideways")
