"""Regression for the r01 driver-red q12_priority_by_flag.

The driver hands ``queries()`` ITS SparkSession, which may run with a
non-UTC session timezone — shifting every timestamp-literal cast and
timestamp->date cast relative to DuckDB's naive TIMESTAMP/DATE literals.
``_t`` (the shared table reader) must pin ``spark.sql.session.timeZone=UTC``
so the comparison windows are engine-stable no matter what session we get.

These tests deliberately poison the session TZ before running the query and
assert (a) _t restores UTC, (b) the driver-red query still matches DuckDB.
"""

import pytest

import __spark_entry__ as entry_mod
from tests.test_oracle_parity import _duck, _normalize

POISON_TZ = "America/Los_Angeles"  # -8h: shifts midnight-boundary windows


@pytest.fixture
def poisoned_tz(spark):
    orig = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", POISON_TZ)
    yield spark
    spark.conf.set("spark.sql.session.timeZone", orig)


def test_t_pins_utc(poisoned_tz, sf_dir):
    entry_mod._t(poisoned_tz, sf_dir, "lineitem")
    assert poisoned_tz.conf.get("spark.sql.session.timeZone") == "UTC"


@pytest.mark.parametrize("name", [
    "q12_priority_by_flag",   # the r01 driver-red row
    "q1_pricing_summary",     # shipdate upper bound
    "q10_returned_items",     # orderdate quarter window + date-cast output
])
def test_oracle_match_under_non_utc_session(poisoned_tz, sf_dir, name):
    sdf = entry_mod.queries()[name](poisoned_tz, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(sf_dir)
    res = con.execute(entry_mod.oracle_sql()[name])
    duck_rows = res.fetchall()
    duck_cols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert _normalize(spark_rows, sdf.columns) == _normalize(duck_rows, duck_cols)
