"""Parity pins for the retired r03 diagnostic probes.

The probes' diagnoses are closed (HUGEINT client conversion confirmed
r03/r04; q12 filter decomposition closed r04), so they no longer spend
driver-window slots (VERDICT r05 #5) — but they stay value-verified here
so a future engine/testdata drift in the primitives they isolate
(aggregate output types, nano-timestamp reads, date-vs-timestamp window
filters) fails a test instead of going unnoticed.
"""

import duckdb
import pytest

import __spark_entry__ as e
from tests.test_oracle_parity import TABLES, _normalize

PROBES = e.retired_probes()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(PROBES))
def test_retired_probe_parity(spark, sf_dir, name):
    fn, sql = PROBES[name]
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert (_normalize(spark_rows, spark_cols)
            == _normalize(duck_rows, duck_cols)), f"{name}: value mismatch"
