"""Bucketed tables — co-located joins without a per-query shuffle.

The reference has no bucketing (every CoGroup re-shuffles both sides,
JoinAlgorithms.scala:155-182). On Spark, bucketing IS the upgrade path the
100 TB design calls for: write fact tables bucketed by their join key once,
and every subsequent equi-join or aggregation on that key skips the
exchange. ``tests/test_bucketed.py`` asserts the no-Exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str], n_buckets: int,
                   sort_by: list[str] | None = None,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Sorting
    within buckets additionally removes the sort from sort-merge joins."""
    w = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the same keys with the same bucket count:
    zero shuffle on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
