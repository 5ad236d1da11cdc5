"""File sources — parity with FileSource.scala.

Missing-input validation mirrors ``validateTaps`` (FileSource.scala:99-115):
``strict=True`` requires every path to exist, else ≥1 (Mode.scala:64-77).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class InvalidSourceException(Exception):
    """(FileSource.scala:35)."""


def _validate(paths: list[str], strict: bool) -> list[str]:
    import glob as _glob

    def exists(p: str) -> bool:
        # glob patterns must MATCH something — a bare '*' is not a free pass
        return bool(_glob.glob(p)) if any(ch in p for ch in "*?[") \
            else os.path.exists(p)

    existing = [p for p in paths if exists(p)]
    if strict and len(existing) != len(paths):
        missing = sorted(set(paths) - set(existing))
        raise InvalidSourceException(f"missing inputs: {missing}")
    if not existing:
        raise InvalidSourceException(f"no inputs exist: {paths}")
    return existing


def text_line(spark: SparkSession, *paths: str, strict: bool = True,
              with_offset: bool = False) -> DataFrame:
    """TextLine ('offset, 'line) (FileSource.scala:405,155-162). The offset
    is a monotonically-increasing id (per-partition ordered), not a byte
    offset — documented divergence."""
    df = spark.read.text(list(_validate(list(paths), strict)))
    df = df.withColumnRenamed("value", "line")
    if with_offset:
        df = df.withColumn("offset", F.monotonically_increasing_id()).select("offset", "line")
    return df


def tsv(spark: SparkSession, *paths: str, schema=None, header: bool = False,
        strict: bool = True, safe: bool = True) -> DataFrame:
    """Tsv with strict/safe parse flags (FileSource.scala:244-258,168-192):
    ``safe=True`` → PERMISSIVE (unparseable → null, the reference's
    safe-parse), else FAILFAST."""
    reader = spark.read.option("sep", "\t").option("header", header) \
        .option("mode", "PERMISSIVE" if safe else "FAILFAST")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(list(_validate(list(paths), strict)))


def csv(spark: SparkSession, *paths: str, schema=None, header: bool = True,
        sep: str = ",", strict: bool = True, safe: bool = True) -> DataFrame:
    reader = spark.read.option("sep", sep).option("header", header) \
        .option("mode", "PERMISSIVE" if safe else "FAILFAST")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(list(_validate(list(paths), strict)))


def json_line(spark: SparkSession, *paths: str, schema=None, strict: bool = True) -> DataFrame:
    """JsonLine (FileSource.scala:450-503)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(list(_validate(list(paths), strict)))


def iterable_source(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """In-memory literal source (IterableSource.scala:44-84)."""
    return spark.createDataFrame(list(rows), schema=schema)


def null_sink(df: DataFrame) -> None:
    """NullSource/NullTap — run the pipeline for its side effects
    (Source.scala:268-308) → the no-op sink executes the full plan."""
    df.write.format("noop").mode("overwrite").save()


def parquet(spark: SparkSession, *paths: str, strict: bool = True) -> DataFrame:
    """Columnar source of record (SURVEY §7.1: parquet replaces the
    reference's SequenceFile/Lzo container tier). Predicate pushdown,
    column pruning and partition pruning all reach the scan."""
    return spark.read.parquet(*_validate(list(paths), strict))


def orc(spark: SparkSession, *paths: str, strict: bool = True) -> DataFrame:
    """ORC twin of :func:`parquet` — same engine-native pushdown/pruning
    properties, for lakes standardized on ORC. Shares the strict/safe
    validateTaps contract (FileSource.scala:99-115)."""
    return spark.read.orc(*_validate(list(paths), strict))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
