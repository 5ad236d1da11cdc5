"""Remaining source/sink parity: prefab dated sources, TsvWithHeader,
CodecSource with a bounded decode-failure budget, DistributedCacheFile, and
Pail-style partitioned stores.

Reference points (SURVEY.md §2.1):
- Daily/Hourly prefabs: source/DailySources.scala:23-61, HourlySources.scala:21-38
- TsvWithHeader: commons/source/TsvWithHeader.scala:36
- CodecSource + MaxFailuresCheck: source/CodecSource.scala:44-48, MaxFailuresCheck.scala:23
- DistributedCacheFile: filecache/DistributedCacheFile.scala:61-151
- PailSource: commons/source/PailSource.scala:40-218
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark import SparkFiles
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scalding_spark.functions.dates import hours
from scalding_spark.sources.time_pathed import TimePathedSource


# -- prefab dated sources (DailySources.scala, HourlySources.scala) ----------

def daily_suffix_source(prefix: str, fmt: str = "parquet") -> TimePathedSource:
    """DailySuffixTsv/Csv-style: ``prefix/yyyy/MM/dd/`` per day."""
    return TimePathedSource(os.path.join(prefix, "%Y/%m/%d"), fmt=fmt)


def hourly_suffix_source(prefix: str, fmt: str = "parquet") -> TimePathedSource:
    """HourlySuffixTsv/Csv-style: ``prefix/yyyy/MM/dd/HH`` per hour."""
    return TimePathedSource(os.path.join(prefix, "%Y/%m/%d/%H"), span=hours(1), fmt=fmt)


# -- TsvWithHeader (commons/source/TsvWithHeader.scala:36) -------------------

def write_tsv_with_header(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """TSV data dir + a separate ``.HEADER`` metadata file holding the field
    names, like the reference's header-file convention."""
    df.write.mode(mode).option("sep", "\t").option("header", False).csv(path)
    with open(path + ".HEADER", "w", encoding="utf-8") as f:
        f.write(json.dumps(df.columns))


def read_tsv_with_header(spark: SparkSession, path: str, schema=None) -> DataFrame:
    with open(path + ".HEADER", encoding="utf-8") as f:
        cols = json.loads(f.read())
    reader = spark.read.option("sep", "\t").option("header", False)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    return df.toDF(*cols)


# -- CodecSource with failure budget (MaxFailuresCheck.scala:23) -------------

class DecodeBudgetExceeded(Exception):
    """Raised when decode failures exceed the configured budget."""


def read_codec(spark: SparkSession, df: DataFrame, decode: Callable[[bytes], dict],
               schema: str, bytes_col: str = "bytes",
               max_failures: int = 0) -> tuple[DataFrame, Callable[[], int]]:
    """Decode a binary column with a bounded failure budget
    (CodecSource.scala:44-48): rows whose ``decode`` raises are dropped and
    counted. Returns ``(decoded_df, check)``; ``check()`` raises
    ``DecodeBudgetExceeded`` if failures > max_failures — the reference's
    MaxFailuresCheck.

    Failures are counted in the data flow (an ``__ok`` marker column on a
    persisted intermediate), NOT a Spark accumulator: accumulators re-add on
    every re-evaluation (second actions, task retries, speculation), which
    would inflate the count past the budget spuriously."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    out_cols = [f.name for f in _parse_datatype_string(schema).fields]

    def runner(it):
        for pdf in it:
            recs = []
            for raw in pdf[bytes_col]:
                try:
                    rec = dict(decode(bytes(raw)))
                    rec["__ok"] = True
                except Exception:  # noqa: BLE001 - budgeted decode
                    rec = {c: None for c in out_cols}
                    rec["__ok"] = False
                recs.append(rec)
            if recs:
                yield pd.DataFrame(recs, columns=out_cols + ["__ok"])

    from scalding_spark.session import register_persisted
    marked = df.select(bytes_col).mapInPandas(
        runner, schema=schema + ", __ok boolean").persist()
    register_persisted(marked)  # released via release_materialized()
    out = marked.where(F.col("__ok")).drop("__ok")

    def check() -> int:
        n = marked.where(~F.col("__ok")).count()
        if n > max_failures:
            raise DecodeBudgetExceeded(
                f"{n} decode failures > budget {max_failures}")
        return n

    return out, check


# -- DistributedCacheFile (filecache/DistributedCacheFile.scala:61-151) ------

def distributed_cache_file(spark: SparkSession, path: str) -> str:
    """Ship a file to every executor (SparkContext.addFile); returns the
    basename to pass to ``cached_path`` inside tasks."""
    spark.sparkContext.addFile(path)
    return os.path.basename(path)


def cached_path(name: str) -> str:
    """Executor-side resolution (the reference's symlinked path)."""
    return SparkFiles.get(name)


# -- Pail-style partitioned record store (PailSource.scala:40-218) -----------

def write_pail(df: DataFrame, root: str, partition_cols: list[str],
               mode: str = "overwrite", fmt: str = "parquet") -> None:
    """Vertically-partitioned store: dynamic partition columns become
    directories (``root/col=value/...``), the reference's Pail 'structured
    directory' layout on native Spark partitioned writes. Readers that filter
    on partition columns scan only the matching directories."""
    getattr(df.write.mode(mode).partitionBy(*partition_cols), fmt)(root)


def read_pail(spark: SparkSession, root: str, fmt: str = "parquet",
              where=None) -> DataFrame:
    df = getattr(spark.read, fmt)(root)
    return df.where(where) if where is not None else df
