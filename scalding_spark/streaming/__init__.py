"""Structured Streaming extensions.

The reference is strictly batch (SURVEY.md §2.10) — its incremental story is
time-partitioned sources + job chaining. These helpers are the engine's
*extension* surface: the same logical aggregations, run incrementally with
watermarks. Each helper accepts either a batch or a streaming DataFrame
(identical plan, different execution), so correctness tests run in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_agg(df: DataFrame, ts_col: str, window: str, *aggs,
                 keys: list[str] | None = None, slide: str | None = None,
                 watermark: str | None = None) -> DataFrame:
    """Tumbling/sliding time-window aggregation. On a stream, pass
    ``watermark`` to bound state (late rows beyond it are dropped)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return df.groupBy(win.alias("win"), *(keys or [])).agg(*aggs)


def sessionize(df: DataFrame, ts_col: str, user_col: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: batch formulation via lag + cumulative session ids
    (the SURVEY guide's pattern); on streams use F.session_window instead."""
    from pyspark.sql import Window
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("session_id", sess_id)


def stream_from_parquet_dir(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-stream source for tests/smoke: treats a parquet dir as a stream."""
    return spark.readStream.schema(schema).parquet(path)
