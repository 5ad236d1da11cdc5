"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, clearly marked); the Spark-side plumbing —
schema, partitioning, UDF signatures, batch shapes — is real and tested.
Swap ``_decode_image_stub`` for a PIL/ffmpeg call in a real deployment; the
plan shape (mapInPandas over binary batches, no shuffle) is unchanged.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def _decode_image_stub(content: bytes) -> list[float]:
    """STUB decode: deterministic 8-dim 'feature' from a content digest.
    Real deployments replace this with an actual decoder; everything around
    it (batching, schema, partitioning) is production-shaped."""
    if content is None:
        raise NotImplementedError("no codec in this environment and content is None")
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_image_features(df: DataFrame, content_col: str = "content",
                           out_col: str = "features") -> DataFrame:
    """Decode + featurize image bytes in Arrow batches (mapInPandas) —
    embarrassingly parallel, zero shuffle; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so executor memory holds
    decoded frames for one batch only."""
    import pandas as pd

    fields = df.schema.fields
    out_schema = T.StructType(list(fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))])

    def run(batches):
        for pdf in batches:
            pdf[out_col] = pdf[content_col].map(_decode_image_stub)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000,
                      duration_col: str = "duration_ms") -> DataFrame:
    """Video frame-sampling plumbing: explode one row per sampled timestamp
    (the decode of each frame is the stubbed step). Pure expressions — the
    fan-out happens before any Python."""
    ts = F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
    return df.withColumn("frame_ts_ms", F.explode(ts))
