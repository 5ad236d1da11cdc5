"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched pandas UDFs over mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, clearly marked); the Spark-side plumbing —
schema, partitioning, UDF signatures, batch shapes — is real and tested.
Swap ``_decode_image_stub``/``_decode_audio_stub`` for PIL/ffmpeg calls in a
real deployment; the plan shapes are unchanged:

- decode/featurize: mapInPandas over binary batches — embarrassingly
  parallel, zero shuffle; Arrow batch size bounds executor memory
  (``spark.sql.execution.arrow.maxRecordsPerBatch``).
- frame sampling: expression-level explode BEFORE Python, so the fan-out is
  JVM-side and each Python batch holds frames, not whole videos.
- size-aware partitioning: media rows are megabytes, not bytes — partition
  by a byte budget, not a row count.
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


# -- decode stubs (replace with real codecs in deployment) -------------------

def _decode_image_stub(content: bytes) -> list[float]:
    """STUB decode: deterministic 8-dim 'feature' from a content digest.
    Real deployments replace this with an actual decoder; everything around
    it (batching, schema, partitioning) is production-shaped."""
    if content is None:
        raise NotImplementedError("no codec in this environment and content is None")
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:8]]


def _resize_image_stub(content: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic re-digest tagged with the target size.
    A real implementation decodes, resamples, re-encodes."""
    if content is None:
        raise NotImplementedError("no codec in this environment and content is None")
    return hashlib.sha256(content + f"{width}x{height}".encode()).digest()


def _decode_audio_stub(content: bytes, n_windows: int = 4) -> list[float]:
    """STUB audio featurizer: n_windows deterministic 'energy' values."""
    if content is None:
        raise NotImplementedError("no codec in this environment and content is None")
    digest = hashlib.sha256(content).digest()
    return [int.from_bytes(digest[i * 2:i * 2 + 2], "big") / 65535.0
            for i in range(n_windows)]


# -- plumbing (real) ---------------------------------------------------------

def extract_image_features(df: DataFrame, content_col: str = "content",
                           out_col: str = "features",
                           decode=_decode_image_stub) -> DataFrame:
    """Decode + featurize image bytes in Arrow batches (mapInPandas) —
    embarrassingly parallel, zero shuffle; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so executor memory holds
    decoded frames for one batch only."""
    fields = df.schema.fields
    out_schema = T.StructType(list(fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))])

    def run(batches):
        for pdf in batches:
            pdf[out_col] = pdf[content_col].map(decode)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int,
                  content_col: str = "content",
                  resize=_resize_image_stub) -> DataFrame:
    """Resize pass: binary→binary per row, metadata columns updated to the
    target dimensions. Same zero-shuffle mapInPandas shape as decode."""
    out_schema = df.schema

    def run(batches):
        for pdf in batches:
            pdf[content_col] = pdf[content_col].map(lambda b: resize(b, width, height))
            if "width" in pdf.columns:
                pdf["width"] = width
            if "height" in pdf.columns:
                pdf["height"] = height
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_audio_features(df: DataFrame, content_col: str = "content",
                           out_col: str = "energies", n_windows: int = 4,
                           decode=_decode_audio_stub) -> DataFrame:
    """Windowed audio features (one array per clip)."""
    fields = df.schema.fields
    out_schema = T.StructType(list(fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))])

    def run(batches):
        for pdf in batches:
            pdf[out_col] = pdf[content_col].map(lambda b: decode(b, n_windows))
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000,
                      duration_col: str = "duration_ms") -> DataFrame:
    """Video frame-sampling plumbing: explode one row per sampled timestamp
    (the decode of each frame is the stubbed step). Pure expressions — the
    fan-out happens before any Python."""
    ts = F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
    return df.withColumn("frame_ts_ms", F.explode(ts))


def decode_sampled_frames(df: DataFrame, every_ms: int = 1000,
                          content_col: str = "content",
                          out_col: str = "frame_features",
                          decode=_decode_image_stub) -> DataFrame:
    """frame_sample_plan + per-frame decode: each exploded (clip, frame_ts)
    row decodes independently, so a 2-hour video fans out across the cluster
    instead of pinning one worker."""
    sampled = frame_sample_plan(df, every_ms)
    fields = sampled.schema.fields
    out_schema = T.StructType(list(fields) + [T.StructField(out_col, T.ArrayType(T.DoubleType()))])

    def run(batches):
        for pdf in batches:
            # explicit None check — `bytes and ...` would treat an EMPTY clip
            # (b'', falsy) as None and drop the frame-ts suffix entirely
            pdf[out_col] = [
                decode(None if c is None else bytes(c) + int(t).to_bytes(8, "big"))
                for c, t in zip(pdf[content_col], pdf["frame_ts_ms"])]
            yield pdf

    return sampled.mapInPandas(run, schema=out_schema)


def repartition_by_bytes(df: DataFrame, total_bytes_col: str = None,
                         content_col: str = "content",
                         target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Media-aware partitioning: rows are MBs, so a row-count split is
    wrong. Computes total payload size and repartitions so each partition
    holds ≈ target_partition_bytes of content. One tiny pre-pass (sum of
    lengths — column-pruned scan), then a round-robin repartition."""
    size_expr = F.col(total_bytes_col) if total_bytes_col else F.length(F.col(content_col))
    total = df.agg(F.sum(size_expr).alias("b")).collect()[0].b or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)
