"""stream_ingest_semantic body — split out of __init__ for readability,
the _neardup.py convention."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def stream_ingest_semantic(stream_df: DataFrame, corpus_path: str,
                           store_path: str, checkpoint: str,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           threshold: float = 0.95,
                           max_batch: int = 20_000,
                           available_now: bool = True):
    """Streaming incremental SEMANTIC-dup ingestion — the embedding tier
    of the store-probe family (exact: :func:`stream_ingest_dedup`,
    MinHash: :func:`stream_ingest_neardup`): each micro-batch is
    cosine-checked against every document ever kept, using only a
    persistent store of NORMALIZED vectors (dim × 8 B/doc — the corpus
    payload never re-enters the stream).

    Per batch (foreachBatch):

    1. the batch's non-NULL, nonzero-norm vectors are normalized and
       collected into ONE broadcast row (micro-batches are small by
       construction; ``max_batch`` is the circuit breaker — same
       driver-OOM contract as semantic_decontaminate's max_benchmark);
    2. within-batch semantic dedup: a row is dropped when ANY smaller-id
       batch vector has cosine ≥ ``threshold`` — evaluated map-only via
       ``F.exists`` over the broadcast row, which is EXACT greedy-by-id
       (≡ ``similarity.semantic_dedup(k=1)``, no cell-boundary recall
       loss at micro-batch sizes);
    3. vs the store: a map-only scan of the store computes, per stored
       vector, which batch vectors clear the threshold (the store is
       never shuffled and never collected — only matched batch IDS cross
       the exchange, ≡ ``similarity.semantic_decontaminate(batch,
       stored)`` semantics);
    4. novel docs land in ``corpus_path``, their normalized vectors in
       ``store_path``, both in a ``__batch`` partition keyed by
       (checkpoint-id, epoch) with dynamic-partition OVERWRITE — a
       replayed epoch rewrites its own partition (idempotent), a fresh
       checkpoint writes a disjoint namespace, and the store read
       excludes the epoch's own possibly-partially-committed partition
       (the replay hole, same as the other two tiers).

    Contracts shared with the similarity family: NULL-vector docs are
    KEPT and never stored (no position in space → cannot be vetted, and
    can never vet others); zero vectors are kept for any threshold > 0
    and not stored (they match nothing).

    100 TB note: per-batch store cost is one map-only scan doing
    |store| × |batch| × dim multiplies. When the store outgrows one scan
    per micro-batch, partition it by a coarse IVF/hyperplane bucket of
    the stored vector and pre-filter the probe to the batch's buckets —
    the partition-pruning upgrade the neardup tier documents for its
    band store.
    """
    from scalding_spark.functions.similarity import (_drop_null_vecs,
                                                     _one_row_df)
    import hashlib
    run_tag = hashlib.md5(checkpoint.encode()).hexdigest()[:12]
    thr = float(threshold)

    def ingest(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates([id_col])
        valid = _drop_null_vecs(batch, vec_col)
        n = valid.count()
        if n > max_batch:
            raise ValueError(
                f"stream_ingest_semantic micro-batch has {n} vectors, over "
                f"max_batch={max_batch} — the batch side is collected and "
                f"broadcast for the within-batch and store probes; shrink "
                f"the trigger (maxFilesPerTrigger / smaller batch dirs) or "
                f"raise the cap deliberately")
        rows = valid.select(F.col(id_col).alias("i"),
                            F.col(vec_col).alias("v")).collect()
        barr = []
        for r in rows:
            v = [float(x) for x in r.v]
            nrm = math.sqrt(sum(x * x for x in v))
            if nrm > 0:
                barr.append((r.i, [x / nrm for x in v]))
        if barr:
            bdf = _one_row_df(
                spark, (barr,), "barr: array<struct<i: long, v: array<double>>>")
            # within-batch: greedy-by-id over the broadcast row, map-only.
            # The normalized vector is materialized as a COLUMN first —
            # Catalyst does not CSE across lambda boundaries, so an inline
            # normalize would re-run per broadcast element per row (the
            # semantic_decontaminate lesson, measured 90× at sf1).
            dot = lambda b: F.aggregate(  # noqa: E731
                F.zip_with(b["v"], F.col("__vecn"), lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x)
            hit = F.exists(
                F.col("barr"),
                lambda b: (b["i"] < F.col(id_col)) & (dot(b) >= thr))
            batch = (batch.withColumn("__vecn", _normalized(vec_col))
                     .crossJoin(F.broadcast(bdf))
                     .where(~F.coalesce(hit, F.lit(False)))
                     .drop("barr", "__vecn"))
            # vs the store: map-only scan emitting matched batch ids only
            from scalding_spark.streaming import _read_store
            store = _read_store(spark, store_path)
            if store is not None:
                store = store.where(
                    F.col("__batch") != f"{run_tag}-{int(epoch_id)}")
                sdot = lambda b: F.aggregate(  # noqa: E731
                    F.zip_with(b["v"], F.col("vecn"), lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x)
                dup_ids = (store.crossJoin(F.broadcast(bdf))
                           .select(F.explode(F.filter(
                               F.col("barr"),
                               lambda b: sdot(b) >= thr)).alias("m"))
                           .select(F.col("m.i").alias(id_col)).distinct())
                batch = batch.join(dup_ids, id_col, "left_anti")
        novel = batch.localCheckpoint()
        tag = F.lit(f"{run_tag}-{int(epoch_id)}")
        (novel.withColumn("__batch", tag)
         .write.mode("overwrite").partitionBy("__batch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(corpus_path))
        vecn = _normalized(vec_col)
        (_drop_null_vecs(novel, vec_col)
         .select(F.col(id_col).alias("id"), vecn.alias("vecn"))
         .where(F.exists(F.col("vecn"), lambda x: x != 0))
         .withColumn("__batch", tag)
         .write.mode("overwrite").partitionBy("__batch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(store_path))

    w = (stream_df.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def _normalized(vec_col: str):
    """L2-normalized copy of ``vec_col`` (zero vector → zeros), the
    similarity-family convention."""
    from scalding_spark.functions.similarity import _norm
    v = F.col(vec_col)
    nrm = _norm(v)
    return F.when(nrm > 0, F.transform(
        v, lambda x: x.cast("double") / nrm)).otherwise(
        F.transform(v, lambda x: F.lit(0.0)))
