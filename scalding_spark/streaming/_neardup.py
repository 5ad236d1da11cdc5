"""stream_ingest_neardup body — split out of __init__ for readability."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_ingest_neardup(stream_df: DataFrame, corpus_path: str,
                          store_path: str, checkpoint: str, text_col: str,
                          id_col: str, num_hashes: int = 64, bands: int = 16,
                          shingle_n: int = 3, threshold: float = 0.7,
                          available_now: bool = True,
                          compact_every_n_epochs: int | None = None):
    """Streaming incremental NEAR-dup ingestion — the MinHash upgrade of
    :func:`stream_ingest_dedup`: each micro-batch is near-dup-checked
    against every document ever kept, using only a persistent signature
    store (``num_hashes`` × 8 B/doc — the corpus TEXT never re-enters the
    stream).

    Per batch (foreachBatch):

    1. within-batch exact dedup, then ONE MinHash signature computation
       for the whole batch (the dominant per-doc CPU cost — shared by
       every later step);
    2. within-batch near-dup: band self-join over those signatures,
       verified by :func:`dedup.signature_jaccard` (smaller ``id_col``
       survives) — the same estimator contract as the store check, so
       batch boundaries don't change which pairs count as duplicates;
    3. vs the store: band-hash probe — the batch's band table BROADCASTS
       against a map-only scan of the (id, sig) store, so the store is
       never shuffled — candidates verified by the same estimator
       (stderr ≈ 1/√num_hashes);
    4. novel docs land in ``corpus_path``, their signatures in
       ``store_path``, both written into a ``__batch`` partition keyed by
       (checkpoint-id, epoch) with dynamic-partition OVERWRITE — an epoch
       replayed after a mid-write crash rewrites its own partition instead
       of appending duplicates (idempotent under the checkpoint's replay
       semantics), while a FRESH checkpoint pointed at the same outputs
       gets its own partition namespace and cannot clobber earlier runs.

    Exact duplicates of stored docs estimate at 1.0 and are caught by the
    same probe; token-less docs carry no signature and always pass.

    ``compact_every_n_epochs=N``: end-of-epoch store+corpus compaction
    every N epochs (see stream_ingest_dedup — same hook, same replay
    safety).

    100 TB note: the per-batch store cost is two map-only scans (band
    probe + candidate verify). When the store outgrows one scan per
    micro-batch, write it partitioned by a band-hash bucket so the probe
    prunes partitions; the verify scan prunes by the candidate semi-join.
    """
    from scalding_spark.functions.dedup import (exact_dedup,
                                                minhash_band_hashes,
                                                minhash_signatures,
                                                signature_jaccard)
    import hashlib
    bh = minhash_band_hashes(num_hashes, bands)
    thr = F.lit(float(threshold))
    # partition namespace: stable across restarts of THIS checkpoint (so a
    # replayed epoch overwrites itself), distinct for a fresh checkpoint
    # (so it cannot overwrite partitions an earlier run wrote)
    from scalding_spark.streaming import (_reject_reserved_batch_col,
                                          _validate_compact_every)
    _reject_reserved_batch_col(stream_df)
    _validate_compact_every(compact_every_n_epochs)
    run_tag = hashlib.md5(checkpoint.encode()).hexdigest()[:12]

    def ingest(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch = exact_dedup(batch, text_col, id_col)
        # ONE signature pass per batch; localCheckpoint: sigs feed the
        # self-join (twice), the store probe, and the store write — and
        # release with the batch, unlike persist() which would accumulate
        # a cache entry per micro-batch for the stream's lifetime
        sigs = (minhash_signatures(batch, text_col, id_col, num_hashes,
                                   shingle_n)
                .localCheckpoint())
        bbands = sigs.select(F.col("id").alias("bid"),
                             F.posexplode(bh).alias("band", "h"))
        bsigs = sigs.select(F.col("id").alias("bid"),
                            F.col("sig").alias("bsig"))
        # within-batch: band self-join, estimator verify, larger id loses
        l, r = bbands.alias("l"), bbands.alias("r")
        losers = (l.join(r, (F.col("l.band") == F.col("r.band"))
                         & (F.col("l.h") == F.col("r.h"))
                         & (F.col("l.bid") < F.col("r.bid")))
                  .select(F.col("l.bid").alias("wid"),
                          F.col("r.bid").alias("bid")).distinct()
                  .join(bsigs.select(F.col("bid").alias("wid"),
                                     F.col("bsig").alias("wsig")), "wid")
                  .join(bsigs, "bid")
                  .where(signature_jaccard(F.col("wsig"), F.col("bsig"),
                                           num_hashes) >= thr)
                  .select("bid").distinct())
        batch = batch.join(losers.withColumnRenamed("bid", id_col),
                           id_col, "left_anti")
        sigs = sigs.join(losers.withColumnRenamed("bid", "id"),
                         "id", "left_anti")
        bbands = bbands.join(losers, "bid", "left_anti")
        bsigs = bsigs.join(losers, "bid", "left_anti")
        from scalding_spark.streaming import _read_store
        store = _read_store(spark, store_path)
        if store is not None:
            # replay hole: exclude THIS epoch's own (possibly partially
            # committed) partition from the store read — otherwise a
            # replayed epoch sees its own docs as "already stored" and the
            # dynamic overwrite then erases them from corpus and store.
            # Partition-pruned filter: the scan skips the directory.
            store = store.where(
                F.col("__batch") != f"{run_tag}-{int(epoch_id)}")
            store_bands = store.select(
                F.col("id").alias("sid"), F.posexplode(bh).alias("band", "h"))
            cands = (store_bands
                     .join(F.broadcast(bbands), ["band", "h"])
                     .select("bid", "sid").distinct())
            dups = (store.join(F.broadcast(cands),
                               store["id"] == F.col("sid"))
                    .join(F.broadcast(bsigs), "bid")
                    .where(signature_jaccard(F.col("bsig"), store["sig"],
                                             num_hashes) >= thr)
                    .select(F.col("bid").alias(id_col)).distinct())
            batch = batch.join(dups, id_col, "left_anti")
        novel = batch.localCheckpoint()
        tag = F.lit(f"{run_tag}-{int(epoch_id)}")
        # per-WRITE dynamic overwrite (not the session conf — foreachBatch
        # shares the caller's session and must not mutate it)
        (novel.withColumn("__batch", tag)
         .write.mode("overwrite").partitionBy("__batch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(corpus_path))
        (sigs.join(novel.select(F.col(id_col).alias("id")), "id")
         .withColumn("__batch", tag)
         .write.mode("overwrite").partitionBy("__batch")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(store_path))
        from scalding_spark.streaming import _maybe_compact
        _maybe_compact(spark, epoch_id, compact_every_n_epochs,
                       store_path, corpus_path)

    w = (stream_df.writeStream.foreachBatch(ingest)
         .option("checkpointLocation", checkpoint))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
