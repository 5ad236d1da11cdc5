"""Continuous corpus ingestion as a STREAM — the streaming face of
examples/incremental_corpus_job.py, with the dedup tier selectable:

  --mode exact     md5 fingerprint store (32 B/doc)      — byte-identical dups
  --mode neardup   MinHash signature store (512 B/doc)   — edited/boilerplate dups
  --mode semantic  normalized-vector store (dim×8 B/doc) — paraphrased dups
  --mode image     perceptual-hash store (8 B/image)     — re-encoded/retouched dups

All three tiers share the store-probe contract (scalding_spark.streaming):
each micro-batch is checked within itself and against everything ever
kept, using only the side-table store — the corpus payload never
re-enters the stream; novel docs append to the corpus and their
fingerprints/signatures/vectors advance the store. Writes land in
(checkpoint-id, epoch) partitions under dynamic OVERWRITE, so a replayed
epoch rewrites itself (exactly-once under foreachBatch replay) and a
fresh checkpoint cannot clobber an earlier run's partitions.

Stores are interchangeable with the batch operators: a corpus ingested
by `--mode neardup` is probe-able by batch `dedup.neardup_against`
without re-signing (same seeds and (band, hash) buckets), `--mode exact`
by `dedup.dedup_against_fingerprints`, `--mode semantic` composes
with `similarity.semantic_decontaminate` semantics, and `--mode image`
shares `multimodal.image_neardup_pairs`' dHash + pigeonhole banding.

Run (the source dir is watched as an append-only parquet stream):
    python -m scalding_spark.tool \
        examples.streaming_ingest_job.StreamingIngestJob \
        --src /data/crawl_batches --corpus /data/corpus \
        --store /data/corpus_store --checkpoint /data/corpus_ckpt \
        --mode neardup --schema "doc_id long, text string"
"""

from __future__ import annotations

from scalding_spark.job import Job
from scalding_spark import streaming


class StreamingIngestJob(Job):
    def build(self) -> None:
        mode = self.args.getOrElse("mode", "exact")
        schema = self.args.getOrElse(
            "schema", "doc_id long, text string")
        stream = streaming.stream_from_parquet_dir(
            self.spark, self.args("src"), schema)
        cev = self.args.getOrElse("compact-every", None)
        common = dict(corpus_path=self.args("corpus"),
                      store_path=self.args("store"),
                      checkpoint=self.args("checkpoint"),
                      available_now=not self.args.boolean("continuous"),
                      # --compact-every N: consolidate closed __batch
                      # epoch partitions every N epochs (the long-running
                      # small-files lever; see streaming.compact_store)
                      compact_every_n_epochs=None if cev is None
                      else int(cev))
        if mode == "exact":
            q = streaming.stream_ingest_dedup(
                stream, text_col=self.args.getOrElse("text-col", "text"),
                id_col=self.args.getOrElse("id-col", "doc_id"), **common)
        elif mode == "neardup":
            q = streaming.stream_ingest_neardup(
                stream, text_col=self.args.getOrElse("text-col", "text"),
                id_col=self.args.getOrElse("id-col", "doc_id"),
                threshold=float(self.args.getOrElse("threshold", "0.7")),
                **common)
        elif mode == "semantic":
            sb = self.args.getOrElse("store-buckets", None)
            q = streaming.stream_ingest_semantic(
                stream,
                vec_col=self.args.getOrElse("vec-col", "embedding"),
                id_col=self.args.getOrElse("id-col", "vec_id"),
                threshold=float(self.args.getOrElse("threshold", "0.95")),
                # bucket-partitioned store + multi-probe pruning: the
                # scale lever once the store outgrows one scan per batch
                store_buckets=None if sb is None else int(sb),
                probe_hamming=int(self.args.getOrElse("probe-hamming", "1")),
                **common)
        elif mode == "image":
            q = streaming.stream_ingest_phash(
                stream,
                content_col=self.args.getOrElse("content-col", "content"),
                id_col=self.args.getOrElse("id-col", "media_id"),
                max_hamming=int(self.args.getOrElse("max-hamming", "2")),
                **common)
        else:
            raise ValueError(
                f"--mode must be exact|neardup|semantic|image, got {mode!r}")
        # availableNow (default): drain what's there and stop — the cron/
        # airflow shape. No timeout: awaitTermination() returns exactly
        # when the backlog is drained; a timeout would let a large
        # backlog exit "successfully" mid-drain and session teardown
        # could then kill the query mid-epoch (ADVICE r07 #2).
        # --continuous blocks here for the life of the query, which is
        # the long-running-service shape.
        q.awaitTermination()
