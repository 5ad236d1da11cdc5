"""Incremental corpus ingestion: dedup each new crawl batch against a
VERSIONED fingerprint store, append only the novel documents, and advance
the store — the continuously-growing-corpus shape where the seen side is a
fingerprint-only table (32 bytes/doc) rather than the corpus text. Each
increment costs O(|batch| + |fingerprints|) regardless of how much text
has accumulated.

  batch.parquet ──┐
                  ├─ dedup_against_fingerprints(store)   [anti-join on md5]
  fp store ───────┘        │
   (version=N)             ├─ novel docs → append to corpus
                           └─ novel fingerprints → fp store version=N+1

Run (repeat per batch):
    python -m scalding_spark.tool \
        examples.incremental_corpus_job.IncrementalCorpusJob \
        --batch /path/batch.parquet --corpus /tmp/corpus --store /tmp/fps
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.functions.dedup import (dedup_against_fingerprints,
                                            exact_dedup)
from scalding_spark.functions.text import normalize_for_fingerprint
from scalding_spark.sources.time_pathed import VersionedKeyValSource


class IncrementalCorpusJob(Job):
    def build(self) -> None:
        batch = self.spark.read.parquet(self.args("batch"))
        store = VersionedKeyValSource(self.args("store"),
                                      key_col="fp", val_col="n")

        # collapse within-batch dups first (the incremental anti-join's
        # contract deliberately keeps them); then drop anything seen
        batch = exact_dedup(batch, "text", "doc_id")
        if store.versions():
            novel = dedup_against_fingerprints(
                batch, store.read(self.spark), "text")
        else:
            novel = batch

        novel.write.mode("append").parquet(self.args("corpus"))

        # advance the store: monoid-merge the novel fingerprints in
        delta = novel.select(
            F.md5(normalize_for_fingerprint(F.col("text"))).alias("fp"),
            F.lit(1).cast("long").alias("n"))
        store.write_incremental(self.spark, delta)
