"""End-to-end training-data preparation: the full north-star pipeline on the
engine's operators, from raw corpus to reproducible train/val/test splits.

  raw docs
   → PII redaction           (pure-codegen regex cascade, no UDF)
   → quality + language gate (column-expression scoring)
   → near-dup CLUSTERING     (n-gram Jaccard pairs → connected components;
                              keeps the canonical doc per cluster, unlike
                              pairwise loser-dropping which over-deletes
                              transitive chains)
   → stratified downsample   (per-source md5-range fractions — reproducible
                              across runs, clusters, partitionings)
   → train/val/test split    (disjoint md5 ranges, auditable contract)
   → partitioned write       (split=... directories)

Run:
    python -m scalding_spark.tool \
        examples.prepare_training_data_job.PrepareTrainingDataJob \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/corpus
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.functions import dedup, sampling
from scalding_spark.functions import text as tx


class PrepareTrainingDataJob(Job):
    def build(self) -> None:
        docs = self.spark.read.parquet(self.args("input"))

        # 1. redact PII in place (email/IP/phone — shared regex constants)
        docs = docs.withColumn("text", tx.pii_redact(F.col("text")))

        # 2. quality + language gate
        min_q = float(self.args.getOrElse("min-quality", "0.3"))
        docs = docs.where(tx.quality_score(F.col("text")) >= min_q)
        lang = self.args.getOrElse("lang", "")
        if lang:
            docs = docs.where(tx.lang_id(F.col("text")) == lang)

        # 3. near-dup clustering: keep one canonical doc per component
        thr = float(self.args.getOrElse("jaccard", "0.5"))
        pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                          n=3, threshold=thr)
        clustered = dedup.dedup_clusters(docs, pairs, "doc_id")
        kept = clustered.where(F.col("doc_id") == F.col("cluster_id")) \
            .drop("cluster_id")

        # 4. per-source stratified downsample (defaults: keep everything)
        frac = float(self.args.getOrElse("keep-fraction", "1.0"))
        if frac < 1.0:
            sources = [r["source"] for r in
                       kept.select("source").distinct().collect()]
            kept = sampling.stratified_sample(
                kept, "doc_id", "source", {s: frac for s in sources})

        # 5. reproducible splits + partitioned write
        out = sampling.train_val_test_split(kept, "doc_id")
        out.write.mode("overwrite").partitionBy("split") \
            .parquet(self.args("output"))
