"""A training-data dedup pipeline as a Job: exact dedup → MinHash-LSH
near-dup pair removal → quality filter → partitioned write. The shape of a
real 100 TB corpus-cleaning run, on the engine's operators.

Run:
    python -m scalding_spark.tool examples.dedup_pipeline_job.DedupPipelineJob \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/clean
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.functions import dedup
from scalding_spark.functions import text as tx
from scalding_spark.sources.extras import write_pail


class DedupPipelineJob(Job):
    def build(self) -> None:
        docs = self.spark.read.parquet(self.args("input"))

        # 1. exact dedup on normalized content (hash shuffle, no text moves)
        kept = dedup.exact_dedup(docs, "text", "doc_id")

        # 2. near-dup removal: LSH candidates → exact-verified pairs → drop
        #    the higher id of each pair (left_anti on the loser set)
        pairs = dedup.minhash_lsh_pairs(
            kept, "text", "doc_id",
            num_hashes=int(self.args.getOrElse("hashes", "32")),
            bands=int(self.args.getOrElse("bands", "16")),
            threshold=float(self.args.getOrElse("threshold", "0.7")))
        losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        kept = kept.join(losers, on="doc_id", how="left_anti")

        # 3. quality gate
        kept = kept.where(
            tx.quality_score(F.col("text")) >= float(self.args.getOrElse("min-quality", "0.3")))

        # 4. partitioned write (pail-style layout by source)
        write_pail(kept, self.args("output"), ["source"])
