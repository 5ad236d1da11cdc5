"""Ranked corpus search: BM25 top-k retrieval as a Tool-runnable job.

The minimal deploy shape for the engine's retrieval tier: tokenize once,
score against a query term set with Okapi BM25 (retrieval.bm25_rank —
corpus tokens filtered to query terms BEFORE any exchange), join the hits
back to their text for display, write the ranked results.

Run:
    python -m scalding_spark.tool \
        examples.search_corpus_job.SearchCorpusJob \
        --input /root/testdata/sf0.001/documents.parquet \
        --query "spark join window" --k 10 --output /tmp/hits
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.functions import retrieval


class SearchCorpusJob(Job):
    def build(self) -> None:
        docs = self.spark.read.parquet(self.args("input"))
        terms = self.args("query").split()
        k = int(self.args.getOrElse("k", "10"))
        hits = retrieval.bm25_rank(docs, terms, k=k)
        # join text back for display — AFTER the top-k, so the join's
        # build side is k rows (broadcast), not the corpus
        out = (hits.join(docs.select("doc_id", "text", "source"), "doc_id")
               .orderBy(F.col("score").desc(), "doc_id"))
        out.write.mode("overwrite").parquet(self.args("output"))
