"""PageRank as a chained Job (reference examples/PageRank.scala:22-179):
edge list in, (node, rank) out, with --iterations/--alpha/--weighted knobs.

Run:
    python -m scalding_spark.tool examples.pagerank_job.PageRankJob \
        --input /path/to/edges.parquet --output /tmp/ranks \
        --iterations 10 --alpha 0.85
"""

from __future__ import annotations

from scalding_spark.job import Job
from scalding_spark.matrix import pagerank
from scalding_spark.pipe import Pipe


class PageRankJob(Job):
    def build(self) -> None:
        edges = self.spark.read.parquet(self.args("input"))
        ranks = pagerank(
            edges,
            alpha=float(self.args.getOrElse("alpha", "0.85")),
            iterations=int(self.args.getOrElse("iterations", "10")),
            weight=self.args.optional("weight-col"))
        Pipe(ranks).write_parquet(self.args("output"))
