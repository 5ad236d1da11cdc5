"""The reference's minimum end-to-end slice (examples/WordCountJob.scala:5):
TextLine → flatMap tokenize → groupBy.size → Tsv, on the engine.

Run:
    python -m scalding_spark.tool examples.wordcount_job.WordCountJob \
        --input /path/to/text --output /tmp/wc --master 'local[4]'
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.pipe import Pipe
from scalding_spark.sources.files import text_line
from scalding_spark.functions.text import tokenize


class WordCountJob(Job):
    def build(self) -> None:
        lines = Pipe(text_line(self.spark, self.args("input")))
        (lines.flat_map(tokenize(F.col("line")), out="word", keep=[])
         .group_by("word").size("count").done()
         .write_tsv(self.args("output")))
