"""The reference's seven-part tutorial (tutorial/Tutorial0-6.scala), ported
1:1 to the engine — the switch path for its own onboarding material. Each
job keeps the original's pipeline shape and field names; the fields-API
calls map as:

  TextLine/Csv/Tsv            -> sources.files.text_line/csv + Pipe.write_tsv
  .project / .rename          -> Pipe.project / Pipe.rename
  .map('a -> 'b){f}           -> Pipe.map(b=<Column expr>)
  .flatMap('a -> 'b){f}       -> Pipe.flat_map(<array expr>, out='b')
  .groupBy('k){_.sum('x)}     -> Pipe.group_by('k').sum('x').done()
  .joinWithLarger/Smaller     -> Pipe.join_with_larger/_smaller

Run any of them, e.g.:
    python -m scalding_spark.tool examples.tutorial_parity_jobs.Tutorial4 \
        --input hello.txt --output /tmp/out4
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalding_spark.job import Job
from scalding_spark.pipe import Pipe
from scalding_spark.sources.files import csv, text_line


def _lines(job: Job) -> Pipe:
    return Pipe(text_line(job.spark, job.args("input")))


class Tutorial0(Job):
    """Tutorial0.scala: read a TextLine, write it back — the minimal flow."""

    def build(self) -> None:
        _lines(self).write_tsv(self.args("output"))


class Tutorial1(Job):
    """Tutorial1.scala: project the 'line field."""

    def build(self) -> None:
        _lines(self).project("line").write_tsv(self.args("output"))


class Tutorial2(Job):
    """Tutorial2.scala: map 'line -> 'reversed."""

    def build(self) -> None:
        (_lines(self)
         .map(reversed=F.reverse(F.col("line")))
         .project("line", "reversed")
         .write_tsv(self.args("output")))


class Tutorial3(Job):
    """Tutorial3.scala: flatMap 'line -> 'word (split on whitespace)."""

    def build(self) -> None:
        (_lines(self)
         .flat_map(F.split(F.col("line"), r"\s+"), out="word", keep=["line"])
         .project("word")
         .write_tsv(self.args("output")))


class Tutorial4(Job):
    """Tutorial4.scala: word count — flatMap + groupBy{ _.size }."""

    def build(self) -> None:
        (_lines(self)
         .flat_map(F.split(F.col("line"), r"\s+"), out="word", keep=[])
         .group_by("word").size("count").done()
         .write_tsv(self.args("output")))


class Tutorial5(Job):
    """Tutorial5.scala: score each line by joining its words against a
    scored dictionary, then sum scores per line (joinWithLarger +
    groupBy{ _.sum })."""

    def build(self) -> None:
        # the original renames to 'dictWord to dodge a field collision;
        # Spark's equi-join on a shared name needs no rename — keep 'word
        scores = (Pipe(text_line(self.spark, self.args("words"),
                                 with_offset=True))
                  .rename({"offset": "score"})
                  .map(word=F.lower(F.col("line")))
                  .project("score", "word"))
        (_lines(self)
         .flat_map(F.split(F.lower(F.col("line")), r"\s+"), out="word",
                   keep=["line"])
         .join_with_smaller("word", scores)
         .group_by("line").sum("score", "score").done()
         .write_tsv(self.args("output")))


class Tutorial6(Job):
    """Tutorial6.scala: schema'd Csv read, concat two fields, project."""

    def build(self) -> None:
        people = Pipe(csv(
            self.spark, self.args("input"), header=False,
            schema="first string, last string, phone string, age int, "
                   "country string", sep=" "))
        (people
         .map(full=F.concat_ws(" ", F.col("first"), F.col("last")))
         .project("full", "age")
         .write_tsv(self.args("output")))
