"""Job/Args/Tool harness tests (ArgTest.scala, Tool.scala behaviors)."""

import pytest

from scalding_spark.job import Args, CascadeJob, Job, ScriptJob
from scalding_spark.tool import load_job_class, run


def test_args_parsing():
    a = Args(["--input", "/x", "--n", "1", "2", "--flag"])
    assert a("input") == "/x"
    assert a.list("n") == ["1", "2"]
    assert a.boolean("flag") and not a.boolean("nope")
    assert a.getOrElse("missing", "d") == "d"
    with pytest.raises(KeyError):
        a.required("missing")
    with pytest.raises(ValueError):
        a.optional("n")


def test_job_next_chaining(spark):
    runs = []

    class Second(Job):
        def build(self):
            runs.append("second")

    class First(Job):
        def build(self):
            runs.append("first")

        def next(self):
            return Second(self.args, self.spark)

    First.run_all([], spark)
    assert runs == ["first", "second"]


def test_cascade_and_script_jobs(spark, tmp_path):
    marker = tmp_path / "touched"

    class A(Job):
        def build(self):
            pass

    class Casc(CascadeJob):
        def jobs(self):
            return [A(self.args, self.spark)]

    assert Casc.run_all([], spark) is None  # no raise == success

    class Sh(ScriptJob):
        def scripts(self):
            return [["touch", str(marker)]]

    Sh(Args([]), spark).run()
    assert marker.exists()


def test_tool_load_and_error_paths():
    cls = load_job_class("examples.wordcount_job.WordCountJob")
    assert issubclass(cls, Job)
    with pytest.raises(SystemExit):
        load_job_class("NotDotted")
    with pytest.raises(SystemExit):
        load_job_class("scalding_spark.job.Args")  # not a Job
    assert run([]) == 2


def test_prepare_training_data_job_end_to_end(spark, tmp_path):
    """The full north-star pipeline runs at sf0.001 and yields disjoint,
    covering, deduplicated splits."""
    from examples.prepare_training_data_job import PrepareTrainingDataJob
    out = str(tmp_path / "corpus")
    job = PrepareTrainingDataJob(
        Args(["--input", "/root/testdata/sf0.001/documents.parquet",
              "--output", out, "--min-quality", "0.0",
              "--jaccard", "0.5"]), spark)
    job.run()
    got = spark.read.parquet(out)
    n_in = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").count()
    n_out = got.count()
    assert 0 < n_out <= n_in
    assert set(r["split"] for r in got.select("split").distinct().collect()) \
        <= {"train", "val", "test"}
    # canonical docs only: every kept doc is its own cluster representative,
    # so re-clustering the output at the same threshold finds no duplicates
    assert got.select("doc_id").distinct().count() == n_out
