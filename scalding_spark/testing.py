"""JobTest — in-memory unit-test harness for Jobs, parity with the
reference's JobTest (JobTest.scala:38-150): mock named sources with literal
tuples, register sink callbacks over the captured output, run the job and
its whole ``next()`` chain, then fire the callbacks.

Usage mirrors the reference's fluent style::

    (JobTest(MyJob)
        .arg("input", "fakeInput")
        .arg("output", "fakeOutput")
        .source("fakeInput", [("a",), ("b",)], "line string")
        .sink("fakeOutput", lambda rows: check(rows))
        .run(spark)
        .finish())

A sink written by one job in the chain is readable as a source by later
jobs (JobTest.scala:70-72: "if s is also used as a source, we shouldn't
reset its buffer") — that's how multi-step ``next()`` pipelines are tested
without touching storage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from scalding_spark.job import Args, Job, Mode


class TestMode(Mode):
    """In-memory Test mode (Mode.scala:180-212): reads come from mocked
    DataFrames, writes buffer rows instead of touching storage."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._sources: dict[str, DataFrame] = {}
        self._buffers: dict[str, list] = {}
        self._files: set[str] = set()

    def mock_source(self, name: str, rows, schema=None) -> None:
        df = rows if isinstance(rows, DataFrame) else \
            self.spark.createDataFrame(list(rows), schema=schema)
        self._sources[name] = df

    def read_source(self, spark: SparkSession, name: str, read) -> DataFrame:
        try:
            return self._sources[name]
        except KeyError:
            # the reference's Test mode also fails on unmocked sources —
            # a test must declare every input (Mode.scala:196-200)
            raise KeyError(
                f"JobTest: source '{name}' was not mocked; call "
                f".source({name!r}, rows, schema)") from None

    def write_sink(self, spark: SparkSession, name: str, df: DataFrame, write) -> None:
        rows = df.collect()
        self._buffers[name] = rows
        # sinks double as sources for later jobs in the next() chain
        self._sources[name] = df

    def file_exists(self, path: str) -> bool:
        return path in self._files

    def buffer(self, name: str) -> list:
        return self._buffers.get(name, [])


class JobTest:
    """Fluent test runner (JobTest.scala:38-150). Construct with a Job
    subclass or a ``(args, spark) -> Job`` factory."""

    def __init__(self, cons: type[Job] | Callable[[Args, SparkSession], Job]):
        self._cons = cons
        self._args: dict[str, list[str]] = {}
        self._sources: list[tuple[str, object, object]] = []
        self._sinks: list[tuple[str, Callable[[list], None]]] = []
        self._files: set[str] = set()

    def arg(self, key: str, value: str | list[str]) -> "JobTest":
        self._args[key] = [value] if isinstance(value, str) else list(value)
        return self

    def source(self, name: str, rows, schema=None) -> "JobTest":
        self._sources.append((name, rows, schema))
        return self

    def sink(self, name: str, callback: Callable[[list], None]) -> "JobTest":
        self._sinks.append((name, callback))
        return self

    def register_file(self, path: str) -> "JobTest":
        """Simulate file existence for ``Job.file_exists`` — contents come
        from mocked sources (JobTest.scala:84-87)."""
        self._files.add(path)
        return self

    def run(self, spark: SparkSession) -> "JobTest":
        mode = TestMode(spark)
        for name, rows, schema in self._sources:
            mode.mock_source(name, rows, schema)
        mode._files |= self._files

        argv: list[str] = []
        for key, values in self._args.items():
            argv.append(f"--{key}")
            argv.extend(values)
        args = Args(argv)
        args._mode = mode  # Mode.putMode (Mode.scala:28-40)

        job: Job | None = self._cons(args, spark)
        while job is not None:
            if not job.run():
                raise RuntimeError(f"{type(job).__name__} failed")
            job = job.next()

        for name, callback in self._sinks:
            callback(mode.buffer(name))
        return self

    def finish(self) -> None:
        """Specs-compat no-op (JobTest.scala:103)."""
