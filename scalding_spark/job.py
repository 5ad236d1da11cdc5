"""Job harness — parity with Job.scala, Args.scala, Mode.scala, Tool.scala.

A Job's constructor declares the (lazy) pipeline; ``run()`` triggers sinks;
``next()`` chains successor jobs (Job.scala:92, Tool.scala:86-122) — the
pattern behind iterative algorithms (PageRank) and period-chained date jobs
(DefaultDateRangeJob, Job.scala:247-298).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from scalding_spark.session import get_spark


class Mode:
    """Production mode (Mode.scala:42-120): named sources/sinks hit real
    storage through the readers/writers the job supplies. ``TestMode``
    (testing.py) swaps both for in-memory mocks — the reference's
    Test/HadoopTest dispatch (Mode.scala:180-241)."""

    def read_source(self, spark: SparkSession, name: str, read) -> DataFrame:
        if read is None:
            raise KeyError(
                f"source '{name}' has no production reader and is not mocked")
        return read(spark)

    def write_sink(self, spark: SparkSession, name: str, df: DataFrame, write) -> None:
        if write is None:
            raise KeyError(
                f"sink '{name}' has no production writer and is not mocked")
        write(df)

    def file_exists(self, path: str) -> bool:
        return os.path.exists(path)


PRODUCTION = Mode()


class Args:
    """``--key value...`` CLI map (scalding-args/Args.scala:23-147)."""

    def __init__(self, argv: list[str]):
        self._map: dict[str, list[str]] = {"": []}
        key = ""
        for tok in argv:
            if tok.startswith("--"):
                key = tok[2:]
                self._map.setdefault(key, [])
            else:
                self._map.setdefault(key, []).append(tok)

    def list(self, key: str) -> list[str]:
        return self._map.get(key, [])

    def optional(self, key: str) -> str | None:
        vals = self.list(key)
        if len(vals) > 1:
            raise ValueError(f"{key} has multiple values: {vals}")
        return vals[0] if vals else None

    def required(self, key: str) -> str:
        v = self.optional(key)
        if v is None:
            raise KeyError(f"missing required arg --{key}")
        return v

    def boolean(self, key: str) -> bool:
        return key in self._map

    def __call__(self, key: str) -> str:
        return self.required(key)

    def getOrElse(self, key: str, default: str) -> str:
        v = self.optional(key)
        return default if v is None else v

    def range(self, key: str, cnv=str) -> "Range":
        """``--key lo hi`` (or ``--key v`` for a point range) →
        ``Range(lo, hi)`` (scalding-args RangedArgs.scala:49-58)."""
        vals = self.list(key)
        if len(vals) == 1:
            return Range(cnv(vals[0]), cnv(vals[0]))
        if len(vals) == 2:
            return Range(cnv(vals[0]), cnv(vals[1]))
        raise ValueError(f"{key} must have either 1 or 2 values specified")


class Range:
    """Ordered closed interval with bound assertions
    (scalding-args RangedArgs.scala:23-47)."""

    def __init__(self, lower, upper):
        if lower > upper:
            raise AssertionError(f"Bad range: {lower} > {upper}")
        self.lower = lower
        self.upper = upper

    def assert_lower_bound(self, minimum) -> None:
        if minimum > self.lower:
            raise AssertionError(f"Range out of bounds: {self.lower} < {minimum}")

    def assert_upper_bound(self, maximum) -> None:
        if maximum < self.upper:
            raise AssertionError(f"Range out of bounds: {self.upper} > {maximum}")

    def assert_bounds(self, minimum, maximum) -> None:
        self.assert_lower_bound(minimum)
        self.assert_upper_bound(maximum)

    def mk_string(self, sep: str) -> str:
        if self.lower == self.upper:
            return str(self.lower)
        return f"{self.lower}{sep}{self.upper}"

    def __eq__(self, other) -> bool:
        return (isinstance(other, Range) and self.lower == other.lower
                and self.upper == other.upper)

    def __hash__(self) -> int:
        # defining __eq__ alone sets __hash__ = None (unhashable) — ranges
        # are natural set members / dict keys for date-keyed job chains
        return hash((self.lower, self.upper))

    def __repr__(self) -> str:
        return f"Range({self.lower!r}, {self.upper!r})"


class FlowListener:
    """Flow lifecycle hooks (Job.scala:167-173; cascading's FlowListener
    contract). Subclass and return instances from :meth:`Job.listeners`;
    ``run_all``/``execute`` fire them around each job's flow."""

    def on_starting(self, job: "Job") -> None:
        pass

    def on_completed(self, job: "Job", success: bool) -> None:
        pass

    def on_throwable(self, job: "Job", exc: BaseException) -> bool:
        """Return True if the failure is handled (suppresses the raise) —
        the cascading onThrowable boolean contract."""
        return False


class Job:
    """Subclass and override ``build`` to declare sinks; ``run_all`` walks the
    ``next()`` chain (Job.scala:41-218)."""

    def __init__(self, args: Args, spark: SparkSession | None = None):
        self.args = args
        # --local/--cluster mode flag parity (Mode.scala:42, Tool.scala:56-70)
        master = None if args.boolean("cluster") else args.getOrElse("master", None)
        self.spark = spark or get_spark(app_name=type(self).__name__, master=master)
        # The mode rides on Args (the reference's Mode.putMode,
        # Mode.scala:28-40) so ``next()`` jobs constructed with self.args
        # inherit the test mode without signature changes.
        self.mode: Mode = getattr(args, "_mode", PRODUCTION)

    def source(self, name: str, read=None) -> DataFrame:
        """Mode-dispatched named input: production calls ``read(spark)``;
        under JobTest the mocked DataFrame is returned instead
        (JobTest.scala:57-66 source())."""
        return self.mode.read_source(self.spark, name, read)

    def sink(self, name: str, df: DataFrame, write=None) -> None:
        """Mode-dispatched named output: production calls ``write(df)``;
        under JobTest rows are buffered for the test's sink callbacks
        (JobTest.scala:68-79 sink())."""
        self.mode.write_sink(self.spark, name, df, write)

    def file_exists(self, path: str) -> bool:
        """Mode-aware existence check (JobTest.scala:84-87 registerFile)."""
        return self.mode.file_exists(path)

    def build(self) -> None:
        raise NotImplementedError

    def run(self) -> bool:
        if self.args.boolean("explain"):
            # --explain: sinks print optimized plans instead of executing
            # (the reference's --tool.graph DOT dump, Tool.scala:74-102).
            self.spark.conf.set("scalding_spark.explain", "true")
        self.build()
        return True

    def next(self) -> "Job | None":
        return None

    def listeners(self) -> list[FlowListener]:
        """Override to attach flow listeners (Job.scala:172-173)."""
        return []

    def timeout(self, seconds: float, fn, *args, **kwargs):
        """Run ``fn(*args, **kwargs)`` under a deadline (Job.scala:196-218):
        the result, or None once ``seconds`` elapse. The worker is a daemon
        thread (the reference's NamedPoolThreadFactory(makeDaemons=true)) so
        an abandoned computation cannot block driver exit — but, as in the
        reference, it keeps running; don't hand it non-idempotent writes."""
        import queue
        import threading

        out: queue.Queue = queue.Queue(maxsize=1)

        def work():
            try:
                out.put(("ok", fn(*args, **kwargs)))
            except BaseException as exc:  # propagate to the caller
                out.put(("err", exc))

        threading.Thread(target=work, name="job-timer", daemon=True).start()
        try:
            kind, val = out.get(timeout=seconds)
        except queue.Empty:
            return None
        if kind == "err":
            raise val
        return val

    def execute(self) -> bool:
        """``run()`` wrapped in this job's flow listeners (Job.scala:163-173:
        buildFlow attaches listeners, run completes the flow)."""
        ls = self.listeners()
        for listener in ls:
            listener.on_starting(self)
        try:
            ok = self.run()
        except BaseException as exc:
            # notify every listener; re-raise unless one claims the failure
            handled = [listener.on_throwable(self, exc) for listener in ls]
            if not any(handled):
                raise
            return False
        for listener in ls:
            listener.on_completed(self, ok)
        return ok

    @classmethod
    def run_all(cls, argv: list[str], spark: SparkSession | None = None) -> None:
        job: Job | None = cls(Args(argv), spark)
        while job is not None:
            if not job.execute():
                raise RuntimeError(f"{type(job).__name__} failed")
            job = job.next()


class CascadeJob(Job):
    """Multi-flow job (CascadeJob.scala:6-32): override ``jobs()`` to return
    the member jobs; they run in order sharing the SparkSession."""

    def jobs(self) -> list[Job]:
        raise NotImplementedError

    def run(self) -> bool:
        for j in self.jobs():
            if not j.run():
                return False
        return True


class ScriptJob(Job):
    """Shell-step job (Job.scala:305-325): override ``scripts()`` to return
    the command lists; a non-zero exit fails the chain."""

    def scripts(self) -> list[list[str]]:
        raise NotImplementedError

    def run(self) -> bool:
        import subprocess
        for cmd in self.scripts():
            if subprocess.run(cmd, check=False).returncode != 0:
                return False
        return True
