"""Job harness — parity with Job.scala, Args.scala, Mode.scala, Tool.scala.

A Job's constructor declares the (lazy) pipeline; ``run()`` triggers sinks;
``next()`` chains successor jobs (Job.scala:92, Tool.scala:86-122) — the
pattern behind iterative algorithms (PageRank) and period-chained date jobs
(DefaultDateRangeJob, Job.scala:247-298).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from scalding_spark.session import get_spark


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


class Job:
    """Subclass and override ``build`` to declare sinks; ``run_all`` walks the
    ``next()`` chain (Job.scala:41-218)."""

    def __init__(self, args: Args, spark: SparkSession | None = None):
        self.args = args
        # --local/--cluster mode flag parity (Mode.scala:42, Tool.scala:56-70)
        master = None if args.boolean("cluster") else args.getOrElse("master", None)
        self.spark = spark or get_spark(app_name=type(self).__name__, master=master)

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

    @classmethod
    def run_all(cls, argv: list[str], spark: SparkSession | None = None) -> None:
        job: Job | None = cls(Args(argv), spark)
        while job is not None:
            if not job.run():
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
