"""CLI driver — parity with Tool.scala.

``python -m scalding_spark.tool <module.JobClass> [--local|--cluster]
[--job args...]``: the job class is loaded by reflection (Tool.scala:46-50),
instantiated with the remaining Args, and its ``next()`` chain is walked
(Tool.scala:86-122). ``--explain`` prints the optimized plan of every sink
instead of executing — the engine's answer to ``--tool.graph`` DOT dumps
(Tool.scala:74-102).

Exception help (RichXHandler, XHandler.scala:10-48): common failure classes
get a hint appended.
"""

from __future__ import annotations

import importlib
import sys

from scalding_spark.job import Args, Job

_HINTS = {
    "ModuleNotFoundError": "is the job module on PYTHONPATH?",
    "AnalysisException": "check column names/types in the failing plan "
                         "(the reference's field-name errors surface here)",
    "InvalidSourceException": "an input path is missing — strict sources "
                              "require every period to exist",
    "OutOfMemoryError": "raise driver/executor memory or repartition before "
                        "wide collects",
}


def load_job_class(dotted: str) -> type[Job]:
    """Reflection load 'pkg.module.ClassName' (Tool.scala:46-50)."""
    mod_name, _, cls_name = dotted.rpartition(".")
    if not mod_name:
        raise SystemExit(f"job class must be 'module.Class', got {dotted!r}")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    if not (isinstance(cls, type) and issubclass(cls, Job)):
        raise SystemExit(f"{dotted} is not a scalding_spark.job.Job subclass")
    return cls


def run(argv: list[str]) -> int:
    if not argv:
        print("usage: python -m scalding_spark.tool <module.JobClass> [--args...]",
              file=sys.stderr)
        return 2
    cls = load_job_class(argv[0])
    try:
        cls.run_all(argv[1:])
        return 0
    except Exception as e:  # noqa: BLE001 - CLI boundary
        hint = _HINTS.get(type(e).__name__, "")
        print(f"{type(e).__name__}: {e}" + (f"\nhint: {hint}" if hint else ""),
              file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(run(sys.argv[1:]))
