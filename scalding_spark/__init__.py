"""scalding_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Twitter Scalding (reference: sfbigdata/scalding
v0.8.5, surveyed in SURVEY.md).

Architecture: every operator compiles to declarative DataFrame/Column
expressions so Catalyst + Tungsten pick the physical strategy (partial
aggregation, broadcast joins, whole-stage codegen, AQE skew handling).
Pandas UDFs / applyInPandas are the escape hatch only where built-in
operators genuinely can't express the semantics (non-commutative
stream folds, custom stateful ops).

Layout
------
- ``session``    SparkSession factory tuned for the engine's defaults.
- ``pipe``       ``Pipe`` — fluent fields-API parity (reference RichPipe.scala).
- ``grouping``   ``GroupBuilder`` — aggregation suite (reference GroupBuilder.scala,
                 ReduceOperations.scala) and ordered group-stream ops
                 (StreamOperations.scala).
- ``joins``      join algorithms (reference JoinAlgorithms.scala): equi, broadcast
                 ("tiny"), cross, semi/anti, cogroup, salted skew join.
- ``matrix``     sparse COO linear algebra (reference mathematics/Matrix.scala).
- ``sources``    sources/sinks (reference Source.scala, FileSource.scala) incl.
                 time-partitioned sources and versioned key-value stores.
- ``functions``  date algebra, text analysis, dedup, similarity search —
                 the scalar/extension layer.
- ``streaming``  Structured Streaming extensions (beyond the batch-only reference).
- ``typed``      TypedPipe/TypedGrouped — typed-API parity (TypedPipe.scala).
- ``combinatorics`` permutations/combinations/subsetSum (mathematics/Combinatorics.scala).
- ``job``        Job/Args/Mode harness (reference Job.scala, Args.scala, Mode.scala).
- ``tool``       reflection CLI driver (reference Tool.scala); ``--explain`` dumps plans.
"""

from scalding_spark.job import Args, CascadeJob, Job, ScriptJob
from scalding_spark.matrix import (ColVector, FiniteHint, Matrix, NoClue,
                                   RowVector, SizeHint, SparseHint,
                                   as_diagonal, pagerank)
from scalding_spark.pipe import Pipe, clear_counters, counters
from scalding_spark.session import (get_spark, materialize,
                                    release_materialized)
from scalding_spark.testing import JobTest
from scalding_spark.typed import TypedPipe

__all__ = [
    "Args", "CascadeJob", "ColVector", "FiniteHint", "Job", "JobTest", "Matrix",
    "NoClue", "Pipe", "RowVector", "ScriptJob", "SizeHint", "SparseHint",
    "TypedPipe", "as_diagonal", "clear_counters", "counters", "get_spark",
    "materialize", "pagerank", "release_materialized",
]
__version__ = "0.1.0"
