"""Distributed combinatorics — parity with the reference's
mathematics/Combinatorics.scala:46-227 (combinations, permutations,
subsetSum, weightedSum).

The reference builds nCk/nPk tables by iterated cross-join + filter on a
pipe of the base items; same plan here, expressed as chained broadcast
crossJoins with the monotonicity filter applied at every stage so the
intermediate never exceeds the final row count (the reference's early
pruning, Combinatorics.scala:61-73).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _base(spark: SparkSession, items: list) -> DataFrame:
    return spark.createDataFrame([(x,) for x in items], ["x"])


def permutations(spark: SparkSession, items: list, k: int) -> DataFrame:
    """All nPk ordered k-tuples of distinct items → columns c1..ck
    (Combinatorics.scala:46-90)."""
    out = _base(spark, items).select(F.col("x").alias("c1"))
    for i in range(2, k + 1):
        nxt = F.broadcast(_base(spark, items).select(F.col("x").alias(f"c{i}")))
        cond = None
        for j in range(1, i):
            c = F.col(f"c{j}") != F.col(f"c{i}")
            cond = c if cond is None else (cond & c)
        out = out.crossJoin(nxt).where(cond)
    return out


def combinations(spark: SparkSession, items: list, k: int) -> DataFrame:
    """All nCk unordered k-subsets as ascending tuples c1 < c2 < ... < ck
    (Combinatorics.scala:92-116)."""
    out = _base(spark, items).select(F.col("x").alias("c1"))
    for i in range(2, k + 1):
        nxt = F.broadcast(_base(spark, items).select(F.col("x").alias(f"c{i}")))
        out = out.crossJoin(nxt).where(F.col(f"c{i-1}") < F.col(f"c{i}"))
    return out


def weighted_sum(spark: SparkSession, weights: list[float], result: float,
                 error: float) -> DataFrame:
    """All non-negative integer tuples (x1..xk) with
    |Σ wᵢ·xᵢ − result| ≤ error (Combinatorics.scala:118-200).

    Stage i crosses in xᵢ ∈ [0, result/wᵢ] and prunes partial sums that
    already overshoot, so intermediates stay bounded."""
    k = len(weights)
    out = None
    partial = F.lit(0.0)
    for i, w in enumerate(weights, start=1):
        hi = int(result // w)
        xi = spark.range(0, hi + 1).select(F.col("id").cast("long").alias(f"x{i}"))
        xi = F.broadcast(xi)
        out = xi if out is None else out.crossJoin(xi)
        partial = partial + F.col(f"x{i}") * F.lit(float(w))
        # prune: remaining stages can only add ≥ 0
        out = out.where(partial <= F.lit(result + error))
    return out.where(F.abs(partial - F.lit(result)) <= F.lit(error))


def subset_sum(spark: SparkSession, items: list[float], result: float,
               error: float = 0.0) -> DataFrame:
    """0/1 subset-sum (Combinatorics.scala:202-227): which subsets of items
    sum to ``result`` within ``error``. Columns x1..xk ∈ {0,1}."""
    k = len(items)
    out = None
    partial = F.lit(0.0)
    for i, w in enumerate(items, start=1):
        xi = F.broadcast(
            spark.createDataFrame([(0,), (1,)], [f"x{i}"]))
        out = xi if out is None else out.crossJoin(xi)
        partial = partial + F.col(f"x{i}") * F.lit(float(w))
        out = out.where(partial <= F.lit(result + error))
    return out.where(F.abs(partial - F.lit(result)) <= F.lit(error))
