"""Typed-API parity layer — the reference's ``TypedPipe[T]`` / ``Grouped[K,V]``
/ ``KeyedList`` surface (TypedPipe.scala:80,224,358) over native columns.

The reference stores T as one opaque tuple slot and fuses map chains by
composing ``flatMapFn`` (TypedPipe.scala:80-143). Here T is a ``value``
column (any Spark type, including structs) and the fusion is Catalyst's
CollapseProject — expressed plans stay JVM-side. Arbitrary Python lambdas
are the escape hatch (``map_py``), Arrow-batched, mirroring the reference's
"any Scala closure" power at the documented UDF cost.

Keyed ops delegate to the same physical plans as the fields API: one
engine, two surfaces.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VALUE = "value"
KEY = "key"


class TypedPipe:
    """A distributed collection of T, physically a 1-column DataFrame
    (TypedPipe.scala:89-90 stores T in a single tuple slot the same way)."""

    def __init__(self, df: DataFrame):
        assert df.columns == [VALUE], f"TypedPipe wants a single '{VALUE}' column, got {df.columns}"
        self.df = df

    # -- construction (TypedPipe.scala:62-75) ------------------------------

    @classmethod
    def from_iterable(cls, spark: SparkSession, items: Iterable, schema: str = None) -> "TypedPipe":
        rows = [(x,) for x in items]
        df = spark.createDataFrame(rows, schema=f"{VALUE} {schema}" if schema else [VALUE])
        return cls(df)

    @classmethod
    def from_df(cls, df: DataFrame, expr: Column | None = None) -> "TypedPipe":
        """Wrap a DataFrame: T = struct of all columns (or ``expr``)."""
        v = expr if expr is not None else F.struct(*df.columns)
        return cls(df.select(v.alias(VALUE)))

    # -- map phase (TypedPipe.scala:103-143) -------------------------------

    def map(self, fn: Callable[[Column], Column]) -> "TypedPipe":
        return TypedPipe(self.df.select(fn(F.col(VALUE)).alias(VALUE)))

    def filter(self, pred: Callable[[Column], Column]) -> "TypedPipe":
        return TypedPipe(self.df.where(pred(F.col(VALUE))))

    def flat_map(self, fn: Callable[[Column], Column]) -> "TypedPipe":
        """``fn`` returns an array Column; explode = 0..n output rows."""
        return TypedPipe(self.df.select(F.explode(fn(F.col(VALUE))).alias(VALUE)))

    def map_py(self, fn: Callable[[Any], Any], returns: str) -> "TypedPipe":
        """Arbitrary Python T→U (the reference's Scala-closure power), as an
        Arrow-batched pandas UDF — the documented slow path."""
        def runner(batches):
            for pdf in batches:
                pdf[VALUE] = pdf[VALUE].map(fn)
                yield pdf[[VALUE]]

        return TypedPipe(self.df.mapInPandas(runner, schema=f"{VALUE} {returns}"))

    def distinct(self) -> "TypedPipe":
        return TypedPipe(self.df.distinct())

    def __add__(self, other: "TypedPipe") -> "TypedPipe":
        return TypedPipe(self.df.unionByName(other.df))

    def limit(self, n: int) -> "TypedPipe":
        return TypedPipe(self.df.limit(n))

    # -- keying (TypedPipe.scala:150-167) ----------------------------------

    def group_by(self, key_fn: Callable[[Column], Column]) -> "TypedGrouped":
        kv = self.df.select(key_fn(F.col(VALUE)).alias(KEY), F.col(VALUE))
        return TypedGrouped(kv)

    def group_all(self) -> "TypedGrouped":
        return TypedGrouped(self.df.select(F.lit(1).alias(KEY), F.col(VALUE)))

    # -- joins (TypedPipe.scala:476-497) -----------------------------------

    def cross(self, other: "TypedPipe") -> "TypedPipe":
        o = F.broadcast(other.df.select(F.col(VALUE).alias("__r")))
        out = self.df.crossJoin(o).select(
            F.struct(F.col(VALUE).alias("_1"), F.col("__r").alias("_2")).alias(VALUE))
        return TypedPipe(out)

    def collect(self) -> list:
        return [r[0] for r in self.df.collect()]


class TypedGrouped:
    """Grouped[K,V] (TypedPipe.scala:358-364): keyed aggregations; ordered
    value-stream ops live on ``sorted_by``'s KeyedListLike view."""

    def __init__(self, kv: DataFrame):
        self.kv = kv

    # -- map-side combinable aggs (TypedPipe.scala:447-464) ----------------

    def _agg(self, expr: Column) -> DataFrame:
        return self.kv.groupBy(KEY).agg(expr.alias(VALUE))

    def sum(self) -> DataFrame:
        return self._agg(F.sum(VALUE))

    def size(self) -> DataFrame:
        return self._agg(F.count(F.lit(1)))

    def max(self) -> DataFrame:
        return self._agg(F.max(VALUE))

    def min(self) -> DataFrame:
        return self._agg(F.min(VALUE))

    def to_list(self, sort: bool = True) -> DataFrame:
        arr = F.collect_list(VALUE)
        return self._agg(F.array_sort(arr) if sort else arr)

    def reduce(self, merge: Callable[[Column, Column], Column],
               sort: bool = True) -> DataFrame:
        """reduceLeft over the (sorted) value stream via F.aggregate — the
        mapReduceMap kernel's reduce leg (TypedPipe.scala:306-317)."""
        arr = F.collect_list(VALUE)
        if sort:
            arr = F.array_sort(arr)
        # try_element_at: a group whose values are ALL null collects to an
        # empty array, and plain element_at(arr, 1) throws under ANSI mode
        # (the Spark 4 default) — the reduce of an empty stream is null,
        # matching reduceLeft-over-Option semantics
        folded = F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.try_element_at(arr, F.lit(1)), merge)
        return self._agg(folded)

    def fold_left(self, zero: Any, merge: Callable[[Column, Column], Column],
                  sort: bool = True) -> DataFrame:
        arr = F.collect_list(VALUE)
        if sort:
            arr = F.array_sort(arr)
        # Zero/value type alignment rules live in grouping._fold_zero_merge
        # (lossless int cast; fractional→double over integrals but kept
        # decimal over representable DecimalTypes, with the merge cast back
        # to the accumulator decimal; foreign kinds untouched).
        from scalding_spark.grouping import _fold_zero_merge
        zero_col, merge = _fold_zero_merge(
            zero, self.kv.schema[VALUE].dataType, merge)
        return self._agg(F.aggregate(arr, zero_col, merge))

    # -- ordered stream ops (TypedPipe.scala:230-317) ----------------------

    def sorted_take(self, k: int, desc: bool = False) -> DataFrame:
        order = F.col(VALUE).desc() if desc else F.col(VALUE).asc()
        w = Window.partitionBy(KEY).orderBy(order)
        return (self.kv.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= k).drop("__rn"))

    def map_value_stream(self, fn, schema: str) -> DataFrame:
        """mapValueStream (TypedPipe.scala:230-250): whole per-key iterator
        transform via applyInPandas."""
        return self.kv.groupBy(KEY).applyInPandas(fn, schema=schema)

    # -- typed joins (CoGrouped2.scala:26-106) -----------------------------

    def join(self, other: "TypedGrouped", how: str = "inner") -> DataFrame:
        l = self.kv.select(KEY, F.col(VALUE).alias("_1"))
        r = other.kv.select(KEY, F.col(VALUE).alias("_2"))
        return l.join(r, on=KEY, how=how)

    def hash_join(self, other: "TypedGrouped", how: str = "inner") -> DataFrame:
        l = self.kv.select(KEY, F.col(VALUE).alias("_1"))
        r = F.broadcast(other.kv.select(KEY, F.col(VALUE).alias("_2")))
        return l.join(r, on=KEY, how=how)
