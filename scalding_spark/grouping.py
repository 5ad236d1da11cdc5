"""``GroupBuilder`` — the aggregation suite and ordered group-stream ops.

Parity target: the reference's ``GroupBuilder`` (GroupBuilder.scala:37),
``ReduceOperations`` (ReduceOperations.scala) and ``StreamOperations``
(StreamOperations.scala). The reference's physical split — map-side-combinable
``AggregateBy`` vs reducer-only ``Every`` chains (GroupBuilder.scala:266-303) —
maps onto Spark as:

- combinable aggregations → ``groupBy().agg(exprs)``; Catalyst ALWAYS plans
  partial (map-side) + final hash aggregation, the upgrade the reference gets
  only via its 100k-entry SummingCache (Operations.scala:103-163);
- order-dependent stream ops (sortBy + take/scan/fold/mapStream) → Window
  specs or sorted higher-order-function folds, with ``applyInPandas`` as the
  last-resort escape hatch.

Every aggregation here compiles to Column expressions (JVM-side, codegen).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _zero_for_type(zero, vt):
    """F.aggregate requires the zero's type to equal the merge result's.
    Returns ``(zero_col, acc_type)``: the aligned zero literal, plus the
    DecimalType the accumulator must be cast back to per merge step (None
    for every non-decimal path).

    Alignment is applied only when LOSSLESS: an int zero casts to the
    column's type (int literal vs bigint column is the common analysis-time
    crash); a FRACTIONAL zero over an INTEGRAL column casts to double so
    accumulation stays fractional — casting 0.5 to a bigint column would
    silently truncate every fold result — while over a DecimalType whose
    scale can represent the zero exactly it casts to that decimal, keeping
    the fold in exact decimal arithmetic (promoting 0.5 over decimal(38,10)
    to double would trade exact accumulation for float rounding). Spark
    widens decimal arithmetic per step ((38,10)+(38,10) → (38,9)), which
    F.aggregate rejects, so the decimal path also requires casting the
    merge result back to the zero's type — hence acc_type. Any other zero
    keeps its own type — casting e.g. '' to the element type would null it
    and poison the fold."""
    from pyspark.sql import types as T
    zero_col = F.lit(zero)
    if not isinstance(zero, (int, float)) or isinstance(zero, bool) \
            or not isinstance(vt, T.NumericType):
        return zero_col, None
    if isinstance(zero, int):
        if isinstance(vt, T.DecimalType):
            # integer fold over decimals hits the same per-step widening
            return zero_col.cast(vt), vt
        return zero_col.cast(vt), None
    if isinstance(vt, (T.FloatType, T.DoubleType)):
        return zero_col.cast("double"), None
    if isinstance(vt, T.DecimalType):
        from decimal import Decimal
        d = Decimal(str(zero)).normalize()
        exp = -d.as_tuple().exponent          # fractional digits needed
        int_digits = max(len(d.as_tuple().digits) - exp, 0)
        if 0 <= exp <= vt.scale and int_digits + vt.scale <= vt.precision:
            return zero_col.cast(vt), vt
    return zero_col.cast("double"), None


def _fold_zero_merge(zero, vt, merge):
    """Aligned (zero_col, merge) pair for a fold via F.aggregate — wraps the
    merge with a cast back to the accumulator's DecimalType when the decimal
    path is taken (see :func:`_zero_for_type`; overflow then nulls/errors
    per ANSI mode instead of silently losing scale)."""
    zero_col, acc_t = _zero_for_type(zero, vt)
    if acc_t is not None:
        inner = merge
        merge = lambda a, x: inner(a, x).cast(acc_t)  # noqa: E731
    return zero_col, merge


def _value_type(df, value_col):
    return df.select(_c(value_col).alias("__z")).schema["__z"].dataType


class GroupBuilder:
    """Accumulates aggregations over one grouping, like the reference's
    ``pipe.groupBy('k){ _.size.sum('x).max('x) }`` (GroupBuilder.scala:46-72).

    Chain agg methods, then ``done()`` schedules one ``groupBy().agg(...)``.
    Order-dependent ops are entered via ``sort_by(...)`` which returns a
    :class:`SortedGroup` (the reference's groupMode=GroupByMode switch,
    GroupBuilder.scala:266-303).
    """

    def __init__(self, df: DataFrame, keys: list, mode: str = "groupby"):
        if mode not in ("groupby", "rollup", "cube"):
            raise ValueError(f"mode must be groupby/rollup/cube, got {mode!r}")
        self._df = df
        self._keys = keys
        self._mode = mode
        self._grouping_sets: list[list[Column]] | None = None
        self._aggs: list[Column] = []
        # parallel to _aggs: the expression that evaluates this aggregate
        # over EMPTY input in a plain global agg — used to synthesize the
        # ANSI grand-total row rollup/cube owe on empty input (see done());
        # grouping()/grouping_id() can't run outside grouping sets, so the
        # builder methods below record literal fallbacks instead
        self._agg_fallbacks: list[Column] = []

    # -- scheduling --------------------------------------------------------

    def agg(self, *exprs: Column) -> "GroupBuilder":
        """Raw aggregation escape hatch (the reference's ``every``,
        GroupBuilder.scala:121-140)."""
        self._aggs.extend(exprs)
        self._agg_fallbacks.extend(exprs)
        return self

    def grouping_flag(self, col, out: str) -> "GroupBuilder":
        """ANSI GROUPING(col) — 1 when ``col`` is rolled up in the output
        row. Use this (not a raw ``F.grouping`` in :meth:`agg`) so the
        empty-input grand-total row can carry its literal value of 1."""
        self._aggs.append(F.grouping(_c(col)).alias(out))
        self._agg_fallbacks.append(
            F.lit(1).cast("tinyint").alias(out))
        return self

    def grouping_id(self, out: str = "grouping_id") -> "GroupBuilder":
        """ANSI GROUPING_ID() over the grouping keys (all bits set = the
        grand total). Literal fallback: 2^n_keys - 1."""
        self._aggs.append(F.grouping_id().alias(out))
        self._agg_fallbacks.append(
            F.lit((1 << len(self._keys)) - 1).cast("bigint").alias(out))
        return self

    def _plain_groupby_only(self, op: str) -> None:
        """Ops that compute their own groupBy shape (pivot, histograms,
        sorted streams) can't honor rollup/cube/grouping-sets — refuse
        loudly rather than silently emit the plain-groupBy answer."""
        if self._mode != "groupby" or self._grouping_sets is not None:
            raise ValueError(
                f"{op} supports plain group_by only — it cannot honor "
                f"mode={self._mode!r}/grouping sets; aggregate with "
                "agg-style builders instead")

    def done(self) -> Pipe:
        """Schedule the accumulated aggregations (GroupBuilder.scala:266-303)."""
        if (self._mode != "groupby" or self._grouping_sets is not None) \
                and not self._aggs:
            raise ValueError(
                "rollup/cube/grouping-sets grouping needs at least one "
                "aggregation before done()")
        if self._grouping_sets is not None:
            out = self._df.groupingSets(
                self._grouping_sets,
                *[_c(k) for k in self._keys]).agg(*self._aggs)
            if any(len(s) == 0 for s in self._grouping_sets):
                out = self._with_empty_grand_total(out)
            return Pipe(out)
        if self._mode != "groupby":
            # multi-level aggregation in ONE pass: Catalyst's Expand emits
            # each row once per grouping set BEFORE the partial aggregate,
            # so the shuffle still carries combined partials per (set, key)
            # — one job where the reference chains N groupBys + a merge
            grouped = (self._df.rollup(*self._keys) if self._mode == "rollup"
                       else self._df.cube(*self._keys))
            return Pipe(self._with_empty_grand_total(grouped.agg(*self._aggs)))
        if not self._aggs:
            # identity GroupBy == distinct on keys
            return Pipe(self._df.select(*self._keys).distinct())
        if self._keys:
            return Pipe(self._df.groupBy(*self._keys).agg(*self._aggs))
        return Pipe(self._df.agg(*self._aggs))

    def _with_empty_grand_total(self, out: DataFrame) -> DataFrame:
        """ANSI repair for Spark's empty-input grouping sets: ``GROUP BY
        ROLLUP/CUBE/GROUPING SETS`` including the ``()`` set owes ONE
        grand-total row even over zero input rows (it contains a global
        aggregation), but Spark's Expand+groupBy formulation yields zero
        rows — an empty upstream partition silently drops the total every
        SQL engine would report.

        Synthesis is ~free at any scale: the grand-total VALUES come from
        a global aggregate over ``limit(0)`` (Catalyst folds it to an
        empty LocalRelation — no scan), gated by an is-input-empty probe
        (``limit(1)``) whose LocalLimit short-circuits after the first
        non-empty partition — a one-row read for scan-rooted inputs.

        Measured dead end (don't retry): probing ``out`` itself so both
        union branches share the aggregate subtree does NOT share
        anything — Catalyst's existence pruning rewrites the agg-under-
        limit probe back into a limit-1 scan of the INPUT (with a
        vestigial Expand), so the executed plan is byte-for-byte the
        same extra probe stage, zero ReusedExchange, and a noisier plan.
        The accepted contract is therefore: one cheap bounded probe job
        per rollup/cube/()-set query, and for an input whose EMPTINESS
        is itself nondeterministic (pathological) the branches could in
        principle disagree. Grouping keys are NULL literals cast to the
        output schema. Aggregates that embed raw
        ``grouping()``/``grouping_id()`` can't evaluate outside grouping
        sets (use :meth:`grouping_flag`/:meth:`grouping_id`, which record
        literal fallbacks); for those we keep Spark's native behavior."""
        from pyspark.errors import AnalysisException
        try:
            vals = self._df.limit(0).groupBy().agg(*self._agg_fallbacks)
        except AnalysisException:
            return out
        vals = vals.toDF(*[f"__v{i}" for i in range(len(vals.columns))])
        probe = self._df.select(F.lit(1).alias("__p")).limit(1)
        gate = (probe.groupBy().agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") == 0))  # 1 row iff out (⟺ input) is empty
        n_keys = len(self._keys)
        sel = [F.lit(None).cast(f.dataType).alias(f.name) if i < n_keys
               else F.col(f"__v{i - n_keys}").cast(f.dataType).alias(f.name)
               for i, f in enumerate(out.schema.fields)]
        return out.unionByName(gate.crossJoin(vals).select(*sel))

    # -- combinable aggregations (ReduceOperations.scala) ------------------

    def size(self, out: str = "size") -> "GroupBuilder":
        """COUNT(*) per key (ReduceOperations.scala:402-405)."""
        return self.agg(F.count(F.lit(1)).alias(out))

    def sum(self, col, out: str | None = None) -> "GroupBuilder":
        """SUM / monoid-plus (ReduceOperations.scala:327-339)."""
        return self.agg(F.sum(_c(col)).alias(out or f"sum_{col}"))

    def times(self, col, out: str | None = None) -> "GroupBuilder":
        """Product of values per key — Ring.times (ReduceOperations.scala:357-370)."""
        return self.agg(F.product(_c(col)).alias(out or f"prod_{col}"))

    def average(self, col, out: str | None = None) -> "GroupBuilder":
        """Mean (ReduceOperations.scala:83-84; the reference's AveragedValue
        online-mean monoid is Catalyst's partial avg: (sum, count) pairs)."""
        return self.agg(F.avg(_c(col)).alias(out or f"avg_{col}"))

    def percentile_exact(self, col, probs, out: str | None = None) -> "GroupBuilder":
        """Exact interpolated percentile(s) per group — the reference's
        Histogram median/q1/q3/percentile surface (mathematics/
        Histogram.scala:3-47) without binning error. Spark's ``percentile``
        agg sorts within the group, so the result is order- and
        partition-independent, and its linear interpolation is bit-identical
        to DuckDB's quantile_cont (verified in the driver oracle). For
        massive groups where an exact sort-based agg is too hot, use
        ``histogram_summary`` (approx, mergeable sketches) instead."""
        # backtick-quote string names so dots/spaces resolve as the literal
        # column, not a struct path (and no private _jc stringification)
        c = F.col("`" + col.replace("`", "``") + "`") if isinstance(col, str) else col
        if isinstance(probs, (list, tuple)):
            expr = F.percentile(c, F.array(*[F.lit(float(p)) for p in probs]))
        else:
            expr = F.percentile(c, F.lit(float(probs)))
        return self.agg(expr.alias(out or f"p_{col}"))

    def size_ave_stdev(self, col, outs=("size", "mean", "stdev")) -> "GroupBuilder":
        """count/mean/stddev in one pass via Moments monoid
        (ReduceOperations.scala:192-195) — Catalyst computes all three as
        partial aggregates in the same hash-agg pass."""
        c = _c(col)
        return self.agg(
            F.count(F.lit(1)).alias(outs[0]),
            F.avg(c).alias(outs[1]),
            F.stddev_pop(c).alias(outs[2]),
        )

    def max(self, col, out: str | None = None) -> "GroupBuilder":
        """(ReduceOperations.scala:252-268). Multi-column extrema: pass
        F.struct(...) — matches the reference's tuple dictionary order."""
        return self.agg(F.max(_c(col)).alias(out or f"max_{col}"))

    def min(self, col, out: str | None = None) -> "GroupBuilder":
        return self.agg(F.min(_c(col)).alias(out or f"min_{col}"))

    def count_where(self, pred: Column, out: str = "count") -> "GroupBuilder":
        """Conditional count (ReduceOperations.scala:135-137)."""
        return self.agg(F.sum(F.when(pred, 1).otherwise(0)).alias(out))

    def forall(self, pred: Column, out: str = "forall") -> "GroupBuilder":
        """AND over the group (ReduceOperations.scala:200-202)."""
        return self.agg(F.min(pred.cast("boolean")).alias(out))

    def exists(self, pred: Column, out: str = "exists") -> "GroupBuilder":
        return self.agg(F.max(pred.cast("boolean")).alias(out))

    def head(self, col, out: str | None = None) -> "GroupBuilder":
        """First value in arrival order (ReduceOperations.scala:207-214).
        Arrival order is partition-dependent in both engines; for a
        deterministic head use sort_by(...).head()."""
        return self.agg(F.first(_c(col)).alias(out or f"head_{col}"))

    def last(self, col, out: str | None = None) -> "GroupBuilder":
        return self.agg(F.last(_c(col)).alias(out or f"last_{col}"))

    def to_list(self, col, out: str | None = None, sort: bool = False) -> "GroupBuilder":
        """Group values → array column (ReduceOperations.scala:375-378).
        The reference's List is reverse-arrival-order and drops nulls;
        collect_list drops nulls too. ``sort=True`` gives a deterministic
        order (recommended — arrival order is partition-dependent)."""
        e = F.collect_list(_c(col))
        if sort:
            e = F.array_sort(e)
        return self.agg(e.alias(out or f"list_{col}"))

    def to_set(self, col, out: str | None = None, sort: bool = True) -> "GroupBuilder":
        """toSet / sum of Set monoid (TypedPipe.scala:319-324)."""
        e = F.collect_set(_c(col))
        if sort:
            e = F.array_sort(e)
        return self.agg(e.alias(out or f"set_{col}"))

    def mk_string(self, col, sep: str = ",", out: str | None = None,
                  sort: bool = True) -> "GroupBuilder":
        """String-join of the group (ReduceOperations.scala:276-290)."""
        e = F.collect_list(_c(col).cast("string"))
        if sort:
            e = F.array_sort(e)
        return self.agg(F.array_join(e, sep).alias(out or f"mkstring_{col}"))

    def dot(self, left, right, out: str = "dot") -> "GroupBuilder":
        """Sum of products per key (ReduceOperations.scala:389-397)."""
        return self.agg(F.sum(_c(left) * _c(right)).alias(out))

    def approximate_unique_count(self, col, err_percent: float = 1.0,
                                 out: str | None = None) -> "GroupBuilder":
        """HLL distinct estimate (ReduceOperations.scala:103-129; default 1%
        error ≈ the reference's 16kB/key sketch). Maps to Spark's
        approx_count_distinct(rsd) — also an HLL++ partial aggregate."""
        return self.agg(
            F.approx_count_distinct(_c(col), rsd=err_percent / 100.0)
            .alias(out or f"approx_distinct_{col}")
        )

    def hll_sketch(self, col, out: str | None = None, lg_k: int = 12) -> "GroupBuilder":
        """Mergeable HLL sketch column (the reference carries Algebird HLL
        objects in tuple slots; we carry DataSketches binary sketches —
        reaggregatable with hll_union_agg)."""
        return self.agg(F.hll_sketch_agg(_c(col), lg_k).alias(out or f"hll_{col}"))

    def unique_count(self, col, out: str | None = None) -> "GroupBuilder":
        """Exact distinct count (expand+dedup under Catalyst)."""
        return self.agg(F.countDistinct(_c(col)).alias(out or f"n_{col}"))

    def approx_percentile(self, col, probs, accuracy: int = 10_000,
                          out: str | None = None) -> "GroupBuilder":
        """Approximate percentile(s) per key — the reference's Algebird
        QTree quantile aggregations (scalding carries QTree sketches in
        tuple slots; Spark's percentile_approx is the same mergeable-sketch
        shape: Greenwald-Khanna partials combine map-side, so a 100 TB
        group costs O(accuracy) state per key, never a sort). ``accuracy``
        trades memory for error (max rank error ≈ n/accuracy). For exact
        results on sortable groups use :meth:`percentile_exact`."""
        c = _c(col)
        if isinstance(probs, (list, tuple)):
            p = F.array(*[F.lit(float(x)) for x in probs])
        else:
            p = F.lit(float(probs))
        return self.agg(F.percentile_approx(c, p, F.lit(accuracy))
                        .alias(out or f"ap_{col}"))

    def cms_sketch(self, col, eps: float = 0.001, confidence: float = 0.99,
                   seed: int = 42, out: str | None = None) -> "GroupBuilder":
        """Mergeable Count-Min sketch column (the reference's Algebird CMS
        monoid, ReduceOperations aggregate surface): binary sketches that
        re-aggregate with further count_min_sketch merges, for approximate
        per-item frequencies over streams too wide to count exactly.
        Width/depth follow Spark's (eps, confidence) parametrization —
        eps·N additive error at the given confidence."""
        return self.agg(
            F.count_min_sketch(_c(col), F.lit(float(eps)),
                               F.lit(float(confidence)), F.lit(seed))
            .alias(out or f"cms_{col}"))

    def sorted_take(self, cols: list, k: int, out: str = "top",
                    reverse: bool = False) -> "GroupBuilder":
        """Bounded top-k per key (ReduceOperations.scala:420-444), the
        reference's PriorityQueueMonoid role. Partial collect_list runs per
        map partition (the sort+slice lands after the merge, so the exchange
        carries per-partition value lists, NOT k-bounded — unlike the
        reference's map-side heaps); the win over a per-key window is
        parallelism: no funneling of the whole table into #groups tasks.
        Pick by shape: few groups × many rows → this; many groups (window
        partitions ≈ cores) × huge groups → SortedGroup.take.
        Mixed sort directions: negate numeric columns inside ``cols``
        (aliased) — ``reverse`` flips the WHOLE struct order, ties
        included."""
        struct = F.struct(*[_c(c) for c in cols])
        arr = F.sort_array(F.collect_list(struct), asc=not reverse)
        return self.agg(F.slice(arr, 1, k).alias(out))

    def reduce(self, col, zero: Any, merge: Callable[[Column, Column], Column],
               out: str, finish: Callable[[Column], Column] | None = None,
               sort: bool = False) -> "GroupBuilder":
        """Generic fold over group values — the ``mapReduceMap`` kernel
        (GroupBuilder.scala:175-199, ReduceOperations.scala:58). Collects the
        group to an array and folds it JVM-side with the higher-order
        ``aggregate`` expression; ``sort=True`` gives foldLeft's deterministic
        non-commutative order (GroupBuilder.scala:154-161). For groups too
        large to collect, use SortedGroup.map_stream (applyInPandas)."""
        arr = F.collect_list(_c(col))
        if sort:
            arr = F.array_sort(arr)
        zero_col, merge = _fold_zero_merge(zero, _value_type(self._df, col),
                                           merge)
        e = F.aggregate(arr, zero_col, merge, finish) if finish else \
            F.aggregate(arr, zero_col, merge)
        return self.agg(e.alias(out))

    # -- non-chained group ops that reshape rows ---------------------------

    def pivot(self, feature_col: str, value_col: str, values: list | None = None,
              agg: Column | None = None) -> Pipe:
        """Long→wide (ReduceOperations.scala:174-186). The reference errors on
        duplicate keys; we take first() by default. Passing explicit
        ``values`` avoids the extra distinct-scan job."""
        self._plain_groupby_only("pivot")
        g = self._df.groupBy(*self._keys)
        p = g.pivot(feature_col, values) if values else g.pivot(feature_col)
        return Pipe(p.agg(agg if agg is not None else F.first(value_col)))

    def histogram(self, col, bin_width: float = 1.0, bin_out: str = "bin",
                  count_out: str = "count") -> Pipe:
        """Map[bin→count] histogram (ReduceOperations.scala:446-450,
        mathematics/Histogram.scala). Returns one row per (key, bin) — the
        COO form scales where the reference's in-memory Map does not.
        Summary stats (median/quartiles) via functions.histogram_summary."""
        self._plain_groupby_only("histogram")
        b = (F.floor(_c(col) / bin_width) * bin_width).alias(bin_out)
        return Pipe(
            self._df.groupBy(*self._keys, b).agg(F.count(F.lit(1)).alias(count_out))
        )

    def histogram_summary(self, col, bin_width: float = 1.0) -> Pipe:
        """The reference Histogram object's derived stats
        (mathematics/Histogram.scala:3-47): min/max/mean/stdDev/median/q1/q3/
        IQR — all computed from the *binned* representation (bin keys weighted
        by counts), matching the reference's resolution exactly.

        Plan: one hash agg to bins, then per-key cdf percentile picks — two
        exchanges total, no per-row state."""
        self._plain_groupby_only("histogram_summary")
        b = (F.floor(_c(col) / bin_width) * bin_width).alias("__bin")
        bins = (self._df.groupBy(*self._keys, b)
                .agg(F.count(F.lit(1)).alias("__n")))
        keys = [str(k) if isinstance(k, str) else k for k in self._keys]
        w = Window.partitionBy(*keys).orderBy("__bin") \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wk = Window.partitionBy(*keys)
        cum = bins.select(
            *keys, "__bin", "__n",
            F.sum("__n").over(w).alias("__cum"),
            F.sum("__n").over(wk).alias("__tot"))

        def pct(p):
            """Smallest bin whose cumulative count reaches p·total
            (Histogram.scala percentile/cdf)."""
            return F.min(F.when(F.col("__cum") >= p * F.col("__tot"),
                                F.col("__bin")))

        out = cum.groupBy(*keys).agg(
            F.min("__bin").alias("hmin"),
            F.max("__bin").alias("hmax"),
            (F.sum(F.col("__bin") * F.col("__n")) / F.first("__tot")).alias("mean"),
            F.sqrt(F.sum(F.col("__bin") * F.col("__bin") * F.col("__n"))
                   / F.first("__tot")
                   - F.pow(F.sum(F.col("__bin") * F.col("__n"))
                           / F.first("__tot"), 2)).alias("std_dev"),
            pct(0.25).alias("q1"),
            pct(0.50).alias("median"),
            pct(0.75).alias("q3"))
        return Pipe(out.withColumn("iqr", F.col("q3") - F.col("q1")))

    def map_list(self, col, fn, out: str, sort: bool = True) -> "GroupBuilder":
        """mapList (ReduceOperations.scala:231-241): collect the group's
        values to an array and apply an expression function array→scalar.
        ``sort=True`` gives the deterministic order the reference gets from
        an explicit sortBy (arrival order is undefined in both engines).
        Memory note: the whole group materializes per key — same caveat as
        the reference's in-memory List."""
        arr = F.collect_list(_c(col))
        if sort:
            arr = F.array_sort(arr)
        return self.agg(fn(arr).alias(out))

    # -- ordered ops -------------------------------------------------------

    def sort_by(self, *cols, reverse: bool = False) -> "SortedGroup":
        """Secondary sort (GroupBuilder.scala:308-318): switch to ordered
        group-stream semantics over (keys, sort columns)."""
        self._plain_groupby_only("sort_by")
        order, specs, names = [], [], []
        for c in cols:
            col = _c(c)
            rep = str(col)
            if " ASC" in rep or " DESC" in rep:
                # Already a SortOrder (x.desc()/x.asc()): usable in windows,
                # but the raw column can't be recovered for struct-based ops
                # (fold_left) — record direction, no raw col.
                order.append(col)
                specs.append((None, " ASC" in rep))
            else:
                asc = not reverse
                order.append(col.asc() if asc else col.desc())
                specs.append((col, asc))
            names.append(c if isinstance(c, str) else None)
        return SortedGroup(self._df, self._keys, order, specs, names)

    def reducers(self, n: int) -> "GroupBuilder":
        """Reducer-count parity (GroupBuilder.scala:88-93) → explicit
        repartition on the keys. Usually unnecessary: AQE picks partition
        counts; keep only for skew/bucketing control."""
        self._df = self._df.repartition(n, *[_c(k) for k in self._keys])
        return self


class SortedGroup:
    """Per-key ordered value-stream ops (StreamOperations.scala; SURVEY.md §2.4).

    Sorted windows give ROWS-frame semantics identical to the reference's
    reducer value-streams. All ops are Window expressions (JVM-side); only
    ``map_stream`` drops to applyInPandas.

    KEY-LESS streams (``group_all().sort_by(...)``) do NOT use
    ``Window.partitionBy()`` — that funnels every row through one task, the
    1-reducer bottleneck the reference is stuck with (RichPipe.scala:190-194)
    and this engine explicitly upgrades (SURVEY §2.6). Instead they range-
    repartition on the sort order (the ``Pipe.rank_by`` pattern): ties stay
    co-located, each partition computes its local window in parallel, and
    per-partition prefix offsets — a #partitions-row table — are broadcast
    back. take() goes further and compiles to orderBy+limit so Catalyst can
    choose TakeOrderedAndProject (map-side top-n heaps).

    Caveat — tie co-location is also the skew bound: globally ranking by a
    LOW-cardinality key (score deciles over 1e10 rows) lands each tie class
    in one partition. For that shape, rank the DISTINCT values instead
    (``group_by(value).done()`` then rank the small table and join back) —
    ties share a rank, so per-value ranking is exact and skew-free.
    """

    def __init__(self, df: DataFrame, keys: list, order: list[Column],
                 specs: list[tuple[Column | None, bool]],
                 sort_names: list[str | None] | None = None):
        self._df = df
        self._keys = keys
        self._order = order
        self._specs = specs  # (raw col | None, ascending) per sort column
        names = sort_names or []
        self._sort_names = [n for n in names if n]
        self._name_asc = [asc for n, (_, asc) in zip(names, specs) if n]
        self._w = Window.partitionBy(*keys).orderBy(*order) if keys else \
            Window.partitionBy().orderBy(*order)

    def _raw_cols(self, op: str) -> list[Column]:
        raws = [raw for raw, _ in self._specs]
        if any(r is None for r in raws):
            raise ValueError(
                f"{op} needs plain sort columns — pass strings/Columns with "
                f"reverse=..., not pre-built .asc()/.desc() SortOrders")
        return raws

    def _rn(self) -> Column:
        return F.row_number().over(self._w)

    # -- key-less (global) machinery: the rank_by range-partition pattern --

    def _ranged(self) -> DataFrame:
        """Range-repartition on the sort order + partition id. Range
        partitioning assigns equal sort-key values to ONE partition, so
        rank/row_number ties never straddle a boundary and per-partition
        results compose with plain row-count offsets.

        PERSISTED — the correctness of every consumer rests on the data
        branch and the offsets branch seeing the SAME ``__pid`` universe.
        As two separate plan subtrees they do NOT share the exchange
        (column pruning makes the subtrees differ, so Catalyst plans no
        ReusedExchange — the same pyspark 4.1 behavior ``_keyless_total``
        documents), and two executions of ``repartitionByRange`` can
        sample different bounds or be AQE-coalesced to different partition
        counts. Observed at the 10x gate as the offsets branch coalescing
        to FEWER pids than the data branch — the inner join then silently
        dropped 7/8 of the corpus (SCALING.md). One persisted computation
        = one frozen pid universe; released via ``release_materialized``.
        """
        from scalding_spark.session import register_persisted
        d = (self._df.repartitionByRange(*self._order)
             .withColumn("__pid", F.spark_partition_id()).persist())
        register_persisted(d)
        return d

    def _pid_w(self) -> Window:
        return Window.partitionBy("__pid").orderBy(*self._order)

    @staticmethod
    def _prefix_offsets(d: DataFrame, total: Column, prefix_agg) -> DataFrame:
        """(pid, prefix-combined totals of all EARLIER pids). The only
        single-task window in the key-less path runs over this #partitions-
        row table, then broadcasts back — never over the data."""
        w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
        return (d.groupBy("__pid").agg(total.alias("__tot"))
                .withColumn("__off", prefix_agg(F.col("__tot")).over(w))
                .select("__pid", "__off"))

    def _keyless_total(self):
        """Broadcast 1-row N for the key-less rank family — counted over
        the RAW input, not the ranked lineage: pyspark 4.1 plans no
        ReusedExchange between the two uses, so counting the ranked frame
        re-ran its whole range exchange + window; the raw count is a
        column-pruned scan + partial-agged count."""
        return F.broadcast(self._df.agg(F.count(F.lit(1)).alias("__n")))

    def _keyless_ranked(self, rank_fn, out: str) -> Pipe:
        d = self._ranged()
        local = d.withColumn("__lr", rank_fn().over(self._pid_w()))
        offs = self._prefix_offsets(d, F.count(F.lit(1)), F.sum)
        return Pipe(local.join(F.broadcast(offs), "__pid")
                    .withColumn(out, F.coalesce(F.col("__off"), F.lit(0)) + F.col("__lr"))
                    .drop("__pid", "__lr", "__off"))

    def _keyless_bad_flag(self, pred: Column) -> DataFrame:
        """Global running max of the violation flag: local cummax + prefix
        max of earlier partitions' totals (max is associative, so the
        two-level split is exact)."""
        flag = F.when(~pred, 1).otherwise(0)
        d = self._ranged()
        loc = F.max(flag).over(self._pid_w().rowsBetween(Window.unboundedPreceding, 0))
        offs = self._prefix_offsets(d, F.max(flag), F.max)
        return (d.withColumn("__loc", loc)
                .join(F.broadcast(offs), "__pid")
                .withColumn("__bad", F.greatest(F.coalesce(F.col("__off"), F.lit(0)),
                                                F.col("__loc")))
                .drop("__pid", "__loc", "__off"))

    # prefix-combine rules for the aggregates whose running form decomposes
    # into (local cumulative) MERGE (combined totals of earlier partitions)
    _SCAN_SPLITS = [
        (F.sum, F.sum, lambda off, loc: off + loc),
        (F.count, F.sum, lambda off, loc: off + loc),
        (F.max, F.max, F.greatest),
        (F.min, F.min, F.least),
    ]

    def take(self, n: int) -> Pipe:
        """First n per key (StreamOperations.scala:80-83) → row_number ≤ n.
        With AQE, the rank filter prunes early; for huge groups this is the
        scalable form of the reference's reducer-side take. Key-less: global
        sorted take = orderBy+limit, which Catalyst plans as
        TakeOrderedAndProject (map-side heaps) for small n."""
        if not self._keys:
            return Pipe(self._df.orderBy(*self._order).limit(n))
        return Pipe(
            self._df.withColumn("__rn", self._rn()).where(F.col("__rn") <= n).drop("__rn")
        )

    def drop(self, n: int) -> Pipe:
        """(StreamOperations.scala:55-58)."""
        if not self._keys:
            return (self._keyless_ranked(F.row_number, "__rn")
                    .filter(F.col("__rn") > n).discard("__rn"))
        return Pipe(
            self._df.withColumn("__rn", self._rn()).where(F.col("__rn") > n).drop("__rn")
        )

    def take_while(self, pred: Column) -> Pipe:
        """Prefix while pred holds (StreamOperations.scala:84-94): running
        max of the violation flag; keep rows before the first violation."""
        if not self._keys:
            return Pipe(self._keyless_bad_flag(pred)
                        .where(F.col("__bad") == 0).drop("__bad"))
        bad = F.max(F.when(~pred, 1).otherwise(0)).over(
            self._w.rowsBetween(Window.unboundedPreceding, 0))
        return Pipe(self._df.withColumn("__bad", bad).where(F.col("__bad") == 0).drop("__bad"))

    def drop_while(self, pred: Column) -> Pipe:
        if not self._keys:
            return Pipe(self._keyless_bad_flag(pred)
                        .where(F.col("__bad") == 1).drop("__bad"))
        bad = F.max(F.when(~pred, 1).otherwise(0)).over(
            self._w.rowsBetween(Window.unboundedPreceding, 0))
        return Pipe(self._df.withColumn("__bad", bad).where(F.col("__bad") == 1).drop("__bad"))

    def scan_left(self, col, out: str, agg: Callable[[Column], Column] = F.sum) -> Pipe:
        """Running accumulation emitting every step (GroupBuilder.scala:252-264,
        StreamOperations.scala:69-75) → cumulative window aggregate. Key-less
        with a decomposable aggregate (sum/count/max/min): two-level parallel
        scan — local cumulative per range partition, merged with broadcast
        prefix-combined totals of earlier partitions."""
        if not self._keys:
            for fn, prefix_agg, merge in self._SCAN_SPLITS:
                if agg is fn:
                    d = self._ranged()
                    loc = agg(_c(col)).over(
                        self._pid_w().rowsBetween(Window.unboundedPreceding, 0))
                    offs = self._prefix_offsets(d, agg(_c(col)), prefix_agg)
                    res = (d.withColumn("__loc", loc)
                           .join(F.broadcast(offs), "__pid")
                           # __loc is NULL when the local prefix holds no
                           # non-null values — the global window semantics
                           # (nulls skipped) then want the earlier-partition
                           # total alone, not NULL-poisoned `off + NULL`
                           .withColumn(out, F.when(F.col("__off").isNull(), F.col("__loc"))
                                       .when(F.col("__loc").isNull(), F.col("__off"))
                                       .otherwise(merge(F.col("__off"), F.col("__loc"))))
                           .drop("__pid", "__loc", "__off"))
                    return Pipe(res)
            # non-decomposable aggregate: correctness requires the single
            # ordered stream — documented fallback, not the default path
        cum = agg(_c(col)).over(self._w.rowsBetween(Window.unboundedPreceding, 0))
        return Pipe(self._df.withColumn(out, cum))

    def rank(self, out: str = "rank", dense: bool = False) -> Pipe:
        """Analytic ranking — the reference expresses these via sortBy+scanLeft
        (SURVEY.md §2.4 note); we expose them as first-class window functions.
        Key-less: parallel global rank via range partitioning (ties co-locate,
        so local rank + earlier-partition row counts is exact; dense ranks
        offset by earlier-partition DISTINCT sort-key counts)."""
        if not self._keys:
            if not dense:
                return self._keyless_ranked(F.rank, out)
            raws = self._raw_cols("global dense_rank")
            d = self._ranged()
            local = d.withColumn("__lr", F.dense_rank().over(self._pid_w()))
            offs = self._prefix_offsets(
                d, F.countDistinct(F.struct(*raws)), F.sum)
            return Pipe(local.join(F.broadcast(offs), "__pid")
                        .withColumn(out, F.coalesce(F.col("__off"), F.lit(0)) + F.col("__lr"))
                        .drop("__pid", "__lr", "__off"))
        return Pipe(self._df.withColumn(out, (F.dense_rank() if dense else F.rank()).over(self._w)))

    def row_number(self, out: str = "rn") -> Pipe:
        if not self._keys:
            return self._keyless_ranked(F.row_number, out)
        return Pipe(self._df.withColumn(out, self._rn()))

    def lag(self, col, n: int = 1, out: str | None = None) -> Pipe:
        name = out or f"lag_{col}"
        if not self._keys:
            # global lag without a 1-task window: global row number (parallel
            # range pattern) + equi-join row i against row i-n on the 8-byte
            # rank key
            ranked = self._keyless_ranked(F.row_number, "__gr").df
            vals = ranked.select((F.col("__gr") + n).alias("__gr_v"),
                                 _c(col).alias(name))
            return Pipe(ranked.join(vals, F.col("__gr") == F.col("__gr_v"), "left")
                        .drop("__gr", "__gr_v"))
        return Pipe(self._df.withColumn(name, F.lag(_c(col), n).over(self._w)))

    def percent_rank(self, out: str = "percent_rank") -> Pipe:
        """(rank − 1)/(N − 1) — ANSI PERCENT_RANK. Keyed: one window
        expression. KEY-LESS: the parallel global rank plus ONE broadcast
        1-row total — still no single-task window."""
        if not self._keys:
            ranked = self.rank("__r").df
            tot = self._keyless_total()
            return Pipe(ranked.join(tot)
                        .withColumn(out, F.when(
                            F.col("__n") > 1,
                            (F.col("__r") - 1).cast("double")
                            / (F.col("__n") - 1)).otherwise(0.0))
                        .drop("__r", "__n"))
        return Pipe(self._df.withColumn(out, F.percent_rank().over(self._w)))

    def cume_dist(self, out: str = "cume_dist") -> Pipe:
        """rows ≤ current / N — ANSI CUME_DIST. KEY-LESS: rank on the
        REVERSED order gives rows ≥ current as (N − rank_desc + 1), so
        cume = that / N — one extra range exchange, no 1-task funnel."""
        if not self._keys:
            raws = self._raw_cols("global cume_dist")
            rev = SortedGroup(
                self._df, [],
                [(r.desc() if asc else r.asc())
                 for r, (_, asc) in zip(raws, self._specs)],
                [(r, not asc) for r, (_, asc) in zip(raws, self._specs)])
            ranked = rev.rank("__rd").df
            tot = self._keyless_total()
            return Pipe(ranked.join(tot)
                        .withColumn(out, (F.col("__n") - F.col("__rd") + 1)
                                    .cast("double") / F.col("__n"))
                        .drop("__rd", "__n"))
        return Pipe(self._df.withColumn(out, F.cume_dist().over(self._w)))

    def ntile(self, n: int, out: str = "ntile") -> Pipe:
        """ANSI NTILE(n): n buckets, the first N mod n buckets one row
        larger. KEY-LESS: global row_number (parallel range pattern) fed
        through the exact NTILE arithmetic — bit-identical to the window
        function without its single partition."""
        if n <= 0:
            raise ValueError(f"ntile bucket count must be positive, got {n}")
        if not self._keys:
            ranked = self._keyless_ranked(F.row_number, "__rn").df
            tot = self._keyless_total()
            qs = F.expr(f"__n div {n}")
            r = F.expr(f"__n % {n}")
            big = (qs + 1) * r  # rows living in the one-larger buckets
            tile = F.when(
                F.col("__rn") <= big,
                F.expr(f"(__rn - 1) div (__n div {n} + 1)") + 1
            ).otherwise(
                r + F.expr(f"(__rn - 1 - (__n div {n} + 1) * (__n % {n})) "
                           f"div (__n div {n})") + 1)
            # degenerate N < n: every row its own bucket (q = 0 path)
            tile = F.when(qs == 0, F.col("__rn")).otherwise(tile)
            return Pipe(ranked.join(tot).withColumn(out, tile.cast("int"))
                        .drop("__rn", "__n"))
        return Pipe(self._df.withColumn(out, F.ntile(n).over(self._w)))

    def head(self) -> Pipe:
        """Deterministic first row per key (ReduceOperations.scala:207-214
        with sort) — min-by via window rank."""
        return self.take(1)

    def last(self) -> Pipe:
        """Last row in the stream's own order — direction-agnostic: the row
        whose row_number equals the group size (flipping the window would
        silently return head() again for descending sorts)."""
        if not self._keys:
            ranked = self._keyless_ranked(F.row_number, "__gr").df
            mx = F.broadcast(ranked.agg(F.max("__gr").alias("__mx")))
            return Pipe(ranked.crossJoin(mx)
                        .where(F.col("__gr") == F.col("__mx")).drop("__gr", "__mx"))
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*self._keys))
        return Pipe(self._df.withColumn("__rn", self._rn())
                    .withColumn("__n", cnt)
                    .where(F.col("__rn") == F.col("__n")).drop("__rn", "__n"))

    def fold_left(self, value_col, zero: Any, merge: Callable[[Column, Column], Column],
                  out: str) -> Pipe:
        """Non-commutative fold in sort order (GroupBuilder.scala:154-161;
        forces reducers in the reference). Values are collected in sort order
        (sort_array over (sortkey, value) structs) and folded JVM-side via the
        higher-order aggregate expression — one hash aggregation, no Python.
        Honors each sort column's direction via an array_sort comparator."""
        raws = self._raw_cols("fold_left")
        fields = [r.alias(f"__s{i}") for i, r in enumerate(raws)]
        pair = F.struct(*fields, _c(value_col).alias("__v"))
        arr = F.collect_list(pair)
        if all(asc for _, asc in self._specs):
            ordered = F.array_sort(arr)
        else:
            def cmp(a, b):
                res = F.lit(0)
                for i, (_, asc) in reversed(list(enumerate(self._specs))):
                    fa, fb = a[f"__s{i}"], b[f"__s{i}"]
                    lt, gt = (-1, 1) if asc else (1, -1)
                    res = (F.when(fa < fb, F.lit(lt))
                           .when(fa > fb, F.lit(gt)).otherwise(res))
                return res
            ordered = F.array_sort(arr, cmp)
        vals = F.transform(ordered, lambda s: s["__v"])
        zero_col, merge = _fold_zero_merge(
            zero, _value_type(self._df, value_col), merge)
        folded = F.aggregate(vals, zero_col, merge)
        keys = [_c(k) if not isinstance(k, str) else F.col(k) for k in self._keys]
        return Pipe(self._df.groupBy(*keys).agg(folded.alias(out)))

    def map_stream(self, fn, schema: str) -> Pipe:
        """Arbitrary iterator→iterator transform over each key's sorted stream
        (GroupBuilder.scala:219-228, Operations.scala:382-414) → applyInPandas.
        ``fn(pdf) -> pdf`` receives each group sorted by the sort columns
        (requires sort_by to have been called with string column names)."""
        if not self._sort_names:
            raise ValueError("map_stream requires sort_by(...) with string column names")
        sort_names, ascending = self._sort_names, self._name_asc

        def sorted_fn(pdf):
            return fn(pdf.sort_values(sort_names, ascending=ascending,
                                      kind="mergesort"))

        return Pipe(self._df.groupBy(*self._keys).applyInPandas(sorted_fn, schema=schema))
