"""``Pipe`` — the fields-API surface of the engine.

Parity target: the reference's ``RichPipe`` (scalding-core/src/main/scala/com/
twitter/scalding/RichPipe.scala) — project/discard/rename/insert/map/flatMap/
filter/limit/sample/unpivot/pack/unpack/merge/groupBy/debug/normalize/traps.

Design: a thin, immutable wrapper over a ``DataFrame``. Every operator is a
declarative Column expression so consecutive ops fuse under Catalyst's
CollapseProject + whole-stage codegen (the reference hand-fuses map chains in
TypedPipe.scala:80-143; Catalyst does it for free). Python lambdas are the
escape hatch, never the default.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _to_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


# flow-counter registry: Pipe.observe(name, ...) registers here; counters(name)
# reads after an action. SCOPED PER SparkSession (a WeakKeyDictionary, so a
# stopped session's observations are garbage-collected rather than pinned
# process-wide) — two flows on different sessions can reuse a name without
# silently replacing each other's Observation. Within one session, names are
# flow-global like Hadoop counter groups: re-observing a name replaces the
# previous Observation (pinned by test_observe_reregister_replaces).
import weakref

_OBSERVATIONS: "weakref.WeakKeyDictionary[Any, dict[str, Any]]" = \
    weakref.WeakKeyDictionary()


def _obs_scope(session) -> dict:
    scope = _OBSERVATIONS.get(session)
    if scope is None:
        scope = {}
        _OBSERVATIONS[session] = scope
    return scope


# sentinel: the Observation has no JVM handle to probe (Spark Connect, or a
# future PySpark that renames the private attrs) — distinct from "handle
# present but no action completed yet" (None)
_NO_HANDLE = object()


def _obs_row_or_none(obs):
    """Non-blocking read of an Observation: the observed metrics dict if an
    action has completed over the observed frame, None if not yet, or
    ``_NO_HANDLE`` when there is nothing to probe. Reaches into PRIVATE
    PySpark attrs (``obs._jo``, ``PythonSQLUtils.toPyRow`` — present and
    stable in classic PySpark 3.4-4.x; absent on Spark Connect where the
    Observation is server-side); on any attribute drift the caller degrades
    to a thread-bounded blocking ``obs.get`` instead of breaking."""
    try:
        jo = obs._jo
        if jo is None:
            return _NO_HANDLE
        opt = jo.getRowOrEmpty()
        if not opt.isDefined():
            return None
        from pyspark.serializers import CPickleSerializer
        utils = getattr(obs._jvm,
                        "org.apache.spark.sql.api.python.PythonSQLUtils")
        return CPickleSerializer().loads(
            utils.toPyRow(opt.get())).asDict(recursive=False)
    except AttributeError:
        return _NO_HANDLE


def counters(name: str, timeout: float | None = None,
             session=None) -> dict:
    """Fetch the metrics of a named :meth:`Pipe.observe`.

    With ``timeout=None`` (default) this BLOCKS until an action has run over
    the observed frame — call it only after ``write``/``count``/``collect``
    has materialized the pipe, or the call never returns. Pass a ``timeout``
    in seconds to poll instead and raise :class:`TimeoutError` if no action
    completes in time (``timeout=0`` is a pure non-blocking probe).

    ``session`` selects which SparkSession's registry to read; defaults to
    the active session, falling back to the only registered one."""
    from pyspark.sql import SparkSession
    if session is None:
        session = SparkSession.getActiveSession()
    scope = _OBSERVATIONS.get(session) if session is not None else None
    if scope is None or name not in scope:
        # active-session miss (e.g. called from a different thread): search
        # all registered scopes — unambiguous iff the name is unique
        hits = [s[name] for s in _OBSERVATIONS.values() if name in s]
        if len(hits) != 1:
            raise KeyError(
                f"no observation named {name!r} registered"
                + (" (ambiguous across sessions)" if len(hits) > 1 else ""))
        obs = hits[0]
    else:
        obs = scope[name]
    if timeout is None:
        return dict(obs.get)
    import time
    deadline = time.monotonic() + timeout
    while True:
        row = _obs_row_or_none(obs)
        if row is _NO_HANDLE:
            # No JVM handle to probe (Spark Connect / attr drift): bound the
            # BLOCKING obs.get with a worker thread instead of polling, so
            # timeout= still returns the metrics once the action completes
            # rather than always timing out. The worker is a daemon; if the
            # action never runs it parks on obs.get until interpreter exit
            # (documented cost of the degraded path).
            return _blocking_get_bounded(
                obs, name, max(deadline - time.monotonic(), 0.0), timeout)
        if row is not None:
            return row
        if time.monotonic() >= deadline:
            raise TimeoutError(
                f"observation {name!r} has no completed action after "
                f"{timeout}s — run an action over the observed frame first")
        time.sleep(0.05)


def _blocking_get_bounded(obs, name: str, remaining: float, timeout) -> dict:
    """One worker PER OBSERVATION, reused across calls: a polling loop
    that retries counters(name, timeout=N) before the action completes
    must not park a fresh thread on obs.get per attempt (unbounded
    accumulation in a long-running driver). Worker exceptions propagate
    instead of masquerading as timeouts."""
    import queue
    import threading
    waiter = getattr(obs, "_scalding_waiter", None)
    if waiter is None or (not waiter[1].is_alive() and waiter[0].empty()):
        out: "queue.Queue" = queue.Queue(maxsize=1)

        def work():
            try:
                out.put(("ok", dict(obs.get)))
            except Exception as e:  # noqa: BLE001 — surfaced to the caller
                out.put(("err", e))

        t = threading.Thread(target=work, daemon=True)
        t.start()
        waiter = (out, t)
        try:
            obs._scalding_waiter = waiter
        except AttributeError:
            pass  # slotted/frozen Observation: per-call worker fallback
    try:
        # small floor so a COMPLETED action's instant get can cross the
        # thread boundary even at timeout=0 (which here can't be a true
        # non-blocking probe)
        kind, value = waiter[0].get(timeout=max(remaining, 0.2))
    except queue.Empty:
        raise TimeoutError(
            f"observation {name!r} has no completed action after "
            f"{timeout}s — run an action over the observed frame first")
    # put the result back for subsequent counters() calls on the same obs
    waiter[0].put((kind, value))
    if kind == "err":
        raise value
    return value


def clear_counters(session=None) -> None:
    """Drop registered observations — all sessions' (default) or one
    session's. Long-running drivers that observe many flow names should
    clear between flows; a replaced name is dropped automatically."""
    if session is None:
        _OBSERVATIONS.clear()
    else:
        _OBSERVATIONS.pop(session, None)


class Pipe:
    """A named-field tuple stream (reference: Cascading pipe) backed by a DataFrame.

    Unlike the reference's untyped ``Fields`` (FieldConversions.scala:114-131),
    the schema is statically typed (``df.schema``) — a deliberate upgrade.
    """

    def __init__(self, df: DataFrame):
        self.df = df

    # -- construction ------------------------------------------------------

    @classmethod
    def from_iterable(cls, spark: SparkSession, rows: Iterable, schema) -> "Pipe":
        """IterableSource parity (IterableSource.scala:44-84)."""
        return cls(spark.createDataFrame(list(rows), schema=schema))

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str) -> "Pipe":
        return cls(spark.read.parquet(path))

    # -- plumbing ----------------------------------------------------------

    @property
    def fields(self) -> list[str]:
        return self.df.columns

    def then(self, fn: Callable[["Pipe"], "Pipe"]) -> "Pipe":
        """Plug a function block into the chain (RichPipe.scala:139)."""
        return fn(self)

    def name(self, alias: str) -> "Pipe":
        """Name the pipe (RichPipe.scala:67) → DataFrame alias for self-joins."""
        return Pipe(self.df.alias(alias))

    def to_df(self) -> DataFrame:
        return self.df

    # -- map-phase operators (RichPipe Each ops; SURVEY.md §2.2) -----------

    def project(self, *cols: str | Column) -> "Pipe":
        """Keep columns (RichPipe.scala:126-128) → column pruning reaches the scan."""
        return Pipe(self.df.select(*cols))

    def discard(self, *cols: str) -> "Pipe":
        """Drop columns (RichPipe.scala:134)."""
        return Pipe(self.df.drop(*cols))

    def rename(self, mapping: Mapping[str, str]) -> "Pipe":
        """Rename fields (RichPipe.scala:296-302)."""
        return Pipe(self.df.withColumnsRenamed(dict(mapping)))

    def insert(self, field: str, value: Any) -> "Pipe":
        """Constant column (RichPipe.scala:277-278)."""
        return Pipe(self.df.withColumn(field, F.lit(value)))

    def map(self, **exprs: Column) -> "Pipe":
        """1-row→1-row transform, appending/replacing named outputs
        (RichPipe.scala:372-383, ALL/REPLACE modes). Column-expression only —
        stays inside whole-stage codegen."""
        return Pipe(self.df.withColumns(dict(exprs)))

    def map_to(self, *exprs: Column, **named: Column) -> "Pipe":
        """mapTo — keep only results (RichPipe.scala:378)."""
        cols = list(exprs) + [e.alias(n) for n, e in named.items()]
        return Pipe(self.df.select(*cols))

    def flat_map(self, expr: Column, out: str, keep: Iterable[str] = ()) -> "Pipe":
        """1→0..n rows by exploding an array-valued expression
        (RichPipe.scala:384-395). ``flatten`` (RichPipe.scala:406-421) is
        flat_map(F.col(c), c)."""
        keep = list(keep) or [c for c in self.df.columns]
        # the exploded output may replace a kept column of the same name
        # (the flatten idiom) — drop it from keep to avoid an ambiguous dup
        keep = [c for c in keep if c != out]
        return Pipe(self.df.select(*keep, F.explode(expr).alias(out)))

    def flat_map_outer(self, expr: Column, out: str) -> "Pipe":
        """explode_outer variant — keeps rows whose array is empty/null as null."""
        return Pipe(self.df.withColumn(out, F.explode_outer(expr)))

    def filter(self, cond: Column | str) -> "Pipe":
        """Keep rows (RichPipe.scala:307-311) → predicate pushdown via Catalyst."""
        return Pipe(self.df.where(cond))

    def limit(self, n: int) -> "Pipe":
        """≤ n rows. Exact (the reference's is per-task approximate,
        RichPipe.scala:481 — documented semantic upgrade, SURVEY.md §7.3)."""
        return Pipe(self.df.limit(n))

    def sample(self, fraction: float, seed: int | None = None) -> "Pipe":
        """Bernoulli sample (RichPipe.scala:488-489)."""
        return Pipe(self.df.sample(fraction=fraction, seed=seed))

    def debug(self, n: int = 20) -> "Pipe":
        """Print tuples (RichPipe.scala:494)."""
        self.df.show(n, truncate=False)
        return self

    def observe(self, name: str, **metrics: Column) -> "Pipe":
        """Flow counters — the engine's answer to Cascading's flow-level
        counters that the reference reads after a run (the ``debug`` pipe
        plus Hadoop counters era). Named aggregate metrics are computed
        DURING the next action over this frame — zero extra scans, zero
        extra shuffles — and read back with :func:`counters` afterwards::

            p = pipe.observe("input", n=F.count(F.lit(1)))
            p = p.filter(ok).observe("kept", n=F.count(F.lit(1)),
                                     bytes=F.sum(F.length("text")))
            p.write_parquet(path)
            dropped = counters("input")["n"] - counters("kept")["n"]

        At 100 TB this is the only sane way to audit per-stage drop rates:
        a separate ``count()`` per stage would re-run the lineage. One
        observation name per action; metrics must be aggregates Spark can
        fold into the pass (no distinct)."""
        from pyspark.sql import Observation
        obs = Observation(name)
        _obs_scope(self.df.sparkSession)[name] = obs
        return Pipe(self.df.observe(
            obs, *[c.alias(n) for n, c in metrics.items()]))

    def unpivot(self, ids: list[str], cols: list[str], var_name: str = "feature",
                value_name: str = "value") -> "Pipe":
        """Wide→long (RichPipe.scala:469-474) → native df.unpivot (melt)."""
        return Pipe(self.df.unpivot(ids, cols, var_name, value_name))

    def pack(self, out: str, *cols: str) -> "Pipe":
        """N fields → one struct column (RichPipe.scala:550-565; the reference
        uses reflection-based TuplePacker — structs are the typed analog)."""
        return Pipe(self.df.withColumn(out, F.struct(*cols)).drop(*cols))

    def unpack(self, col: str) -> "Pipe":
        """One struct column → N fields (RichPipe.scala:577-594)."""
        others = [c for c in self.df.columns if c != col]
        return Pipe(self.df.select(*others, f"{col}.*"))

    def __add__(self, other: "Pipe") -> "Pipe":
        """Merge / UNION ALL (RichPipe.scala:170)."""
        return Pipe(self.df.unionByName(other.df))

    def union_all(self, *others: "Pipe") -> "Pipe":
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return Pipe(out)

    # -- set ops (SURVEY.md §2.7; semi/anti idioms Matrix.scala:632-693) ---

    def intersect(self, other: "Pipe") -> "Pipe":
        return Pipe(self.df.intersect(other.df))

    def except_all(self, other: "Pipe") -> "Pipe":
        return Pipe(self.df.exceptAll(other.df))

    def distinct(self, *cols: str) -> "Pipe":
        """Dedup on columns (RichPipe.scala:160-165; typed TypedPipe.scala:121-125).
        Hash-shuffle on the key columns; partial distinct happens map-side."""
        if cols:
            return Pipe(self.df.select(*cols).distinct())
        return Pipe(self.df.distinct())

    # -- grouping ----------------------------------------------------------

    def group_by(self, *keys: str | Column):
        """Enter the aggregation builder (RichPipe.scala:153-155)."""
        from scalding_spark.grouping import GroupBuilder
        return GroupBuilder(self.df, list(keys))

    def group_all(self):
        """Single-group global agg (RichPipe.scala:178-194). Unlike the
        reference's 1-reducer bottleneck, Catalyst computes partial aggregates
        on every partition and merges — no repartition(1)."""
        from scalding_spark.grouping import GroupBuilder
        return GroupBuilder(self.df, [])

    def rollup_by(self, *keys: str | Column):
        """Hierarchical multi-level aggregation (engine upgrade over the
        reference, where per-level totals need N chained groupBys + a
        merge): one Expand + one combined partial-agged pass emits every
        prefix level, NULL marking the rolled-up key (ANSI ROLLUP)."""
        from scalding_spark.grouping import GroupBuilder
        return GroupBuilder(self.df, list(keys), mode="rollup")

    def cube_by(self, *keys: str | Column):
        """All key-subset aggregations in one pass (ANSI CUBE) — same
        Expand-based single-job plan as :meth:`rollup_by`."""
        from scalding_spark.grouping import GroupBuilder
        return GroupBuilder(self.df, list(keys), mode="cube")

    def grouping_sets(self, sets: list[list[str]], *keys: str):
        """Explicit ANSI GROUPING SETS — the general form rollup/cube
        specialize: exactly the requested key subsets, still one Expand +
        one combined partial-agged pass. ``keys`` is the union of grouping
        columns; each entry of ``sets`` lists the keys grouped at that
        level (the rest come back NULL)."""
        from scalding_spark.grouping import GroupBuilder
        gb = GroupBuilder(self.df, list(keys), mode="groupby")
        gb._grouping_sets = [[_to_col(c) for c in s] for s in sets]
        return gb

    # -- randomized repartition / shuffle (RichPipe.scala:199-267) ---------

    def shard(self, n: int, seed: int | None = None) -> "Pipe":
        """groupRandomly/shard — random repartition into n groups."""
        if seed is None:
            return Pipe(self.df.repartition(n))
        part = F.pmod(F.hash(F.rand(seed)), F.lit(n))
        return Pipe(self.df.repartition(n, part))

    def shuffle(self, shards: int, seed: int = 12345) -> "Pipe":
        """Global seeded random reorder (RichPipe.scala:243-267). The engine
        defines its own stable seeded shuffle (SURVEY.md §7.3) — a range
        partition + sort on rand(seed), parallel at any scale."""
        return Pipe(
            self.df.withColumn("__r", F.rand(seed))
            .repartitionByRange(shards, "__r")
            .sortWithinPartitions("__r")
            .drop("__r")
        )

    def rank_by(self, *order: Column, rank_col: str = "rank",
                partitions: int | None = None) -> "Pipe":
        """Global dense row ranks under a TOTAL order (caller supplies the
        tie-break) — scalable upgrade over `row_number() OVER (ORDER BY ...)`,
        which funnels every row through ONE task.

        Plan: range-repartition on the order (sampled balanced ranges) →
        per-partition row_number (parallel) → add per-partition offsets,
        computed on the tiny #partitions-row table and broadcast back.
        """
        from pyspark.sql import Window
        from scalding_spark.session import register_persisted
        d = (self.df.repartitionByRange(*order) if partitions is None
             else self.df.repartitionByRange(partitions, *order))
        # persisted: the window branch and the offsets branch must see the
        # SAME __pid universe — as separate pruned subtrees the exchange is
        # not reused and can re-sample bounds / AQE-coalesce differently
        # (see SortedGroup._ranged, the 10x-gate partition-drop bug)
        d = d.withColumn("__pid", F.spark_partition_id()).persist()
        register_persisted(d)
        w = Window.partitionBy("__pid").orderBy(*order)
        local = d.withColumn("__lr", F.row_number().over(w))
        off_w = (Window.orderBy("__pid")
                 .rowsBetween(Window.unboundedPreceding, -1))
        offs = (local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
                .withColumn("__off",
                            F.coalesce(F.sum("__n").over(off_w), F.lit(0)))
                .select("__pid", "__off"))
        # bigint: this API's whole point is >2^31-row corpora, where an
        # int rank overflows (ANSI throw / legacy wraparound); matches
        # rank_by_value, which already emits bigint
        return Pipe(local.join(F.broadcast(offs), on="__pid")
                    .withColumn(rank_col, (F.col("__off") + F.col("__lr"))
                                .cast("bigint"))
                    .drop("__pid", "__lr", "__off"))

    def rank_by_value(self, *cols: str, rank_col: str = "rank",
                      dense: bool = False, reverse: bool = False) -> "Pipe":
        """Global rank when the sort key has FEW distinct values relative to
        rows (score deciles, quality tiers over 1e10 docs) — the skew-free
        complement to ``rank_by``: ties share a rank, so rank the DISTINCT
        value table and join it back instead of co-locating each tie class
        in one partition (the range-partition pattern's skew bound).

        Plan: groupBy(value).count — map-side partial aggregation bounds the
        exchange to #partitions × #distinct rows no matter how hot a value
        is → rank the counts table with the parallel range pattern (ties
        impossible: values are distinct) → equi-join back by value (AQE
        broadcasts the small table or skew-splits the join). rank =
        1 + rows strictly before (competition ranking, like F.rank);
        ``dense`` numbers distinct values consecutively."""
        order = [F.col(c).desc() if reverse else F.col(c) for c in cols]
        counts = self.df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__n"))
        from scalding_spark.session import register_persisted
        # persisted: same frozen-__pid contract as rank_by / SortedGroup
        d = (counts.repartitionByRange(*order)
             .withColumn("__pid", F.spark_partition_id()).persist())
        register_persisted(d)
        w = Window.partitionBy("__pid").orderBy(*order)
        local = (d.withColumn("__cum", F.sum("__n").over(
                     w.rowsBetween(Window.unboundedPreceding, 0)))
                 .withColumn("__rn", F.row_number().over(w)))
        off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
        offs = (d.groupBy("__pid")
                .agg(F.sum("__n").alias("__tot"), F.count(F.lit(1)).alias("__cnt"))
                .withColumn("__off_n", F.coalesce(F.sum("__tot").over(off_w), F.lit(0)))
                .withColumn("__off_r", F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)))
                .select("__pid", "__off_n", "__off_r"))
        r = (F.col("__off_r") + F.col("__rn")) if dense else \
            (F.col("__off_n") + F.col("__cum") - F.col("__n") + 1)
        ranked = (local.join(F.broadcast(offs), "__pid")
                  .withColumn(rank_col, r)
                  .select(*[F.col(c).alias(f"__v_{c}") for c in cols], rank_col))
        # null-SAFE equi-join back: groupBy ranks a NULL value group like any
        # other, but a plain `on=cols` join never matches NULL = NULL and
        # would silently drop every null-keyed row from a rank-every-row op
        cond = None
        for c in cols:
            this = self.df[c].eqNullSafe(F.col(f"__v_{c}"))
            cond = this if cond is None else cond & this
        return Pipe(self.df.join(ranked, on=cond)
                    .drop(*[f"__v_{c}" for c in cols]))

    # -- misc parity -------------------------------------------------------

    def normalize(self, col: str, out: str | None = None) -> "Pipe":
        """Divide a column by its global sum (RichPipe.scala:528-538) — the
        reference's groupAll+crossWithTiny, as a broadcast cross join of the
        1-row aggregate. (A window over the empty partition spec would compute
        the same thing but moves EVERY row to one task — the 1-reducer
        bottleneck this engine exists to avoid.)"""
        total = F.broadcast(self.df.agg(F.sum(col).alias("__total")))
        return Pipe(self.df.crossJoin(total)
                    .withColumn(out or col, F.col(col) / F.col("__total"))
                    .drop("__total"))

    def partition_agg(self, tag_expr: Column, tag: str, build) -> "Pipe":
        """partition(fs->tag)(part)(aggs) (RichPipe.scala:324-340): derive a
        partition key, group by it, aggregate. ``build`` receives a
        GroupBuilder and must return it."""
        from scalding_spark.grouping import GroupBuilder
        tagged = self.df.withColumn(tag, tag_expr)
        return build(GroupBuilder(tagged, [tag])).done()

    def from_json(self, col: str | Column, schema, out: str | None = None) -> "Pipe":
        """Parse a JSON string column into a typed struct (the engine's
    JsonLine-in-a-column: records embedded in a field rather than a file).
    Malformed rows yield null structs (PERMISSIVE), matching the safe-parse
    source contract. Pure expression — fuses into the scan."""
        c = _to_col(col)
        name = out or (col if isinstance(col, str) else "parsed")
        return Pipe(self.df.withColumn(name, F.from_json(c, schema)))

    def to_json(self, out: str, *cols: str) -> "Pipe":
        """Serialize columns to one JSON string column (write-side twin of
    :meth:`from_json`); with no ``cols`` the whole row is serialized."""
        use = list(cols) or [c for c in self.df.columns]
        return Pipe(self.df.withColumn(out, F.to_json(F.struct(*use))))

    def from_csv(self, col: str | Column, schema: str,
                 out: str | None = None, sep: str = ",") -> "Pipe":
        """Parse a delimited string column via the CSV reader's expression
    form — the Osv/Tsv-in-a-column shape (delimited records embedded in a
    field)."""
        c = _to_col(col)
        name = out or (col if isinstance(col, str) else "parsed")
        return Pipe(self.df.withColumn(
            name, F.from_csv(c, F.lit(schema), {"sep": sep})))

    def approx_quantiles(self, col: str, probs: list[float],
                         rel_err: float = 0.01) -> list[float]:
        """Driver-side approximate quantiles (Greenwald-Khanna) — the
        reference's submit-time QTree read (readAtSubmitter + Algebird
        QTree): a scalar handful of cut points fetched to the driver to
        parameterize the NEXT stage (range bounds, skew thresholds,
        histogram bins). One pass, mergeable partials, O(1/rel_err) state
        per partition — safe to call on a 100 TB column."""
        return self.df.stat.approxQuantile(col, [float(p) for p in probs],
                                            float(rel_err))

    def heavy_hitters(self, cols: list[str], support: float = 0.01) -> dict:
        """Driver-side frequent items per column (Karp-Papadimitriou-
        Shenker via df.stat.freqItems) — the reference's Algebird
        TopCMS/heavy-hitters read: every item with frequency above
        ``support`` is RETURNED (possible false positives, no false
        negatives — same one-sided contract as CMS heavy hitters). Use for
        skew-key discovery feeding skew_join; O(1/support) driver bytes."""
        row = self.df.stat.freqItems(cols, support).collect()[0]
        return {c: sorted(row[f"{c}_freqItems"], key=str) for c in cols}

    def force_to_disk(self) -> "Pipe":
        """Materialization barrier (RichPipe.scala:428) → persist().
        Recorded in the session ledger: ``release_materialized()`` frees
        it along with every internal library persist."""
        from scalding_spark.session import register_persisted
        out = self.df.persist()
        register_persisted(out)
        return Pipe(out)

    def map_partitions(self, fn, schema, barrier_setup: Callable | None = None) -> "Pipe":
        """``using(resource).map`` parity (RichPipe.scala:73-119): per-batch
        stateful transform with setup/teardown, via Arrow-batched mapInPandas.
        ``fn(resource, iterator_of_pdf) -> iterator_of_pdf``; ``barrier_setup``
        builds the per-task resource (returned value is passed to fn)."""
        if barrier_setup is None:
            return Pipe(self.df.mapInPandas(fn, schema=schema))

        def wrapped(it):
            resource = barrier_setup()
            try:
                yield from fn(resource, it)
            finally:
                close = getattr(resource, "close", None) or getattr(resource, "release", None)
                if close:
                    close()

        return Pipe(self.df.mapInPandas(wrapped, schema=schema))

    def add_trap(self, fn, schema: str, trap_path: str | None = None,
                 error_col: str = "__error") -> "Pipe":
        """Error-row diversion (RichPipe.scala:515-518). Rows for which ``fn``
        raises are quarantined (written to ``trap_path`` as parquet with an
        ``__error`` message column) instead of failing the job. ``fn`` is a
        per-row dict→dict transform applied in Arrow batches.

        The reference captures only op-visible fields and no exception info
        (RichPipe.scala:508-514); we keep the full row plus the error —
        a cleaner but compatible quarantine schema (SURVEY.md §7.3)."""
        import json

        import pandas as pd

        from pyspark.sql.types import _parse_datatype_string

        orig_col = "__orig"
        # parse via Spark so parameterized types (decimal(10,2), map<..>)
        # don't break a naive comma split
        out_cols = [f.name for f in _parse_datatype_string(schema).fields]
        out_schema = schema + f", {error_col} string, {orig_col} string"

        def runner(it):
            for pdf in it:
                recs = []
                for rec in pdf.to_dict("records"):
                    try:
                        res = dict(fn(rec))
                        res[error_col] = None
                        res[orig_col] = None
                        recs.append(res)
                    except Exception as e:  # noqa: BLE001 - trap semantics
                        bad = {c: None for c in out_cols}
                        bad[error_col] = f"{type(e).__name__}: {e}"
                        bad[orig_col] = json.dumps(rec, default=str)
                        recs.append(bad)
                if recs:
                    yield pd.DataFrame(recs, columns=out_cols + [error_col, orig_col])

        from scalding_spark.session import register_persisted
        result = self.df.mapInPandas(runner, schema=out_schema).persist()
        register_persisted(result)  # released via release_materialized()
        if trap_path and not self._explain_only():
            # NOTE: the trap write is an eager action (Spark has no lazy
            # multi-sink); appends accumulate across job runs by design —
            # point each run at a fresh trap dir if that's unwanted.
            (result.where(F.col(error_col).isNotNull())
             .select(orig_col, error_col)
             .write.mode("append").parquet(trap_path))
        return Pipe(result.where(F.col(error_col).isNull()).drop(error_col, orig_col))

    # -- joins (delegates; see joins.py) -----------------------------------

    def join_with_smaller(self, on, right: "Pipe", how: str = "inner") -> "Pipe":
        from scalding_spark import joins
        return joins.join_with_smaller(self, right, on, how)

    def join_with_tiny(self, on, right: "Pipe", how: str = "inner") -> "Pipe":
        from scalding_spark import joins
        return joins.join_with_tiny(self, right, on, how)

    def cross_with_tiny(self, right: "Pipe") -> "Pipe":
        from scalding_spark import joins
        return joins.cross_with_tiny(self, right)

    # -- sinks -------------------------------------------------------------

    def _explain_only(self) -> bool:
        """--explain mode (Tool parity with --tool.graph, Tool.scala:74-102):
        sinks print their optimized plan instead of executing."""
        try:
            return self.df.sparkSession.conf.get(
                "scalding_spark.explain", "false") == "true"
        except Exception:  # noqa: BLE001 - conf access is best-effort
            return False

    def write_parquet(self, path: str, mode: str = "overwrite",
                     partition_by: list[str] | None = None,
                     max_records_per_file: int | None = None) -> "Pipe":
        """``max_records_per_file`` caps output-file size without a
        repartition: each write task rolls to a new file at the cap. The
        100 TB output-hygiene lever — a 2000-task job that would emit 2000
        multi-GB files (or, post-filter, 2000 tiny ones plus a few huge)
        instead emits files bounded at cap×avg_row_bytes, with NO extra
        exchange. Pair with ``reducers(n)`` only when task-count itself is
        the problem."""
        if self._explain_only():
            print(f"== sink: parquet {path} ==")
            self.df.explain(mode="formatted")
            return self
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if max_records_per_file is not None:
            w = w.option("maxRecordsPerFile", int(max_records_per_file))
        w.parquet(path)
        return self

    def write_tsv(self, path: str, header: bool = False) -> "Pipe":
        """Tsv sink parity (FileSource.scala:244-258)."""
        if self._explain_only():
            print(f"== sink: tsv {path} ==")
            self.df.explain(mode="formatted")
            return self
        self.df.write.mode("overwrite").option("sep", "\t").option("header", header).csv(path)
        return self

    def write_json(self, path: str) -> "Pipe":
        """JsonLine sink parity (FileSource.scala:450-503)."""
        if self._explain_only():
            print(f"== sink: json {path} ==")
            self.df.explain(mode="formatted")
            return self
        self.df.write.mode("overwrite").json(path)
        return self
