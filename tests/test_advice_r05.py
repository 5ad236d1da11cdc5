"""Round-5 regression pins for the r04 ADVICE + VERDICT findings.

1. materialize() persist mode: session-scoped ledger + release_materialized
   (the r04 cache leak that turned the suite red in default order).
2. iterative lineage cuts under persist mode fall back to a plan-truncating
   strategy (persist cannot truncate; plans double per round otherwise).
3. fold zero over DecimalType: a fractional zero stays in exact decimal
   arithmetic when the column's scale can represent it; scale-0 decimals
   and integral columns still promote to double.
4. counters(timeout=) degrades to a thread-bounded blocking get when the
   Observation has no JVM probe handle (Spark Connect) instead of always
   raising TimeoutError.
"""

import threading
import time
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from scalding_spark import pipe as pipe_mod
from scalding_spark.grouping import GroupBuilder, _zero_for_type
from scalding_spark.pipe import counters
from scalding_spark.session import (MATERIALIZE_CONF, _MATERIALIZED,
                                    materialize, release_materialized)
from scalding_spark.typed import TypedPipe


# --- 1. persist-mode ledger + release ----------------------------------------

def test_release_materialized_unpersists_persist_mode_frames(spark):
    df = spark.range(50).withColumn("v", F.col("id") * 3)
    spark.conf.set(MATERIALIZE_CONF, "persist")
    try:
        out = materialize(df, eager=True)
        assert out.storageLevel.useMemory, "persist mode did not cache"
        assert any(f is out._jdf for f in _MATERIALIZED.get(spark, [])), \
            "persist-mode frame not recorded in the session ledger"
    finally:
        spark.conf.unset(MATERIALIZE_CONF)
        release_materialized(spark)
    assert not out.storageLevel.useMemory, "release_materialized left cache"
    assert not _MATERIALIZED.get(spark, []), "ledger not cleared"


def test_ledger_holds_jvm_handles_not_python_frames(spark):
    """The ledger must store df._jdf, not the DataFrame: a Python
    DataFrame strongly references its SparkSession, so holding it as a
    WeakKeyDictionary VALUE pins its own KEY — every entry (and the
    stopped session) would live for process lifetime."""
    from scalding_spark.session import register_persisted
    df = spark.range(5).persist()
    try:
        register_persisted(df)
        entry = _MATERIALIZED.get(spark, [])[-1]
        assert entry is df._jdf, "ledger entry is not the JVM handle"
        from pyspark.sql import DataFrame
        assert not isinstance(entry, DataFrame), (
            "ledger holds Python DataFrames — value→key cycle makes "
            "WeakKeyDictionary entries immortal")
    finally:
        release_materialized(spark)
    assert not df.storageLevel.useMemory


def test_local_mode_registers_nothing(spark):
    before = len(_MATERIALIZED.get(spark, []))
    materialize(spark.range(10), eager=True)
    assert len(_MATERIALIZED.get(spark, [])) == before


# --- 2. iterative cuts truncate the plan even in persist mode ----------------

def test_iterative_persist_mode_truncates_plan_and_registers_nothing(spark):
    df = spark.range(20).withColumn("v", F.col("id") + 1)
    spark.conf.set(MATERIALIZE_CONF, "persist")
    try:
        before = len(_MATERIALIZED.get(spark, []))
        out = materialize(df, eager=True, iterative=True)
        # plan truncated: the logical plan is a leaf scan, not the original
        # Range->Project tree (localCheckpoint/checkpoint fallback)
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "Range" not in plan, f"iterative cut kept lineage: {plan}"
        assert len(_MATERIALIZED.get(spark, [])) == before, \
            "iterative cut must not accumulate ledger entries per round"
        assert sorted(r.id for r in out.collect()) == list(range(20))
    finally:
        spark.conf.unset(MATERIALIZE_CONF)
        release_materialized(spark)


def test_iterative_persist_mode_uses_reliable_when_ckpt_dir_set(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.range(10)
    spark.conf.set(MATERIALIZE_CONF, "persist")
    try:
        out = materialize(df, eager=True, iterative=True)
        assert sorted(r.id for r in out.collect()) == list(range(10))
    finally:
        spark.conf.unset(MATERIALIZE_CONF)


# --- 3. decimal fold zero -----------------------------------------------------

def test_fold_fractional_zero_over_decimal_stays_decimal(spark):
    df = spark.createDataFrame(
        [(1, Decimal("0.1000000000")), (1, Decimal("0.2000000000"))],
        "k int, v decimal(38,10)")
    out = (GroupBuilder(df, ["k"])
           .reduce("v", 0.5, lambda a, x: a + x, out="s").done()
           .df.collect())
    # exact decimal accumulation: 0.5 + 0.1 + 0.2 == 0.8 with NO float error
    assert out[0]["s"] == Decimal("0.8")
    assert isinstance(out[0]["s"], Decimal), \
        f"fold switched to {type(out[0]['s'])} — float rounding introduced"


def test_fold_fractional_zero_over_scale0_decimal_promotes_to_double(spark):
    df = spark.createDataFrame(
        [(1, Decimal("10")), (1, Decimal("20"))], "k int, v decimal(10,0)")
    out = (GroupBuilder(df, ["k"])
           .reduce("v", 0.5, lambda a, x: a + x, out="s").done()
           .df.collect())
    assert out[0]["s"] == pytest.approx(30.5)


def test_typed_fold_fractional_zero_over_decimal_stays_decimal(spark):
    tp = TypedPipe.from_iterable(
        spark, [Decimal("0.1000"), Decimal("0.2000")], "decimal(20,4)")
    g = tp.group_by(lambda v: F.lit(1))
    rows = g.fold_left(0.5, lambda a, x: a + x).collect()
    assert rows[0][-1] == Decimal("0.8")
    assert isinstance(rows[0][-1], Decimal)


def test_zero_for_type_unrepresentable_zero_falls_back_to_double(spark):
    from pyspark.sql import types as T

    def tname(zero, dt):
        col, _ = _zero_for_type(zero, dt)
        return spark.range(1).select(col.alias("z")).schema["z"] \
            .dataType.typeName()

    # 0.25 needs scale 2 > 1 → double; 123.5 overflows decimal(3,1) → double
    assert "double" in tname(0.25, T.DecimalType(10, 1))
    assert "double" in tname(123.5, T.DecimalType(3, 1))
    assert "decimal" in tname(0.5, T.DecimalType(10, 1))


# --- 4. counters() degraded probe path ---------------------------------------

class _FakeObsReady:
    """Observation with no _jo handle whose action has completed."""
    @property
    def get(self):
        return {"n": 7}


class _FakeObsNever:
    """Observation with no _jo handle whose .get blocks forever."""
    @property
    def get(self):
        threading.Event().wait(60)
        return {}


def _register_fake(spark, name, obs):
    pipe_mod._obs_scope(spark)[name] = obs


def test_counters_timeout_degrades_to_blocking_get_when_no_handle(spark):
    _register_fake(spark, "r05_nohandle_ready", _FakeObsReady())
    t0 = time.monotonic()
    assert counters("r05_nohandle_ready", timeout=5) == {"n": 7}
    assert time.monotonic() - t0 < 5, "degraded path blocked the full timeout"


def test_counters_timeout_still_raises_when_no_handle_and_no_action(spark):
    _register_fake(spark, "r05_nohandle_never", _FakeObsNever())
    with pytest.raises(TimeoutError):
        counters("r05_nohandle_never", timeout=0.3)


# --- 5. internal-persist ledger coverage (the r04 leak class, swept) ---------

def _cache_manager_empty(spark) -> bool:
    """DataFrame persists (the leak class) register in the CacheManager;
    localCheckpoint RDD blocks do NOT (they are plain RDD persists cleaned
    by ContextCleaner after GC) — so this is a DETERMINISTIC leak signal,
    unlike counting getPersistentRDDs (GC-timing-dependent, was flaky)."""
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pagerank_releases_its_internal_persists(spark):
    from scalding_spark.matrix import pagerank
    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long")
    pagerank(edges, iterations=3).count()
    assert _cache_manager_empty(spark), (
        "pagerank left CacheManager entries (nodes/trans unpersist missing)")


def test_minhash_and_ngram_persists_are_released(spark):
    from scalding_spark.functions import dedup
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i % 3}")
         for i in range(30)], "doc_id long, text string")
    spark.catalog.clearCache()
    led_before = len(_MATERIALIZED.get(spark, []))
    dedup.minhash_lsh_pairs(docs, "text", "doc_id", 16, 8,
                            threshold=0.5).count()
    dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3,
                              threshold=0.5).count()
    assert len(_MATERIALIZED.get(spark, [])) >= led_before + 2, (
        "expected the sig + shingle-index persists in the ledger")
    assert not _cache_manager_empty(spark), "expected live cache entries"
    release_materialized(spark)
    assert _cache_manager_empty(spark), (
        "release_materialized left internal library persists cached")
    assert not _MATERIALIZED.get(spark, []), "ledger not drained"


def test_kmeans_unpersists_even_when_iteration_throws(spark):
    from scalding_spark.functions import similarity
    spark.catalog.clearCache()
    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(20)],
        "vec_id long, embedding array<double>")
    similarity.kmeans(emb, k=2, max_iter=2)
    assert _cache_manager_empty(spark)
    # exception path: break the corpus so the first action inside fails
    bad = emb.withColumn(
        "embedding", F.raise_error(F.lit("boom")).cast("array<double>"))
    with pytest.raises(Exception):
        similarity.kmeans(bad, k=2, max_iter=2)
    assert _cache_manager_empty(spark), (
        "kmeans leaked its corpus cache on the exception path")


# --- 6. iterative operators end-to-end under every materialize mode ----------

def _pagerank_rows(spark):
    from scalding_spark.matrix import pagerank
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)],
        "src long, dst long")
    return sorted((r.node, round(r.rank, 10))
                  for r in pagerank(edges, iterations=5).collect())


def _cc_rows(spark):
    from scalding_spark.functions.dedup import connected_components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 12), (11, 13)],
        "src long, dst long")
    return sorted(tuple(r) for r in connected_components(edges).collect())


def test_iterative_ops_identical_under_all_materialize_modes(spark, tmp_path):
    """The ADVICE r04 medium finding: iterative loops under persist mode
    must neither blow up their plans nor accumulate cache, and every mode
    must produce identical results."""
    spark.catalog.clearCache()
    base_pr, base_cc = _pagerank_rows(spark), _cc_rows(spark)
    led_before = len(_MATERIALIZED.get(spark, []))
    spark.conf.set(MATERIALIZE_CONF, "persist")
    try:
        assert _pagerank_rows(spark) == base_pr
        assert _cc_rows(spark) == base_cc
        assert len(_MATERIALIZED.get(spark, [])) == led_before, (
            "iterative ops under persist mode must not grow the ledger")
        spark.sparkContext.setCheckpointDir(str(tmp_path / "rck"))
        spark.conf.set(MATERIALIZE_CONF, "reliable")
        assert _pagerank_rows(spark) == base_pr
        assert _cc_rows(spark) == base_cc
    finally:
        spark.conf.unset(MATERIALIZE_CONF)
        release_materialized(spark)
    assert _cache_manager_empty(spark), (
        "iterative runs left CacheManager entries under alternate modes")


def test_counters_degraded_path_reuses_one_worker_thread(spark):
    """Polling counters(timeout=) repeatedly before the action completes
    must reuse ONE parked worker per Observation, not accumulate threads."""
    obs = _FakeObsNever()
    _register_fake(spark, "r05_thread_reuse", obs)
    for _ in range(3):
        with pytest.raises(TimeoutError):
            counters("r05_thread_reuse", timeout=0.05)
    q, t = obs._scalding_waiter
    assert t.is_alive() and q.empty()
    n = sum(1 for th in threading.enumerate()
            if th is t)
    assert n == 1


class _FakeObsRaises:
    @property
    def get(self):
        raise RuntimeError("observation backend exploded")


def test_counters_degraded_path_propagates_worker_exception(spark):
    _register_fake(spark, "r05_worker_err", _FakeObsRaises())
    with pytest.raises(RuntimeError, match="exploded"):
        counters("r05_worker_err", timeout=2)
