"""Bucketed-table contract: a join of two co-bucketed tables must not
shuffle either side."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.sources import bucketed


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    # warehouse dir is a static conf — use the session default location and
    # drop the tables afterwards
    left = spark.range(0, 1000).select(F.col("id").alias("k"),
                                       (F.col("id") * 2).alias("lv"))
    right = spark.range(0, 500).select(F.col("id").alias("k"),
                                       (F.col("id") * 3).alias("rv"))
    bucketed.write_bucketed(left, "bk_left", ["k"], 4, sort_by=["k"])
    bucketed.write_bucketed(right, "bk_right", ["k"], 4, sort_by=["k"])
    yield "bk_left", "bk_right"
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_join_no_shuffle(spark, tables):
    lt, rt = tables
    # force a non-broadcast join so the bucketed (shuffle-free) sort-merge
    # path is what's under test — at real scale both sides are huge anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed.bucketed_join(spark, lt, rt, on=["k"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_no_shuffle(spark, tables):
    lt, _ = tables
    agg = bucketed.read_bucketed(spark, lt).groupBy("k").agg(F.sum("lv"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -- FingerprintStore: bucketed incremental dedup (r05) ----------------------

def test_fingerprint_store_incremental_rounds(spark):
    from scalding_spark.functions.dedup import FingerprintStore
    store = FingerprintStore(spark, "t_fp_store_inc", n_buckets=4)
    spark.sql("DROP TABLE IF EXISTS t_fp_store_inc")
    b0 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string")
    store.initialize(b0, "text")
    assert store.exists()
    # batch 1: one dup of batch 0, one new
    b1 = spark.createDataFrame(
        [(2, "Alpha  beta!"), (3, "epsilon zeta")],  # 2 normalizes to dup
        "doc_id long, text string")
    kept1 = store.dedup_new_batch(b1, "text")
    assert sorted(r.doc_id for r in kept1.collect()) == [3]
    store.append(kept1, "text")
    # batch 2: dups of BOTH prior batches + one new
    b2 = spark.createDataFrame(
        [(4, "gamma delta"), (5, "EPSILON zeta"), (6, "eta theta")],
        "doc_id long, text string")
    kept2 = store.dedup_new_batch(b2, "text")
    assert sorted(r.doc_id for r in kept2.collect()) == [6]
    assert store.fps().count() == 3  # alpha-beta, gamma-delta, epsilon-zeta
    spark.sql("DROP TABLE t_fp_store_inc")


def test_fingerprint_store_anti_join_never_exchanges_the_store(spark):
    """The point of the bucketed store: the anti join's STORE side arrives
    pre-partitioned — only the batch side plans an Exchange."""
    from scalding_spark.functions.dedup import FingerprintStore
    store = FingerprintStore(spark, "t_fp_store_plan", n_buckets=4)
    spark.sql("DROP TABLE IF EXISTS t_fp_store_plan")
    b0 = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(50)],
        "doc_id long, text string")
    store.initialize(b0, "text")
    batch = spark.createDataFrame(
        [(100 + i, f"doc number {i * 2}") for i in range(20)],
        "doc_id long, text string")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (store.dedup_new_batch(batch, "text")
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    n_exchange = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchange == 1, (
        f"expected exactly ONE shuffle (the batch side); plan:\n{plan}")
    # and the store scan reports its bucketing
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    # probe-side pruning (r12 pin, guide §6): the store probe reads ONLY
    # the fingerprint column — nothing else exists to read, and nothing
    # else may ever be added to the probe's ReadSchema
    import re
    store_scans = [l for l in plan.splitlines()
                   if "t_fp_store_plan" in l and "ReadSchema" in l]
    assert store_scans, plan
    assert all(re.search(r"ReadSchema: struct<fp:string>", l)
               for l in store_scans), plan
    spark.sql("DROP TABLE t_fp_store_plan")


def test_fingerprint_store_writes_one_file_per_bucket(spark, tmp_path):
    """r12 (guide §6 output sizing): _fps_of repartitions by
    (n_buckets, fp) — the same murmur3-pmod placement the bucketed
    write uses — so each write task holds exactly one bucket and each
    initialize/append lands ONE file per bucket, not tasks × buckets
    small files (the small-file tax compounds on a daily-append store)."""
    import glob
    import os
    from scalding_spark.functions.dedup import FingerprintStore
    path = str(tmp_path / "store")
    store = FingerprintStore(spark, "t_fp_store_files", n_buckets=4,
                             path=path)
    spark.sql("DROP TABLE IF EXISTS t_fp_store_files")
    b0 = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(200)],
        "doc_id long, text string")
    store.initialize(b0, "text")
    files_after_init = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files_after_init) == 4, files_after_init
    b1 = spark.createDataFrame(
        [(1000 + i, f"fresh doc {i}") for i in range(200)],
        "doc_id long, text string")
    store.append(store.dedup_new_batch(b1, "text"), "text")
    files_after_append = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files_after_append) == 8, files_after_append
    # the incremental semantics are untouched
    assert store.fps().count() == 400
    spark.sql("DROP TABLE t_fp_store_files")
