"""dedup.neardup_against: batch near-dup gate vs a signature-only store."""

from pyspark.sql import functions as F

from scalding_spark.functions import dedup

_LONG_A = ("the quick brown fox jumps over the lazy dog near the old "
           "river bank every single morning before sunrise")
_LONG_B = ("completely different content about spark shuffle partitions "
           "and broadcast joins tuned for large clusters")


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dup_dropped_distinct_kept(spark):
    stored = _corpus(spark, [(0, _LONG_A)])
    store = dedup.minhash_signatures(stored, "text", "doc_id", 32, 3)
    batch = _corpus(spark, [(1, _LONG_A), (3, _LONG_B)])
    kept = {r["doc_id"] for r in
            dedup.neardup_against(batch, store, "text", "doc_id",
                                  num_hashes=32, bands=16,
                                  threshold=0.7).collect()}
    assert kept == {3}  # exact copy estimates 1.0; disjoint text survives


def test_tokenless_and_null_docs_always_pass(spark):
    stored = _corpus(spark, [(0, _LONG_A)])
    store = dedup.minhash_signatures(stored, "text", "doc_id", 32, 3)
    batch = _corpus(spark, [(1, None), (3, "   "), (5, "")])
    kept = {r["doc_id"] for r in
            dedup.neardup_against(batch, store, "text", "doc_id",
                                  num_hashes=32, bands=16,
                                  threshold=0.1).collect()}
    assert kept == {1, 3, 5}


def test_empty_store_keeps_everything(spark):
    store = dedup.minhash_signatures(
        _corpus(spark, []), "text", "doc_id", 32, 3)
    batch = _corpus(spark, [(1, _LONG_A), (3, _LONG_B)])
    kept = {r["doc_id"] for r in
            dedup.neardup_against(batch, store, "text", "doc_id",
                                  num_hashes=32, bands=16,
                                  threshold=0.1).collect()}
    assert kept == {1, 3}


def test_same_buckets_as_minhash_lsh_pairs(spark):
    """The store probe and the self-join LSH use the SAME signature seeds
    and band hashes: any pair minhash_lsh_pairs reports at threshold t
    (estimator-verified variant: signature agreement) is also caught when
    one side sits in the store."""
    docs = _corpus(spark, [(0, _LONG_A), (1, _LONG_A)])
    store = dedup.minhash_signatures(
        docs.where("doc_id = 0"), "text", "doc_id", 32, 3)
    kept = dedup.neardup_against(docs.where("doc_id = 1"), store,
                                 "text", "doc_id", num_hashes=32,
                                 bands=16, threshold=0.99).count()
    assert kept == 0  # identical signatures agree in every slot


def test_plan_stays_jvm_side(spark):
    stored = _corpus(spark, [(i, f"{_LONG_A} {i}") for i in range(8)])
    store = dedup.minhash_signatures(stored, "text", "doc_id", 32, 3)
    batch = _corpus(spark, [(100, _LONG_B)])
    out = dedup.neardup_against(batch, store, "text", "doc_id",
                                num_hashes=32, bands=16, threshold=0.7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # batch side broadcasts
