"""ANN tests: exact scores, bounded candidate sets, recall sanity on
clustered (non-adversarial) data."""

import math
import random

import pytest
from pyspark.sql import functions as F

from scalding_spark.functions import similarity


@pytest.fixture(scope="module")
def clustered(spark):
    """3 well-separated clusters — data where ANN recall is meaningful."""
    rng = random.Random(7)
    centers = [[5.0 if i == c else 0.0 for i in range(8)] for c in range(3)]
    rows = []
    for vid in range(90):
        c = centers[vid % 3]
        rows.append((vid, [x + rng.gauss(0, 0.3) for x in c]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def exact_topk(df, k=5):
    out = similarity.cosine_topk_bruteforce(df, df.where(F.col("vec_id") < 6), k=k)
    return {(r.query_id, r.neighbor_id) for r in out.collect()}


def test_bruteforce_scores_exact(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    out = {(r.query_id, r.neighbor_id): r.cosine
           for r in similarity.cosine_topk_bruteforce(df, df, k=2).collect()}
    assert out[(0, 1)] == pytest.approx(1.0)
    assert out[(0, 2)] == pytest.approx(0.0)
    assert (0, 0) not in out  # self excluded


def test_ivf_recall_on_clustered(clustered):
    exact = exact_topk(clustered)
    ivf = similarity.cosine_topk_ivf(
        clustered, clustered.where(F.col("vec_id") < 6), k=5,
        n_cells=8, n_probe=3)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall} too low on clustered data"


def test_ivf_scores_match_bruteforce_where_found(clustered):
    queries = clustered.where(F.col("vec_id") < 3)
    bf = {(r.query_id, r.neighbor_id): r.cosine
          for r in similarity.cosine_topk_bruteforce(clustered, queries, k=20).collect()}
    ivf = similarity.cosine_topk_ivf(clustered, queries, k=5, n_cells=8, n_probe=3)
    for r in ivf.collect():
        assert bf[(r.query_id, r.neighbor_id)] == pytest.approx(r.cosine)


def test_lsh_recall_on_clustered(clustered):
    exact = exact_topk(clustered)
    lsh = similarity.cosine_topk_lsh(
        clustered, clustered.where(F.col("vec_id") < 6), k=5,
        dim=8, n_planes=4, n_tables=6)
    got = {(r.query_id, r.neighbor_id) for r in lsh.collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.7, f"LSH recall {recall} too low on clustered data"


def test_ivf_centroids_deterministic(clustered):
    a = similarity.ivf_centroids(clustered, 4)
    b = similarity.ivf_centroids(clustered, 4)
    assert a == b and len(a) == 4


def test_near_dup_lsh_subset_of_exact(clustered):
    """LSH near-dup pairs exact-verify candidates, so every emitted pair must
    appear in the exact all-pairs truth set with the same cosine."""
    exact = {(r.id_a, r.id_b): r.cosine for r in
             similarity.embedding_near_dup_exact(clustered, threshold=0.9).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine for r in
           similarity.embedding_near_dup_pairs(clustered, threshold=0.9, dim=8).collect()}
    assert lsh, "clustered data must produce near-dup pairs"
    for pair, cos in lsh.items():
        assert pair in exact
        assert cos == pytest.approx(exact[pair], abs=1e-12)


def test_near_dup_exact_symmetric_ordering(clustered):
    out = similarity.embedding_near_dup_exact(clustered, threshold=0.9).collect()
    assert all(r.id_a < r.id_b for r in out)


def test_ivf_trained_centroids_recall(clustered):
    """train_iters > 0 refines the quantizer with Lloyd's iterations —
    recall on clustered data must be at least as good as the exact-verified
    floor, and scores stay exact."""
    exact = exact_topk(clustered)
    ivf = similarity.cosine_topk_ivf(
        clustered, clustered.where(F.col("vec_id") < 6), k=5,
        n_cells=8, n_probe=3, train_iters=5)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"trained-IVF recall {recall} too low"
    # deterministic: same training run -> same result set
    again = similarity.cosine_topk_ivf(
        clustered, clustered.where(F.col("vec_id") < 6), k=5,
        n_cells=8, n_probe=3, train_iters=5)
    assert {(r.query_id, r.neighbor_id) for r in again.collect()} == got


# -- r03: SemDeDup-style semantic dedup ---------------------------------------

def _blob_corpus(spark):
    """4 tight blobs of 3 near-identical vectors + 2 far singletons."""
    import random as _r
    rng = _r.Random(7)
    rows = []
    vid = 0
    for b in range(4):
        base = [10.0 * (b + 1) * ((-1) ** b), 5.0 * b, -3.0 * b + 1.0]
        for _ in range(3):
            rows.append((vid, [x + rng.uniform(-0.01, 0.01) for x in base]))
            vid += 1
    rows.append((vid, [1.0, -50.0, 2.0])); vid += 1
    rows.append((vid, [-7.0, 3.0, 40.0])); vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_drops_within_blob_dups(spark):
    from scalding_spark.functions.similarity import semantic_dedup
    df = _blob_corpus(spark)
    kept = semantic_dedup(df, threshold=0.999, k=4, seed=3)
    ids = sorted(r["vec_id"] for r in kept.collect())
    # each blob keeps >= 1 (its smallest id survives by construction);
    # the far singletons always survive
    assert 12 in ids and 13 in ids
    assert len(ids) >= 4 + 2 - 2  # at minimum one per blob may merge
    assert len(ids) < 14          # something was actually dropped
    # survivors contain the smallest id of every blob that kept exactly one
    for blob_start in (0, 3, 6, 9):
        assert any(i in ids for i in range(blob_start, blob_start + 3))


def test_semantic_dedup_k1_matches_exact_rule(spark):
    """With one cluster the cell join is all-pairs, so the kept set must
    equal the greedy smaller-id rule computed from the exact pair list."""
    from scalding_spark.functions import similarity as sim
    df = _blob_corpus(spark)
    kept = {r["vec_id"] for r in
            sim.semantic_dedup(df, threshold=0.999, k=1, seed=3).collect()}
    pairs = sim.embedding_near_dup_exact(df, threshold=0.999).collect()
    losers = {p["id_b"] for p in pairs}
    expect = {r["vec_id"] for r in df.collect()} - losers
    assert kept == expect


def test_semantic_dedup_keeps_all_when_threshold_impossible(spark):
    from scalding_spark.functions.similarity import semantic_dedup
    df = _blob_corpus(spark)
    assert semantic_dedup(df, threshold=1.1, k=4).count() == df.count()


def test_semantic_dedup_preserves_schema(spark):
    from scalding_spark.functions.similarity import semantic_dedup
    df = _blob_corpus(spark).withColumn("extra", F.lit("x"))
    kept = semantic_dedup(df, threshold=0.999, k=2)
    assert kept.columns == df.columns
