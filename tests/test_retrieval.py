"""BM25 ranked retrieval (scalding_spark.functions.retrieval) — formula
parity against a hand-computed reference, fixed-point determinism, and the
no-match contract."""

import math

import pytest
from pyspark.sql import functions as F

from scalding_spark.functions import retrieval


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "spark join spark"), (2, "join table"), (3, "other words here")],
        "doc_id long, text string")


def _bm25_ref(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_formula(corpus):
    out = {r["doc_id"]: r for r in
           retrieval.bm25_rank(corpus, ["spark", "join"], k=10).collect()}
    avgdl = 8 / 3
    exp1 = (_bm25_ref(2, 1, 3, 3, avgdl) + _bm25_ref(1, 2, 3, 3, avgdl))
    exp2 = _bm25_ref(1, 2, 3, 2, avgdl)
    assert out[1]["n_match_terms"] == 2 and out[2]["n_match_terms"] == 1
    assert abs(out[1]["score"] - exp1) < 1e-9
    assert abs(out[2]["score"] - exp2) < 1e-9
    assert 3 not in out  # no matching term -> absent, not zero-scored


def test_bm25_ranking_and_k_cut(corpus):
    rows = retrieval.bm25_rank(corpus, ["spark", "join"], k=1).collect()
    assert [r["doc_id"] for r in rows] == [1]  # doc1 outranks doc2


def test_bm25_fixed_point_layout_independent(corpus):
    a = retrieval.bm25_rank(corpus, ["spark", "join"], term_decimals=6)
    b = retrieval.bm25_rank(corpus.repartition(7), ["spark", "join"],
                            term_decimals=6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bm25_fixed_close_to_float(corpus):
    fx = {r["doc_id"]: r["score"] for r in
          retrieval.bm25_rank(corpus, ["spark", "join"],
                              term_decimals=6).collect()}
    fl = {r["doc_id"]: r["score"] for r in
          retrieval.bm25_rank(corpus, ["spark", "join"]).collect()}
    assert all(abs(fx[d] - fl[d]) < 1e-5 for d in fl)


def test_bm25_duplicate_query_terms_collapse(corpus):
    a = retrieval.bm25_rank(corpus, ["join", "join", "spark"]).collect()
    b = retrieval.bm25_rank(corpus, ["spark", "join"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bm25_no_hits_returns_empty(corpus):
    assert retrieval.bm25_rank(corpus, ["zzz"]).count() == 0


def test_bm25_filter_precedes_explode_plan(corpus):
    """Scale contract: the corpus token stream is filtered to query terms
    BEFORE the explode — no per-token rows cross an exchange — and the
    top-k is TakeOrderedAndProject, not a global sort."""
    q = retrieval.bm25_rank(corpus, ["spark", "join"], k=5)
    p = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
