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


# -- property-based: BM25 vs a pure-Python reference --------------------------

from hypothesis import given, settings, strategies as st

_VOCAB = ["spark", "join", "window", "table", "scan", "row"]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    import math
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for q in set(terms):
        df = sum(q in v for v in toks.values())
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(q)
            if tf:
                dl = len(v)
                out[i] = out.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl / avgdl))
    return out


@settings(max_examples=8, deadline=None)
@given(data=st.data())
def test_bm25_matches_python_reference(spark, data):
    n_docs = data.draw(st.integers(min_value=2, max_value=6))
    docs = []
    for i in range(n_docs):
        words = data.draw(st.lists(st.sampled_from(_VOCAB),
                                   min_size=1, max_size=12))
        docs.append((i, " ".join(words)))
    terms = data.draw(st.lists(st.sampled_from(_VOCAB),
                               min_size=1, max_size=3))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in
           retrieval.bm25_rank(df, terms, k=100).collect()}
    ref = _py_bm25(docs, terms)
    assert set(got) == set(ref)
    assert all(abs(got[i] - ref[i]) < 1e-9 for i in ref)
