"""DSIR importance resampling (lm.hashed_ngram_features /
importance_weights / importance_resample): hand-computed weight parity,
fixed-point layout independence, deterministic Gumbel top-k selection."""

import math

import pytest
from pyspark.sql import functions as F

from scalding_spark.functions import lm

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "stock market crash price index"),
    (3, "market price moves fast today"),
]
TARGET = [
    (100, "the cat and the dog sat"),
    (101, "a cat sat on a mat"),
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(TARGET, "doc_id long, text string")


def _py_weights(n_buckets=512, add_k=0.5, use_bigrams=True):
    """Reference implementation in plain Python over the same md5 buckets."""
    import hashlib

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets

    def feats(text):
        t = text.split()
        out = list(t)
        if use_bigrams:
            out += [f"{a} {b}" for a, b in zip(t, t[1:])]
        return [bucket(f) for f in out]

    raw_c, tgt_c = {}, {}
    doc_f = {}
    for i, txt in DOCS:
        doc_f[i] = feats(txt)
        for b in doc_f[i]:
            raw_c[b] = raw_c.get(b, 0) + 1
    for _, txt in TARGET:
        for b in feats(txt):
            tgt_c[b] = tgt_c.get(b, 0) + 1
    n_r, n_t = sum(raw_c.values()), sum(tgt_c.values())
    kb = add_k * n_buckets
    out = {}
    for i, fs in doc_f.items():
        w = sum(math.log(tgt_c.get(b, 0) + add_k) - math.log(raw_c[b] + add_k)
                for b in fs)
        w += len(fs) * (math.log(n_r + kb) - math.log(n_t + kb))
        out[i] = (len(fs), w)
    return out


def test_feature_counts(spark, raw):
    f = lm.hashed_ngram_features(raw, "text", "doc_id", n_buckets=512)
    per_doc = {r.doc_id: r.n for r in
               f.groupBy("doc_id").agg(F.sum("occ").alias("n")).collect()}
    # 6 tokens + 5 bigrams = 11 features for doc 0; 5+4=9 for doc 3
    assert per_doc[0] == 11 and per_doc[3] == 9


def test_weights_match_python_reference(spark, raw, target):
    got = {r.doc_id: (r.n_feats, r.log_weight) for r in
           lm.importance_weights(raw, target, "text", "doc_id",
                                 n_buckets=512).collect()}
    expect = _py_weights()
    assert set(got) == set(expect)
    for i in expect:
        assert got[i][0] == expect[i][0]
        assert got[i][1] == pytest.approx(expect[i][1], abs=1e-9)
    # target-looking docs (0, 1) outweigh finance docs (2, 3)
    assert min(got[0][1], got[1][1]) > max(got[2][1], got[3][1])


def test_fixed_point_layout_independent(spark, raw, target):
    a = lm.importance_weights(raw, target, "text", "doc_id",
                              n_buckets=512, term_decimals=6)
    b = lm.importance_weights(raw.repartition(7), target.repartition(3),
                              "text", "doc_id", n_buckets=512,
                              term_decimals=6)
    ra = sorted((r.doc_id, r.lw_fixed) for r in a.collect())
    rb = sorted((r.doc_id, r.lw_fixed) for r in b.collect())
    assert ra == rb
    assert all(isinstance(v, int) for _, v in ra)


def test_resample_deterministic_and_biased(spark, raw, target):
    sel1 = lm.importance_resample(raw, target, "text", "doc_id", k=2,
                                  n_buckets=512, salt="s")
    sel2 = lm.importance_resample(raw, target, "text", "doc_id", k=2,
                                  n_buckets=512, salt="s")
    ids1 = sorted(r.doc_id for r in sel1.collect())
    assert ids1 == sorted(r.doc_id for r in sel2.collect())
    assert len(ids1) == 2
    assert set(ids1) <= {0, 1, 2, 3}
    # selected rows carry the original columns + log_weight
    assert {"doc_id", "text", "log_weight"} <= set(sel1.columns)


def test_resample_follows_weights_at_extreme_gap(spark):
    """With an overwhelming weight gap the Gumbel noise cannot flip the
    ranking: the target-like doc must always win k=1."""
    raw = spark.createDataFrame(
        [(0, "alpha beta gamma delta " * 20), (1, "zzz qqq xxx www " * 20)],
        "doc_id long, text string")
    tgt = spark.createDataFrame([(9, "alpha beta gamma delta " * 20)],
                                "doc_id long, text string")
    sel = lm.importance_resample(raw, tgt, "text", "doc_id", k=1,
                                 n_buckets=256)
    assert [r.doc_id for r in sel.collect()] == [0]


def test_model_table_broadcasts(spark, raw, target):
    """Scale contract: the λ model join must broadcast (≤ n_buckets rows);
    the raw side's feature aggregation is the only hash exchange keyed on
    doc data."""
    w = lm.importance_weights(raw, target, "text", "doc_id", n_buckets=512)
    p = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
