"""Null-text / zero-vector robustness semantics, surfaced by the edge-corpus
oracle campaign (scripts/gen_edge.py → full driver gate on .scaling/edge).

Every behavior here was a REAL failure on the edge corpus before r05:
ANSI DIVIDE_BY_ZERO killing the ANN queries on one zero vector,
xxhash64(NULL) fingerprinting all null docs identically, lang_id tagging
absent text 'und', mapInPandas decoders raising on a missing blob, and
pack_sequences diverging from SQL on all-null sequences.
"""

import pytest
from pyspark.sql import functions as F

from scalding_spark.functions import multimodal as mm
from scalding_spark.functions import similarity, text as tx
from scalding_spark.functions.sampling import pack_sequences
from scalding_spark.functions.dedup import dedup_against


def test_cosine_zero_norm_is_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 2.0])],
        "id long, v array<double>")
    out = (df.alias("a").crossJoin(df.alias("b"))
           .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"),
                   similarity.cosine(F.col("a.v"), F.col("b.v")).alias("c")))
    rows = {(r.ia, r.ib): r.c for r in out.collect()}  # must not raise (ANSI)
    assert rows[(1, 2)] is None and rows[(1, 1)] is None
    assert rows[(2, 3)] == pytest.approx(0.0)
    assert rows[(3, 3)] == pytest.approx(1.0)


def test_cosine_topk_skips_zero_vector_neighbors(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]),
            (3, [0.5, 0.5]), (4, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk_bruteforce(
        df, df.where("vec_id = 0"), k=3).collect()
    # NULLS LAST: the zero vector only appears when real scores run out —
    # with 4 non-self candidates and k=3 it must not appear at all
    assert [r.neighbor_id for r in out] == [1, 3, 4]


def test_fingerprint64_null_text_propagates(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same text"), (4, "same text")],
        "id long, text string")
    got = df.select("id", tx.fingerprint64(F.col("text")).alias("fp")).collect()
    fps = {r.id: r.fp for r in got}
    assert fps[1] is None and fps[2] is None  # no shared constant hash
    assert fps[3] == fps[4] is not None
    # count_distinct ignores NULLs — 2 null docs are not "one unique text"
    assert df.agg(F.count_distinct(
        tx.fingerprint64(F.col("text")))).first()[0] == 1


def test_lang_id_null_vs_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "123 456"), (4, "the of and to a in")],
        "id long, text string")
    got = {r.id: r.lang for r in
           df.select("id", tx.lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] is None          # absent text: never inspected
    assert got[2] == "und"         # inspected, no evidence
    assert got[3] == "und"
    assert got[4] == "en"


def test_multimodal_null_content_yields_null_features(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, None), (3, b"")],
        "media_id long, content binary")
    feats = {r.media_id: r.features
             for r in mm.extract_image_features(df).collect()}
    assert feats[2] is None
    assert len(feats[1]) == 8 and len(feats[3]) == 8  # b'' decodes fine
    energies = {r.media_id: r.energies
                for r in mm.extract_audio_features(df).collect()}
    assert energies[2] is None and len(energies[1]) == 4
    resized = {r.media_id: r.content
               for r in mm.resize_images(df, 32, 32).collect()}
    assert resized[2] is None and resized[1] is not None


def test_frame_sample_null_clip(spark):
    df = spark.createDataFrame(
        [(1, b"clip", 2500), (2, None, 1500)],
        "media_id long, content binary, duration_ms int")
    out = mm.decode_sampled_frames(df, every_ms=1000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_features)
    assert len(by_id[1]) == 3 and all(f is not None for f in by_id[1])
    assert len(by_id[2]) == 2 and all(f is None for f in by_id[2])


def test_pack_sequences_null_text_is_empty_member(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "gamma")],
        "doc_id long, text string")
    out = pack_sequences(df, "text", "doc_id", seq_tokens=100).collect()
    assert len(out) == 1
    # the null doc contributes an empty line between its neighbors —
    # NOT silently skipped (array_join default) — and weighs 1 token
    assert out[0].text == "alpha beta\n\ngamma"
    assert out[0].n_docs == 3 and out[0].n_tokens == 4


def test_dedup_against_keeps_null_text_docs(spark):
    seen = spark.createDataFrame(
        [(10, "known text"), (11, None)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(20, "known text"), (21, None), (22, "fresh")],
        "doc_id long, text string")
    kept = sorted(r.doc_id for r in
                  dedup_against(new, seen, "text").select("doc_id").collect())
    # a null-text doc duplicates NOTHING — not even another null-text doc
    assert kept == [21, 22]


def test_py_reference_null_mirrors():
    import py_reference as pr
    assert pr.tokenize(None) == []
    assert pr.cosine([0.0, 0.0], [1.0, 2.0]) is None
    assert pr.cosine([1.0, 0.0], [1.0, 0.0]) == pytest.approx(1.0)


# -- empty-input axis (.scaling/empty): an empty upstream slice must not
# -- crash, and grouping sets owe their ANSI grand-total row ---------------

def test_rollup_empty_input_emits_ansi_grand_total(spark):
    from scalding_spark.pipe import Pipe
    empty = spark.createDataFrame([], "a string, b string, v double")
    out = (Pipe(empty).rollup_by("a", "b")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
           .grouping_flag("a", "g_a").grouping_id("gid")
           .done().to_df().collect())
    assert [tuple(r) for r in out] == [(None, None, 0, None, 1, 3)]


def test_cube_nonempty_unchanged_by_grand_total_repair(spark):
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame([("x", 1.0), ("y", 2.0)], "a string, v double")
    out = (Pipe(df).cube_by("a")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
           .done().to_df().collect())
    rows = sorted([tuple(r) for r in out], key=str)
    expect = sorted([("x", 1, 1.0), ("y", 1, 2.0), (None, 2, 3.0)], key=str)
    assert rows == expect  # exactly one grand total, not two


def test_grouping_sets_without_total_set_stays_empty(spark):
    from scalding_spark.pipe import Pipe
    empty = spark.createDataFrame([], "a string, b string, v double")
    out = (Pipe(empty).grouping_sets([["a"]], "a", "b")
           .agg(F.count(F.lit(1)).alias("n")).done().to_df().collect())
    assert out == []  # no () set requested -> no grand total owed
    out2 = (Pipe(empty).grouping_sets([["a"], []], "a", "b")
            .agg(F.count(F.lit(1)).alias("n")).done().to_df().collect())
    assert [tuple(r) for r in out2] == [(None, None, 0)]


def test_pagerank_empty_graph(spark):
    from scalding_spark.matrix import pagerank
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges).collect() == []


def test_cosine_topk_ivf_empty_corpus(spark):
    corpus = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = similarity.cosine_topk_ivf(corpus, corpus, k=5)
    assert out.collect() == []  # not an AnalysisException


def test_kmeans_empty_corpus(spark):
    corpus = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assigned, cents = similarity.kmeans(corpus, k=4)
    assert assigned.collect() == [] and cents == []


def test_train_logistic_quality_empty_keeps_zero_model(spark):
    docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    stats = {}
    w, b = tx.train_logistic_quality(docs, "text", F.col("lang") == "en",
                                     iters=3, stats=stats)
    assert b == 0.0 and all(v == 0.0 for v in w.values())
    assert stats["n_docs"] == 0 and stats["loss_path"] == []


def test_corpus_divergence_empty_vocab_is_zero(spark):
    from scalding_spark.functions import lm
    docs = spark.createDataFrame([], "doc_id long, text string")
    row = lm.corpus_divergence(docs, docs, "text").first()
    assert row.vocab == 0 and row.n_toks_a is None


# -- fuzz-axis findings (scripts/gen_fuzz.py, seeds 101/104) ----------------

def test_char_entropy_single_char_is_positive_zero(spark):
    import math
    df = spark.createDataFrame([(1, "xxxx"), (2, "ab")], "id long, t string")
    got = {r.id: r.e for r in
           df.select("id", tx.char_entropy(F.col("t")).alias("e")).collect()}
    # -(1*log2(1)) must canonicalize to +0.0 — '-0' breaks value hashing
    assert got[1] == 0.0 and math.copysign(1.0, got[1]) == 1.0
    assert got[2] == pytest.approx(1.0)


def test_perplexity_buckets_exact_thirds_at_boundary(spark):
    """n=207, fractions (1/3, 2/3): exact math says head gets 69 docs.
    floor(n * float(1/3)) sits ON a double-representation boundary here —
    binary double rounds 207·0.3333333333333333 UP to exactly 69.0 while
    exact decimal gives 68.9999999999999931 (the measured Spark-vs-DuckDB
    split on fuzz seed 104). The rational cut (3·rk <= n) is exact."""
    from scalding_spark.functions import lm
    docs = spark.createDataFrame(
        [(i, f"tok{i % 40} " * (1 + i % 7)) for i in range(207)],
        "doc_id long, text string")
    out = lm.perplexity_buckets(docs, "text", "doc_id",
                                fractions=(1 / 3, 2 / 3))
    counts = {r.bucket: r.n for r in
              out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"head": 69, "middle": 69, "tail": 69}


def test_top_fraction_exact_ceil_cut(spark):
    from scalding_spark.functions.sampling import top_fraction
    df = spark.createDataFrame([(i, i * 10) for i in range(6)],
                               "doc_id long, score long")
    kept = top_fraction(df, [F.col("score").desc()], 1 / 3, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [4, 5]  # ceil(6/3)=2


def test_remove_duplicate_lines_null_text_one_to_one(spark):
    from scalding_spark.functions.dedup import remove_duplicate_lines
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, None)], "doc_id long, text string")
    got = {r.doc_id: r.text for r in
           remove_duplicate_lines(df, "text", "doc_id", scope="doc",
                                  delimiter=" ").collect()}
    assert got == {1: "a b", 2: ""}  # null doc still present, empty rewrite


def test_null_vectors_excluded_from_similarity_but_kept_by_dedup(spark):
    """A NULL embedding (missing vector) has no position in the space:
    similarity ops exclude the row (DuckDB's list_inner_product even
    hard-errors on it), kmeans assigns it no cell — but semantic_dedup
    still KEEPS the row (a missing vector duplicates nothing)."""
    rows = [(0, [1.0, 0.0]), (1, None), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    topk = similarity.cosine_topk_bruteforce(df, df.where("vec_id = 0"), k=9)
    assert sorted(r.neighbor_id for r in topk.collect()) == [2, 3]
    pairs = similarity.embedding_near_dup_exact(df, threshold=0.9)
    assert [(r.id_a, r.id_b) for r in pairs.collect()] == [(0, 2)]
    assigned, _ = similarity.kmeans(df, k=2)
    assert sorted(r.id for r in assigned.collect()) == [0, 2, 3]
    kept = similarity.semantic_dedup(df, threshold=0.99, k=2)
    assert 1 in {r.vec_id for r in kept.collect()}  # null row survives


def test_reliable_materialize_without_checkpoint_dir_fails_clearly(spark):
    from scalding_spark.session import materialize
    if spark.sparkContext._jsc.sc().getCheckpointDir().isDefined():
        pytest.skip("checkpoint dir configured in this session")
    spark.conf.set("spark.scalding_spark.materialize", "reliable")
    try:
        with pytest.raises(ValueError, match="checkpoint directory"):
            materialize(spark.range(3), eager=True)
    finally:
        spark.conf.set("spark.scalding_spark.materialize", "local")


def test_asof_join_null_keys_never_match(spark):
    """SQL join semantics: NULL = NULL is not a match. A null-keyed left
    row comes back unmatched (left-join contract); a null-keyed right row
    matches nothing — the union+window formulation must not let the
    partitionBy group null keys into fabricated matches (fuzz seed 402
    vs DuckDB's native ASOF JOIN)."""
    from scalding_spark.joins import as_of_join
    left = spark.createDataFrame(
        [(None, 10, "l0"), (1, 10, "l1")], "k int, ts int, lv string")
    right = spark.createDataFrame(
        [(None, 5, "r0"), (1, 5, "r1")], "k int, ts int, rv string")
    out = {r.lv: r.rv for r in
           as_of_join(left, right, on=["k"], left_ts="ts",
                      right_ts="ts").df.collect()}
    assert out == {"l0": None, "l1": "r1"}
