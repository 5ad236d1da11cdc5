"""dedup.corpus_diff: snapshot-to-snapshot added/removed/changed audit."""

from pyspark.sql import functions as F

from scalding_spark.functions import dedup


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _diff(spark, old_rows, new_rows):
    got = dedup.corpus_diff(_mk(spark, old_rows), _mk(spark, new_rows),
                            "doc_id").collect()
    return {r["doc_id"]: r["status"] for r in got}


def test_all_four_statuses(spark):
    old = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    new = [(2, "b"), (3, "c CHANGED"), (5, "e")]
    assert _diff(spark, old, new) == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "removed",
        5: "added"}


def test_null_text_semantics(spark):
    # NULL → NULL compares equal (eqNullSafe); NULL → text and
    # text → NULL are content changes; a NULL fingerprint is never
    # mistaken for a missing row.
    old = [(1, None), (2, None), (3, "x")]
    new = [(1, None), (2, "now"), (3, None), (4, None)]
    assert _diff(spark, old, new) == {
        1: "unchanged", 2: "changed", 3: "changed", 4: "added"}


def test_compares_normalized_fingerprints_not_raw_text(spark):
    # case/punctuation/whitespace-only edits are NOT changes — the same
    # normalize_for_fingerprint contract as exact_dedup/dedup_against.
    old = [(1, "Hello, World!"), (2, "a b")]
    new = [(1, "hello world"), (2, "a  B..")]
    assert _diff(spark, old, new) == {1: "unchanged", 2: "unchanged"}


def test_empty_sides(spark):
    old = [(1, "a")]
    assert _diff(spark, old, []) == {1: "removed"}
    assert _diff(spark, [], old) == {1: "added"}
    assert _diff(spark, [], []) == {}


def test_plan_is_jvm_only_and_schema_is_key_status(spark):
    old = _mk(spark, [(i, f"t{i}") for i in range(10)])
    new = _mk(spark, [(i, f"t{i}") for i in range(5, 15)])
    out = dedup.corpus_diff(old, new, "doc_id")
    assert out.columns == ["doc_id", "status"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan


# -- property: statuses match a pure-Python mirror on random snapshots --------

from hypothesis import given, settings, strategies as st
import re as _re

_TEXTS = st.one_of(st.none(), st.sampled_from(
    ["alpha beta", "ALPHA, beta!", "gamma", "gamma delta", "", "  ", "x"]))
_SNAP = st.dictionaries(st.integers(0, 12), _TEXTS, max_size=10)


def _norm(t):
    return _re.sub(r"[^a-z0-9]+", " ", t.lower()).strip() if t is not None \
        else None


def _py_diff(old, new):
    out = {}
    for k in old.keys() | new.keys():
        if k not in old:
            out[k] = "added"
        elif k not in new:
            out[k] = "removed"
        elif _norm(old[k]) == _norm(new[k]):
            out[k] = "unchanged"
        else:
            out[k] = "changed"
    return out


@settings(max_examples=25, deadline=None)
@given(old=_SNAP, new=_SNAP)
def test_diff_matches_python_mirror(spark, old, new):
    got = _diff(spark, list(old.items()), list(new.items()))
    assert got == _py_diff(old, new), (old, new)


# -- contamination_report: the audit complement of decontaminate --------------

def test_contamination_report_counts_and_zero_rows(spark):
    from pyspark.sql import functions as F
    corpus = _mk(spark, [
        (1, "alpha beta gamma delta"),          # shares 'alpha beta gamma' path? n=2 below
        (2, "alpha beta something else"),
        (3, "totally unrelated words here"),
        (4, None),
    ])
    bench = spark.createDataFrame(
        [(100, "alpha beta"), (200, "never seen phrase"), (300, None)],
        "bench_id long, text string")
    got = {r["bench_id"]: (r["n_corpus_docs"], r["n_shared_ngrams"])
           for r in dedup.contamination_report(
               corpus, bench, "text", "doc_id", "bench_id", n=2).collect()}
    # 'alpha beta' (one 2-gram) appears in docs 1 and 2
    assert got[100] == (2, 1)
    # clean and NULL-text benchmark items are PRESENT with zeros
    assert got[200] == (0, 0) and got[300] == (0, 0)


def test_contamination_report_plan_broadcasts_bench(spark):
    corpus = _mk(spark, [(i, f"w{i} x{i} y{i}") for i in range(20)])
    bench = spark.createDataFrame([(1, "w3 x3 y3")],
                                  "bench_id long, text string")
    out = dedup.contamination_report(corpus, bench, "text", "doc_id",
                                     "bench_id", n=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
