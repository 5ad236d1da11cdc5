"""Classifier-evaluation ops (functions/evaluation.py) vs pure-Python
mirrors — exact AUC/KS with ties, calibration bins, threshold sweeps —
plus the degenerate axes (empty input, one-class labels, NULLs)."""

import math

import pytest
from pyspark.sql import functions as F

from scalding_spark.functions import evaluation as ev


def _py_auc_ks(pairs):
    """Reference AUC (tie-corrected Mann-Whitney) + KS on (score, y)."""
    pairs = [(s, y) for s, y in pairs if s is not None and y is not None]
    npos = sum(y for _, y in pairs)
    nneg = len(pairs) - npos
    if npos == 0 or nneg == 0:
        return npos, nneg, None, None
    ss = sorted(pairs)
    # average ranks over ties
    i, rank_sum_pos = 0, 0.0
    while i < len(ss):
        j = i
        while j < len(ss) and ss[j][0] == ss[i][0]:
            j += 1
        avg_rank = (i + 1 + j) / 2.0  # ranks i+1..j
        rank_sum_pos += avg_rank * sum(y for _, y in ss[i:j])
        i = j
    auc = (rank_sum_pos - npos * (npos + 1) / 2.0) / (npos * nneg)
    ks, cp, cn = 0.0, 0, 0
    i = 0
    while i < len(ss):
        j = i
        while j < len(ss) and ss[j][0] == ss[i][0]:
            j += 1
        cp += sum(y for _, y in ss[i:j])
        cn += sum(1 - y for _, y in ss[i:j])
        ks = max(ks, abs(cp / npos - cn / nneg))
        i = j
    return npos, nneg, auc, ks


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "s double, y int")


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_auc_perfect_and_reversed(spark):
    pairs = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    r = _one(ev.roc_auc(_df(spark, pairs), "s", "y"))
    assert (r.n_pos, r.n_neg, r.auc, r.ks) == (50, 50, 1.0, 1.0)
    rev = [(-s, y) for s, y in pairs]
    r = _one(ev.roc_auc(_df(spark, rev), "s", "y"))
    assert (r.auc, r.ks) == (0.0, 1.0)


def test_auc_all_ties_is_half(spark):
    pairs = [(1.0, i % 2) for i in range(40)]
    r = _one(ev.roc_auc(_df(spark, pairs), "s", "y"))
    assert r.auc == 0.5 and r.ks == 0.0


def test_auc_ks_match_python_mirror_with_heavy_ties(spark):
    import random
    rng = random.Random(7)
    # quantized scores → many tie classes, correlated labels
    pairs = [(round(rng.random(), 1),
              1 if rng.random() < 0.3 + 0.4 * rng.random() else 0)
             for _ in range(500)]
    npos, nneg, auc, ks = _py_auc_ks(pairs)
    r = _one(ev.roc_auc(_df(spark, pairs), "s", "y"))
    assert (r.n_pos, r.n_neg) == (npos, nneg)
    assert math.isclose(r.auc, auc, rel_tol=0, abs_tol=1e-12)
    assert math.isclose(r.ks, ks, rel_tol=0, abs_tol=1e-12)


def test_auc_partition_layout_invariant(spark):
    import random
    rng = random.Random(11)
    pairs = [(round(rng.random(), 2), rng.randint(0, 1)) for _ in range(300)]
    a = _one(ev.roc_auc(_df(spark, pairs).repartition(1), "s", "y"))
    b = _one(ev.roc_auc(_df(spark, pairs).repartition(17), "s", "y"))
    assert (a.auc, a.ks) == (b.auc, b.ks)  # bit-identical, not isclose


def test_auc_single_class_and_empty_are_null_not_zero(spark):
    r = _one(ev.roc_auc(_df(spark, [(1.0, 1), (2.0, 1)]), "s", "y"))
    assert (r.n_pos, r.n_neg, r.auc, r.ks) == (2, 0, None, None)
    r = _one(ev.roc_auc(_df(spark, []), "s", "y"))
    assert (r.n_pos, r.n_neg, r.auc, r.ks) == (0, 0, None, None)


def test_auc_null_scores_and_labels_are_dropped(spark):
    pairs = [(1.0, 0), (2.0, 1), (None, 1), (3.0, None)]
    r = _one(ev.roc_auc(_df(spark, pairs), "s", "y"))
    assert (r.n_pos, r.n_neg, r.auc) == (1, 1, 1.0)


def test_calibration_bins_counts_and_means(spark):
    # bin 0: scores .0x, bin 9: .95 and 1.0 (top-bin inclusion)
    pairs = [(0.05, 0), (0.05, 1), (0.95, 1), (1.0, 1)]
    rows = {r.bin: r for r in
            ev.calibration_bins(_df(spark, pairs), "s", "y").collect()}
    assert set(rows) == {0, 9}
    assert rows[0].n == 2 and rows[0].pos == 1 and rows[0].frac_pos == 0.5
    assert rows[0].mean_score == 0.05
    assert rows[9].n == 2 and rows[9].frac_pos == 1.0
    assert math.isclose(rows[9].mean_score, 0.975, abs_tol=1e-12)


def test_calibration_rejects_zero_bins(spark):
    with pytest.raises(ValueError):
        ev.calibration_bins(_df(spark, [(0.5, 1)]), "s", "y", bins=0)


def test_confusion_at_threshold(spark):
    pairs = [(0.9, 1), (0.8, 0), (0.4, 1), (0.1, 0)]
    r = _one(ev.confusion_at(_df(spark, pairs), "s", "y", 0.5))
    assert (r.tp, r.fp, r.tn, r.fn) == (1, 1, 1, 1)
    assert r.precision == 0.5 and r.recall == 0.5
    assert r.f1 == 0.5 and r.accuracy == 0.5


def test_sweep_matches_per_threshold_confusion_and_null_rates(spark):
    pairs = [(0.9, 1), (0.8, 0), (0.4, 1), (0.1, 0), (0.95, 1)]
    df = _df(spark, pairs)
    sweep = {r.threshold: r for r in
             ev.threshold_sweep(df, "s", "y", [0.0, 0.5, 0.99]).collect()}
    assert len(sweep) == 3
    for t, row in sweep.items():
        single = _one(ev.confusion_at(df, "s", "y", t))
        assert (row.tp, row.fp, row.tn, row.fn) == \
            (single.tp, single.fp, single.tn, single.fn)
    # threshold above every score: no predicted positives → precision NULL
    r = _one(ev.confusion_at(df, "s", "y", 2.0))
    assert r.tp == 0 and r.precision is None and r.recall == 0.0
    with pytest.raises(ValueError):
        ev.threshold_sweep(df, "s", "y", [])


def test_auc_has_no_data_sized_single_partition_window(spark):
    """The cumulative ranks must run per range-partition; the only
    single-task window is over the #partitions-row offsets table (the
    grouping.py key-less contract)."""
    pairs = [(float(i % 97), i % 2) for i in range(400)]
    plan = ev.roc_auc(_df(spark, pairs), "s", "y") \
        ._jdf.queryExecution().executedPlan().toString()
    # per-partition windows partition by __pid; the offsets window scans
    # an aggregate of __pid only — no Window over an empty partition spec
    # fed by the per-score table
    for line in plan.splitlines():
        if "Window" in line and "__pid" not in line:
            raise AssertionError(f"data-sized global window in plan: {line}")


def _gdf(spark, rows):
    return spark.createDataFrame(rows, "grp string, s double, y int")


def test_grouped_auc_matches_per_group_global(spark):
    import random
    rng = random.Random(3)
    rows = [(f"g{i % 3}", round(rng.random(), 1), rng.randint(0, 1))
            for i in range(300)]
    got = {r.grp: r for r in
           ev.roc_auc(_gdf(spark, rows), "s", "y", by=["grp"]).collect()}
    assert set(got) == {"g0", "g1", "g2"}
    for grp in got:
        sub = [(s, y) for g, s, y in rows if g == grp]
        npos, nneg, auc, ks = _py_auc_ks(sub)
        r = got[grp]
        assert (r.n_pos, r.n_neg) == (npos, nneg)
        assert math.isclose(r.auc, auc, rel_tol=0, abs_tol=1e-12)
        assert math.isclose(r.ks, ks, rel_tol=0, abs_tol=1e-12)


def test_grouped_auc_null_slice_and_one_class_slice(spark):
    rows = [("a", 1.0, 0), ("a", 2.0, 1),     # perfect slice
            (None, 1.0, 1), (None, 2.0, 0),   # NULL key, reversed
            ("b", 5.0, 1), ("b", 6.0, 1)]     # one-class slice
    got = {r.grp: r for r in
           ev.roc_auc(_gdf(spark, rows), "s", "y", by=["grp"]).collect()}
    assert set(got) == {"a", None, "b"}
    assert got["a"].auc == 1.0
    assert got[None].auc == 0.0           # NULL slice kept, not dropped
    assert got["b"].auc is None and got["b"].ks is None
    assert (got["b"].n_pos, got["b"].n_neg) == (2, 0)


def test_grouped_auc_layout_invariant(spark):
    import random
    rng = random.Random(13)
    rows = [(f"g{i % 4}", round(rng.random(), 2), rng.randint(0, 1))
            for i in range(400)]
    a = sorted((r.grp, r.auc, r.ks) for r in
               ev.roc_auc(_gdf(spark, rows).repartition(1),
                          "s", "y", by=["grp"]).collect())
    b = sorted((r.grp, r.auc, r.ks) for r in
               ev.roc_auc(_gdf(spark, rows).repartition(23),
                          "s", "y", by=["grp"]).collect())
    assert a == b  # bit-identical


# --- pr_auc / average precision (r09) ------------------------------------------

def test_pr_auc_perfect_and_all_positive(spark):
    pairs = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    r = _one(ev.pr_auc(_df(spark, pairs), "s", "y"))
    assert (r.n_pos, r.n_neg, r.pr_auc) == (50, 50, 1.0)
    # no negatives: precision is 1 at every threshold
    r = _one(ev.pr_auc(_df(spark, [(1.0, 1), (2.0, 1)]), "s", "y"))
    assert (r.n_pos, r.n_neg, r.pr_auc) == (2, 0, 1.0)


def test_pr_auc_no_positives_and_empty_are_null(spark):
    r = _one(ev.pr_auc(_df(spark, [(1.0, 0), (2.0, 0)]), "s", "y"))
    assert (r.n_pos, r.n_neg, r.pr_auc) == (0, 2, None)
    r = _one(ev.pr_auc(_df(spark, []), "s", "y"))
    assert (r.n_pos, r.n_neg, r.pr_auc) == (0, 0, None)
    # NULL scores/labels are unjudged
    r = _one(ev.pr_auc(_df(spark, [(None, 1), (3.0, None)]), "s", "y"))
    assert (r.n_pos, r.n_neg, r.pr_auc) == (0, 0, None)


def test_pr_auc_known_value_with_ties(spark):
    # desc classes: s=3 (1 pos) -> P=1, R=1/2; s=2 (1 pos, 1 neg of 2)
    # -> TP=2, CNT=3, term = 1*2/3; s=1 (neg only) -> no term
    # AP = (1*1/1 + 1*2/3) / 2 = 5/6
    pairs = [(3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)]
    r = _one(ev.pr_auc(_df(spark, pairs), "s", "y"))
    import py_reference as pr
    npos, nneg, want = pr.pr_auc_scalar(pairs)
    assert (r.n_pos, r.n_neg) == (npos, nneg) == (2, 2)
    assert r.pr_auc == want
    assert math.isclose(want, 5.0 / 6.0, rel_tol=0, abs_tol=1e-9)


def test_pr_auc_flatters_less_than_roc_on_imbalance(spark):
    """The reason the metric exists: a mediocre ranker over 1:50 labels
    keeps a high ROC-AUC while PR-AUC collapses."""
    import random
    rng = random.Random(5)
    pairs = []
    for i in range(1020):
        pos = i % 51 == 0
        s = rng.random() + (0.15 if pos else 0.0)  # weak signal
        pairs.append((round(s, 3), 1 if pos else 0))
    roc = _one(ev.roc_auc(_df(spark, pairs), "s", "y")).auc
    pr = _one(ev.pr_auc(_df(spark, pairs), "s", "y")).pr_auc
    assert roc > 0.55
    assert pr < roc - 0.2


def test_pr_auc_matches_python_mirror_bit_exactly(spark):
    """Hypothesis parity: the Spark plan and the pure-Python mirror in
    py_reference.py agree BIT-FOR-BIT (same per-class division, same
    decimal tie-round, same exact sum) on arbitrary judged corpora."""
    from hypothesis import given, settings, strategies as st
    import py_reference as pr

    pair = st.tuples(
        st.one_of(st.none(),
                  st.floats(min_value=-5, max_value=5, allow_nan=False,
                            width=32).map(lambda x: round(x, 2))),
        st.one_of(st.none(), st.integers(min_value=0, max_value=1)))

    @given(st.lists(pair, max_size=120))
    @settings(max_examples=25, deadline=None)
    def check(pairs):
        pairs = [(float(s) if s is not None else None, y)
                 for s, y in pairs]
        npos, nneg, want = pr.pr_auc_scalar(pairs)
        r = _one(ev.pr_auc(
            spark.createDataFrame(pairs, "s double, y int"), "s", "y"))
        assert (r.n_pos, r.n_neg) == (npos, nneg)
        assert r.pr_auc == want  # bit-identical, not isclose

    check()


def test_pr_auc_layout_invariant(spark):
    import random
    rng = random.Random(17)
    pairs = [(round(rng.random(), 2), rng.randint(0, 1)) for _ in range(300)]
    a = _one(ev.pr_auc(_df(spark, pairs).repartition(1), "s", "y"))
    b = _one(ev.pr_auc(_df(spark, pairs).repartition(17), "s", "y"))
    assert a.pr_auc == b.pr_auc  # bit-identical


def test_pr_auc_has_no_data_sized_single_partition_window(spark):
    pairs = [(float(i % 97), i % 2) for i in range(400)]
    plan = ev.pr_auc(_df(spark, pairs), "s", "y") \
        ._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "__pid" not in line:
            raise AssertionError(f"data-sized global window in plan: {line}")


def test_grouped_pr_auc_matches_per_group_global(spark):
    import random
    import py_reference as pr
    rng = random.Random(29)
    rows = [(f"g{i % 3}", round(rng.random(), 1), rng.randint(0, 1))
            for i in range(300)]
    got = {r.grp: r for r in
           ev.pr_auc(_gdf(spark, rows), "s", "y", by=["grp"]).collect()}
    assert set(got) == {"g0", "g1", "g2"}
    for grp in got:
        sub = [(s, y) for g, s, y in rows if g == grp]
        npos, nneg, want = pr.pr_auc_scalar(sub)
        r = got[grp]
        assert (r.n_pos, r.n_neg) == (npos, nneg)
        assert r.pr_auc == want


def test_grouped_pr_auc_null_slice_and_no_positive_slice(spark):
    rows = [("a", 1.0, 0), ("a", 2.0, 1),     # perfect slice
            (None, 1.0, 1), (None, 2.0, 0),   # NULL key, reversed
            ("b", 5.0, 0), ("b", 6.0, 0)]     # no positives
    got = {r.grp: r for r in
           ev.pr_auc(_gdf(spark, rows), "s", "y", by=["grp"]).collect()}
    assert set(got) == {"a", None, "b"}
    assert got["a"].pr_auc == 1.0
    assert got[None].pr_auc == 0.5   # pos ranked 2nd of 2: AP = 1/2
    assert got["b"].pr_auc is None
    assert (got["b"].n_pos, got["b"].n_neg) == (0, 2)


# --- cohens_kappa (r09) ---------------------------------------------------------

def _py_kappa(pairs):
    """Pure-python mirror: exact-integer kappa identity."""
    judged = [(str(a), str(b)) for a, b in pairs
              if a is not None and b is not None]
    n = len(judged)
    if n == 0:
        return 0, None, None, None
    agree = sum(1 for a, b in judged if a == b)
    am, bm = {}, {}
    for a, b in judged:
        am[a] = am.get(a, 0) + 1
        bm[b] = bm.get(b, 0) + 1
    pab = sum(am[k] * bm.get(k, 0) for k in am)
    po = agree / n
    pe = pab / (n * n)
    kappa = (n * agree - pab) / (n * n - pab) if n * n != pab else None
    return n, po, pe, kappa


def _kdf(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def test_kappa_perfect_and_independent(spark):
    pairs = [(str(i % 3), str(i % 3)) for i in range(60)]
    r = _one(ev.cohens_kappa(_kdf(spark, pairs), "a", "b"))
    assert (r.n, r.po, r.kappa) == (60, 1.0, 1.0)
    # marginals independent: po == pe exactly -> kappa 0
    pairs = [(str(i % 2), str((i // 2) % 2)) for i in range(40)]
    r = _one(ev.cohens_kappa(_kdf(spark, pairs), "a", "b"))
    assert r.kappa == 0.0


def test_kappa_matches_python_mirror_bit_exactly(spark):
    import random
    rng = random.Random(23)
    pairs = []
    for _ in range(400):
        a = rng.choice(["x", "y", "z", None])
        b = a if rng.random() < 0.6 else rng.choice(["x", "y", "z", None])
        pairs.append((a, b))
    n, po, pe, kappa = _py_kappa(pairs)
    r = _one(ev.cohens_kappa(_kdf(spark, pairs), "a", "b"))
    assert (r.n, r.po, r.pe, r.kappa) == (n, po, pe, kappa)


def test_kappa_constant_raters_and_empty(spark):
    # both raters constant and equal: pe = 1, kappa undefined -> NULL
    r = _one(ev.cohens_kappa(_kdf(spark, [("x", "x")] * 5), "a", "b"))
    assert (r.n, r.po, r.pe, r.kappa) == (5, 1.0, 1.0, None)
    r = _one(ev.cohens_kappa(_kdf(spark, []), "a", "b"))
    assert (r.n, r.po, r.pe, r.kappa) == (0, None, None, None)
    # NULL ratings are unjudged
    r = _one(ev.cohens_kappa(
        _kdf(spark, [("x", None), (None, "y"), ("x", "x")]), "a", "b"))
    assert (r.n, r.kappa) == (1, None)  # single constant pair -> pe=1


def test_kappa_heterogeneous_types_compare_by_value(spark):
    df = spark.createDataFrame([(1, "1"), (2, "2"), (3, "4")],
                               "a int, b string")
    r = _one(ev.cohens_kappa(df, "a", "b"))
    assert r.n == 3 and r.po == 2 / 3


def test_kappa_layout_invariant(spark):
    import random
    rng = random.Random(31)
    pairs = [(str(rng.randint(0, 3)), str(rng.randint(0, 3)))
             for _ in range(300)]
    x = _one(ev.cohens_kappa(_kdf(spark, pairs).repartition(1), "a", "b"))
    y = _one(ev.cohens_kappa(_kdf(spark, pairs).repartition(13), "a", "b"))
    assert (x.po, x.pe, x.kappa) == (y.po, y.pe, y.kappa)


def test_grouped_kappa_matches_per_group_global(spark):
    import random
    rng = random.Random(37)
    rows = [(rng.choice(["g0", "g1", None]),
             str(rng.randint(0, 2)), str(rng.randint(0, 2)))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "grp string, a string, b string")
    got = {r.grp: r for r in
           ev.cohens_kappa(df, "a", "b", by=["grp"]).collect()}
    assert set(got) == {"g0", "g1", None}  # NULL slice kept
    for grp in got:
        sub = [(a, b) for g, a, b in rows if g == grp]
        n, po, pe, kappa = _py_kappa(sub)
        r = got[grp]
        assert (r.n, r.po, r.pe, r.kappa) == (n, po, pe, kappa)


# --- grouped calibration / sweep (r10) ----------------------------------------

def test_calibration_by_slice_matches_per_slice_global(spark):
    rows = [("a", 0.05, 1), ("a", 0.05, 0), ("a", 0.95, 1),
            ("b", 0.5, 0), ("b", 1.0, 1), (None, 0.3, 1)]
    df = spark.createDataFrame(rows, "src string, s double, y int")
    got = {(r["src"], r["bin"]): (r["n"], r["pos"], r["frac_pos"],
                                  r["mean_score"])
           for r in ev.calibration_bins(df, "s", "y", bins=10,
                                        by=["src"]).collect()}
    keys = {r[0] for r in rows}
    assert {k[0] for k in got} == keys, "NULL slice key must report"
    for key in keys:
        cond = F.col("src").eqNullSafe(F.lit(key))
        for g in ev.calibration_bins(df.where(cond), "s", "y",
                                     bins=10).collect():
            assert got[(key, g["bin"])] == (g["n"], g["pos"], g["frac_pos"],
                                            g["mean_score"]), (key, g)


def test_sweep_by_slice_matches_per_slice_global(spark):
    rows = [("a", 0.2, 1), ("a", 0.7, 0), ("b", 0.9, 1), (None, 0.4, 0)]
    df = spark.createDataFrame(rows, "src string, s double, y int")
    ths = [0.25, 0.5, 0.75]
    out = ev.threshold_sweep(df, "s", "y", ths, by=["src"]).collect()
    assert len(out) == 3 * len(ths), "every judged slice reports per cutoff"
    got = {(r["src"], r["threshold"]): (r["tp"], r["fp"], r["tn"], r["fn"],
                                        r["precision"], r["recall"],
                                        r["f1"], r["accuracy"])
           for r in out}
    for key in ("a", "b", None):
        cond = F.col("src").eqNullSafe(F.lit(key))
        for g in ev.threshold_sweep(df.where(cond), "s", "y",
                                    ths).collect():
            assert got[(key, g["threshold"])] == (
                g["tp"], g["fp"], g["tn"], g["fn"], g["precision"],
                g["recall"], g["f1"], g["accuracy"]), (key, g)
    # confusion_at passes the slice through
    one = ev.confusion_at(df, "s", "y", 0.5, by=["src"]).collect()
    assert {(r["src"], r["threshold"]) for r in one} == \
        {("a", 0.5), ("b", 0.5), (None, 0.5)}


def test_grouped_calibration_and_sweep_empty_and_validation(spark):
    df = spark.createDataFrame([], "src string, s double, y int")
    assert ev.calibration_bins(df, "s", "y", by=["src"]).count() == 0
    assert ev.threshold_sweep(df, "s", "y", [0.5], by=["src"]).count() == 0
    # the GLOBAL contracts are unchanged: one row per threshold on empty
    assert ev.threshold_sweep(df, "s", "y", [0.1, 0.9]).count() == 2
    with pytest.raises(ValueError, match="bins"):
        ev.calibration_bins(df, "s", "y", bins=0, by=["src"])
    with pytest.raises(ValueError, match="threshold"):
        ev.threshold_sweep(df, "s", "y", [], by=["src"])
