"""Classifier evaluation at corpus scale — the audit half of the
quality-model surface (text.py's ``train_logistic_quality`` /
``linear_quality_score``): a pipeline that trains and applies quality
filters over 100 TB needs to MEASURE them on held-out labels at the same
scale it applies them, or the filter's quality is folklore.

No reference analog (the reference ships no eval ops; this module is
part of the LLM-pipeline extension surface, like dedup.py/sampling.py).

Determinism contract (the same one train_logistic_quality pins): every
metric is accumulated in EXACT integer / decimal arithmetic — rank and
marginal PRODUCTS in DECIMAL(38,0) (wrap-free where BIGINT silently
wraps past 2⁶³, ~3e9 judged rows for the rank identity — ADVICE r09),
tie-class counts as BIGINTs, score sums as DECIMAL(27,9) — with one
IEEE division at the end, so results are bit-identical under any
partition layout and across engines (the driver's value-hash gate
compares against DuckDB).

Scale shapes:

- :func:`roc_auc` never globally sorts rows: it aggregates per DISTINCT
  score (one shuffle), then runs the key-less range-partition
  prefix-offset pattern (grouping.py's ``SortedGroup`` machinery — ties
  co-locate by construction, per-partition windows run in parallel, and
  only a #partitions-row offsets table crosses a single-task window);
- :func:`pr_auc` shares roc_auc's shape with the cumulative direction
  flipped (thresholds sweep descending);
- :func:`calibration_bins` / :func:`confusion_at` /
  :func:`threshold_sweep` are single partial-aggregated passes (bins /
  thresholds are plan literals), map-side combined like any groupBy;
- :func:`cohens_kappa` is one category-pair groupBy plus tiny marginal
  aggregations of the (persisted) pair table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# exact decimal accumulator for score sums: 9 fractional digits (the
# train_logistic_quality grad_decimals convention), 18 integral — sums of
# 1e12 unit-scale scores stay exact
_DEC = "decimal(27,9)"

# wide-count operand: BIGINT → DECIMAL(19,0), so products of two counts
# land in DECIMAL(38,0) EXACTLY (wrap-free up to ~9.2e18 per operand).
# The same products in BIGINT silently wrap past 2⁶³ in non-ANSI mode —
# for the rank identity that's only ~3e9 judged rows (s2 ≈ n²), squarely
# reachable at 100 TB. Decimal overflow past 38 digits (n ≳ 7e18 rows)
# returns NULL rather than a wrong number — loud, not silent.
_D19 = "decimal(19,0)"
_DEC0 = "decimal(38,0)"


def _wide(c: Column) -> Column:
    return c.cast(_D19)


def _scored(df: DataFrame, score_col: str, label_col: str,
            by: list[str] | None = None) -> DataFrame:
    """(s, y) pairs with NULL scores/labels dropped: a row without a score
    cannot be ranked, a row without a label cannot be judged — standard
    eval practice, documented rather than silent (the row counts the
    metrics return are counts of JUDGED rows)."""
    y = F.col(label_col).cast("int")
    return (df.where(F.col(score_col).isNotNull() & y.isNotNull())
            .select(*(by or []), F.col(score_col).alias("s"), y.alias("y")))


def _score_cum(t: DataFrame, desc: bool = False,
               by: list[str] | None = None) -> DataFrame:
    """Per-DISTINCT-score tie classes with cumulative counts, computed in
    parallel: groupBy([by,] s) (the one data-sized shuffle) →
    range-partition by (by, score) → per-(partition, slice) window
    cumulatives + a small per-(partition, slice) prefix-offset table
    (grouping.py's key-less range-partition pattern; the persist freezes
    the partition universe the data and offsets branches must share —
    SCALING.md's 10× lesson). Returns one row per distinct ([by,] score)
    with ``(*by, n, np, cb, cpt, cnt)``: class size, class positives,
    count BEFORE this class, positives/count THROUGH this class —
    cumulative WITHIN the slice in ascending score order, or descending
    when ``desc`` (the threshold direction PR metrics sweep).

    With ``by``, no task is ever sized by a slice's full distinct-score
    table: the cumulative windows partition by (partition-id, slice), so
    a dominant slice with continuous scores spreads across the range
    partitions like any other data, and only the offsets table — one row
    per (partition, slice) pair actually touched, two BIGINTs wide —
    crosses the per-slice sequential window."""
    from scalding_spark.session import register_persisted
    by = list(by or [])
    g = t.groupBy(*by, "s").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("y").alias("np"))
    order = F.col("s").desc() if desc else F.col("s").asc()
    d = (g.repartitionByRange(*[F.col(k) for k in by], order)
         .withColumn("__pid", F.spark_partition_id()).persist())
    register_persisted(d)
    w = Window.partitionBy("__pid", *by).orderBy(order)
    before = w.rowsBetween(Window.unboundedPreceding, -1)
    thru = w.rowsBetween(Window.unboundedPreceding, 0)
    local = (d.withColumn("__lb", F.coalesce(F.sum("n").over(before), F.lit(0)))
             .withColumn("__lpt", F.sum("np").over(thru))
             .withColumn("__lnt", F.sum("n").over(thru)))
    offw = (Window.partitionBy(*by).orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (d.groupBy("__pid", *by)
            .agg(F.sum("n").alias("__tn"), F.sum("np").alias("__tp"))
            .withColumn("__offn", F.coalesce(F.sum("__tn").over(offw), F.lit(0)))
            .withColumn("__offp", F.coalesce(F.sum("__tp").over(offw), F.lit(0)))
            .select(F.col("__pid").alias("__opid"),
                    *[F.col(k).alias(f"__o{i}") for i, k in enumerate(by)],
                    "__offn", "__offp"))
    if by:
        # NULL-safe slice-key equality: a NULL slice key is its own group
        # (the module rule); a name-list join would silently drop it.
        # Both sides descend from the persisted ``d`` (a self-join), so
        # the offsets keys are RENAMED before the condition — dataframe-
        # qualified columns resolve trivially-true on shared lineage.
        # No broadcast HINT on offs (unlike the key-less branch): offs
        # is one tiny row per (partition, slice) TOUCHED, but the slice
        # count is user data — a hint would OOM the driver at extreme
        # slice cardinalities, while AQE already converts this join to
        # broadcast-hash at runtime whenever offs is actually small
        cond = F.col("__pid") == F.col("__opid")
        for i, k in enumerate(by):
            cond = cond & F.col(k).eqNullSafe(F.col(f"__o{i}"))
        joined = (local.join(offs, cond)
                  .drop("__opid", *[f"__o{i}" for i in range(len(by))]))
    else:
        joined = local.join(
            F.broadcast(offs.withColumnRenamed("__opid", "__pid")), "__pid")
    return joined.select(
        *by, "n", "np",
        (F.col("__offn") + F.col("__lb")).alias("cb"),
        (F.col("__offp") + F.col("__lpt")).alias("cpt"),
        (F.col("__offn") + F.col("__lnt")).alias("cnt"))


def roc_auc(df: DataFrame, score_col: str, label_col: str,
            by: list[str] | None = None) -> DataFrame:
    """Exact ROC-AUC and KS statistic → ONE row
    ``(n_pos, n_neg, auc, ks)``, or one row PER GROUP
    ``(*by, n_pos, n_neg, auc, ks)`` when ``by`` names slice columns —
    the form a quality filter is actually audited in (per language, per
    source domain): a global 0.9 AUC routinely hides a coin-flip slice.

    AUC is the Mann-Whitney form with full tie correction: with average
    rank r̄_i over ascending scores, AUC = (Σ_pos r̄ − n⁺(n⁺+1)/2) /
    (n⁺·n⁻). KS = max_s |TPR(s) − FPR(s)| over score thresholds.

    Exactness: per tie class (cum_before, n, n_pos) are BIGINTs, so
    2·Σ_pos r̄ = Σ_class n_pos·(2·cum_before + n + 1) is an exact integer
    sum, and the KS numerator |cum_pos·n⁻ − cum_neg·n⁺| is integer too;
    each metric is ONE double division at the end. Either class empty →
    AUC/KS are NULL (undefined, not 0 — an all-positive eval slice is an
    upstream bug worth surfacing).

    Scale: groupBy(score) is the only data-sized shuffle; the cumulative
    counts run per range-partition in parallel with a broadcast
    #partitions-row prefix-offset table (grouping.py's key-less pattern,
    including its frozen-pid persist — the data and offsets branches must
    see the same partition universe, SCALING.md's 10× lesson). Heavy tie
    classes (quantized scores) are exactly the case this wins: one row
    per DISTINCT score, never one partition per tie class.

    Grouped form (``by=[...]``): the cumulatives use the SAME
    range-partition prefix-offset machinery, range-partitioned on
    (slice, score) with windows per (partition, slice) — a dominant
    slice with continuous scores spreads across partitions like any
    other data; no task is ever sized by a slice's full distinct-score
    table. NULL slice keys form their own group (a missing ``lang`` is a
    slice worth auditing, not a row to drop); slices with one label
    class report NULL auc/ks. Zero judged rows → zero result rows (there
    is no slice universe to report over).

    Wrap safety (ADVICE r09): every product in the rank identity runs in
    DECIMAL(38,0) — the BIGINT form silently wrapped past 2⁶³, which for
    s2 ≈ n² is only ~3e9 judged rows. Past 38 digits (~7e18 rows) the
    decimal overflows to NULL — loud, never silently wrong.
    """
    if by:
        return _roc_auc_by(df, score_col, label_col, list(by))
    t = _scored(df, score_col, label_col)
    cls = _score_cum(t)
    tot = F.broadcast(t.agg(F.coalesce(F.sum("y"), F.lit(0)).alias("__npos"),
                            F.count(F.lit(1)).alias("__nall")))
    npos, nall = F.col("__npos"), F.col("__nall")
    nneg = nall - npos
    agg = (cls.crossJoin(tot)
           .groupBy("__npos", "__nall")
           .agg(F.sum(_wide(F.col("np"))
                      * _wide(2 * F.col("cb") + F.col("n") + 1))
                .alias("__s2"),
                F.max(F.abs(_wide(F.col("cpt")) * _wide(nneg)
                            - _wide(F.col("cnt") - F.col("cpt"))
                            * _wide(npos)))
                .alias("__ksn")))
    defined = (npos > 0) & (nneg > 0)
    # doubling AFTER the cast is bit-identical to casting 2·p while p
    # fits a BIGINT (×2.0 only bumps the exponent) and wrap-free when it
    # doesn't — the denominator products stay in DECIMAL(38,0)
    one = (agg.select(
        npos.alias("n_pos"), nneg.alias("n_neg"),
        F.when(defined,
               (F.col("__s2") - _wide(npos) * _wide(npos + 1)).cast("double")
               / (F.lit(2.0) * (_wide(npos) * _wide(nneg)).cast("double")))
        .alias("auc"),
        F.when(defined, F.col("__ksn").cast("double")
               / (_wide(npos) * _wide(nneg)).cast("double")).alias("ks")))
    # zero judged rows → the groupBy above yields NO row; the contract is
    # always-one-row (callers read metrics positionally)
    empty = tot.where(nall == 0).select(
        npos.alias("n_pos"), (nall - npos).alias("n_neg"),
        F.lit(None).cast("double").alias("auc"),
        F.lit(None).cast("double").alias("ks"))
    return one.unionByName(empty)


def _roc_auc_by(df: DataFrame, score_col: str, label_col: str,
                by: list[str]) -> DataFrame:
    """Per-slice AUC/KS (see :func:`roc_auc`): same exact-integer rank
    algebra, with the per-slice cumulatives from
    :func:`_score_cum(by=...)` — the (by, score) range-partition
    prefix-offset pattern, so a dominant slice's distinct-score table
    never funnels through one window task — and the slice totals joined
    back null-safely (a NULL slice key is its own group)."""
    t = _scored(df, score_col, label_col, by)
    c = _score_cum(t, by=by)
    tot = t.groupBy(*by).agg(F.sum("y").alias("__npos"),
                             F.count(F.lit(1)).alias("__nall"))
    # NULL-safe join keys: a NULL slice key is its own group (groupBy
    # already treats it so); a plain equi-join would silently drop it
    tot = tot.select(*[F.col(k).alias(f"__k{i}")
                       for i, k in enumerate(by)], "__npos", "__nall")
    cond = None
    for i, k in enumerate(by):
        e = c[k].eqNullSafe(F.col(f"__k{i}"))
        cond = e if cond is None else cond & e
    npos, nall = F.col("__npos"), F.col("__nall")
    nneg = nall - npos
    agg = (c.join(tot, cond)
           .drop(*[f"__k{i}" for i in range(len(by))])
           .groupBy(*by, "__npos", "__nall")
           .agg(F.sum(_wide(F.col("np"))
                      * _wide(2 * F.col("cb") + F.col("n") + 1))
                .alias("__s2"),
                F.max(F.abs(_wide(F.col("cpt")) * _wide(nneg)
                            - _wide(F.col("cnt") - F.col("cpt"))
                            * _wide(npos)))
                .alias("__ksn")))
    defined = (npos > 0) & (nneg > 0)
    return agg.select(
        *by,
        npos.alias("n_pos"), nneg.alias("n_neg"),
        F.when(defined,
               (F.col("__s2") - _wide(npos) * _wide(npos + 1)).cast("double")
               / (F.lit(2.0) * (_wide(npos) * _wide(nneg)).cast("double")))
        .alias("auc"),
        F.when(defined, F.col("__ksn").cast("double")
               / (_wide(npos) * _wide(nneg)).cast("double")).alias("ks"))


def pr_auc(df: DataFrame, score_col: str, label_col: str,
           by: list[str] | None = None) -> DataFrame:
    """Area under the precision-recall curve (average precision, the
    step-interpolated sklearn AP form) → ONE row
    ``(n_pos, n_neg, pr_auc)``, or one row PER GROUP with ``by=``.

    The metric an IMBALANCED quality filter is actually audited with:
    corpus quality labels are routinely 1-to-100 skewed, where ROC-AUC
    flatters (the FPR denominator is the huge negative class) and
    PR-AUC degrades honestly with precision.

    AP = Σ over distinct-score threshold classes of
    (ΔRecall · Precision) = (1/n⁺) · Σ_classes np · TP(s) / CNT(s),
    sweeping thresholds DESCENDING (TP(s)/CNT(s) = positives/rows with
    score ≥ s). Tie classes collapse to one term by construction, the
    sklearn tie convention.

    Determinism (the module contract, calibration_bins' recipe): TP and
    CNT are exact BIGINTs; each class contributes ONE double division —
    np·TP computed wrap-free in DECIMAL(38,0) over CNT (exact to the
    last bit while np·TP ≤ 2⁵³, i.e. ≲9e7 rows tied at one positive
    score; beyond that the division rounds at the 53rd bit, a relative
    1e-16, never a wrong magnitude — ADVICE r09) — tie-rounded to
    DECIMAL(27,9) and summed EXACTLY (layout-independent), with one
    final double division by n⁺. Cross-engine the double→decimal cast
    is a tie-round at the 10th digit (engines can disagree on exact
    half-way ties — the calibration_bins caveat); within one engine any
    input is bit-stable.

    n⁺ = 0 (no positives, including zero judged rows) → pr_auc NULL
    (undefined, not 0); n⁻ = 0 gives 1.0 naturally (precision is 1 at
    every threshold). Always ≥1 row globally (the roc_auc empty-branch
    contract); per-slice, every judged slice reports.

    Scale: identical shape to :func:`roc_auc` — groupBy(score) is the
    only data-sized shuffle, cumulatives run per range-partition in
    parallel (``_score_cum(desc=True)``); the grouped form
    range-partitions on (slice, score), so no task is ever sized by a
    slice's distinct-score table."""
    if by:
        return _pr_auc_by(df, score_col, label_col, list(by))
    t = _scored(df, score_col, label_col)
    cls = _score_cum(t, desc=True)  # cpt/cnt = TP/COUNT at score ≥ s
    tot = F.broadcast(t.agg(F.coalesce(F.sum("y"), F.lit(0)).alias("__npos"),
                            F.count(F.lit(1)).alias("__nall")))
    npos, nall = F.col("__npos"), F.col("__nall")
    term = _ap_term()
    agg = (cls.crossJoin(tot)
           .groupBy("__npos", "__nall")
           .agg(F.coalesce(F.sum(term), F.lit(0).cast(_DEC)).alias("__ap")))
    one = agg.select(
        npos.alias("n_pos"), (nall - npos).alias("n_neg"),
        F.when(npos > 0, F.col("__ap").cast("double") / npos.cast("double"))
        .alias("pr_auc"))
    empty = tot.where(nall == 0).select(
        npos.alias("n_pos"), (nall - npos).alias("n_neg"),
        F.lit(None).cast("double").alias("pr_auc"))
    return one.unionByName(empty)


def _ap_term() -> Column:
    """One tie class's AP contribution: np·TP as an exact DECIMAL(38,0)
    product (wrap-free where the BIGINT form wrapped past ~3e9 tied
    positives — ADVICE r09), one double division by CNT, tie-rounded to
    DECIMAL(27,9). Exact while np·TP ≤ 2⁵³ (~9e7 heavily-tied rows);
    above that the product itself never wraps but the double division
    rounds at the 53rd bit — a relative 1e-16 on the term, never a wrong
    order of magnitude."""
    return F.when(F.col("np") > 0,
                  ((_wide(F.col("np")) * _wide(F.col("cpt"))).cast("double")
                   / F.col("cnt").cast("double")).cast(_DEC))


def _pr_auc_by(df: DataFrame, score_col: str, label_col: str,
               by: list[str]) -> DataFrame:
    """Per-slice AP (see :func:`pr_auc`): descending per-slice
    cumulatives from :func:`_score_cum(desc=True, by=...)` — the
    (by, score) range-partition prefix-offset pattern, no slice-sized
    window task — with slice totals joined back null-safely; the
    _roc_auc_by machinery with the threshold direction flipped."""
    t = _scored(df, score_col, label_col, by)
    c = _score_cum(t, desc=True, by=by)
    tot = t.groupBy(*by).agg(F.sum("y").alias("__npos"),
                             F.count(F.lit(1)).alias("__nall"))
    tot = tot.select(*[F.col(k).alias(f"__k{i}")
                       for i, k in enumerate(by)], "__npos", "__nall")
    cond = None
    for i, k in enumerate(by):
        e = c[k].eqNullSafe(F.col(f"__k{i}"))
        cond = e if cond is None else cond & e
    npos, nall = F.col("__npos"), F.col("__nall")
    term = _ap_term()
    agg = (c.join(tot, cond)
           .drop(*[f"__k{i}" for i in range(len(by))])
           .groupBy(*by, "__npos", "__nall")
           .agg(F.coalesce(F.sum(term), F.lit(0).cast(_DEC)).alias("__ap")))
    return agg.select(
        *by,
        npos.alias("n_pos"), (nall - npos).alias("n_neg"),
        F.when(npos > 0, F.col("__ap").cast("double") / npos.cast("double"))
        .alias("pr_auc"))


def cohens_kappa(df: DataFrame, rater_a: str, rater_b: str,
                 by: list[str] | None = None) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two raters →
    ONE row ``(n, po, pe, kappa)``, or one row PER GROUP with ``by=``.

    The label-QA metric for the human/model annotations that feed
    quality classifiers (train_logistic_quality's labels): raw percent
    agreement flatters whenever one category dominates; kappa subtracts
    the agreement two INDEPENDENT raters with the same marginals would
    reach by chance (κ = (p_o − p_e)/(1 − p_e)).

    Exactness (the module contract): with n judged rows, per-category
    marginals a_k/b_k, and agree = Σ_k diag_k, the identity
    κ = (n·agree − Σ_k a_k·b_k) / (n² − Σ_k a_k·b_k) makes numerator
    and denominator exact integers, computed in DECIMAL(38,0) — in
    BIGINT, n² silently wraps past n ≈ 3.04e9 judged rows (ADVICE r09);
    the decimal form is wrap-free to n ≈ 9.2e18 and overflows to NULL,
    never a wrong number, beyond. κ, p_o = agree/n and
    p_e = Σ a_k b_k / n² are each ONE double division, bit-identical
    under any partition layout and across engines. Ratings compare by
    VALUE (cast to string so heterogeneous label types still pair);
    rows where either rating is NULL are unjudged and dropped — n
    counts judged rows. Both raters constant AND equal → p_e = 1 and κ
    is NULL (0/0: agreement indistinguishable from chance); zero judged
    rows → the always-one-row contract (n=0, NULL metrics). NULL slice
    keys form their own group in the ``by=`` form (the roc_auc rule).

    Scale: one groupBy((a, b) pair) over the corpus — category-pair
    cardinality rows, map-side combined; the marginal products reduce
    driver-free via two more tiny aggregations of that pair table. The
    pair table is PERSISTED (the roc_auc pattern): the marginals, the
    agreement sum, and the empty branch are four consumers, and without
    the persist each re-runs the corpus scan — one scan instead of
    four. No data-sized exchange beyond the first groupBy."""
    if by:
        return _cohens_kappa_by(df, rater_a, rater_b, list(by))
    from scalding_spark.session import register_persisted
    a = F.col(rater_a).cast("string")
    b = F.col(rater_b).cast("string")
    t = (df.where(a.isNotNull() & b.isNotNull())
         .select(a.alias("__a"), b.alias("__b")))
    pairs = t.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("c")) \
        .persist()
    register_persisted(pairs)
    am = pairs.groupBy("__a").agg(F.sum("c").alias("ak"))
    bm = pairs.groupBy("__b").agg(F.sum("c").alias("bk"))
    prod = (am.join(bm, am["__a"] == bm["__b"])
            .agg(F.coalesce(F.sum(_wide(F.col("ak")) * _wide(F.col("bk"))),
                            F.lit(0).cast(_DEC0)).alias("__pab")))
    agg = pairs.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("__n"),
        F.coalesce(F.sum(F.when(F.col("__a") == F.col("__b"),
                                F.col("c"))), F.lit(0)).alias("__agree"))
    n, agree, pab = F.col("__n"), F.col("__agree"), F.col("__pab")
    one = (agg.crossJoin(F.broadcast(prod))
           .where(n > 0)
           .select(n.alias("n"), *_kappa_cols(n, agree, pab)))
    empty = agg.where(n == 0).select(
        n.alias("n"), F.lit(None).cast("double").alias("po"),
        F.lit(None).cast("double").alias("pe"),
        F.lit(None).cast("double").alias("kappa"))
    return one.unionByName(empty)


def _kappa_cols(n: Column, agree: Column, pab: Column) -> list[Column]:
    """po/pe/kappa from the identity's exact integers. The identity's
    products (n², n·agree, Σ aₖbₖ) run in DECIMAL(38,0): BIGINT wraps
    silently past n ≈ 3.04e9 judged rows (ADVICE r09); decimal is
    wrap-free to ~9.2e18 and NULLs (loudly) past 38 digits. One double
    division per metric — bit-identical under any layout."""
    n2 = _wide(n) * _wide(n)
    na = _wide(n) * _wide(agree)
    return [
        (agree.cast("double") / n.cast("double")).alias("po"),
        (pab.cast("double") / n2.cast("double")).alias("pe"),
        F.when(n2 - pab != 0,
               (na - pab).cast("double")
               / (n2 - pab).cast("double")).alias("kappa"),
    ]


def _cohens_kappa_by(df: DataFrame, rater_a: str, rater_b: str,
                     by: list[str]) -> DataFrame:
    """Per-slice kappa (see :func:`cohens_kappa`): the pair table,
    marginals, and products all carry the slice key; every judged slice
    reports one row — INCLUDING slices whose two raters share no
    categories (Σ aₖbₖ has no terms → p_e = 0, κ = p_o; the final join
    is a LEFT join with __pab coalesced to 0, mirroring the global
    form's coalesce — an inner join silently dropped such slices,
    ADVICE r09 high). The marginal product joins null-safely on the
    slice key (NULL keys are their own group). The per-slice pair
    table persists for the same four-consumer reason as the global
    form."""
    from scalding_spark.session import register_persisted
    a = F.col(rater_a).cast("string")
    b = F.col(rater_b).cast("string")
    t = (df.where(a.isNotNull() & b.isNotNull())
         .select(*by, a.alias("__a"), b.alias("__b")))
    pairs = (t.groupBy(*by, "__a", "__b")
             .agg(F.count(F.lit(1)).alias("c")).persist())
    register_persisted(pairs)
    am = pairs.groupBy(*by, "__a").agg(F.sum("c").alias("ak"))
    bm = (pairs.groupBy(*by, "__b").agg(F.sum("c").alias("bk"))
          .select(*[F.col(k).alias(f"__k{i}") for i, k in enumerate(by)],
                  "__b", "bk"))
    cond = am["__a"] == bm["__b"]
    for i, k in enumerate(by):
        cond = cond & am[k].eqNullSafe(F.col(f"__k{i}"))
    prod = (am.join(bm, cond)
            .groupBy(*[am[k] for k in by])
            .agg(F.sum(_wide(F.col("ak")) * _wide(F.col("bk")))
                 .alias("__pab")))
    agg = pairs.groupBy(*by).agg(
        F.sum("c").alias("__n"),
        F.coalesce(F.sum(F.when(F.col("__a") == F.col("__b"),
                                F.col("c"))), F.lit(0)).alias("__agree"))
    prod = prod.select(*[F.col(k).alias(f"__j{i}")
                         for i, k in enumerate(by)], "__pab")
    cond = None
    for i, k in enumerate(by):
        e = agg[k].eqNullSafe(F.col(f"__j{i}"))
        cond = e if cond is None else cond & e
    n, agree = F.col("__n"), F.col("__agree")
    # LEFT join: a slice with disjoint rater category sets has NO
    # marginal-product row (the am×bm join matched nothing) — it is
    # still a judged slice and must report, with Σ aₖbₖ = 0
    pab = F.coalesce(F.col("__pab"), F.lit(0).cast(_DEC0))
    return (agg.join(prod, cond, "left")
            .drop(*[f"__j{i}" for i in range(len(by))])
            .select(*by, n.alias("n"), *_kappa_cols(n, agree, pab)))


def calibration_bins(df: DataFrame, score_col: str, label_col: str,
                     bins: int = 10,
                     by: list[str] | None = None) -> DataFrame:
    """Reliability-diagram table for a probability-scored classifier →
    ``(bin, n, pos, frac_pos, mean_score)``, one row per OCCUPIED bin of
    [0,1) split ``bins`` ways (scores of exactly 1.0 land in the top bin).

    A calibrated filter has frac_pos ≈ mean_score per bin; systematic gaps
    mean the score is a ranking, not a probability — which changes how a
    mixing policy may use it (temperature_mix assumes calibrated weights).

    mean_score accumulates as DECIMAL(27,9) (exact integer arithmetic
    underneath — layout-independent, the train_logistic_quality
    fixed-point convention) with one final double division; frac_pos is an
    integer ratio. For cross-ENGINE bit-parity feed scores representable
    in ≤9 decimal digits (the double→decimal cast is a tie-round at the
    10th digit, and engines disagree on ties); within one engine any
    score is deterministic. One partial-aggregated pass; bin count is a
    literal.

    Grouped form (``by=[...]``, r10): one row per OCCUPIED (slice, bin)
    — a filter calibrated globally is routinely mis-calibrated per
    language/source, which silently breaks any per-slice use of its
    scores as probabilities. Still ONE partial-aggregated pass (the
    slice key just joins the grouping); NULL slice keys are their own
    group (the module rule); zero judged rows → zero rows (no slice
    universe).
    """
    if bins < 1:
        raise ValueError(f"bins={bins}: want >= 1")
    by = list(by or [])
    t = _scored(df, score_col, label_col, by)
    b = F.least(F.floor(F.col("s") * bins).cast("int"), F.lit(bins - 1))
    return (t.groupBy(*by, b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("y").alias("pos"),
                 F.sum(F.col("s").cast(_DEC)).alias("__ssum"))
            .select(*by, "bin", "n", "pos",
                    (F.col("pos").cast("double") / F.col("n").cast("double"))
                    .alias("frac_pos"),
                    (F.col("__ssum").cast("double") / F.col("n").cast("double"))
                    .alias("mean_score")))


def confusion_at(df: DataFrame, score_col: str, label_col: str,
                 threshold: float,
                 by: list[str] | None = None) -> DataFrame:
    """Confusion matrix + derived rates at ONE decision threshold
    (predict positive iff score ≥ threshold) → one row ``(threshold, tp,
    fp, tn, fn, precision, recall, f1, accuracy)`` — INCLUDING on zero
    judged rows (all-zero counts, NULL rates; the sweep's empty branch).
    Rates with an empty denominator are NULL. Exactly
    :func:`threshold_sweep` at a single literal; one aggregated pass.

    With ``by=[...]``: one row per JUDGED slice — and, per the by-form
    rule (see threshold_sweep), zero judged rows yield ZERO rows, not
    the global form's always-one-row branch (there is no slice universe
    to report over)."""
    return threshold_sweep(df, score_col, label_col, [threshold], by=by)


def threshold_sweep(df: DataFrame, score_col: str, label_col: str,
                    thresholds: list[float],
                    by: list[str] | None = None) -> DataFrame:
    """Operating-characteristic sweep: one confusion row PER candidate
    threshold — how a filter cutoff is actually chosen (pick recall floor,
    read off precision).

    Plan: the corpus aggregates per DISTINCT score once (the roc_auc
    shuffle); the per-score table then cross-joins the LITERAL threshold
    array and re-aggregates — corpus cost is independent of len(thresholds),
    the second pass is |distinct scores| × |thresholds| on two BIGINTs.
    All counts exact; each rate is one final division.

    ALWAYS len(thresholds) rows, the roc_auc contract (callers read one
    row per cutoff positionally): zero JUDGED rows (empty input, or all
    scores/labels NULL) yields one all-zero-counts / NULL-rates row per
    threshold via an explicit empty branch — without it the empty
    per-score table never explodes and the sweep silently vanished
    (ADVICE r08 #3).

    Grouped form (``by=[...]``, r10): one row per (judged slice,
    threshold) — the cutoff a filter ships globally is rarely the right
    operating point per slice. Every JUDGED slice reports all
    len(thresholds) rows by construction (the explode runs per
    distinct-score row, every judged slice has one); zero judged rows →
    zero rows (no slice universe — the by-form rule), so the global
    empty branch stays global-only."""
    if not thresholds:
        raise ValueError("thresholds: want at least one cutoff")
    if len({float(x) for x in thresholds}) != len(thresholds):
        # the explode emits one copy per list element and the groupBy
        # then MERGES them — a duplicated cutoff would silently
        # double-count every class (and the empty branch would disagree,
        # emitting one row per copy)
        raise ValueError("thresholds: duplicate cutoffs would "
                         "double-count; pass each threshold once")
    by = list(by or [])
    t = _scored(df, score_col, label_col, by)
    g = t.groupBy(*by, "s").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("y").alias("np"))
    th = F.explode(F.array(*[F.lit(float(x)) for x in thresholds]))
    pos_pred = F.col("s") >= F.col("threshold")
    agg = (g.select(*by, "s", "n", "np", th.alias("threshold"))
           .groupBy(*by, "threshold")
           .agg(F.coalesce(F.sum(F.when(pos_pred, F.col("np"))), F.lit(0)).alias("tp"),
                F.coalesce(F.sum(F.when(pos_pred, F.col("n") - F.col("np"))),
                           F.lit(0)).alias("fp"),
                F.coalesce(F.sum(F.when(~pos_pred, F.col("n") - F.col("np"))),
                           F.lit(0)).alias("tn"),
                F.coalesce(F.sum(F.when(~pos_pred, F.col("np"))), F.lit(0)).alias("fn")))

    def ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den.cast("double"))

    tp, fp, tn, fn = (F.col(c) for c in ("tp", "fp", "tn", "fn"))
    filled = agg.select(
        *by, "threshold", "tp", "fp", "tn", "fn",
        ratio(tp, tp + fp).alias("precision"),
        ratio(tp, tp + fn).alias("recall"),
        ratio(2 * tp, 2 * tp + fp + fn).alias("f1"),
        ratio(tp + tn, tp + fp + tn + fn).alias("accuracy"))
    if by:
        return filled
    # zero judged rows → g is empty and the explode never happens; the
    # contract is one row per threshold regardless (roc_auc's empty
    # branch, ADVICE r08 #3): all counts 0, every rate NULL (0/0)
    zero = F.lit(0).cast("bigint")
    nul = F.lit(None).cast("double")
    empty = (t.agg(F.count(F.lit(1)).alias("__nall"))
             .where(F.col("__nall") == 0)
             .select(th.alias("threshold"))
             .select("threshold", zero.alias("tp"), zero.alias("fp"),
                     zero.alias("tn"), zero.alias("fn"),
                     nul.alias("precision"), nul.alias("recall"),
                     nul.alias("f1"), nul.alias("accuracy")))
    return filled.unionByName(empty)
