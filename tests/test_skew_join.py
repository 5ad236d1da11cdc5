"""Skew-join correctness: sampled skew join output must equal the plain
join's (the reference's own criterion, SkewJoinTest.scala:100-140), on data
with a deliberately hot key."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe
from scalding_spark import joins


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 holds 50% of the left side
    left = spark.range(0, 4000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("l_val"))
    right = spark.range(0, 500).select(
        (F.col("id") % 97).alias("k"), (F.col("id") * 10).alias("r_val"))
    return Pipe(left), Pipe(right)


def agg(df):
    return sorted(tuple(r) for r in
                  df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                      F.sum("l_val").alias("sl"),
                                      F.sum("r_val").alias("sr")).collect())


def test_skew_join_equals_plain(skewed):
    left, right = skewed
    plain = agg(left.df.join(right.df, on="k"))
    # high sample rate so the tiny test data actually samples the hot key;
    # small fragments so replication really kicks in
    sk = joins.skew_join(left, right, on=["k"], sample_rate=0.5,
                         rows_per_fragment=100)
    assert agg(sk.df) == plain


def test_salted_equals_plain(skewed):
    left, right = skewed
    plain = agg(left.df.join(right.df, on="k"))
    assert agg(joins.salted_skew_join(left, right, on=["k"], salt=8).df) == plain


@pytest.mark.parametrize("repl", [
    joins.SkewReplicationA(replication_factor=1),
    joins.SkewReplicationA(replication_factor=3),
    joins.SkewReplicationB(max_keys_in_memory=50, max_reducer_output=500),
    joins.SkewReplicationB(),  # production caps: cold path on tiny data
])
def test_skew_replication_strategies_equal_plain(skewed, repl):
    # the reference's own criterion (SkewJoinTest.scala:100-140): any
    # replication policy must reproduce the plain join exactly
    left, right = skewed
    plain = agg(left.df.join(right.df, on="k"))
    sk = joins.skew_join(left, right, on=["k"], sample_rate=0.5,
                         replication=repl, reducers=8)
    assert agg(sk.df) == plain


def test_skew_replication_formulas_match_reference(spark):
    # pin the A/B arithmetic itself against hand-computed reference values
    # (SkewReplication.scala:38-66), via a literal-count DataFrame
    rows = [(0, 0), (1, 0), (0, 1), (5, 200), (200, 5), (10**7, 10**6)]
    df = spark.createDataFrame(rows, "l_cnt: long, r_cnt: long")

    def run(strategy, reducers):
        lr, rr = strategy.replications(F.col("l_cnt"), F.col("r_cnt"), reducers)
        return [tuple(r) for r in
                df.select(lr.alias("l"), rr.alias("r")).collect()]

    def ref_a(l, r, n, rf=1):
        n = n if n > 0 else 100
        left, right = min(r * rf, n), min(l * rf, n)
        return (1 if left == 0 else left, 1 if right == 0 else right)

    def ref_b(l, r, n, mkim=10**6, mro=10**7):
        n = n if n > 0 else 100
        left = max(1, r // mkim)
        right = min(n, (l * r) // (mro * left))
        return (left, 1 if right == 0 else right)

    assert run(joins.SkewReplicationA(), 0) == [ref_a(l, r, 0) for l, r in rows]
    assert run(joins.SkewReplicationA(3), 16) == [ref_a(l, r, 16, 3) for l, r in rows]
    assert run(joins.SkewReplicationB(), 0) == [ref_b(l, r, 0) for l, r in rows]
    assert run(joins.SkewReplicationB(50, 500), 8) == \
        [ref_b(l, r, 8, 50, 500) for l, r in rows]


# ---------------------------------------------------------------------------
# fuzzy_join (exact edit-distance join, PassJoin segment filter)
# ---------------------------------------------------------------------------

def _brute(spark, L, R, k):
    ldf = spark.createDataFrame(L, "lid long, ls string")
    rdf = spark.createDataFrame(R, "rid long, rs string")
    return {(r.lid, r.rid, r.d) for r in
            ldf.crossJoin(rdf)
            .withColumn("d", F.levenshtein("ls", "rs"))
            .where(F.col("d") <= k).collect()}


def _fuzzy(spark, L, R, k):
    from scalding_spark.joins import fuzzy_join
    ldf = spark.createDataFrame(L, "lid long, ls string")
    rdf = spark.createDataFrame(R, "rid long, rs string")
    out = fuzzy_join(ldf, rdf, "ls", "rs", "lid", "rid", max_distance=k).df
    return {(r.lid, r.rid, r.distance) for r in out.collect()}


def test_fuzzy_join_hand_cases(spark):
    L = [(0, "kitten"), (1, "saturday"), (2, "abc"), (3, "x")]
    R = [(10, "sitten"), (11, "sunday"), (12, "abcd"), (13, "xy"),
         (14, "kitten")]
    for k in (1, 2, 3):
        assert _fuzzy(spark, L, R, k) == _brute(spark, L, R, k), k


def test_fuzzy_join_equals_bruteforce_random(spark):
    import random
    rnd = random.Random(7)
    mk = lambda: "".join(rnd.choice("ab1") for _ in range(rnd.randint(0, 8)))
    L = [(i, mk()) for i in range(60)]
    R = [(1000 + i, mk()) for i in range(60)]
    for k in (1, 2, 3):
        assert _fuzzy(spark, L, R, k) == _brute(spark, L, R, k), k


def test_fuzzy_join_equals_bruteforce_edit_derived(spark):
    """Adversarial recall stress for the multi-match-aware shift window:
    every left string is built from some right string by <= 3 random
    edits, so true matches are DENSE and any window too tight by one
    position shows up as a missing pair vs brute force (longer strings
    than the uniform-random test — segment shifts reach the window
    edges)."""
    import random
    rnd = random.Random(41)
    alpha = "abc"
    R = [(1000 + i, "".join(rnd.choice(alpha)
                            for _ in range(rnd.randint(4, 18))))
         for i in range(50)]
    L = []
    for i in range(90):
        s = list(rnd.choice(R)[1])
        for _ in range(rnd.randint(0, 3)):
            op = rnd.choice("ids")
            if op == "i":
                s.insert(rnd.randint(0, len(s)), rnd.choice(alpha))
            elif op == "d" and s:
                del s[rnd.randint(0, len(s) - 1)]
            elif s:
                s[rnd.randint(0, len(s) - 1)] = rnd.choice(alpha)
        L.append((i, "".join(s)))
    for k in (1, 2, 3):
        assert _fuzzy(spark, L, R, k) == _brute(spark, L, R, k), k


def test_fuzzy_join_candidate_circuit_breaker(spark):
    """A hot shared substring (every key shares the same text) blows the
    candidate join quadratic; max_candidates must fail LOUDLY before the
    join runs, and a generous cap must not fire."""
    from scalding_spark.joins import fuzzy_join
    L = [(i, "aaaaaaaa") for i in range(40)]
    R = [(1000 + i, "aaaaaaaa") for i in range(40)]
    ldf = spark.createDataFrame(L, "lid long, ls string")
    rdf = spark.createDataFrame(R, "rid long, rs string")
    with pytest.raises(ValueError, match="candidate volume"):
        fuzzy_join(ldf, rdf, "ls", "rs", "lid", "rid",
                   max_distance=1, max_candidates=100)
    out = fuzzy_join(ldf, rdf, "ls", "rs", "lid", "rid",
                     max_distance=1, max_candidates=10_000_000).df
    assert out.count() == 40 * 40  # identical strings: all pairs, d=0


def test_fuzzy_join_candidate_counter(spark):
    from scalding_spark.joins import fuzzy_join
    from scalding_spark.pipe import counters
    L = [(0, "kitten"), (1, "mitten")]
    R = [(10, "sitten"), (11, "bitten")]
    ldf = spark.createDataFrame(L, "lid long, ls string")
    rdf = spark.createDataFrame(R, "rid long, rs string")
    out = fuzzy_join(ldf, rdf, "ls", "rs", "lid", "rid", max_distance=1,
                     counter="fz_test").df
    n = out.count()
    got = counters("fz_test")
    assert n == 4 and got["n_candidates"] >= 4, got


def test_fuzzy_join_short_strings_and_empties(spark):
    # everything at or below the segment threshold goes through the
    # short-bucket path; empties must still obey the distance contract
    L = [(0, ""), (1, "a"), (2, "ab"), (3, "abcdef")]
    R = [(10, ""), (11, "b"), (12, "ba"), (13, "abcdefg")]
    for k in (1, 2):
        assert _fuzzy(spark, L, R, k) == _brute(spark, L, R, k), k


def test_fuzzy_join_validates(spark):
    from scalding_spark.joins import fuzzy_join
    ldf = spark.createDataFrame([(1, "a")], "lid long, s string")
    rdf = spark.createDataFrame([(2, "b")], "rid long, s string")
    with pytest.raises(ValueError, match="differ"):
        fuzzy_join(ldf, rdf, "s", "s", "lid", "rid")
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(ldf, rdf.withColumnRenamed("s", "t"), "s", "t",
                   "lid", "rid", max_distance=0)


def test_fuzzy_join_null_strings_excluded(spark):
    # levenshtein(NULL, x) is NULL on both engines -> never <= k; the
    # filter paths must agree (null lengths fail every candidate guard)
    L = [(0, None), (1, "abc")]
    R = [(10, "abd"), (11, None)]
    ldf = spark.createDataFrame(L, "lid long, ls string")
    rdf = spark.createDataFrame(R, "rid long, rs string")
    from scalding_spark.joins import fuzzy_join
    out = fuzzy_join(ldf, rdf, "ls", "rs", "lid", "rid", 1).df.collect()
    assert {(r.lid, r.rid) for r in out} == {(1, 10)}


def test_fuzzy_join_verifies_distinct_string_pairs(spark):
    """r09 plan pin (VERDICT r08 #2): the candidate distinct + exact
    verify must run in DISTINCT-STRING space — the plan contains an
    aggregate keyed on the two STRING columns only (no ids), and the id
    columns only re-attach via the expansion joins above it. The old
    id-space plan's distinct was keyed on all four columns."""
    from scalding_spark.joins import fuzzy_join
    ldf = spark.createDataFrame([(i, "kitten") for i in range(5)],
                                "lid long, ls string")
    rdf = spark.createDataFrame([(100 + i, "sitten") for i in range(5)],
                                "rid long, rs string")
    plan = fuzzy_join(ldf, rdf, "ls", "rs", "lid", "rid", 1).df \
        ._jdf.queryExecution().executedPlan().toString()
    string_only_agg = [
        ln for ln in plan.splitlines()
        if "HashAggregate" in ln and "keys=[" in ln
        and "ls#" in ln and "rs#" in ln
        and "lid#" not in ln and "rid#" not in ln]
    assert string_only_agg, (
        "no distinct over (ls, rs) string pairs in the plan — the verify "
        "stage is running per id pair again:\n" + plan)


def test_fuzzy_join_duplicate_rows_collapse_on_main_path(spark):
    """Historical distinct contract: duplicate (id, string) input rows
    contribute ONE main-path output pair (the id-space plan's distinct
    did this; the expansion joins must too, via each side's distinct)."""
    from scalding_spark.joins import fuzzy_join
    ldf = spark.createDataFrame([(1, "kitten"), (1, "kitten")],
                                "lid long, ls string")
    rdf = spark.createDataFrame([(2, "sitten")], "rid long, rs string")
    out = fuzzy_join(ldf, rdf, "ls", "rs", "lid", "rid", 1).df.collect()
    assert [(r.lid, r.rid, r.distance) for r in out] == [(1, 2, 1)]


def test_fuzzy_join_equals_bruteforce_k4(spark):
    """k=4 differential (the window derivation is general in k; the
    k=1..3 suite never exercises a 5-segment split or the wider shift
    windows). Smaller corpus keeps the brute-force side cheap."""
    import random
    rnd = random.Random(97)
    alpha = "ab"
    R = [(1000 + i, "".join(rnd.choice(alpha)
                            for _ in range(rnd.randint(5, 14))))
         for i in range(25)]
    L = []
    for i in range(40):
        s = list(rnd.choice(R)[1])
        for _ in range(rnd.randint(0, 4)):
            op = rnd.choice("ids")
            if op == "i":
                s.insert(rnd.randint(0, len(s)), rnd.choice(alpha))
            elif op == "d" and s:
                del s[rnd.randint(0, len(s) - 1)]
            elif s:
                s[rnd.randint(0, len(s) - 1)] = rnd.choice(alpha)
        L.append((i, "".join(s)))
    assert _fuzzy(spark, L, R, 4) == _brute(spark, L, R, 4)
