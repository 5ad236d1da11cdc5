"""Operator-level unit tests (the reference's per-operator spec style,
CoreTest.scala): literal inputs, golden outputs computed in Python."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe
from scalding_spark import joins


@pytest.fixture(scope="module")
def people(spark):
    return Pipe(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, "c", 40.0)],
        "id long, grp string, x double"))


def test_block_join_equals_plain_join(spark, people):
    right = Pipe(spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "grp string, name string"))
    plain = sorted((r.id, r.name) for r in
                   people.join_with_smaller("grp", right).df.collect())
    blocked = sorted((r.id, r.name) for r in
                     joins.block_join(people, right, on=["grp"],
                                      left_repl=3, right_repl=2).df.collect())
    assert blocked == plain


def test_block_join_validity_matrix():
    with pytest.raises(ValueError):
        joins.block_join(None, None, on=["k"], left_repl=2, how="left")
    with pytest.raises(ValueError):
        joins.block_join(None, None, on=["k"], right_repl=2, how="right")
    with pytest.raises(ValueError):
        joins.block_join(None, None, on=["k"], how="outer")


def test_join_with_tiny_refuses_outer(people):
    with pytest.raises(ValueError):
        joins.join_with_tiny(people, people, on="grp", how="outer")


def test_shard_partitions_and_preserves_rows(people):
    out = people.shard(2)
    assert out.df.rdd.getNumPartitions() == 2
    assert sorted(r.id for r in out.df.collect()) == [1, 2, 3, 4]


def test_shuffle_seeded_deterministic(people):
    a = [r.id for r in people.shuffle(2, seed=7).df.collect()]
    b = [r.id for r in people.shuffle(2, seed=7).df.collect()]
    assert a == b and sorted(a) == [1, 2, 3, 4]


def test_sample_seeded_subset(people):
    rows = people.sample(0.5, seed=1).df.collect()
    assert all(r.id in (1, 2, 3, 4) for r in rows)


def test_limit_exact(people):
    assert people.limit(2).df.count() == 2


def test_histogram_summary_golden(spark):
    # values 1..10, width 2 → bins 0(1),2(2,3),4(4,5),6(6,7),8(8,9),10(10)
    p = Pipe(spark.createDataFrame([(float(i),) for i in range(1, 11)], "x double"))
    row = p.group_all().__class__  # group_all returns GroupBuilder on const key
    out = p.group_all().histogram_summary("x", bin_width=2.0).df.collect()[0]
    assert out.hmin == 0.0 and out.hmax == 10.0
    # cdf: cum counts 1,3,5,7,9,10 of 10 → q1: first cum>=2.5 → bin 2;
    # median: cum>=5 → bin 4; q3: cum>=7.5 → bin 8
    assert out.q1 == 2.0 and out.median == 4.0 and out.q3 == 8.0
    assert out.iqr == 6.0


def test_map_list(spark):
    p = Pipe(spark.createDataFrame(
        [("a", 3.0), ("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double"))
    out = {r.k: r.first_sorted for r in
           (p.group_by("k")
            .map_list("v", lambda arr: F.element_at(arr, 1), out="first_sorted")
            .done().df.collect())}
    assert out == {"a": 1.0, "b": 5.0}


def test_add_trap_quarantines_bad_rows(spark, people, tmp_path):
    def fn(row):
        if row["id"] == 3:
            raise ValueError("boom")
        return {"id": row["id"], "doubled": row["x"] * 2}

    out = people.add_trap(fn, "id long, doubled double", str(tmp_path / "trap"))
    got = sorted((r.id, r.doubled) for r in out.df.collect())
    assert got == [(1, 20.0), (2, 40.0), (4, 80.0)]


def test_times_product_exact(spark):
    # powers of two: exact in floating point regardless of multiply order
    p = Pipe(spark.createDataFrame(
        [("a", 2.0), ("a", 4.0), ("a", 0.5), ("b", 8.0)], "k string, v double"))
    out = {r.k: r.product for r in
           p.group_by("k").times("v", "product").done().df.collect()}
    assert out == {"a": 4.0, "b": 8.0}


def test_rank_by_matches_global_window(spark):
    """rank_by (range-partitioned parallel rank) must equal the single-task
    row_number window on any partition count."""
    import random
    from pyspark.sql import Window
    from scalding_spark.pipe import Pipe

    rng = random.Random(3)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    golden = {r.id: r.rk for r in df.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("v").desc(), "id"))).collect()}
    for parts in (1, 4, 13):
        got = {r.id: r.rank for r in
               Pipe(df).rank_by(F.col("v").desc(), F.col("id"),
                                partitions=parts).df.collect()}
        assert got == golden, f"partitions={parts}"


def test_rank_by_no_single_task_exchange(spark):
    """The plan must contain no SinglePartition exchange over the ranked data
    (the offsets table is tiny and allowed to)."""
    from scalding_spark.pipe import Pipe
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    p = Pipe(df).rank_by(F.col("v"), F.col("id")).df
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_map_stream_sorted_iterator_transform(spark):
    """GroupBuilder buffer/every escape hatch (GroupBuilder.scala:219-228):
    per-key ordered stream → applyInPandas; here a running gap between
    consecutive sorted values."""
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame(
        [("a", 10), ("a", 13), ("a", 19), ("b", 5), ("b", 6)], "k: string, v: int")

    def gaps(pdf):
        pdf = pdf.copy()
        pdf["gap"] = pdf["v"].diff().fillna(0).astype("int64")
        return pdf[["k", "v", "gap"]]

    out = (Pipe(df).group_by("k").sort_by("v")
           .map_stream(gaps, schema="k string, v int, gap long").df)
    got = {(r["k"], r["v"]): r["gap"] for r in out.collect()}
    assert got == {("a", 10): 0, ("a", 13): 3, ("a", 19): 6,
                   ("b", 5): 0, ("b", 6): 1}


def test_reducers_sets_partition_count(spark):
    """reducers(n) parity (GroupBuilder.scala:88-93): the agg input is
    repartitioned to exactly n partitions on the keys."""
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame([(i % 7, i) for i in range(100)], "k: int, v: int")
    gb = Pipe(df).group_by("k").reducers(5)
    assert gb._df.rdd.getNumPartitions() == 5
    out = gb.size("n").done().df
    assert out.count() == 7


def test_percentile_exact_values(spark):
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame([("a", float(v)) for v in (1, 2, 3, 4)],
                               "k: string, v: double")
    out = (Pipe(df).group_by("k")
           .percentile_exact("v", 0.5, "med")
           .percentile_exact("v", [0.0, 1.0], "minmax")
           .done().df.collect()[0])
    assert out["med"] == 2.5            # interpolated between 2 and 3
    assert list(out["minmax"]) == [1.0, 4.0]


# -- r03: sketch aggregations (QTree / CMS analogs) ----------------------------

def test_approx_percentile_close_to_exact(spark):
    from scalding_spark.pipe import Pipe
    import pyspark.sql.functions as F
    df = spark.range(0, 1001).select(
        (F.col("id") % 2).alias("k"), F.col("id").cast("double").alias("v"))
    out = {r["k"]: r for r in (
        Pipe(df).group_by("k")
        .approx_percentile("v", [0.25, 0.5, 0.75], accuracy=100_000)
        .done().to_df().collect())}
    # accuracy >> n makes GK exact: the discrete element at each rank
    for k in (0, 1):
        p25, p50, p75 = out[k]["ap_v"]
        assert abs(p50 - 500) <= 2
        assert abs(p25 - 250) <= 2 and abs(p75 - 750) <= 2


def test_approx_percentile_scalar_prob(spark):
    from scalding_spark.pipe import Pipe
    import pyspark.sql.functions as F
    df = spark.range(1, 101).select(F.lit(1).alias("k"),
                                    F.col("id").cast("double").alias("v"))
    row = (Pipe(df).group_by("k").approx_percentile("v", 0.5, out="med")
           .done().to_df().first())
    assert abs(row["med"] - 50) <= 1


def test_cms_sketch_binary_and_mergeable(spark):
    from scalding_spark.pipe import Pipe
    import pyspark.sql.functions as F
    df = spark.range(0, 1000).select((F.col("id") % 4).alias("k"),
                                     (F.col("id") % 10).alias("v"))
    sk = (Pipe(df).group_by("k").cms_sketch("v", eps=0.01)
          .done().to_df())
    rows = sk.collect()
    assert len(rows) == 4 and all(isinstance(r["cms_v"], (bytes, bytearray))
                                  for r in rows)
    # sketches are a fixed-width binary payload (mergeable monoid state);
    # identical per-key inputs -> identical sketch bytes (seeded hashing)
    assert len({len(r["cms_v"]) for r in rows}) == 1


def test_approx_quantiles_driver_side(spark):
    from scalding_spark.pipe import Pipe
    import pyspark.sql.functions as F
    df = spark.range(0, 1001).select(F.col("id").cast("double").alias("v"))
    q = Pipe(df).approx_quantiles("v", [0.1, 0.5, 0.9], rel_err=0.001)
    assert len(q) == 3 and abs(q[1] - 500) <= 5 and q[0] < q[1] < q[2]


def test_heavy_hitters_finds_skew_keys(spark):
    from scalding_spark.pipe import Pipe
    import pyspark.sql.functions as F
    # key 7 carries 50% of rows; uniform tail below the 30% support
    df = spark.range(0, 2000).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id") % 100).alias("k"))
    hh = Pipe(df).heavy_hitters(["k"], support=0.3)
    assert 7 in hh["k"]


def test_rollup_matches_unioned_groupbys(spark):
    from scalding_spark.pipe import Pipe
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4), ("b", "x", 8)],
        "k1 string, k2 string, v long")
    got = {(r["k1"], r["k2"]): r["s"] for r in
           Pipe(df).rollup_by("k1", "k2").sum("v", "s").done()
           .to_df().collect()}
    assert got[("a", "x")] == 1 and got[("b", "x")] == 12
    assert got[("a", None)] == 3 and got[("b", None)] == 12
    assert got[(None, None)] == 15
    assert ("x", None) not in {k[::-1] for k in got}  # no (None, k2) level


def test_cube_adds_the_cross_levels(spark):
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
        "k1 string, k2 string, v long")
    got = {(r["k1"], r["k2"]): r["s"] for r in
           Pipe(df).cube_by("k1", "k2").sum("v", "s").done()
           .to_df().collect()}
    assert got[(None, "x")] == 5 and got[(None, "y")] == 2  # cube-only level
    assert got[(None, None)] == 7


def test_rollup_is_single_expand_job(spark):
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame([("a", "x", 1)], "k1 string, k2 string, v long")
    q = Pipe(df).rollup_by("k1", "k2").sum("v", "s").done().to_df()
    p = q._jdf.queryExecution().executedPlan().toString()
    assert p.count("Expand") == 1
    assert p.count("Exchange hashpartitioning") == 1
    # the rollup pass itself is partial + final over the grouping-id keys
    agg_lines = [ln for ln in p.splitlines() if "HashAggregate" in ln]
    assert sum("spark_grouping_id" in ln for ln in agg_lines) == 2
    # the ANSI empty-grand-total branch must never touch the source: its
    # value aggregate reads a folded-empty relation, its gate a 1-row limit
    assert "LocalTableScan <empty>" in p
    assert p.count("LocalLimit 1") == 1


def test_grouping_sets_exact_levels(spark):
    from scalding_spark.pipe import Pipe
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
        "k1 string, k2 string, v long")
    got = {(r["k1"], r["k2"]): r["s"] for r in
           Pipe(df).grouping_sets([["k1"], []], "k1", "k2")
           .sum("v", "s").done().to_df().collect()}
    # exactly the requested levels: per-k1 and grand total; NO (k1,k2) rows
    assert got == {("a", None): 3, ("b", None): 4, (None, None): 7}
