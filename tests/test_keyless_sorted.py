"""Key-less (global) SortedGroup ops: ``group_all().sort_by(...)`` must NOT
funnel every row through a single-partition window — the range-partitioned
rank_by pattern computes the same answers in parallel (VERDICT r01 item 4).

Correctness: each op vs a plain-Python golden on a shuffled input.
Plan contracts: RangePartitioning present; any SinglePartition shuffle
carries only the tiny per-partition offset table (helper __ columns), never
data columns.
"""

import random

import pytest
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe


@pytest.fixture(scope="module")
def rows():
    rng = random.Random(7)
    data = [(i, rng.randrange(1000)) for i in range(400)]
    rng.shuffle(data)
    return data


@pytest.fixture(scope="module")
def pipe(spark, rows):
    return Pipe(spark.createDataFrame(rows, "x: bigint, v: bigint").repartition(13))


def _sorted_rows(rows):
    return sorted(rows)  # unique x => total order


def test_global_row_number_and_rank(pipe, rows):
    got = {r.x: r.rn for r in
           pipe.group_all().sort_by("x").row_number("rn").df.collect()}
    expect = {x: i + 1 for i, (x, _) in enumerate(_sorted_rows(rows))}
    assert got == expect


def test_global_rank_with_ties(spark):
    data = [(i, i // 3) for i in range(60)]  # key = i//3: 3-way ties
    p = Pipe(spark.createDataFrame(data, "id: bigint, k: bigint").repartition(7))
    got = sorted((r.id, r.rank) for r in
                 p.group_all().sort_by("k").rank("rank").df.collect())
    expect = sorted((i, (i // 3) * 3 + 1) for i in range(60))
    assert got == expect
    dense = sorted((r.id, r.rank) for r in
                   p.group_all().sort_by("k").rank("rank", dense=True).df.collect())
    assert dense == sorted((i, i // 3 + 1) for i in range(60))


def test_global_take_drop(pipe, rows):
    srt = _sorted_rows(rows)
    got_take = sorted((r.x, r.v) for r in
                      pipe.group_all().sort_by("x").take(7).df.collect())
    assert got_take == srt[:7]
    got_drop = sorted((r.x, r.v) for r in
                      pipe.group_all().sort_by("x").drop(390).df.collect())
    assert got_drop == srt[390:]


def test_global_take_while_drop_while(pipe, rows):
    srt = _sorted_rows(rows)
    limit = srt[250][0]
    pred = F.col("x") < limit
    tw = sorted((r.x, r.v) for r in
                pipe.group_all().sort_by("x").take_while(pred).df.collect())
    assert tw == srt[:250]
    dw = sorted((r.x, r.v) for r in
                pipe.group_all().sort_by("x").drop_while(pred).df.collect())
    assert dw == srt[250:]


def test_global_scan_cumsum_and_running_max(pipe, rows):
    srt = _sorted_rows(rows)
    got = {r.x: r.cum for r in
           pipe.group_all().sort_by("x").scan_left("v", "cum").df.collect()}
    acc = 0
    for x, v in srt:
        acc += v
        assert got[x] == acc
    got_mx = {r.x: r.mx for r in
              pipe.group_all().sort_by("x").scan_left("v", "mx", agg=F.max).df.collect()}
    mx = None
    for x, v in srt:
        mx = v if mx is None else max(mx, v)
        assert got_mx[x] == mx


def test_global_lag_and_last(pipe, rows):
    srt = _sorted_rows(rows)
    got = {r.x: r.lag_v for r in
           pipe.group_all().sort_by("x").lag("v", 1, "lag_v").df.collect()}
    assert got[srt[0][0]] is None
    for (x0, v0), (x1, _) in zip(srt, srt[1:]):
        assert got[x1] == v0
    last = pipe.group_all().sort_by("x").last().df.collect()
    assert [(r.x, r.v) for r in last] == [srt[-1]]


def test_global_descending_reverse(pipe, rows):
    srt = _sorted_rows(rows)
    got = sorted((r.x, r.v) for r in
                 pipe.group_all().sort_by("x", reverse=True).take(5).df.collect())
    assert got == sorted(srt[-5:])


# --- plan contracts --------------------------------------------------------

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_no_singlepartition_data_shuffle(df):
    """Every SinglePartition shuffle must carry ONLY __ helper columns (the
    #partitions-row offsets table) or scalar partial-aggregate buffers
    (count/sum/min/max — one row per map partition feeding a global total);
    data rows flow through RangePartitioning."""
    from tests.test_plans import _shuffle_exchange_schemas
    exchanges = _shuffle_exchange_schemas(df)
    assert any("rangepartitioning" in part for _, part, _c in exchanges)

    def tiny(c: str) -> bool:
        return c.startswith("__") or c in ("count", "sum", "min", "max", "avg")

    offenders = [
        (part, cols) for name, part, cols in exchanges
        if name.startswith("Shuffle") and "SinglePartition" in part
        and any(not tiny(c) for c, _ in cols)
    ]
    assert not offenders, f"data through a 1-task exchange: {offenders}"


def test_keyless_scan_plan_is_range_partitioned(pipe):
    df = pipe.group_all().sort_by("x").scan_left("v", "cum").df
    assert "rangepartitioning" in _plan(df)
    _assert_no_singlepartition_data_shuffle(df)


def test_keyless_rank_no_singlepartition_data_shuffle(pipe):
    df = pipe.group_all().sort_by("x").row_number("rn").df
    assert "rangepartitioning" in _plan(df)
    _assert_no_singlepartition_data_shuffle(df)


def test_keyless_take_is_take_ordered(pipe):
    p = _plan(pipe.group_all().sort_by("x").take(5).df)
    assert "TakeOrderedAndProject" in p


def test_global_descending_rank_drop_scan_lag(spark):
    """Descending keyless ops + rank ties straddling range-partition
    boundaries — the compositions the parallel pattern must get exactly
    right (reverse order flows into repartitionByRange; tie groups must
    land in ONE partition for local rank + offsets to be exact)."""
    import random
    rng = random.Random(1)
    data = [(i, rng.randrange(50)) for i in range(100)]
    rng.shuffle(data)
    p = Pipe(spark.createDataFrame(data, "x: bigint, v: bigint").repartition(7))

    desc = sorted(data, reverse=True)
    got_rn = {r.x: r.rn for r in
              p.group_all().sort_by("x", reverse=True).row_number("rn").df.collect()}
    assert got_rn == {x: i + 1 for i, (x, _) in enumerate(desc)}

    got_drop = sorted(r.x for r in
                      p.group_all().sort_by("x", reverse=True).drop(95).df.collect())
    assert got_drop == [0, 1, 2, 3, 4]

    got_scan = {r.x: r.c for r in
                p.group_all().sort_by("x", reverse=True).scan_left("v", "c").df.collect()}
    acc = 0
    for x, v in desc:
        acc += v
        assert got_scan[x] == acc

    sv = sorted(data, key=lambda t: t[1])
    first_at = {}
    for i, (x, v) in enumerate(sv):
        first_at.setdefault(v, i + 1)
    got_rk = {r.x: r.rk for r in
              p.group_all().sort_by("v").rank("rk").df.collect()}
    assert got_rk == {x: first_at[v] for x, v in data}

    dmap = {v: i + 1 for i, v in enumerate(sorted({v for _, v in data}))}
    got_dense = {r.x: r.rk for r in
                 p.group_all().sort_by("v").rank("rk", dense=True).df.collect()}
    assert got_dense == {x: dmap[v] for x, v in data}

    got_lag = {r.x: r.lv for r in
               p.group_all().sort_by("x", reverse=True).lag("v", 2, "lv").df.collect()}
    for i, (x, v) in enumerate(desc):
        assert got_lag[x] == (desc[i - 2][1] if i >= 2 else None)


# --- rank_by_value: skew-free global rank over low-cardinality keys --------

def test_rank_by_value_matches_window_semantics(spark):
    import random
    rng = random.Random(3)
    data = [(i, rng.randrange(5)) for i in range(300)]   # 5 hot values
    p = Pipe(spark.createDataFrame(data, "id: bigint, tier: bigint").repartition(9))

    srt = sorted(data, key=lambda t: t[1])
    first_at, seen = {}, {}
    for i, (x, v) in enumerate(srt):
        first_at.setdefault(v, i + 1)
    dense_map = {v: i + 1 for i, v in enumerate(sorted({v for _, v in data}))}

    got = {r.id: r.rank for r in p.rank_by_value("tier").df.collect()}
    assert got == {x: first_at[v] for x, v in data}

    got_d = {r.id: r.rank for r in p.rank_by_value("tier", dense=True).df.collect()}
    assert got_d == {x: dense_map[v] for x, v in data}

    # reverse: rank 1 = hottest tier descending
    rev_first = {}
    for i, (x, v) in enumerate(sorted(data, key=lambda t: -t[1])):
        rev_first.setdefault(v, i + 1)
    got_r = {r.id: r.rank for r in p.rank_by_value("tier", reverse=True).df.collect()}
    assert got_r == {x: rev_first[v] for x, v in data}


def test_rank_by_value_no_tie_class_single_partition(spark):
    """The data side must never range-partition by the tie-prone value: no
    SinglePartition exchange carries data columns, and no exchange at all
    range-partitions the raw rows (only the distinct-value counts table)."""
    from tests.test_plans import _shuffle_exchange_schemas
    data = [(i, i % 3) for i in range(90)]
    p = Pipe(spark.createDataFrame(data, "id: bigint, tier: bigint").repartition(5))
    df = p.rank_by_value("tier").df
    for name, part, cols in _shuffle_exchange_schemas(df):
        if name.startswith("Shuffle") and "SinglePartition" in part:
            assert all(c.startswith("__") for c, _ in cols), (part, cols)
        if "rangepartitioning" in part:
            # the ranged table is the counts table: carries __n, not id
            assert any(c == "__n" for c, _ in cols)


# -- r03: percent_rank / cume_dist / ntile (keyed + keyless) ------------------

def _ref_window(df, fn, *args):
    """Single-partition window reference (the semantics oracle; the keyless
    implementations must match it without using its 1-task plan)."""
    from pyspark.sql import Window
    w = Window.partitionBy().orderBy("v")
    return {r["id"]: r["x"] for r in
            df.withColumn("x", fn(*args).over(w)).select("id", "x").collect()}


@pytest.fixture(scope="module")
def ranked_df(spark):
    import random
    rng = random.Random(11)
    rows = [(i, rng.randint(0, 30)) for i in range(200)]
    return spark.createDataFrame(rows, "id long, v long").repartition(8)


def test_keyless_percent_rank_matches_window(spark, ranked_df):
    from scalding_spark.pipe import Pipe
    got = {r["id"]: r["percent_rank"] for r in
           Pipe(ranked_df).group_all().sort_by("v").percent_rank()
           .to_df().collect()}
    ref = _ref_window(ranked_df, F.percent_rank)
    assert all(abs(got[i] - ref[i]) < 1e-12 for i in ref)


def test_keyless_cume_dist_matches_window(spark, ranked_df):
    from scalding_spark.pipe import Pipe
    got = {r["id"]: r["cume_dist"] for r in
           Pipe(ranked_df).group_all().sort_by("v").cume_dist()
           .to_df().collect()}
    ref = _ref_window(ranked_df, F.cume_dist)
    assert all(abs(got[i] - ref[i]) < 1e-12 for i in ref)


@pytest.fixture(scope="module")
def unique_df(spark):
    # UNIQUE sort keys: NTILE's bucket of a row is only well-defined up to
    # tie order, so the equality oracle needs a total order
    import random
    rng = random.Random(5)
    vs = list(range(200))
    rng.shuffle(vs)
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vs)], "id long, v long").repartition(8)


@pytest.mark.parametrize("n", [1, 3, 7, 200, 350])
def test_keyless_ntile_matches_window(spark, unique_df, n):
    from scalding_spark.pipe import Pipe
    got = {r["id"]: r["ntile"] for r in
           Pipe(unique_df).group_all().sort_by("v").ntile(n)
           .to_df().collect()}
    ref = _ref_window(unique_df, F.ntile, n)
    assert got == ref


def test_keyless_new_rank_ops_have_no_single_partition(spark, ranked_df):
    """Same contract as the other keyless ops: any SinglePartition shuffle
    carries ONLY tiny helper columns (offsets/totals), never the data."""
    from scalding_spark.pipe import Pipe
    for build in (lambda s: s.percent_rank(), lambda s: s.cume_dist(),
                  lambda s: s.ntile(4)):
        df = build(Pipe(ranked_df).group_all().sort_by("v")).to_df()
        assert "rangepartitioning" in _plan(df)
        _assert_no_singlepartition_data_shuffle(df)


def test_keyed_rank_ops_delegate_to_native_windows(spark, ranked_df):
    from scalding_spark.pipe import Pipe
    df = ranked_df.withColumn("k", F.col("id") % 3)
    g = Pipe(df).group_by("k").sort_by("v")
    from pyspark.sql import Window
    w = Window.partitionBy("k").orderBy("v")
    for op, fn in (("percent_rank", F.percent_rank), ("cume_dist", F.cume_dist)):
        got = {r["id"]: r[op] for r in
               getattr(Pipe(df).group_by("k").sort_by("v"), op)()
               .to_df().collect()}
        ref = {r["id"]: r["x"] for r in
               df.withColumn("x", fn().over(w)).collect()}
        assert got == ref


def test_pack_sequences_covers_every_doc_on_gappy_ids(spark):
    """Regression for the 10x-gate partition-drop bug (SCALING.md): the
    keyless scan's offsets branch and data branch executed the range
    exchange independently; when AQE coalesced the pruned offsets branch
    to fewer partitions than the data branch, the __pid inner join
    silently dropped most of the corpus. The ranged frame is now persisted
    (one frozen pid universe) — every doc must appear in exactly one
    packed sequence, for a corpus whose ids have sf1-shaped million-scale
    gaps, across shuffle layouts."""
    from scalding_spark.functions import sampling
    rows = [(i + block * 1_000_000, f"tok{i % 7} " * (3 + i % 9))
            for block in range(5) for i in range(800)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "16"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            out = sampling.pack_sequences(docs, "text", "doc_id",
                                          seq_tokens=64)
            agg = out.agg(F.sum("n_docs").alias("d"),
                          F.count(F.lit(1)).alias("s"),
                          F.max("seq_id").alias("m")).collect()[0]
            assert agg["d"] == len(rows), f"lost docs at {parts} partitions"
            assert agg["s"] == agg["m"] + 1, "seq ids must be contiguous"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        from scalding_spark.session import release_materialized
        release_materialized(spark)
