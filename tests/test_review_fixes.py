"""Regression tests for code-review findings: each test pins the previously
broken behavior."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from scalding_spark.pipe import Pipe
from scalding_spark.functions.dates import Duration
from scalding_spark.sources import extras
from scalding_spark.typed import TypedPipe


@pytest.fixture()
def seq(spark):
    return Pipe(spark.createDataFrame(
        [("a", 1, "x1"), ("a", 2, "x2"), ("a", 3, "x3"), ("b", 7, "y7")],
        "k string, t long, s string"))


def test_last_respects_descending_sort(seq):
    """last() on a DESC stream must be the minimum, not head() again."""
    desc = seq.group_by("k").sort_by("t", reverse=True)
    assert {(r.k, r.t) for r in desc.head().df.collect()} == {("a", 3), ("b", 7)}
    assert {(r.k, r.t) for r in desc.last().df.collect()} == {("a", 1), ("b", 7)}


def test_fold_left_descending_order(seq):
    """Non-commutative fold must apply in the requested (descending) order."""
    out = (seq.group_by("k").sort_by("t", reverse=True)
           .fold_left("s", "", lambda acc, x: F.concat(acc, x), out="joined"))
    got = {r.k: r.joined for r in out.df.collect()}
    assert got == {"a": "x3x2x1", "b": "y7"}


def test_fold_left_rejects_sortorder_columns(seq):
    with pytest.raises(ValueError, match="plain sort columns"):
        (seq.group_by("k").sort_by(F.col("t").desc())
         .fold_left("s", "", lambda a, x: F.concat(a, x), out="j"))


def test_month_arithmetic_clamps_day():
    assert Duration("months", 1).add_to(datetime(2026, 1, 31)) == datetime(2026, 2, 28)
    assert Duration("months", 1).add_to(datetime(2024, 1, 31)) == datetime(2024, 2, 29)
    assert Duration("years", 1).add_to(datetime(2024, 2, 29)) == datetime(2025, 2, 28)


def test_add_trap_parameterized_types(spark, seq):
    from decimal import Decimal

    def fn(row):
        return {"k": row["k"], "amt": Decimal(row["t"]).quantize(Decimal("0.01"))}

    out = seq.add_trap(fn, "k string, amt decimal(10,2)")
    assert out.df.count() == 4
    assert [f.name for f in out.df.schema.fields] == ["k", "amt"]


def test_flat_map_flatten_idiom(spark):
    p = Pipe(spark.createDataFrame([(1, [10, 20])], "id long, tags array<long>"))
    out = p.flat_map(F.col("tags"), out="tags")
    assert out.df.columns == ["id", "tags"]
    assert sorted(r.tags for r in out.df.collect()) == [10, 20]


def test_typed_fold_string_accumulator(spark):
    tp = TypedPipe.from_iterable(spark, [1, 2, 3], "long")
    out = tp.group_all().fold_left(
        "", lambda acc, x: F.concat(acc, x.cast("string")))
    assert out.collect()[0].value == "123"


def test_codec_check_stable_across_actions(spark):
    raw = spark.createDataFrame([(b"1:a",), (b"bad",)], "bytes binary")

    def decode(b: bytes) -> dict:
        k, v = b.decode().split(":")
        return {"k": int(k), "v": v}

    out, check = extras.read_codec(spark, raw, decode, "k long, v string",
                                   max_failures=1)
    out.count()
    out.count()  # second action must not double the failure count
    assert check() == 1 and check() == 1


def test_glob_validation_requires_matches(spark, tmp_path):
    from scalding_spark.sources import files
    with pytest.raises(files.InvalidSourceException):
        files.text_line(spark, str(tmp_path / "*.txt"))
    (tmp_path / "a.txt").write_text("hello\n")
    assert files.text_line(spark, str(tmp_path / "*.txt")).count() == 1


def test_normalize_no_single_partition_window(spark):
    p = Pipe(spark.createDataFrame([(float(i),) for i in range(1, 5)], "v double"))
    out = p.normalize("v", "share")
    assert {r.share for r in out.df.collect()} == {0.1, 0.2, 0.3, 0.4}
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # broadcast cross join, not a 1-task window


# --- round-2 ADVICE fixes --------------------------------------------------

def test_time_pathed_multi_period_csv(spark, tmp_path):
    """Multi-period non-parquet reads must pass the path LIST as one arg —
    *paths would feed the second path into DataFrameReader.csv's schema
    slot (ADVICE r01)."""
    from scalding_spark.functions.dates import DateRange
    from scalding_spark.sources.time_pathed import TimePathedSource

    for d in ("2026-08-01", "2026-08-02"):
        p = tmp_path / d
        p.mkdir()
        (p / "part.csv").write_text(f"1,{d}\n")
    src = TimePathedSource(str(tmp_path / "%Y-%m-%d"), fmt="csv")
    df = src.read(spark, DateRange.of("2026-08-01", "2026-08-02"))
    assert df.count() == 2


def test_connected_components_empty_edges_converges_fast(spark):
    """Zero-edge input: sum() over zero rows is NULL; convergence must still
    fire on iteration 1, not run out max_iter (ADVICE r01)."""
    import time
    from scalding_spark.functions.dedup import connected_components

    empty = spark.createDataFrame([], "src long, dst long")
    t0 = time.monotonic()
    out = connected_components(empty, max_iter=50)
    assert out.count() == 0
    assert time.monotonic() - t0 < 30  # 50 checkpoint+collect rounds would blow this


def test_percentile_exact_odd_column_names(spark):
    """percentile_exact must survive names needing quoting and not rely on
    the private _jc handle (ADVICE r01)."""
    p = Pipe(spark.createDataFrame(
        [("a", float(v)) for v in range(1, 5)], ["k", "my col.v"]))
    out = p.group_by("k").percentile_exact("my col.v", 0.5, out="med").done().df
    assert out.collect()[0].med == 2.5
    multi = p.group_by("k").percentile_exact(
        "my col.v", [0.25, 0.75], out="q").done().df.collect()[0].q
    assert multi == [1.75, 3.25]


def test_decode_sampled_frames_empty_clip_distinct_features(spark):
    """Empty (b'') clips must still get the frame-ts suffix — every sampled
    frame's feature vector must differ (ADVICE r01)."""
    from scalding_spark.functions import multimodal

    df = spark.createDataFrame(
        [("clip0", b"", 2500)], "id string, content binary, duration_ms long")
    out = multimodal.decode_sampled_frames(df, every_ms=1000).collect()
    assert len(out) == 3
    feats = [tuple(r.frame_features) for r in out]
    assert len(set(feats)) == 3  # truthiness bug made all three identical


def test_as_of_join_suffixes_colliding_right_columns(spark):
    """Right payload names colliding with left output names get _right —
    duplicate output names made the result unselectable (ADVICE r01)."""
    from scalding_spark.joins import as_of_join

    left = spark.createDataFrame([(1, 10.0, "L")], "k long, ts double, v string")
    right = spark.createDataFrame([(1, 5.0, "R", 99.0)],
                                  "k long, rts double, v string, ts double")
    out = as_of_join(left, right, on=["k"], left_ts="ts", right_ts="rts").df
    assert sorted(out.columns) == ["k", "ts", "ts_right", "v", "v_right"]
    row = out.collect()[0]
    assert (row.v, row.v_right, row.ts_right) == ("L", "R", 99.0)


# --- round-2 self-review fixes ---------------------------------------------

def test_sparse_hint_unknown_inner_dim_never_tiny():
    """SparseHint * with cols=-1 used to yield NEGATIVE sparsity/total,
    which the strategy dispatch read as 'tiny' and broadcast an unbounded
    matrix. Unknown inner dim must propagate to NoClue / shuffle."""
    from scalding_spark.matrix import (
        FiniteHint, NoClue, SparseHint, choose_product_strategy)

    h = SparseHint(0.5, 1_000_000, -1) * FiniteHint(1_000_000, 1_000_000)
    assert isinstance(h, NoClue)
    assert choose_product_strategy(
        SparseHint(0.5, 1_000_000, -1) * FiniteHint(1_000_000, 1_000_000),
        FiniteHint(1_000_000, 1_000_000)) == "shuffle"
    # corrupted hints (negative sparsity straight from the user) also never
    # qualify as broadcastable
    assert choose_product_strategy(
        SparseHint(-0.5, 10, 10), FiniteHint(1_000_000, 1_000_000)) == "shuffle"


def test_keyless_scan_left_null_values_keep_prefix(spark):
    """A row whose local null-only prefix produced __loc = NULL must still
    inherit the earlier partitions' running total (global window sums skip
    nulls) — `off + NULL` used to poison it to NULL."""
    from pyspark.sql import functions as F
    from scalding_spark.pipe import Pipe

    df = spark.createDataFrame(
        [(i, None if i >= 50 else float(i)) for i in range(100)],
        "x long, v double")
    got = (Pipe(df).group_all().sort_by("x").scan_left("v", "cum")
           .df.orderBy("x").collect())
    want = 0.0
    for r in got:
        if r.v is not None:
            want += r.v
        assert r.cum == want  # rows past x=50 carry the x<50 total, not NULL


def test_rank_by_value_keeps_null_keys(spark):
    """rank_by_value must rank NULL-valued rows like the window form does —
    the join-back is null-safe, not a silent inner-join drop."""
    from pyspark.sql import functions as F
    from scalding_spark.pipe import Pipe

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None), (5, "a")],
        "id long, seg string")
    got = Pipe(df).rank_by_value("seg").df
    assert got.count() == 5          # nothing dropped
    by_seg = {(r.seg, r.rank) for r in got.collect()}
    # Spark range-partition ordering is NULLS FIRST: nulls rank 1, a -> 3, b -> 5
    assert by_seg == {(None, 1), ("a", 3), ("b", 5)}


def test_range_is_hashable():
    from scalding_spark.job import Range

    assert {Range(1, 2), Range(1, 2), Range(2, 3)} == {Range(1, 2), Range(2, 3)}
    assert hash(Range(1, 2)) == hash(Range(1, 2))


def test_lm_gate_keeps_tokenless_docs(spark, tmp_path):
    """The prep job's LM-surprise gate must not delete docs that have no LM
    score (no tokens) — regression for the inner-join drop."""
    from scalding_spark.job import Args
    from examples.prepare_training_data_job import PrepareTrainingDataJob

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today", "en", "s", 40),
         (2, "?!", "en", "s", 2)],   # no tokens -> no LM score
        "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(src)
    out = str(tmp_path / "corpus")
    PrepareTrainingDataJob(Args(
        ["--input", src, "--output", out, "--min-quality", "0.0",
         "--min-model-score", "0.0", "--max-neg-logp", "1e9",
         "--jaccard", "0.9"]), spark).run()
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2}


# ---------------------------------------------------------------------------
# r03 core-module review fixes
# ---------------------------------------------------------------------------

def test_fold_and_reduce_align_numeric_zero(spark):
    # python int zero vs bigint column: F.aggregate requires matching types
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame([(1, 10), (1, 20)], "k long, v long")
    f = (Pipe(df).group_by("k").sort_by("v")
         .fold_left("v", 0, lambda a, x: a + x, out="s").to_df().collect())
    assert f[0]["s"] == 30
    r = (Pipe(df).group_by("k")
         .reduce("v", 0, lambda a, x: a + x, out="s").done().to_df().collect())
    assert r[0]["s"] == 30
    # non-numeric zero keeps its own type (string concat fold)
    df2 = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    s = (Pipe(df2).group_by("k").sort_by("v")
         .fold_left("v", "", lambda a, x: F.concat(a, x), out="s")
         .to_df().collect())
    assert s[0]["s"] == "ab"


def test_typed_reduce_all_null_group(spark):
    from scalding_spark.typed import TypedPipe
    out = (TypedPipe.from_iterable(spark, [None, None], schema="long")
           .group_all().reduce(lambda a, b: a + b).collect())
    assert out[0]["value"] is None  # reduce of empty stream, not a crash


def test_rollup_mode_rejects_reshaping_ops(spark):
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame([(1, "x", 2.0)], "k long, f string, v double")
    for op in (lambda g: g.pivot("f", "v"),
               lambda g: g.histogram("v"),
               lambda g: g.histogram_summary("v"),
               lambda g: g.sort_by("v")):
        with pytest.raises(ValueError, match="plain group_by only"):
            op(Pipe(df).rollup_by("k"))
    with pytest.raises(ValueError, match="at least one aggregation"):
        Pipe(df).rollup_by("k").done()


def test_multi_join_rejects_short_hows(spark):
    from scalding_spark.joins import multi_join
    a = spark.createDataFrame([(1, 1)], "k long, x long")
    b = spark.createDataFrame([(1, 2)], "k long, y long")
    c = spark.createDataFrame([(1, 3)], "k long, z long")
    with pytest.raises(ValueError, match="hows"):
        multi_join([a, b, c], on=["k"], hows=["inner"])


def test_matrix_binarize_keeps_zero_dead(spark):
    from scalding_spark.matrix import Matrix
    m = Matrix(spark.createDataFrame([(1, 1, 0.0), (1, 2, 5.0)],
                                     "row long, col long, val double"))
    got = sorted((r.row, r.col, r.val) for r in m.binarize().df.collect())
    assert got == [(1, 2, 1.0)]  # stored zero is NOT an edge


def test_vector_dot_disjoint_support_is_zero(spark):
    from scalding_spark.matrix import RowVector, ColVector
    rv = RowVector(spark.createDataFrame([(1, 2.0)], "col long, val double"))
    cv = ColVector(spark.createDataFrame([(2, 3.0)], "row long, val double"))
    assert rv.dot(cv).collect()[0]["dot"] == 0.0


def test_elementwise_sum_hint_uses_both_operands(spark):
    from scalding_spark.matrix import Matrix, FiniteHint
    a = Matrix(spark.createDataFrame([(1, 1, 1.0)],
                                     "row long, col long, val double"),
               hint=FiniteHint(10, 10))
    b = Matrix(spark.createDataFrame([(2, 2, 1.0)],
                                     "row long, col long, val double"),
               hint=FiniteHint(10**6, 10**6))
    h = (a + b).hint
    assert h.total >= 10**12  # tiny-left must not mislabel the union


def test_rank_by_emits_bigint(spark):
    from scalding_spark.pipe import Pipe
    df = spark.createDataFrame([(i,) for i in range(5)], "v long")
    out = Pipe(df).rank_by(F.col("v")).to_df()
    assert dict(out.dtypes)["rank"] == "bigint"
