"""Matrix/vector/combinatorics unit tests with analytic goldens — the
reference's MatrixTest.scala / CombinatoricsTest.scala strategy: tiny literal
matrices, results asserted against hand/NumPy-computed values."""

import math

import pytest
from pyspark.sql import functions as F

from scalding_spark.matrix import ColVector, Matrix, RowVector
from scalding_spark import combinatorics

COO = [(1, 1, 1.0), (1, 2, 2.0), (2, 1, 3.0), (2, 2, 4.0), (3, 3, 5.0)]
SCHEMA = "row long, col long, val double"


@pytest.fixture(scope="module")
def m(spark):
    return Matrix(spark.createDataFrame(COO, SCHEMA))


def as_dict(df, keys=("row", "col")):
    return {tuple(getattr(r, k) for k in keys): r.val for r in df.collect()}


def test_transpose_involution(m):
    assert as_dict(m.transpose().transpose().df) == as_dict(m.df)


def test_matmul_identity(spark, m):
    eye = Matrix(spark.createDataFrame(
        [(i, i, 1.0) for i in (1, 2, 3)], SCHEMA))
    assert as_dict(m.matmul(eye).df) == as_dict(m.df)


def test_matmul_values(spark, m):
    # [[1,2],[3,4]] @ [[1,2],[3,4]] = [[7,10],[15,22]]; block at (3,3): 25
    got = as_dict(m.matmul(m).df)
    assert got == {(1, 1): 7.0, (1, 2): 10.0, (2, 1): 15.0, (2, 2): 22.0,
                   (3, 3): 25.0}


def test_elementwise_add_sub_cancel(m):
    out = (m + m) - m
    assert as_dict(out.df) == as_dict(m.df)


def test_elem_wise_op_zero_fill(spark, m):
    other = Matrix(spark.createDataFrame([(1, 1, 10.0), (9, 9, 7.0)], SCHEMA))
    got = as_dict(m.elem_wise_op(other, lambda a, b: a * 2 + b).df)
    assert got[(1, 1)] == 12.0       # both present
    assert got[(1, 2)] == 4.0        # right absent → zero
    assert got[(9, 9)] == 7.0        # left absent → zero


def test_row_col_normalize(m):
    l1 = as_dict(m.row_l1_normalize().df)
    assert l1[(1, 1)] == pytest.approx(1 / 3) and l1[(1, 2)] == pytest.approx(2 / 3)
    l2 = as_dict(m.col_l2_normalize().df)
    assert l2[(1, 1)] == pytest.approx(1 / math.sqrt(1 + 9))
    c = as_dict(m.row_mean_centering().df)
    assert c[(1, 1)] == pytest.approx(-0.5) and c[(1, 2)] == pytest.approx(0.5)


def test_row_size_ave_stdev(m):
    got = {r.row: (r.size, r.mean, r.stdev) for r in m.row_size_ave_stdev().collect()}
    assert got[1] == (2, 1.5, pytest.approx(0.5))
    assert got[3] == (1, 5.0, pytest.approx(0.0))


def test_top_elems_per_axis(m):
    top = as_dict(m.top_row_elems(1).df)
    assert top == {(1, 2): 2.0, (2, 2): 4.0, (3, 3): 5.0}
    topc = as_dict(m.top_col_elems(1).df)
    assert topc == {(2, 1): 3.0, (2, 2): 4.0, (3, 3): 5.0}


def test_keep_remove_cols_elements(spark, m):
    keys = spark.createDataFrame([(1,)], "k long")
    kept = as_dict(m.keep_cols_by(keys).df)
    assert set(kept) == {(1, 1), (2, 1)}
    removed = as_dict(m.remove_cols_by(keys).df)
    assert set(removed) == {(1, 2), (2, 2), (3, 3)}
    sub = Matrix(spark.createDataFrame([(1, 1, 99.0)], SCHEMA))
    assert set(as_dict(m.keep_elements_by(sub).df)) == {(1, 1)}
    assert (1, 1) not in as_dict(m.remove_elements_by(sub).df)


def test_diagonal_inverse(spark):
    d = Matrix(spark.createDataFrame([(1, 1, 2.0), (2, 2, 0.0), (3, 3, 4.0)], SCHEMA))
    got = as_dict(d.diagonal_inverse().df)
    assert got == {(1, 1): 0.5, (3, 3): 0.25}  # zero entry skipped


def test_map_rows_pandas(spark, m):
    def double(pdf):
        pdf = pdf.copy()
        pdf["val"] = pdf["val"] * 2
        return pdf

    got = as_dict(m.map_rows_pandas(double).df)
    assert got[(2, 2)] == 8.0 and len(got) == 5


def test_zip_col_vector(spark, m):
    vec = spark.createDataFrame([(1, 10.0), (3, 30.0)], "row long, val double")
    rows = {(r.row, r.col): (r.val, r.vec_val) for r in m.zip_col_vector(vec).collect()}
    assert rows[(1, 2)] == (2.0, 10.0)
    assert rows[(2, 1)] == (3.0, 0.0)  # absent vector entry → monoid zero


def test_vector_products(spark):
    rv = RowVector(spark.createDataFrame([(1, 2.0), (2, 3.0)], "col long, val double"))
    cv = ColVector(spark.createDataFrame([(1, 4.0), (2, 5.0)], "row long, val double"))
    assert rv.dot(cv).collect()[0].dot == pytest.approx(2 * 4 + 3 * 5)
    outer = as_dict(cv.outer_product(rv).df)
    assert outer == {(1, 1): 8.0, (1, 2): 12.0, (2, 1): 10.0, (2, 2): 15.0}


def test_col_vector_normalize_topk_diag(spark):
    cv = ColVector(spark.createDataFrame(
        [(1, 3.0), (2, -4.0)], "row long, val double"))
    l1 = {r.row: r.val for r in cv.l1_normalize().df.collect()}
    assert l1[1] == pytest.approx(3 / 7) and l1[2] == pytest.approx(-4 / 7)
    l2 = {r.row: r.val for r in cv.l2_normalize().df.collect()}
    assert l2[1] == pytest.approx(3 / 5)
    top = cv.top_elems(1).df.collect()
    assert [(r.row, r.val) for r in top] == [(1, 3.0)]
    d = as_dict(cv.diag().df)
    assert d == {(1, 1): 3.0, (2, 2): -4.0}


def test_row_vector_times_matrix(spark, m):
    rv = RowVector(spark.createDataFrame([(1, 1.0), (2, 1.0), (3, 1.0)],
                                         "col long, val double"))
    got = {r.col: r.val for r in rv.times_matrix(m).df.collect()}
    assert got == {1: 4.0, 2: 6.0, 3: 5.0}  # column sums


def test_permutations_combinations_counts(spark):
    items = list(range(1, 6))
    assert combinatorics.permutations(spark, items, 3).count() == 60   # 5P3
    assert combinatorics.combinations(spark, items, 3).count() == 10   # 5C3
    rows = combinatorics.combinations(spark, items, 2).collect()
    assert all(r.c1 < r.c2 for r in rows)


def test_weighted_sum(spark):
    # 2a + 3b = 12 exactly: (a,b) in {(0,4),(3,2),(6,0)}
    got = {(r.x1, r.x2) for r in
           combinatorics.weighted_sum(spark, [2.0, 3.0], 12.0, 0.0).collect()}
    assert got == {(0, 4), (3, 2), (6, 0)}


def test_gram_matches_matmul_transpose(m):
    assert as_dict(m.gram().df) == as_dict(m.matmul(m.transpose()).df)
    m.unpersist()


# -- pipe-derived scalar products (ScalarOps golden, MatrixTest.scala:127-138,
#    553-596: mat1 = {(1,1)->1,(2,2)->3,(1,2)->4}, trace = 4) ---------------

SCALAR_COO = [(1, 1, 1.0), (2, 2, 3.0), (1, 2, 4.0)]


@pytest.fixture(scope="module")
def sm(spark):
    return Matrix(spark.createDataFrame(SCALAR_COO, SCHEMA))


def test_scalar_literal_products(sm):
    exp3 = {(1, 1): 3.0, (2, 2): 9.0, (1, 2): 12.0}
    assert as_dict((sm * 3.0).df) == exp3          # times3
    assert as_dict((3.0 * sm).df) == exp3          # 3times
    assert as_dict((sm / 3.0).df) == {             # div3
        (1, 1): 1.0 / 3.0, (2, 2): 1.0, (1, 2): 4.0 / 3.0}


def test_scalar_pipe_products(sm):
    tr = sm.trace()  # 1-row frame, value 4.0 — never collected
    exp = {(1, 1): 4.0, (2, 2): 12.0, (1, 2): 16.0}
    assert as_dict((sm * tr).df) == exp            # timestrace
    # tracetimes: scalar-left commutes; spelled scale_by because
    # DataFrame.__mul__ raises before Python tries Matrix.__rmul__
    assert as_dict(sm.scale_by(tr).df) == exp
    assert as_dict((sm / tr).df) == {              # divtrace
        (1, 1): 0.25, (2, 2): 0.75, (1, 2): 1.0}


def test_scalar_pipe_total_sum_normalization(sm):
    # the ADVICE-cited user journey: A / A.sum — entries sum to 1 after
    out = (sm / sm.total_sum()).df
    assert abs(sum(as_dict(out).values()) - 1.0) < 1e-12


def test_scale_by_contract(spark, sm):
    with pytest.raises(ValueError, match="one column"):
        sm.scale_by(sm.df)  # 3 columns
    with pytest.raises(ZeroDivisionError):
        sm / 0
    # NULL scalar (empty matrix's sum) -> empty result, not a crash
    empty = Matrix(spark.createDataFrame([], SCHEMA))
    assert (sm / empty.total_sum()).df.count() == 0


def test_scale_by_plan_is_broadcast_map_only(sm):
    """The matrix side must not shuffle: the only exchange is the 1-row
    scalar's BroadcastExchange (the reference's crossWithTiny)."""
    plan = (sm / sm.total_sum()).df._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_vector_scalar_products(spark):
    row1 = RowVector(spark.createDataFrame(
        [(1, 1.0), (2, 4.0)], "col long, val double"))
    col1 = ColVector(spark.createDataFrame(
        [(1, 1.0), (2, 4.0)], "row long, val double"))
    # scalarRowRight / scalarColRight literal golden (x3)
    assert {r.col: r.val for r in row1.scale(3.0).df.collect()} == \
        {1: 3.0, 2: 12.0}
    assert {r.row: r.val for r in col1.scale(3.0).df.collect()} == \
        {1: 3.0, 2: 12.0}
    # pipe scalar: divide by own sum -> normalized
    s = col1.df.agg(F.sum("val").alias("s"))
    got = {r.row: r.val for r in col1.scale_by(s, divide=True).df.collect()}
    assert got == {1: 0.2, 2: 0.8}
    got_r = {r.col: r.val for r in
             row1.scale_by(s, divide=True).df.collect()}
    assert got_r == {1: 0.2, 2: 0.8}


def test_matrix_persists_are_ledgered(spark):
    """gram()/persist() handles never reach the caller — they must land in
    the session ledger so release_materialized() can free them (the r04
    leak class)."""
    from scalding_spark.session import release_materialized
    cm = spark._jsparkSession.sharedState().cacheManager()
    release_materialized(spark)  # start clean
    was_empty = cm.isEmpty()
    m = Matrix(spark.createDataFrame(COO, SCHEMA))
    m.gram().df.count()
    m2 = Matrix(spark.createDataFrame(COO, SCHEMA)).persist()
    m2.df.count()
    assert not cm.isEmpty()
    release_materialized(spark)
    if was_empty:  # other fixtures may hold their own caches
        assert cm.isEmpty()
