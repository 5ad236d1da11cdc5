"""SizeHint algebra property tests — the reference property suite
(mathematics/SizeHintTest.scala:27-90) ported to hypothesis, plus the
strategy-dispatch contract (MatrixProduct.scala:86-108): matmul must
broadcast a side whose hint says it's tiny — including a SPARSE side whose
dense dims are huge but whose expected element count is small.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scalding_spark.matrix import (MAX_TINY_JOIN, FiniteHint, Matrix, NoClue,
                                   SizeHint, SparseHint, as_diagonal,
                                   choose_product_strategy)

no_clue = st.just(NoClue())
dim = st.integers(min_value=-1, max_value=1_000_000)
finite = st.builds(FiniteHint, dim, dim)
sparse = st.builds(SparseHint, st.floats(min_value=0.0, max_value=1.0), dim, dim)
any_hint = st.one_of(no_clue, finite, sparse)


def _tot(h):
    return h.total if h.total is not None else -1


@given(any_hint, any_hint)
def test_sum_at_least_as_big_as_operand(a, b):
    if a.total is not None and (a + b).total is not None:
        assert (a + b).total >= a.total


@given(any_hint, any_hint)
def test_ordering_makes_sense(a, b):
    assert _tot(max([a, b], key=_tot)) >= _tot(a)


@given(sparse, sparse)
def test_addition_increases_sparsity_fraction(a, b):
    assert (a + b).sparsity >= a.sparsity


@given(any_hint)
def test_transpose_preserves_size(a):
    assert a.transpose().total == a.total


@given(finite)
def test_squaring_finite_hint_preserves_size(a):
    sq = a.set_rows_to_cols()
    sq2 = a.set_cols_to_rows()
    assert sq.total == (sq * sq).total
    assert sq2.total == (sq2 * sq2).total


@given(finite)
def test_adding_finite_hint_to_itself_preserves_size(a):
    assert (a + a).total == a.total


@given(sparse)
def test_adding_sparse_to_itself_doesnt_decrease_size(a):
    if (a + a).total is not None and a.total is not None:
        assert (a + a).total >= a.total


@given(finite)
def test_diagonals_are_smaller(a):
    d = as_diagonal(a)
    assert (d.total if d.total is not None else -2) < _tot(a) or _tot(a) == -1


@given(finite)
def test_diagonals_about_min_dim(a):
    d = as_diagonal(a).total
    if d is not None:
        m = min(a.rows, a.cols)
        assert m - 1 <= d <= m


@given(any_hint, any_hint, st.floats(min_value=0.0, max_value=1.0))
def test_transpose_law_in_total(a, b, sp):
    # (A B)^T = B^T A^T — for a semantically valid product the inner dims
    # must match (the sparsity saturation estimate uses the inner dim, so
    # mismatched dims saturate differently per side; the reference property
    # suite samples [−1, 1e6] and never hits that boundary)
    if not isinstance(b, NoClue) and not isinstance(a, NoClue):
        b = SparseHint(sp, a.cols, b.cols) if isinstance(b, SparseHint) \
            else FiniteHint(a.cols, b.cols)
    assert (a * b).transpose().total == (b.transpose() * a.transpose()).total


def test_noclue_is_absorbing():
    n = NoClue()
    f = FiniteHint(10, 10)
    assert (n * f).total is None and (f * n).total is None
    assert (n + f).total is None
    assert n.set_cols(5) == FiniteHint(-1, 5)
    assert n.set_rows(5) == FiniteHint(5, -1)


def test_sparse_product_saturates_to_finite():
    # cols * sp_a * sp_b >= 1 collapses to a dense FiniteHint
    a = SparseHint(0.5, 100, 100)
    b = SparseHint(0.5, 100, 100)
    out = a * b
    assert isinstance(out, FiniteHint) and (out.rows, out.cols) == (100, 100)
    tiny = SparseHint(1e-4, 100, 100) * SparseHint(1e-4, 100, 100)
    assert isinstance(tiny, SparseHint)
    assert tiny.sparsity == pytest.approx(100 * 1e-8)


def test_factory_compat():
    assert isinstance(SizeHint(), NoClue)
    assert SizeHint(3, 4) == FiniteHint(3, 4)
    assert SizeHint(3, 4).total == 12
    assert SizeHint(100, 100, 0.01) == SparseHint(0.01, 100, 100)
    assert SizeHint(1, None) == FiniteHint(1, -1)


# --- strategy dispatch (MatrixProduct.scala:90-104) ------------------------

def test_strategy_dispatch_table():
    tiny = FiniteHint(10, 10)
    big = FiniteHint(1_000_000, 1_000_000)
    unknown = NoClue()
    sparse_tiny = SparseHint(1e-10, 10_000_000, 10_000_000)  # 1e14 dense cells, 1e4 expected
    assert sparse_tiny.total < MAX_TINY_JOIN
    assert choose_product_strategy(tiny, big) == "broadcast_left"
    assert choose_product_strategy(big, tiny) == "broadcast_right"
    assert choose_product_strategy(big, big) == "shuffle"
    assert choose_product_strategy(unknown, unknown) == "shuffle"
    # unknown left, huge right: nothing known-tiny → shuffle
    assert choose_product_strategy(unknown, big) == "shuffle"
    # upgrade over the reference's ordering-first dispatch: a known-tiny
    # side is broadcast even when the other side is NoClue
    assert choose_product_strategy(unknown, tiny) == "broadcast_right"
    assert choose_product_strategy(tiny, unknown) == "broadcast_left"
    # the new capability: sparsity, not dense size, drives the choice
    assert choose_product_strategy(big, sparse_tiny) == "broadcast_right"
    assert choose_product_strategy(sparse_tiny, big) == "broadcast_left"


@pytest.mark.usefixtures("spark")
def test_matmul_broadcasts_sparse_tiny_side(spark):
    """A sparse-hinted side with huge dense dims but a tiny expected element
    count must produce a broadcast join (round-1 gap: only known-total dense
    hints triggered it)."""
    import random
    rng = random.Random(3)
    big = spark.createDataFrame(
        [(rng.randrange(1000), rng.randrange(50), 1.0) for _ in range(2000)],
        "row long, col long, val double")
    small = spark.createDataFrame(
        [(i % 50, i, 2.0) for i in range(60)], "row long, col long, val double")
    a = Matrix(big)                                    # NoClue
    b = Matrix(small, hint=SparseHint(1e-14, 10**9, 10**9))
    assert b.hint.total < MAX_TINY_JOIN
    out = a.matmul(b)
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # and the product hint propagated through the sparse algebra
    assert out.hint.total is None  # NoClue * sparse = NoClue

    dense_a = Matrix(big, hint=FiniteHint(1000, 50))
    out2 = dense_a.matmul(b)
    assert isinstance(out2.hint, (SparseHint, FiniteHint))
    plan2 = out2.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2


@given(any_hint, any_hint)
def test_product_total_never_negative(a, b):
    """A product hint's expected count is None (unknown) or >= 0 — never
    negative. SparseHint * with an unknown inner dim used to produce a
    NEGATIVE sparsity/total that the strategy dispatch read as 'tiny' and
    broadcast an unbounded matrix."""
    t = (a * b).total
    assert t is None or t >= 0


@given(any_hint, any_hint)
def test_sum_total_never_negative(a, b):
    t = (a + b).total
    assert t is None or t >= 0


@given(any_hint, any_hint)
def test_dispatch_never_broadcasts_unknown_or_corrupt(a, b):
    """Whatever the hints, the chosen side's expected count must be a known
    non-negative number under the tiny threshold."""
    strat = choose_product_strategy(a, b)
    if strat == "broadcast_left":
        assert a.total is not None and 0 <= a.total < MAX_TINY_JOIN
    elif strat == "broadcast_right":
        assert b.total is not None and 0 <= b.total < MAX_TINY_JOIN
