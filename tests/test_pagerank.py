"""PageRank acceptance tests vs in-test power iteration — the reference's
PageRankTest.scala:22-54 / WeightedPageRankFromMatrixTest.scala:100-167
strategy (analytic goldens, tolerance-based)."""

import pytest
from pyspark.sql import functions as F

from scalding_spark.matrix import Matrix, pagerank

EDGES = [(1, 2, 1.0), (1, 3, 3.0), (2, 3, 1.0), (3, 1, 1.0)]


def golden(weighted: bool, alpha=0.85, iters=25):
    nodes = [1, 2, 3]
    out = {1: [(2, 1.0), (3, 3.0)], 2: [(3, 1.0)], 3: [(1, 1.0)]}
    ranks = {v: 1 / 3 for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, outs in out.items():
            tot = sum(w for _, w in outs) if weighted else len(outs)
            for d, w in outs:
                share = (w / tot) if weighted else (1 / tot)
                contrib[d] += ranks[s] * share
        ranks = {v: (1 - alpha) / 3 + alpha * contrib[v] for v in nodes}
    return ranks


@pytest.mark.parametrize("weighted", [False, True])
def test_pagerank_matches_power_iteration(spark, weighted):
    edges = spark.createDataFrame(EDGES, "src long, dst long, w double")
    got = {r.node: r.rank for r in
           pagerank(edges, iterations=25,
                    weight="w" if weighted else None).collect()}
    want = golden(weighted)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    if weighted:
        # node 3 receives the heavy 3.0 edge → must outrank the unweighted case
        assert got[3] > golden(False)[3]


def test_row_cosine_similarity(spark):
    m = Matrix(spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 0.0), (2, 1, 1.0), (3, 2, 2.0)],
        "row long, col long, val double"))
    sim = {(r.row, r.col): r.val for r in m.row_cosine_similarity().df.collect()}
    assert sim[(1, 2)] == pytest.approx(1.0)   # parallel vectors
    assert sim[(1, 1)] == pytest.approx(1.0)   # self
    assert (1, 3) not in sim                    # orthogonal → zero → pruned
