"""HITS integer power method: hand-computed goldens (star, chain),
multi-edge and self-loop conventions, isolated-node zeros, and numpy
matrix-power parity on a random digraph."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.operators.graph import hits

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _run(spark, edges, iters, nodes=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = (
        spark.createDataFrame([(x,) for x in nodes], "node long")
        if nodes is not None
        else None
    )
    return {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(e, n, iters=iters).collect()
    }


def test_star_golden(spark):
    # 0 -> 1,2,3. a_1 = [0,1,1,1]; h_1 = [3,0,0,0];
    # a_2 = indeg-weighted h: a_2(v) = h_1(0) = 3 for v in 1..3;
    # h_2(0) = 3+3+3 = 9.
    got = _run(spark, [(0, 1), (0, 2), (0, 3)], iters=2)
    assert got[0] == (9, 0)
    assert got[1] == got[2] == got[3] == (0, 3)


def test_multiedge_and_selfloop(spark):
    # double edge 0->1 counts twice; self-loop 2->2 feeds itself.
    got = _run(spark, [(0, 1), (0, 1), (2, 2)], iters=1)
    assert got[0] == (4, 0)  # h_1(0) = 2 * a_1(1) = 2*2
    assert got[1] == (0, 2)  # a_1(1) = 2 * h_0(0)
    assert got[2] == (1, 1)  # the loop: a_1(2)=h_0(2)=1, h_1(2)=a_1(2)=1


def test_isolated_node_zero(spark):
    got = _run(spark, [(0, 1)], iters=3, nodes=[0, 1, 9])
    assert got[9] == (0, 0)


def test_matrix_power_parity(spark):
    rng = np.random.default_rng(8)
    n = 12
    A = np.zeros((n, n), dtype=np.int64)  # A[u, v] = multiplicity u->v
    edges = []
    for _ in range(30):
        u, v = int(rng.integers(0, n)), int(rng.integers(0, n))
        A[u, v] += 1
        edges.append((u, v))
    h = np.ones(n, dtype=np.int64)
    for _ in range(5):
        a = A.T @ h
        h = A @ a
    got = _run(spark, edges, iters=5, nodes=list(range(n)))
    for v in range(n):
        assert got[v] == (h[v], a[v]), v
