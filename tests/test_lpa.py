"""Label propagation: clique convergence, smallest-label tie-break,
synchronous (not chained) updates, isolated-node retention."""

from __future__ import annotations

from metric_search_spark.operators.graph import label_propagation
from tests.sparkutil import get_spark


def _run(edges, rounds, nodes=None):
    spark = get_spark()
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = (
        spark.createDataFrame([(n,) for n in nodes], "node long")
        if nodes is not None
        else None
    )
    return {
        r.node: r.label
        for r in label_propagation(e, rounds=rounds, nodes=nd).collect()
    }


def test_two_cliques_converge_to_min_ids():
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    got = _run(edges, rounds=4)
    assert {got[i] for i in range(4)} == {0}
    assert {got[10 + i] for i in range(4)} == {10}


def test_tie_breaks_to_smallest_label():
    # path 0-1-2: node 1 sees labels {0, 2} equally often -> takes 0
    got = _run([(0, 1), (1, 2)], rounds=1)
    assert got[1] == 0
    # endpoints see only the middle
    assert got[0] == 1 and got[2] == 1


def test_updates_are_synchronous():
    # chain 0-1-2-3, one round: each node uses the ROUND-START labels
    got = _run([(0, 1), (1, 2), (2, 3)], rounds=1)
    assert got == {0: 1, 1: 0, 2: 1, 3: 2}


def test_isolated_node_keeps_label():
    got = _run([(0, 1)], rounds=3, nodes=[0, 1, 9])
    assert got[9] == 9
