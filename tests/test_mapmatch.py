"""Viterbi map matching: coherence vs greedy snap, switch-cost economics,
the drop-uncovered-trajectory contract, reverse-lex tie-break, and brute
all-paths parity for the DP (kernel and Spark end-to-end)."""

from __future__ import annotations

import itertools

import pytest

from metric_search_spark.operators.mapmatch import viterbi_match, viterbi_path
from tests.sparkutil import get_spark

_RES = 4  # 16x16 grid


def _c(i: int) -> float:
    return (i + 0.5) / (1 << _RES)


def _routes_df(spark, routes: dict[str, list[tuple[float, float]]]):
    rows = [(lid, [{"x": x, "y": y} for x, y in path]) for lid, path in routes.items()]
    return spark.createDataFrame(
        rows, "line_id string, path array<struct<x double, y double>>"
    )


def _traj_df(spark, trajs: dict[int, list[tuple[float, float]]]):
    rows = [
        (tid, seq, x, y)
        for tid, pts in trajs.items()
        for seq, (x, y) in enumerate(pts)
    ]
    return spark.createDataFrame(rows, "traj_id long, seq long, x double, y double")


# two horizontal parallel routes: A on row 2, B on row 6 (4 cells apart)
_AB = {
    "A": [(_c(0), _c(2)), (_c(15), _c(2))],
    "B": [(_c(0), _c(6)), (_c(15), _c(6))],
}


def _match(spark, trajs, routes=_AB, k=3, sc=3):
    out = viterbi_match(
        _traj_df(spark, trajs),
        _routes_df(spark, routes),
        res=_RES,
        radius_cells=k,
        switch_cost=sc,
    ).collect()
    by_t: dict[int, dict[int, str]] = {}
    cost: dict[int, int] = {}
    for r in out:
        by_t.setdefault(r["traj_id"], {})[r["seq"]] = r["line_id"]
        cost[r["traj_id"]] = r["cost"]
    return {t: ([m[s] for s in sorted(m)], cost[t]) for t, m in by_t.items()}


def test_single_route_hug():
    spark = get_spark()
    # points exactly on row-2 cells: emission 0 to A, 16 to B (out of k=3)
    trajs = {0: [(_c(i), _c(2)) for i in range(0, 10, 2)]}
    out = _match(spark, trajs)
    assert out[0] == (["A"] * 5, 0)


def test_viterbi_is_coherent_where_greedy_flips():
    spark = get_spark()
    # hug A on row 3 (em 1 to A, 9 to B) but one noisy point on row 5
    # (em 9/1): greedy snap flips to B there; Viterbi pays em 9 instead
    # of 2 switches (cost 6 + em 1)
    pts = [(_c(i), _c(3)) for i in range(5)]
    pts[2] = (_c(2), _c(5))
    out = _match(spark, {0: pts}, k=3, sc=4)
    assert out[0][0] == ["A"] * 5
    assert out[0][1] == 4 * 1 + 9  # four em-1 points + the noisy em-9 point


def test_switch_happens_when_cheap():
    spark = get_spark()
    # first half on A's row, second half on B's row; with a cheap switch
    # the path switches once; with a huge switch cost it stays on one
    pts = [(_c(i), _c(2)) for i in range(3)] + [(_c(i), _c(6)) for i in range(3, 6)]
    out = _match(spark, {0: pts}, k=4, sc=1)
    assert out[0][0] == ["A"] * 3 + ["B"] * 3
    assert out[0][1] == 1  # zero emissions + one switch
    out = _match(spark, {0: pts}, k=4, sc=100)
    # staying costs 3 points x em 16 = 48 on either route; tie -> "A"
    # (reverse-lex smallest), beats 100 + 0
    assert out[0][0] == ["A"] * 6
    assert out[0][1] == 48


def test_uncovered_trajectory_dropped():
    spark = get_spark()
    trajs = {
        0: [(_c(i), _c(2)) for i in range(4)],  # covered
        1: [(_c(0), _c(2)), (_c(8), _c(12))],  # point 1 is >3 cells from both
    }
    out = _match(spark, trajs, k=3)
    assert 0 in out and 1 not in out


def test_tie_break_reverse_lex():
    spark = get_spark()
    # exactly between the rows (row 4): em 4 to each, every step; all
    # constant paths cost 20; tie -> "A" everywhere
    trajs = {0: [(_c(i), _c(4)) for i in range(5)]}
    out = _match(spark, trajs, k=3, sc=5)
    assert out[0] == (["A"] * 5, 20)


def _brute(cands: dict[int, dict[str, int]], n: int, sc: int):
    lines = sorted({r for d in cands.values() for r in d})
    best = None
    for path in itertools.product(lines, repeat=n):
        if any(path[t] not in cands[t] for t in range(n)):
            continue
        cost = sum(cands[t][path[t]] for t in range(n)) + sc * sum(
            path[t] != path[t - 1] for t in range(1, n)
        )
        key = (cost, tuple(reversed(path)))
        if best is None or key < best:
            best = key
    if best is None:
        return None
    return list(best[1])[::-1], best[0]


def test_kernel_brute_parity():
    # pseudo-random candidate structures incl. missing lines per step
    state = 11

    def nxt(m):
        nonlocal state
        state = (state * 48271) % 2147483647
        return state % m

    for trial in range(150):
        n = 2 + nxt(5)
        nlines = 2 + nxt(3)
        sc = nxt(6)
        cands: dict[int, dict[str, int]] = {}
        for t in range(n):
            d = {}
            for li in range(nlines):
                if nxt(4) > 0:  # ~75% present
                    d[f"r{li}"] = nxt(10)
            if not d:
                d[f"r{nxt(nlines)}"] = nxt(10)
            cands[t] = d
        triples = [(t, r, em) for t, d in cands.items() for r, em in d.items()]
        got = viterbi_path(triples, n, sc)
        want = _brute(cands, n, sc)
        assert got == want, f"trial {trial}: {got} != {want}\n{cands=} {sc=}"


def test_validation():
    spark = get_spark()
    t = _traj_df(spark, {0: [(_c(0), _c(2))]})
    r = _routes_df(spark, _AB)
    with pytest.raises(ValueError, match="radius_cells"):
        viterbi_match(t, r, radius_cells=0)
    with pytest.raises(ValueError, match="switch_cost"):
        viterbi_match(t, r, switch_cost=-1)
