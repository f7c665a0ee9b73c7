"""Majority downsampling: hand-built label rasters (quartet majority,
smallest-label ties, weighted counts), true-mode-vs-majority-of-majorities
distinction at depth 2, and a python brute twin."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.cells import interleave_bits
from metric_search_spark.operators.tiling import downsample_mode
from tests.sparkutil import get_spark


def _tid(cx, cy, res):
    return (res << 56) | int(interleave_bits(np.array([cx]), np.array([cy]))[0])


def _run(rows, levels, res, cnt=False):
    spark = get_spark()
    data = [(_tid(cx, cy, res), lab, *( [c] if cnt else [] )) for cx, cy, lab, *c_ in rows for c in [c_[0] if c_ else 1]]
    schema = "tile long, label long" + (", cnt long" if cnt else "")
    df = spark.createDataFrame(data, schema)
    out = downsample_mode(df, levels, cnt_col="cnt" if cnt else None)
    return {(r["res"], r["tile"]): (r["label"], r["cnt"]) for r in out.collect()}


def test_quartet_majority_and_tie():
    res = 2
    # parent (0,0) at res 1 has children (0,0),(1,0),(0,1),(1,1):
    # labels 7,7,7,3 -> mode 7; parent (1,1): children (2,2),(3,2) with
    # labels 5 and 2, one each -> tie -> smaller label 2
    rows = [
        (0, 0, 7), (1, 0, 7), (0, 1, 7), (1, 1, 3),
        (2, 2, 5), (3, 2, 2),
    ]
    out = _run(rows, 1, res)
    assert out[(1, _tid(0, 0, 1))] == (7, 4)
    assert out[(1, _tid(1, 1, 1))] == (2, 2)
    # base level echoes input
    assert out[(2, _tid(1, 1, 2))] == (3, 1)


def test_weighted_counts():
    res = 1
    # one parent (res 0): labels 1 (weight 10) vs 2 (weights 4+5=9)
    rows = [(0, 0, 1, 10), (1, 0, 2, 4), (0, 1, 2, 5)]
    out = _run(rows, 1, res, cnt=True)
    assert out[(0, _tid(0, 0, 0))] == (1, 19)


def test_true_mode_not_majority_of_majorities():
    res = 2
    # res-1 parent A = children with labels [1,1,2], parent B = [2,2,1]
    # (unit weights). Level-1 modes: A->1, B->2. At res 0 the TRUE mode
    # over all six base tiles is a 3-3 tie -> label 1; a
    # majority-of-majorities with collapsed weights would see A:1 w3 vs
    # B:2 w3 (same answer here) — distinguish with weights: make A's
    # minority huge
    rows = [
        (0, 0, 1), (1, 0, 1), (0, 1, 2, ),
        (2, 0, 2), (3, 0, 2), (2, 1, 1),
    ]
    out = _run(rows, 2, res)
    assert out[(0, _tid(0, 0, 0))][0] == 1  # tie 3-3 -> smallest label
    # weighted variant: A = [1x1, 2x5], B = [1x1, 1x1] -> A's mode is 2
    # but the res-0 TRUE mode is 2 (w5) vs 1 (w3) -> 2; a collapsed
    # majority-of-majorities would have seen A:2 w6 vs B:1 w2 -> 2 too;
    # stronger: A = [1x2, 2x3] (mode 2), B = [1x2] -> true: 1 w4 vs 2 w3
    # -> 1; collapsed: A:2 w5 vs B:1 w2 -> 2. Pin the true-mode answer.
    rows = [
        (0, 0, 1, 2), (1, 0, 2, 3),
        (2, 0, 1, 2),
    ]
    out = _run(rows, 2, 2, cnt=True)
    assert out[(0, _tid(0, 0, 0))] == (1, 7)


def test_brute_parity_pseudorandom():
    state = 5

    def nxt(m):
        nonlocal state
        state = (state * 48271) % 2147483647
        return state % m

    res, levels = 3, 3
    rows = []
    for _ in range(60):
        rows.append((nxt(8), nxt(8), nxt(5), 1 + nxt(9)))
    out = _run(rows, levels, res, cnt=True)
    # brute: per level, accumulate label weights from BASE rows
    import collections

    for lvl in range(res, res - levels - 1, -1):
        shift = res - lvl
        dist = collections.defaultdict(lambda: collections.defaultdict(int))
        for cx, cy, lab, w in rows:
            dist[(cx >> shift, cy >> shift)][lab] += w
        for (cx, cy), d in dist.items():
            w, lab = max((w, -l) for l, w in d.items())
            tot = sum(d.values())
            assert out[(lvl, _tid(cx, cy, lvl))] == (-lab, tot), (lvl, cx, cy)


def test_validation():
    spark = get_spark()
    df = spark.createDataFrame([(_tid(0, 0, 1), 1)], "tile long, label long")
    with pytest.raises(ValueError, match="levels"):
        downsample_mode(df, 0)
