"""operators/skyline.skyline_2d — Pareto frontier.

Pins: brute-force dominance parity on random points (hypothesis-free
seeded sweep incl. duplicate points and ix/iy ties), tie co-survival, and
partitioning invariance (the per-partition prefilter must not lose a
global survivor).
"""

from __future__ import annotations

import numpy as np

from metric_search_spark.operators.skyline import skyline_2d
from tests.sparkutil import get_spark


def _brute(pts):
    out = []
    for i, (ix, iy) in enumerate(pts):
        dom = any(
            bx >= ix and by >= iy and (bx > ix or by > iy) for bx, by in pts
        )
        if not dom:
            out.append(i)
    return set(out)


def test_matches_brute_force_with_ties():
    spark = get_spark()
    rng = np.random.default_rng(21)
    # coarse grid forces many ix/iy ties; duplicates + an explicit
    # anti-chain (ids 120/121 duplicated, 122) pin tie co-survival
    pts = [(int(x), int(y)) for x, y in rng.integers(0, 40, size=(120, 2))]
    pts += [(50, 10), (50, 10), (10, 50)] + pts[:5]
    rows = [
        (i, x / (1 << 20), y / (1 << 20)) for i, (x, y) in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    want = _brute(pts)
    assert got == want
    assert {120, 121, 122} <= want  # duplicates co-survive; anti-chain holds


def test_exact_when_candidates_span_many_arrow_batches():
    # regression: the refine must see ALL candidates in one frame — with
    # 7-row Arrow batches a mapInPandas "global" pass would be per-batch
    spark = get_spark()
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        rng = np.random.default_rng(5)
        rows = [
            (i, float(x), float(y))
            for i, (x, y) in enumerate(rng.uniform(0, 1, size=(300, 2)))
        ]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
        pts = [(int(x * (1 << 20)), int(y * (1 << 20))) for _, x, y in rows]
        assert got == _brute(pts)
    finally:
        spark.conf.set(key, old)


def test_partitioning_invariance():
    spark = get_spark()
    rng = np.random.default_rng(22)
    rows = [
        (i, float(x), float(y))
        for i, (x, y) in enumerate(rng.uniform(0, 1, size=(400, 2)))
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    a = sorted(map(tuple, skyline_2d(df, "x", "y").collect()))
    b = sorted(map(tuple, skyline_2d(df.repartition(13), "x", "y").collect()))
    c = sorted(map(tuple, skyline_2d(df.coalesce(1), "x", "y").collect()))
    assert a == b == c
