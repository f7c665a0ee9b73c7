"""operators/hull.convex_hull — per-group strict convex hull.

Pins: brute-force directed-edge-test parity on random groups (the same
predicate the DuckDB oracle uses), CCW order + lex-min anchor, soundness
of the per-batch candidate stage under tiny Arrow batches (a batch-local
hull must never lose a global vertex), and degenerate 1/2-point groups.
"""

from __future__ import annotations

import numpy as np

from metric_search_spark.operators.hull import convex_hull, hull_indices
from tests.sparkutil import get_spark


def _brute_vertices(x, y):
    n = len(x)
    out = set()
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            if all(
                (x[b] - x[a]) * (y[c] - y[a]) - (y[b] - y[a]) * (x[c] - x[a]) > 0
                for c in range(n)
                if c not in (a, b)
            ):
                out.add(a)
    return out


def test_kernel_matches_edge_test_and_is_ccw():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(3, 90))
        x, y = rng.uniform(0, 1, n), rng.uniform(0, 1, n)
        idx = hull_indices(x, y)
        assert set(idx.tolist()) == _brute_vertices(x, y)
        hx, hy = x[idx], y[idx]
        m = len(idx)
        for i in range(m):
            cr = (hx[(i + 1) % m] - hx[i]) * (hy[(i + 2) % m] - hy[i]) - (
                hy[(i + 1) % m] - hy[i]
            ) * (hx[(i + 2) % m] - hx[i])
            assert cr > 0  # strictly convex, CCW
        assert (x[idx[0]], y[idx[0]]) == min(zip(x, y))  # lex-min anchor


def test_spark_hull_small_arrow_batches_and_degenerate_groups():
    spark = get_spark()
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "13")  # stage 1 sees many tiny batches
    try:
        rng = np.random.default_rng(3)
        rows = []
        pts = {}
        for g in range(4):
            n = [150, 80, 2, 1][g]
            xs = rng.uniform(0, 1, n)
            ys = rng.uniform(0, 1, n)
            pts[g] = (xs, ys)
            base = g * 1000
            rows += [
                (g, base + i, float(xs[i]), float(ys[i])) for i in range(n)
            ]
        df = spark.createDataFrame(rows, "label int, id long, x double, y double")
        got = convex_hull(df, by=["label"]).collect()
        by_g: dict[int, list] = {}
        for r in got:
            by_g.setdefault(r["label"], []).append(r)
        for g in (0, 1):
            xs, ys = pts[g]
            want = {g * 1000 + i for i in _brute_vertices(xs, ys)}
            assert {r["id"] for r in by_g[g]} == want
            # seq is a CCW walk from the lex-min vertex
            seqs = sorted(by_g[g], key=lambda r: r["seq"])
            assert (seqs[0]["x"], seqs[0]["y"]) == min(zip(xs, ys))
        assert {r["id"] for r in by_g[2]} == {2000, 2001}  # 2-point group
        assert {r["id"] for r in by_g[3]} == {3000}  # 1-point group
    finally:
        spark.conf.set(key, old)
