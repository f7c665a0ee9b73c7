"""Unit tests for operators/trajectory: discrete Fréchet (scalar vs
batched parity + brute-force recursive reference), Douglas–Peucker
(vs a naive recursive twin), stay-points (vs a naive O(n²) twin).

Reference parity note: the reference's elastic-measure family is 1-D
(TWED.cpp); these are the 2-D geospatial-path analogs built on the same
"sequential over the recurrence, vectorized across everything else"
kernel shape as core.metrics.TWED.
"""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.operators.trajectory import (
    douglas_peucker_mask,
    frechet_many,
    frechet_one,
    hausdorff_one,
    staypoints_one,
)


def _frechet_ref(a: np.ndarray, b: np.ndarray) -> float:
    """Textbook Eiter–Mannila recursion with memo — the independent twin."""
    from functools import lru_cache

    a = np.asarray(a, float)
    b = np.asarray(b, float)

    def d(i, j):
        return float(np.sqrt(((a[i] - b[j]) ** 2).sum()))

    @lru_cache(maxsize=None)
    def c(i, j):
        if i == 0 and j == 0:
            return d(0, 0)
        if i == 0:
            return max(c(0, j - 1), d(0, j))
        if j == 0:
            return max(c(i - 1, 0), d(i, 0))
        return max(min(c(i - 1, j), c(i - 1, j - 1), c(i, j - 1)), d(i, j))

    return c(len(a) - 1, len(b) - 1)


def _dp_ref(x, y, eps):
    """Naive recursive Douglas–Peucker, lowest-index argmax ties."""
    n = len(x)
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True

    def seg_d2(k, i, j):
        ax, ay, bx, by = x[i], y[i], x[j], y[j]
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            return (x[k] - ax) ** 2 + (y[k] - ay) ** 2
        cr = (x[k] - ax) * dy - (y[k] - ay) * dx
        return cr * cr / l2

    def rec(i, j):
        if j - i < 2:
            return
        ds = [seg_d2(k, i, j) for k in range(i + 1, j)]
        m = int(np.argmax(ds))
        if ds[m] > eps * eps:
            k = i + 1 + m
            keep[k] = True
            rec(i, k)
            rec(k, j)

    rec(0, n - 1)
    return keep


def _staypoints_ref(x, y, ts, radius, min_dwell):
    """Naive greedy scan, O(n²) inner loop."""
    n = len(x)
    out = []
    i = 0
    while i < n - 1:
        j = i
        for t in range(i + 1, n):
            if (x[t] - x[i]) ** 2 + (y[t] - y[i]) ** 2 > radius * radius:
                break
            j = t
        if j > i and ts[j] - ts[i] >= min_dwell:
            out.append((i, j))
            i = j + 1
        else:
            i += 1
    return out


@pytest.mark.parametrize("seed", range(5))
def test_frechet_one_vs_ref(seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(rng.integers(2, 12), 2))
    b = rng.normal(size=(rng.integers(2, 12), 2))
    assert frechet_one(a, b) == pytest.approx(_frechet_ref(a, b), abs=1e-12)


def test_frechet_many_matches_one():
    rng = np.random.default_rng(7)
    anchor = rng.normal(size=(9, 2))
    P = rng.normal(size=(40, 6, 2))
    got = frechet_many(P, anchor)
    want = np.array([frechet_one(P[r], anchor) for r in range(len(P))])
    # same DP on same squared distances → bit-identical
    assert (got == want).all()


def test_frechet_identity_and_symmetry():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 2))
    b = rng.normal(size=(5, 2))
    assert frechet_one(a, a) == 0.0
    assert frechet_one(a, b) == pytest.approx(frechet_one(b, a), abs=1e-12)


def test_frechet_lower_bound_endpoints():
    # d_F >= max(d(a0,b0), d(a_end,b_end)) — coupling must pair endpoints
    rng = np.random.default_rng(3)
    for _ in range(10):
        a = rng.normal(size=(6, 2))
        b = rng.normal(size=(7, 2))
        lb = max(
            np.sqrt(((a[0] - b[0]) ** 2).sum()),
            np.sqrt(((a[-1] - b[-1]) ** 2).sum()),
        )
        assert frechet_one(a, b) >= lb - 1e-12


@pytest.mark.parametrize("seed", range(6))
def test_hausdorff_vs_brute_and_frechet_bound(seed):
    rng = np.random.default_rng(seed + 50)
    a = rng.normal(size=(rng.integers(2, 15), 2))
    b = rng.normal(size=(rng.integers(2, 15), 2))
    # brute twin
    d = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2))
    want = max(d.min(axis=1).max(), d.min(axis=0).max())
    got = hausdorff_one(a, b)
    assert got == pytest.approx(want, abs=1e-12)
    # Hausdorff drops the ordering constraint Fréchet keeps → always ≤
    assert got <= frechet_one(a, b) + 1e-12
    assert hausdorff_one(a, a) == 0.0


@pytest.mark.parametrize("seed", range(8))
def test_douglas_peucker_vs_ref(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 40))
    x = np.arange(n) * 0.25
    y = rng.normal(scale=5.0, size=n)
    eps = float(rng.uniform(0.5, 6.0))
    assert (douglas_peucker_mask(x, y, eps) == _dp_ref(x, y, eps)).all()


def test_douglas_peucker_edges():
    assert douglas_peucker_mask(np.array([]), np.array([]), 1.0).size == 0
    assert douglas_peucker_mask(np.array([0.0]), np.array([1.0]), 1.0).tolist() == [
        True
    ]
    # straight line collapses to endpoints
    x = np.arange(10.0)
    m = douglas_peucker_mask(x, 2 * x + 1, 0.01)
    assert m.tolist() == [True] + [False] * 8 + [True]
    # zero-length chord (a == b) falls back to point distance
    x2 = np.array([0.0, 1.0, 0.0])
    y2 = np.array([0.0, 5.0, 0.0])
    assert douglas_peucker_mask(x2, y2, 1.0).tolist() == [True, True, True]


@pytest.mark.parametrize("seed", range(8))
def test_staypoints_vs_ref(seed):
    rng = np.random.default_rng(seed + 100)
    n = int(rng.integers(2, 60))
    # random walk with occasional dwell clusters
    x = np.cumsum(rng.normal(scale=2.0, size=n))
    y = np.cumsum(rng.normal(scale=2.0, size=n))
    ts = np.cumsum(rng.uniform(0.5, 3.0, size=n))
    got = staypoints_one(x, y, ts, radius=3.0, min_dwell=4.0)
    assert got == _staypoints_ref(x, y, ts, 3.0, 4.0)


def test_staypoints_empty_and_dwell_gate():
    assert staypoints_one(np.array([]), np.array([]), np.array([]),
                          radius=1.0, min_dwell=1.0) == []
    # all points coincident but dwell too short → nothing
    z = np.zeros(5)
    assert staypoints_one(z, z, np.arange(5.0), radius=1.0, min_dwell=10.0) == []
    # dwell long enough → one stay covering everything
    assert staypoints_one(z, z, np.arange(5.0) * 10, radius=1.0,
                          min_dwell=10.0) == [(0, 4)]
