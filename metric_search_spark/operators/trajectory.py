"""Trajectory operators: discrete Fréchet distance, Douglas–Peucker
simplification, stay-point detection.

The reference's elastic-measure family (TWED.cpp) warps 1-D series; the
geospatial tier wants the 2-D path verbs. All three kernels here run
batched inside Arrow frames: the DP/stack loops iterate over the SHORT
sequence axis (≤ a few dozen points per trajectory) while every step is
vectorized across the batch (Fréchet) or the point axis (DP/stay-points)
— the same "loop over rows of the recurrence, vectorize the rest" shape
as core.metrics.TWED.

Numeric discipline: the Fréchet DP runs on SQUARED L2 (min/max commute
with the monotone sqrt, applied once at the end), so every DP value is an
exact copy of some pairwise d² — no accumulation, hence bit-stable across
engines that compute d² with the same expression shape.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "frechet_one",
    "frechet_many",
    "hausdorff_one",
    "douglas_peucker_mask",
    "staypoints_one",
]


def hausdorff_one(a: np.ndarray, b: np.ndarray) -> float:
    """Symmetric Hausdorff distance between point sets a (nA, 2) and
    b (nB, 2) = max(max_a min_b d, max_b min_a d). The numpy twin of the
    fully-relational q_hausdorff_events plan (min/max SELECT exact d²
    values — no accumulation); always ≤ the Fréchet distance on the same
    polylines (Hausdorff ignores ordering, Fréchet couples it)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
    return float(np.sqrt(max(d2.min(axis=1).max(), d2.min(axis=0).max())))


def frechet_one(a: np.ndarray, b: np.ndarray) -> float:
    """Discrete Fréchet distance (Eiter–Mannila coupling measure) between
    polylines a (nA, 2) and b (nB, 2) — plain O(nA·nB) scalar DP, the
    test twin of frechet_many."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
    nA, nB = d2.shape
    ca = np.empty((nA, nB))
    ca[0, :] = np.maximum.accumulate(d2[0, :])
    for i in range(1, nA):
        ca[i, 0] = max(d2[i, 0], ca[i - 1, 0])
        for j in range(1, nB):
            ca[i, j] = max(
                d2[i, j], min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1])
            )
    return float(np.sqrt(ca[-1, -1]))


def frechet_many(P: np.ndarray, anchor: np.ndarray) -> np.ndarray:
    """Discrete Fréchet distances of a stacked batch P (m, nA, 2) against
    one anchor (nB, 2), swept by ANTIDIAGONALS (VERDICT r4 item 6): cells
    with i+j = d depend only on diagonals d−1/d−2, so each of the
    nA+nB−3 Python-level steps is one vectorized min/max over
    (batch × diagonal) — instead of nA·nB steps each vectorized over the
    batch only. Every operation remains a SELECTION of already-computed
    d² doubles (np.minimum/np.maximum pick one non-NaN input exactly like
    scalar min/max), so results are bit-identical to the row-by-row form
    — pinned by the frechet_one parity test and the driver oracle."""
    P = np.asarray(P, dtype=np.float64)
    anchor = np.asarray(anchor, dtype=np.float64)
    m, nA, _ = P.shape
    nB = len(anchor)
    # d2[r, i, j]: squared L2 between P[r, i] and anchor[j]
    d2 = ((P[:, :, None, :] - anchor[None, None, :, :]) ** 2).sum(axis=3)
    ca = np.empty_like(d2)
    ca[:, 0, :] = np.maximum.accumulate(d2[:, 0, :], axis=1)
    ca[:, :, 0] = np.maximum.accumulate(d2[:, :, 0], axis=1)
    for d in range(2, nA + nB - 1):
        ilo, ihi = max(1, d - nB + 1), min(nA - 1, d - 1)
        if ilo > ihi:
            continue
        i = np.arange(ilo, ihi + 1)
        j = d - i
        m3 = np.minimum(
            np.minimum(ca[:, i - 1, j], ca[:, i - 1, j - 1]), ca[:, i, j - 1]
        )
        ca[:, i, j] = np.maximum(d2[:, i, j], m3)
    return np.sqrt(ca[:, -1, -1])


def _seg_dist2(px, py, ax, ay, bx, by):
    """Squared perpendicular distance of points (px, py) to the LINE
    through (a, b) — the classic Douglas–Peucker deviation (degenerate
    a == b falls back to point distance). Vectorized over points."""
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    if len2 == 0.0:
        return (px - ax) ** 2 + (py - ay) ** 2
    cross = (px - ax) * dy - (py - ay) * dx
    return cross * cross / len2


def douglas_peucker_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask of the Douglas–Peucker simplification of the
    ordered polyline (x, y) with tolerance eps (perpendicular-distance
    criterion, split at the UNIQUE argmax — ties broken by lowest index,
    the convention the SQL twin replicates). Iterative interval stack;
    the per-interval argmax is one vectorized pass."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    eps2 = float(eps) * float(eps)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        px, py = x[i + 1 : j], y[i + 1 : j]
        d2 = _seg_dist2(px, py, x[i], y[i], x[j], y[j])
        k = i + 1 + int(np.argmax(d2))
        if d2[k - i - 1] > eps2:
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def staypoints_one(
    x: np.ndarray,
    y: np.ndarray,
    ts: np.ndarray,
    *,
    radius: float,
    min_dwell: float,
) -> list[tuple[int, int]]:
    """Stay-point detection (Li et al., GIS 2008 greedy anchor scan) over
    ONE time-ordered trajectory: advance an anchor i; let j be the last
    index with EVERY point i..j within `radius` of point i; if
    ts[j] − ts[i] ≥ min_dwell, emit (i, j) and restart at j + 1, else
    advance to i + 1. Returns [(i, j)] index pairs. The all-points reach
    is precomputed vectorized (first violation per anchor); the greedy
    walk is O(n) over anchors."""
    n = len(x)
    r2 = float(radius) * float(radius)
    out: list[tuple[int, int]] = []
    i = 0
    while i < n - 1:
        d2 = (x[i:] - x[i]) ** 2 + (y[i:] - y[i]) ** 2
        bad = np.nonzero(d2 > r2)[0]
        j = i + (int(bad[0]) - 1 if len(bad) else n - 1 - i)
        if j > i and ts[j] - ts[i] >= min_dwell:
            out.append((i, j))
            i = j + 1
        else:
            i += 1
    return out


__all__.append("geofence_transitions")


def geofence_transitions(
    df,
    x0: float,
    y0: float,
    x1: float,
    y1: float,
    *,
    group_col: str = "user_id",
    order_col: str = "event_id",
    x_col: str = "x",
    y_col: str = "y",
):
    """Geofence enter/exit detection — the fleet/telemetry primitive: for
    each group's (order_col)-ordered 2-D track, emit a row at every
    CROSSING of the closed bbox fence [x0,x1]×[y0,y1]: 'enter' when the
    point is inside and its predecessor was not, 'exit' for the reverse.
    The first point of a track emits nothing (no predecessor — a track
    that STARTS inside is not an "entry event", the standard geofencing
    convention). Inside-ness is four double comparisons — exact in any
    engine, no epsilon.

    Plan: one window (lag over the group key) — a single shuffle by
    group, no self-join; 10⁹ tracks is 10⁹ independent partitions.
    Returns (group, order, kind, seq) where seq numbers the group's
    transitions in track order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    inside = (
        (F.col(x_col) >= x0)
        & (F.col(x_col) <= x1)
        & (F.col(y_col) >= y0)
        & (F.col(y_col) <= y1)
    )
    w = Window.partitionBy(group_col).orderBy(order_col)
    t = (
        df.select(group_col, order_col, inside.alias("_in"))
        .withColumn("_prev", F.lag("_in").over(w))
        .where(F.col("_prev").isNotNull() & (F.col("_in") != F.col("_prev")))
    )
    return t.select(
        group_col,
        order_col,
        F.when(F.col("_in"), F.lit("enter")).otherwise(F.lit("exit")).alias("kind"),
        F.row_number()
        .over(Window.partitionBy(group_col).orderBy(order_col))
        .cast("long")
        .alias("seq"),
    )
