"""Property-based pins for the exact polygon relate kernel: on random
CONVEX lattice polygons (where an independent exact oracle exists), the
piece-classification decision procedure must agree with the integer
Separating-Axis Theorem — for convex A, B: closures disjoint iff some
edge-normal axis shows a strict projection gap; interiors disjoint but
touching iff the minimum axis overlap is exactly zero; else interiors
intersect. Plus structural invariants on arbitrary inputs: symmetry,
orientation-independence, and area>0 <=> overlaps."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from metric_search_spark.operators.relate import (
    intersection_area2,
    relate_rings,
)


def _hull(points):
    """Monotone-chain convex hull (exact ints), CCW, no collinear runs."""
    pts = sorted(set(points))
    if len(pts) < 3:
        return None

    def half(seq):
        out = []
        for p in seq:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lo = half(pts)
    hi = half(pts[::-1])
    ring = lo[:-1] + hi[:-1]
    return ring if len(ring) >= 3 else None


def _sat_relate_convex(a, b):
    """Independent exact oracle for CONVEX rings: SAT over the edge
    normals of both polygons, projections compared in exact ints."""
    axes = []
    for ring in (a, b):
        n = len(ring)
        for i in range(n):
            dx = ring[(i + 1) % n][0] - ring[i][0]
            dy = ring[(i + 1) % n][1] - ring[i][1]
            axes.append((-dy, dx))
    min_overlap = None
    for nx, ny in axes:
        pa = [nx * x + ny * y for x, y in a]
        pb = [nx * x + ny * y for x, y in b]
        ov = min(max(pa), max(pb)) - max(min(pa), min(pb))
        # normalize per-axis scale is unnecessary: only the SIGN of the
        # overlap matters, and zero is scale-free
        if ov < 0:
            return "disjoint"
        if ov == 0:
            min_overlap = 0
    return "touches" if min_overlap == 0 else "overlaps"


coord = st.integers(min_value=0, max_value=12)
point = st.tuples(coord, coord)
cloud = st.lists(point, min_size=3, max_size=7)


@settings(max_examples=300, deadline=None)
@given(cloud, cloud, st.integers(0, 8), st.integers(0, 8))
def test_convex_relate_matches_sat(ca, cb, ox, oy):
    """Kernel == SAT on convex hulls of small lattice clouds (offset b
    so disjoint/touch/overlap all occur), in both argument orders."""
    a = _hull(ca)
    b = _hull([(x + ox, y + oy) for x, y in cb])
    if a is None or b is None:
        return
    want = _sat_relate_convex(a, b)
    assert relate_rings(a, b) == want
    assert relate_rings(b, a) == want


@settings(max_examples=150, deadline=None)
@given(cloud, cloud, st.integers(0, 8), st.integers(0, 8))
def test_area_consistent_with_relate(ca, cb, ox, oy):
    """area > 0 <=> relate == overlaps; area symmetric; orientation
    (CW input) changes nothing."""
    a = _hull(ca)
    b = _hull([(x + ox, y + oy) for x, y in cb])
    if a is None or b is None:
        return
    rel = relate_rings(a, b)
    a2 = intersection_area2(a, b)
    assert (a2 > 0) == (rel == "overlaps")
    # the pinned float MEASURE is argument-order-dependent by design
    # (pieces of dA fold before dB) — swapping args may move the last
    # ulp; the sign and ~1e-12 relative agreement must hold
    swapped = intersection_area2(b, a)
    assert abs(swapped - a2) <= 1e-9 * max(1.0, abs(a2))
    # reversing an input ring normalizes back to the SAME CCW list, so
    # this one is bit-identical
    assert intersection_area2(a[::-1], b) == a2
    assert relate_rings(a[::-1], b[::-1]) == rel
