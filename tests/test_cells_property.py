"""Property-based invariants of the Morton cell index (hypothesis) —
round-trips, hierarchy coherence, and k-ring membership under arbitrary
[0,1)² coordinates. Pure numpy, no Spark session."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from metric_search_spark.cells import (
    cell_children,
    cell_encode,
    cell_from_phash,
    cell_parent,
    cell_size,
    cell_to_xy,
    coords_from_phash,
    kring,
    phash_from_xy,
)

unit = st.floats(min_value=0.0, max_value=1.0, exclude_max=True, allow_nan=False)
res_s = st.integers(min_value=1, max_value=12)


@settings(max_examples=200, deadline=None)
@given(x=unit, y=unit)
def test_phash_roundtrip_within_grid_cell(x, y):
    """xy -> phash -> xy lands at the enclosing full-res cell center:
    |x − x'| < half a 2^-31 cell."""
    ph = phash_from_xy(np.array([x]), np.array([y]))
    assert 0 <= int(ph[0]) < (1 << 62)
    rx, ry = coords_from_phash(ph)
    assert abs(rx[0] - x) <= 2.0**-32 + 1e-15
    assert abs(ry[0] - y) <= 2.0**-32 + 1e-15


@settings(max_examples=200, deadline=None)
@given(x=unit, y=unit, res=res_s)
def test_cell_contains_its_point_and_parent_nests(x, y, res):
    cell = int(cell_encode(np.array([x]), np.array([y]), res)[0])
    r, cx, cy = cell_to_xy(np.array([cell]))
    assert int(r[0]) == res
    s = cell_size(res)
    assert cx[0] * s <= x < (cx[0] + 1) * s
    assert cy[0] * s <= y < (cy[0] + 1) * s
    # parent at res-1 is the same point's cell one level coarser
    parent = int(cell_parent(np.array([cell]))[0])
    assert parent == int(cell_encode(np.array([x]), np.array([y]), res - 1)[0])
    # and the cell is among its parent's 4 children
    assert cell in set(int(c) for c in cell_children(parent))


@settings(max_examples=100, deadline=None)
@given(x=unit, y=unit, res=st.integers(min_value=2, max_value=10),
       k=st.integers(min_value=0, max_value=3))
def test_kring_is_exactly_the_chebyshev_ball(x, y, res, k):
    """kring(c, k) = every in-bounds cell within Chebyshev distance k —
    derived independently from grid indices."""
    cell = int(cell_encode(np.array([x]), np.array([y]), res)[0])
    _, cx, cy = cell_to_xy(np.array([cell]))
    cx, cy = int(cx[0]), int(cy[0])
    n = 1 << res
    want = {
        int(cell_encode(np.array([(gx + 0.5) / n]), np.array([(gy + 0.5) / n]), res)[0])
        for gx in range(max(0, cx - k), min(n - 1, cx + k) + 1)
        for gy in range(max(0, cy - k), min(n - 1, cy + k) + 1)
    }
    got = set(int(c) for c in kring(cell, k))
    assert got == want
