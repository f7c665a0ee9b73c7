"""Raster region labeling: pinned against a python flood-fill twin on a
hand-built raster, 4- vs 8-connectivity semantics, and validation errors."""

from __future__ import annotations

import pytest

from metric_search_spark.operators.tiling import label_regions
from tests.sparkutil import get_spark

# two L-shaped blobs touching only diagonally, plus an isolated cell and a
# cell on the grid edge (exercises the boundary guards)
#   . A A .
#   A A . .
#   . . B .
#   C . B B
_CELLS = [
    (1, 0), (2, 0),
    (0, 1), (1, 1),
    (2, 2),
    (0, 3), (2, 3), (3, 3),
]
_RES = 2  # 4x4 grid


def _flood(cells, connectivity):
    """Reference flood fill over grid coords → {cell: frozenset(region)}."""
    cells = set(cells)
    offs = [(1, 0), (-1, 0), (0, 1), (0, -1)]
    if connectivity == 8:
        offs += [(1, 1), (-1, -1), (1, -1), (-1, 1)]
    seen, regions = set(), {}
    for c in cells:
        if c in seen:
            continue
        stack, comp = [c], set()
        while stack:
            cur = stack.pop()
            if cur in comp:
                continue
            comp.add(cur)
            for dx, dy in offs:
                n = (cur[0] + dx, cur[1] + dy)
                if n in cells and n not in comp:
                    stack.append(n)
        seen |= comp
        fz = frozenset(comp)
        for m in comp:
            regions[m] = fz
    return regions


def _points_df(spark):
    # one point per cell, dropped at the cell center of the 4x4 grid
    rows = [((cx + 0.5) / 4.0, (cy + 0.5) / 4.0, cx, cy) for cx, cy in _CELLS]
    return spark.createDataFrame(rows, "x double, y double, cx long, cy long")


@pytest.mark.parametrize("connectivity,n_regions", [(4, 3), (8, 2)])
def test_matches_flood_fill(connectivity, n_regions):
    spark = get_spark()
    out = label_regions(
        _points_df(spark), _RES, connectivity=connectivity
    ).collect()
    assert len(out) == len(_CELLS)
    assert all(r["cnt"] == 1 for r in out)
    expect = _flood(_CELLS, connectivity)
    # decode tile -> (cx, cy) and group by the operator's region label
    by_region = {}
    decoded = {}
    for r in out:
        prefix = r["tile"] & ((1 << 56) - 1)
        cx = ((prefix >> 0) & 1) | (((prefix >> 2) & 1) << 1)
        cy = ((prefix >> 1) & 1) | (((prefix >> 3) & 1) << 1)
        decoded[(cx, cy)] = r["region"]
        by_region.setdefault(r["region"], set()).add((cx, cy))
    assert len(by_region) == n_regions
    for cell, comp in expect.items():
        assert by_region[decoded[cell]] == comp
    # region label is the MIN tile id of its member tiles
    for region, comp in by_region.items():
        tiles = [t for t, r in
                 ((row["tile"], row["region"]) for row in out)
                 if r == region]
        assert region == min(tiles)


def test_counts_aggregate_per_tile():
    spark = get_spark()
    df = _points_df(spark)
    # triple every point: counts must scale, labels must not change
    tripled = df.unionByName(df).unionByName(df)
    out = label_regions(tripled, _RES).collect()
    assert len(out) == len(_CELLS)
    assert all(r["cnt"] == 3 for r in out)


def test_validation():
    spark = get_spark()
    df = _points_df(spark)
    with pytest.raises(ValueError, match="connectivity"):
        label_regions(df, _RES, connectivity=6)
    with pytest.raises(ValueError, match="resolution"):
        label_regions(df, 0)
