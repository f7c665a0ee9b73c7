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


def test_region_boundaries_hand_computed():
    """Same hand raster: per-region area/perimeter/boundary cells/bbox
    against values computed by hand from the picture (every cell of every
    region here touches free space or the lattice border, so
    boundary_cells == area; perimeter = 4*area - 2*internal_adjacencies)."""
    from metric_search_spark.operators.tiling import region_boundaries

    spark = get_spark()
    out = {
        r.region: (r.area, r.perimeter, r.boundary_cells,
                   r.min_cx, r.min_cy, r.max_cx, r.max_cy)
        for r in region_boundaries(_points_df(spark), _RES).collect()
    }
    regions = _flood(_CELLS, 4)
    assert len(out) == 3
    # key regions by their cell sets, independent of the min-Morton label
    by_cells = {}
    for lab, stats in out.items():
        # recover which flood region this label covers via bbox match
        for fz in set(regions.values()):
            xs = [c[0] for c in fz]
            ys = [c[1] for c in fz]
            if (min(xs), min(ys), max(xs), max(ys)) == stats[3:]:
                by_cells[fz] = stats
    a = frozenset({(1, 0), (2, 0), (0, 1), (1, 1)})  # the top L: 3 adjacencies
    b = frozenset({(2, 2), (2, 3), (3, 3)})          # the bottom L: 2
    c = frozenset({(0, 3)})                          # isolated
    assert by_cells[a][:3] == (4, 4 * 4 - 2 * 3, 4)
    assert by_cells[b][:3] == (3, 4 * 3 - 2 * 2, 3)
    assert by_cells[c][:3] == (1, 4, 1)


def test_region_boundaries_interior_cell():
    """A 3x3 solid block has ONE interior cell: boundary_cells = 8 < area,
    perimeter = 12 (the outline of a 3x3 square)."""
    from metric_search_spark.operators.tiling import region_boundaries

    spark = get_spark()
    rows = [
        ((cx + 0.5) / 8.0, (cy + 0.5) / 8.0)
        for cx in range(3)
        for cy in range(3)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    out = region_boundaries(df, 3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.area, r.perimeter, r.boundary_cells) == (9, 12, 8)
    assert (r.min_cx, r.min_cy, r.max_cx, r.max_cy) == (0, 0, 2, 2)
