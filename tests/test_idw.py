"""IDW gap-fill: hand-computed Shepard p=2 estimates on a tiny raster,
empty-tiles-only output, exact rational arithmetic, validation."""

from __future__ import annotations

import pytest

from metric_search_spark.operators.tiling import idw_fill, tile_assign
from tests.sparkutil import get_spark

# res-2 (4x4) grid; two occupied cells with different densities/values:
#   (0,0): 3 points, labels 1,2,3   (2,1): 1 point, label 10
_POINTS = [
    (0.1, 0.1, 1),
    (0.15, 0.2, 2),
    (0.2, 0.05, 3),
    (0.625, 0.375, 10),
]
_RES = 2


def _df(spark):
    return spark.createDataFrame(_POINTS, "x double, y double, label long")


def test_hand_computed_estimates():
    spark = get_spark()
    out = {
        r["tile"]: (r["est"], r["vest"])
        for r in idw_fill(_df(spark), _RES, k=1, value_col="label").collect()
    }
    # occupied tiles never appear
    occ = {
        r["tile"]
        for r in tile_assign(_df(spark), _RES).select("tile").collect()
    }
    assert not occ & set(out)
    # k=1 ring: d² ∈ {1, 2}, L = lcm = 2 → w(adjacent)=2, w(diagonal)=1.
    # cell (1,0): adjacent to (0,0) [cnt 3, val 6], diagonal to (2,1)
    # [cnt 1, val 10] → MIXED weights: est = (2·3 + 1·1)/(2+1) = 7/3
    tile_10 = (_RES << 56) | 0b01
    est, vest = out[tile_10]
    assert est == pytest.approx(7 / 3, abs=0)
    assert vest == pytest.approx((2 * 6 + 1 * 10) / 3, abs=0)
    # cell (1,1): diagonal to (0,0), adjacent to (2,1) — the opposite mix
    tile_11 = (_RES << 56) | 0b11
    est, vest = out[tile_11]
    assert est == pytest.approx(5 / 3, abs=0)
    assert vest == pytest.approx((1 * 6 + 2 * 10) / 3, abs=0)
    # cell (3,1): only (2,1) in its ring (adjacent) → est = its own stats
    tile_31 = (_RES << 56) | 0b0111
    est, vest = out[tile_31]
    assert est == 1.0 and vest == 10.0


def test_coverage_is_ring_of_occupied_minus_occupied():
    spark = get_spark()
    out = idw_fill(_df(spark), _RES, k=1).collect()
    # occupied (0,0),(2,1): in-grid ring union is 4 + 9 cells sharing
    # {(1,0),(1,1)} ⇒ 11 cells, minus the 2 occupied
    assert len(out) == 9
    assert all(set(r.asDict().keys()) == {"tile", "est"} for r in out)


def test_validation():
    spark = get_spark()
    with pytest.raises(ValueError, match="k"):
        idw_fill(_df(spark), _RES, k=0)
