"""Morton range planning: interval exactness, locality compression,
refine equivalence, guard rails, and the zero-exchange plan pin."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.cells import cell_encode
from metric_search_spark.operators.tiling import morton_ranges, range_lookup
from metric_search_spark.plans.inspect import count_exchanges

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _cells_in_ranges(ranges, cells):
    out = np.zeros(len(cells), dtype=bool)
    for lo, hi in ranges:
        out |= (cells >= lo) & (cells <= hi)
    return out


def test_ranges_cover_exactly_the_bbox_cells():
    # every cell whose CELL contains a bbox-covered grid square is in the
    # ranges; nothing else is
    x0, y0, x1, y1 = 0.11, 0.32, 0.47, 0.65
    res = 6
    ranges = morton_ranges(x0, y0, x1, y1, res)
    n = 1 << res
    want = set()
    for cx in range(int(x0 * n), int(x1 * n) + 1):
        for cy in range(int(y0 * n), int(y1 * n) + 1):
            c = cell_encode(
                np.array([(cx + 0.5) / n]), np.array([(cy + 0.5) / n]), res
            )[0]
            want.add(int(c))
    got = set()
    for lo, hi in ranges:
        got.update(range(lo, hi + 1))
    assert got == want
    # intervals are sorted, disjoint, non-adjacent (maximal merge)
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 + 1 < l2


def test_aligned_power_of_two_bbox_is_one_range():
    # a bbox exactly covering one res-2 quadrant at res 6 is a single
    # contiguous Morton run (the whole point of the z-curve)
    ranges = morton_ranges(0.25, 0.25, 0.4999999, 0.4999999, 6)
    assert len(ranges) == 1
    lo, hi = ranges[0]
    assert hi - lo + 1 == 16 * 16


def test_locality_compression():
    ranges = morton_ranges(0.237, 0.181, 0.561, 0.444, 7)
    n_cells = sum(hi - lo + 1 for lo, hi in ranges)
    assert n_cells == 1428 and len(ranges) == 62  # 23x fewer predicates


def test_max_cells_guard():
    with pytest.raises(ValueError, match="max_cells"):
        morton_ranges(0.0, 0.0, 1.0, 1.0, 12, max_cells=1000)
    with pytest.raises(ValueError, match="bbox"):
        morton_ranges(0.5, 0.0, 0.4, 1.0, 4)


def test_range_lookup_equals_plain_bbox_filter(spark):
    rng = np.random.default_rng(11)
    xs, ys = rng.random(4000), rng.random(4000)
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "id long, x double, y double",
    )
    x0, y0, x1, y1 = 0.217, 0.33, 0.68, 0.71
    got = {r.id for r in range_lookup(df, x0, y0, x1, y1, 6).collect()}
    want = {
        i
        for i, (x, y) in enumerate(zip(xs, ys))
        if x0 <= x <= x1 and y0 <= y <= y1
    }
    assert got == want and want


def test_range_lookup_is_shuffle_free(spark):
    df = spark.range(100).selectExpr(
        "id", "id / 100.0 AS x", "id / 100.0 AS y"
    )
    assert count_exchanges(range_lookup(df, 0.1, 0.1, 0.6, 0.6, 5)) == 0
