"""Horn slope/aspect/hillshade hand cases: axis and diagonal octants,
flat cells, interior-only emission, exact integer gradients."""

from __future__ import annotations

from metric_search_spark.operators.flow import slope_aspect
from tests.sparkutil import get_spark

_RES = 3  # 8x8


def _pts(cells):
    rows = []
    for (cx, cy), n in cells.items():
        rows += [((cx + 0.5) / 8, (cy + 0.5) / 8)] * n
    return rows


def _run(cells):
    spark = get_spark()
    df = spark.createDataFrame(_pts(cells), "x double, y double")
    out = slope_aspect(df, _RES).collect()
    # tile -> row, keyed back to (cx, cy) via the cells dict tiles
    from metric_search_spark.functions.spatial import cell_from_cxy_col
    import pyspark.sql.functions as F

    tiles = {
        (cx, cy): spark.range(1)
        .select(cell_from_cxy_col(F.lit(cx), F.lit(cy), _RES))
        .first()[0]
        for (cx, cy) in cells
    }
    by_tile = {r.tile: r for r in out}
    return {k: by_tile.get(t) for k, t in tiles.items()}


def test_axis_gradient_east_west():
    got = _run({(3, 3): 10, (2, 3): 1})
    w = got[(2, 3)]  # peak sits to its east
    assert (w.gx, w.gy, w.g2, w.aspect8, w.shade) == (20, 0, 400, 0, 36)
    p = got[(3, 3)]  # only occupied neighbor to its west
    assert (p.gx, p.gy, p.aspect8, p.shade) == (-2, 0, 4, 14)
    assert p.elev == 10 and w.elev == 1


def test_diagonal_octants():
    got = _run({(1, 1): 1, (2, 2): 7})
    ne = got[(1, 1)]
    assert (ne.gx, ne.gy, ne.aspect8) == (7, 7, 1)
    sw = got[(2, 2)]
    assert (sw.gx, sw.gy, sw.aspect8) == (-1, -1, 5)


def test_flat_and_interior_only():
    got = _run({(5, 5): 4, (0, 2): 3})
    f = got[(5, 5)]
    assert (f.gx, f.gy, f.aspect8, f.shade, f.elev) == (0, 0, 8, 16, 4)
    assert got[(0, 2)] is None  # border cell: excluded, not padded


def test_axis_dominant_wins_inside_22_5_deg():
    # gx=2, gy=5: (2+5)^2=49 > 2*4 but NOT > 2*25 -> axis-dominant N
    got = _run({(4, 3): 1, (5, 4): 2, (4, 4): 1, (3, 4): 1})
    r = got[(4, 3)]
    # neighbors: (5,4) d=(1,1) wx=1,wy=1,z=2; (4,4) d=(0,1) wy=2,z=1;
    #            (3,4) d=(-1,1) wx=-1,wy=1,z=1
    assert (r.gx, r.gy) == (2 - 1, 2 + 2 + 1)
    assert r.aspect8 == 2
