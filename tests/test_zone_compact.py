"""Classified zone join (full/border cover) + quadtree compact/uncompact +
raster focal sum — correctness vs brute twins, invariants, and plan pins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from metric_search_spark.operators.pip import (
    classify_cover,
    point_in_polygon_join,
    zone_join,
)
from metric_search_spark.operators.tiling import (
    compact_tiles,
    tile_focal_sum,
    uncompact_tiles,
)

from tests.sparkutil import get_spark

_POLY_SCHEMA = StructType(
    [
        StructField("poly_id", StringType()),
        StructField(
            "ring",
            ArrayType(
                StructType(
                    [StructField("x", DoubleType()), StructField("y", DoubleType())]
                )
            ),
        ),
    ]
)


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _polys():
    """Seeded star polygons in [0,1]² (same family as test_pip_image)."""
    rng = np.random.default_rng(11)
    out = []
    for j in range(3):
        cx, cy = rng.uniform(0.25, 0.75, 2)
        n_v = int(rng.integers(5, 12))
        angles = np.sort(rng.uniform(0, 2 * np.pi, n_v))
        radii = rng.uniform(0.08, 0.24, n_v)
        out.append(
            (
                f"poly{j}",
                [
                    (float(cx + r * np.cos(a)), float(cy + r * np.sin(a)))
                    for a, r in zip(angles, radii)
                ],
            )
        )
    return out


def _poly_df(spark, polys):
    return spark.createDataFrame(
        [(pid, [{"x": x, "y": y} for x, y in ring]) for pid, ring in polys],
        _POLY_SCHEMA,
    )


def _pts_df(spark, n=400, seed=12):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "x": rng.random(n), "y": rng.random(n)})
    )


def _crossing(px, py, ring):
    c = 0
    n = len(ring)
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        if (ay > py) != (by > py) and px < ax + (py - ay) * (bx - ax) / (by - ay):
            c += 1
    return c % 2 == 1


@pytest.mark.parametrize("res", [3, 5, 7])
def test_zone_join_equals_brute_pip(spark, res):
    """The full/border short-circuit must be invisible in the output: same
    (id, poly_id) set as the brute per-point join at every resolution."""
    polys = _polys()
    poly_df = _poly_df(spark, polys)
    pts = _pts_df(spark)
    z = set(map(tuple, zone_join(pts, poly_df, res=res).collect()))
    p = set(map(tuple, point_in_polygon_join(pts, poly_df, res=res).collect()))
    assert z == p and len(z) > 0


def test_classify_cover_invariants(spark):
    """Full cells are uniformly inside (all four corners + center pass the
    exact test) and ship no ring payload; border cells keep their ring."""
    polys = _polys()
    res = 6
    s = 2.0 ** (-res)
    rows = classify_cover(_poly_df(spark, polys), res=res).collect()
    rings = dict(polys)
    n_full = n_border = 0
    for r in rows:
        cell = r["_cell"]
        assert cell >> 56 == res
        prefix = cell & ((1 << 56) - 1)
        cx = cy = 0
        for b in range(res):
            cx |= ((prefix >> (2 * b)) & 1) << b
            cy |= ((prefix >> (2 * b + 1)) & 1) << b
        if r["is_border"]:
            n_border += 1
            assert r["_rings"] is not None
        else:
            n_full += 1
            assert r["_rings"] is None  # broadcast payload scales with perimeter
            ring = rings[r["poly_id"]]
            eps = s * 1e-6  # nudge corners off edges/vertices
            for px, py in [
                ((cx + 0.5) * s, (cy + 0.5) * s),
                (cx * s + eps, cy * s + eps),
                ((cx + 1) * s - eps, cy * s + eps),
                (cx * s + eps, (cy + 1) * s - eps),
                ((cx + 1) * s - eps, (cy + 1) * s - eps),
            ]:
                assert _crossing(px, py, ring), (r["poly_id"], cx, cy)
    # at res 6 the interiors dominate: the short-circuit must have real work
    assert n_full > 0 and n_border > 0


_RINGS_SCHEMA = StructType(
    [
        StructField("poly_id", StringType()),
        StructField(
            "rings",
            ArrayType(
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                )
            ),
        ),
    ]
)


def _multi():
    """Shell + hole + disjoint island (even-odd across rings)."""
    shell = [(0.20, 0.20), (0.70, 0.22), (0.72, 0.65), (0.25, 0.70)]
    hole = [(0.38, 0.38), (0.55, 0.40), (0.52, 0.55), (0.40, 0.52)]
    island = [(0.80, 0.78), (0.93, 0.82), (0.85, 0.93)]
    return [("m0", [shell, hole, island])]


def _rings_crossing(px, py, rings):
    return (sum(int(_crossing_count(px, py, r)) for r in rings)) % 2 == 1


def _crossing_count(px, py, ring):
    c = 0
    n = len(ring)
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        if (ay > py) != (by > py) and px < ax + (py - ay) * (bx - ax) / (by - ay):
            c += 1
    return c


@pytest.mark.parametrize("res", [4, 6])
def test_multipolygon_zone_join_holes_and_islands(spark, res):
    """zone_join with rings: hole points excluded, island points included,
    and the classified path agrees with both the brute rings join and a
    python even-odd twin."""
    polys = _multi()
    poly_df = spark.createDataFrame(
        [
            (pid, [[{"x": x, "y": y} for x, y in ring] for ring in rings])
            for pid, rings in polys
        ],
        _RINGS_SCHEMA,
    )
    pts = _pts_df(spark, n=600, seed=13)
    z = set(map(tuple, zone_join(pts, poly_df, res=res, rings_col="rings").collect()))
    p = set(
        map(
            tuple,
            point_in_polygon_join(pts, poly_df, res=res, rings_col="rings").collect(),
        )
    )
    assert z == p
    rings = polys[0][1]
    pdf = pts.toPandas()
    want = {
        (int(r.id), "m0") for r in pdf.itertuples() if _rings_crossing(r.x, r.y, rings)
    }
    assert z == want and len(want) > 0
    # the twin must actually exercise the hole and the island
    hole_pt = (0.45, 0.45)
    island_pt = (0.85, 0.83)
    assert not _rings_crossing(*hole_pt, rings)
    assert _rings_crossing(*island_pt, rings)


def test_classify_cover_rings_drops_hole_interior(spark):
    """A cell fully inside the hole is uniformly OUTSIDE the multipolygon:
    it must not appear in the classified cover at all."""
    polys = _multi()
    poly_df = spark.createDataFrame(
        [
            (pid, [[{"x": x, "y": y} for x, y in ring] for ring in rings])
            for pid, rings in polys
        ],
        _RINGS_SCHEMA,
    )
    res = 7
    s = 2.0 ** (-res)
    rows = classify_cover(poly_df, res=res, rings_col="rings").collect()
    rings = polys[0][1]
    cells = {}
    for r in rows:
        prefix = r["_cell"] & ((1 << 56) - 1)
        cx = cy = 0
        for b in range(res):
            cx |= ((prefix >> (2 * b)) & 1) << b
            cy |= ((prefix >> (2 * b + 1)) & 1) << b
        cells[(cx, cy)] = r["is_border"]
    # hole center cell: deep inside the hole, away from its edges
    hx, hy = 0.455, 0.455
    hole_cell = (int(hx / s), int(hy / s))
    assert hole_cell not in cells
    # island interior is covered (full or border), hole rim is border
    ix, iy = 0.85, 0.83
    assert (int(ix / s), int(iy / s)) in cells
    full_cells = [c for c, b in cells.items() if not b]
    assert full_cells, "multipolygon cover must still have full cells"
    for cx, cy in full_cells[:50]:
        assert _rings_crossing((cx + 0.5) * s, (cy + 0.5) * s, rings)


def test_zone_join_points_side_no_shuffle(spark):
    """The points side must reach the broadcast probe without any shuffle
    Exchange: cell assignment is a projection, the join is broadcast-hash,
    and the even-odd filter is row-local."""
    from metric_search_spark.plans import count_exchanges

    polys = _poly_df(spark, _polys())
    pts = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        ((F.element_at("embedding", 1) + 1.0) / 2.0).alias("x"),
        ((F.element_at("embedding", 2) + 1.0) / 2.0).alias("y"),
    )
    out = zone_join(pts, polys, res=6)
    assert count_exchanges(out) == 0
    assert "BroadcastHashJoin" in out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )


def test_zonal_stats_matches_brute(spark):
    """zonal_stats (zone_join + keep_cols ride-through + one aggregate)
    vs a python brute twin, single rings and multipolygon both."""
    from metric_search_spark.operators.pip import zonal_stats

    polys = _polys()
    poly_df = _poly_df(spark, polys)
    pts = _pts_df(spark, n=500, seed=71).withColumn(
        "v", (F.col("id") % 5).cast("int")
    )
    got = {
        (r["poly_id"], r["cnt"], r["val"])
        for r in zonal_stats(pts, poly_df, res=5, value_col="v").collect()
    }
    pdf = pts.toPandas()
    want = {}
    for pid, ring in polys:
        cnt = val = 0
        for row in pdf.itertuples():
            if _crossing(row.x, row.y, ring):
                cnt += 1
                val += int(row.v)
        if cnt:
            want[pid] = (cnt, val)
    assert got == {(p, c, v) for p, (c, v) in want.items()}
    # multipolygon path: shell+hole+island
    mpolys = _multi()
    mdf = spark.createDataFrame(
        [
            (pid, [[{"x": x, "y": y} for x, y in ring] for ring in rings])
            for pid, rings in mpolys
        ],
        _RINGS_SCHEMA,
    )
    got_m = {
        (r["poly_id"], r["cnt"], r["val"])
        for r in zonal_stats(
            pts, mdf, res=6, value_col="v", rings_col="rings"
        ).collect()
    }
    rings = mpolys[0][1]
    cnt = val = 0
    for row in pdf.itertuples():
        if _rings_crossing(row.x, row.y, rings):
            cnt += 1
            val += int(row.v)
    assert got_m == {("m0", cnt, val)}


def _orient(px, py, qx, qy, rx, ry):
    return (qx - px) * (ry - py) - (qy - py) * (rx - px)


def _poly_interiors_intersect(rings_a, rings_b):
    def edges(rings):
        for ring in rings:
            n = len(ring)
            for i in range(n):
                yield ring[i], ring[(i + 1) % n]

    for (a1, a2) in edges(rings_a):
        for (b1, b2) in edges(rings_b):
            o1 = _orient(*a1, *a2, *b1)
            o2 = _orient(*a1, *a2, *b2)
            o3 = _orient(*b1, *b2, *a1)
            o4 = _orient(*b1, *b2, *a2)
            if o1 * o2 < 0 and o3 * o4 < 0:
                return True
    for rings, other in ((rings_a, rings_b), (rings_b, rings_a)):
        for ring in rings:
            if _rings_crossing(*ring[0], other):
                return True
    return False


def test_polygon_intersects_join_matches_brute(spark):
    """Distributed overlay self-join over random star polygons vs a python
    all-pairs twin (proper crossing + per-ring containment)."""
    from metric_search_spark.operators.pip import polygon_intersects_join

    rng = np.random.default_rng(81)
    polys = []
    for j in range(60):
        cx, cy = rng.uniform(0.1, 0.9, 2)
        nv = int(rng.integers(4, 9))
        angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
        radii = rng.uniform(0.02, 0.09, nv)
        polys.append(
            (
                f"p{j:02d}",
                [
                    (float(cx + r * np.cos(a)), float(cy + r * np.sin(a)))
                    for a, r in zip(angles, radii)
                ],
            )
        )
    df = _poly_df(spark, polys)
    got = {
        (r["left_id"], r["right_id"])
        for r in polygon_intersects_join(df, df, res=5).collect()
        if r["left_id"] < r["right_id"]
    }
    want = set()
    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            if _poly_interiors_intersect([polys[i][1]], [polys[j][1]]):
                want.add((polys[i][0], polys[j][0]))
    assert got == want and len(want) > 0


def test_polygon_intersects_join_holes_and_islands(spark):
    """Semantics pins: an island part nested inside the other polygon with
    NO edge crossing must match; a square inside the other's HOLE must
    not."""
    from metric_search_spark.operators.pip import polygon_intersects_join

    shell = [(0.2, 0.2), (0.8, 0.2), (0.8, 0.8), (0.2, 0.8)]
    hole = [(0.4, 0.4), (0.6, 0.4), (0.6, 0.6), (0.4, 0.6)]
    far = [(0.05, 0.05), (0.1, 0.05), (0.1, 0.1), (0.05, 0.1)]
    inner = [(0.25, 0.25), (0.33, 0.25), (0.33, 0.33), (0.25, 0.33)]
    in_hole = [(0.45, 0.45), (0.55, 0.45), (0.55, 0.55), (0.45, 0.55)]
    left = spark.createDataFrame(
        [("A", [[{"x": x, "y": y} for x, y in r] for r in (shell, hole)])],
        _RINGS_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            ("island", [[{"x": x, "y": y} for x, y in r] for r in (far, inner)]),
            ("inhole", [[{"x": x, "y": y} for x, y in in_hole]]),
        ],
        _RINGS_SCHEMA,
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in polygon_intersects_join(
            left, right, res=6, left_rings_col="rings", right_rings_col="rings"
        ).collect()
    }
    assert ("A", "island") in got  # nested part, zero crossings
    assert ("A", "inhole") not in got  # inside the hole = outside A


def test_polygon_intersects_join_no_nested_loop(spark):
    """The big×big overlay must plan as cell-partitioned equi-joins — no
    BroadcastNestedLoopJoin / cartesian product anywhere."""
    from metric_search_spark.entry_queries import q_square_overlap_embeddings
    from metric_search_spark.plans import has_nested_loop_join

    out = q_square_overlap_embeddings(spark, "/root/testdata/sf0.001")
    assert not has_nested_loop_join(out)


def _rand_cells(rng, res, n):
    """n distinct random cells at resolution res."""
    grid = 1 << res
    seen = set()
    while len(seen) < n:
        cx = int(rng.integers(0, grid))
        cy = int(rng.integers(0, grid))
        t = 0
        for b in range(res):
            t |= ((cx >> b) & 1) << (2 * b)
            t |= ((cy >> b) & 1) << (2 * b + 1)
        seen.add((res << 56) | t)
    return sorted(seen)


@pytest.mark.parametrize("seed,n", [(0, 40), (1, 300), (2, 1000)])
def test_compact_uncompact_roundtrip(spark, seed, n):
    """uncompact(compact(S), res) == S for random cell sets, compaction is
    minimal (no complete sibling quartet survives) and non-overlapping."""
    res = 5
    rng = np.random.default_rng(seed)
    cells = _rand_cells(rng, res, n)
    df = spark.createDataFrame([(int(c),) for c in cells], "tile long")
    comp = [r["tile"] for r in compact_tiles(df).collect()]
    # levels well-formed, no duplicate, no quartet of siblings left
    assert len(comp) == len(set(comp))
    by_parent = {}
    for t in comp:
        lvl = t >> 56
        assert 0 <= lvl <= res
        if lvl > 0:
            p = ((lvl - 1) << 56) | ((t & ((1 << 56) - 1)) >> 2)
            by_parent[p] = by_parent.get(p, 0) + 1
    assert all(v < 4 for v in by_parent.values()), "complete quartet not merged"
    # no cell is an ancestor of another
    comp_set = set(comp)
    for t in comp:
        lvl = t >> 56
        pfx = t & ((1 << 56) - 1)
        for up in range(1, lvl + 1):
            assert ((lvl - up) << 56 | (pfx >> (2 * up))) not in comp_set
    # exact roundtrip
    comp_df = spark.createDataFrame([(int(c),) for c in comp], "tile long")
    back = sorted(r["tile"] for r in uncompact_tiles(comp_df, res).collect())
    assert back == cells


def test_compact_full_grid_collapses_to_root(spark):
    """The complete res-3 grid compacts to the single level-0 cell."""
    res = 3
    all_cells = [(int((res << 56) | t),) for t in range(4 ** res)]
    df = spark.createDataFrame(all_cells, "tile long")
    out = [r["tile"] for r in compact_tiles(df).collect()]
    assert out == [0]


def test_compact_respects_groups(spark):
    """by= scopes compaction: the same quartet complete in group A but split
    across groups must only merge inside A."""
    res = 2
    quartet = [(res << 56) | t for t in range(4)]  # siblings of parent 0
    rows = [("a", int(t)) for t in quartet] + [("b", int(quartet[0]))]
    df = spark.createDataFrame(rows, "g string, tile long")
    out = {(r["g"], r["tile"]) for r in compact_tiles(df, by=["g"]).collect()}
    assert ("a", (1 << 56) | 0) in out  # merged to the level-1 parent
    assert ("b", quartet[0]) in out  # lone sibling untouched
    assert len(out) == 2


def test_compact_honors_tile_col_name(spark):
    """compact/uncompact round-trip under a non-default tile column name
    (the output must carry tile_col, not a hardcoded 'tile')."""
    res = 3
    cells = _rand_cells(np.random.default_rng(9), res, 30)
    df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
    comp = compact_tiles(df, tile_col="cell")
    assert comp.columns == ["cell"]
    back = sorted(
        r["cell"] for r in uncompact_tiles(comp, res, tile_col="cell").collect()
    )
    assert back == cells


def test_degenerate_geometry_contributes_nothing(spark):
    """Empty rings and <2-vertex paths must NOT crash the job (Spark's
    sequence(1, 0) counts DOWN to element_at(..., 0)): they contribute no
    edges/segments and disappear from the output."""
    from metric_search_spark.operators.pip import polyline_tiles

    # single-ping + empty paths alongside one real route
    schema = StructType(
        [
            StructField("line_id", StringType()),
            StructField(
                "path",
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                ),
            ),
        ]
    )
    lines = spark.createDataFrame(
        [
            ("ping", [{"x": 0.5, "y": 0.5}]),
            ("empty", []),
            ("real", [{"x": 0.1, "y": 0.1}, {"x": 0.3, "y": 0.2}]),
        ],
        schema,
    )
    got = {r["line_id"] for r in polyline_tiles(lines, res=5).collect()}
    assert got == {"real"}
    # polygon with an empty ring in its rings array: the empty ring adds
    # no crossings; the shell still matches
    shell = [(0.2, 0.2), (0.8, 0.2), (0.8, 0.8), (0.2, 0.8)]
    polys = spark.createDataFrame(
        [("withempty", [[{"x": x, "y": y} for x, y in shell], []])],
        _RINGS_SCHEMA,
    )
    pts = _pts_df(spark, n=50, seed=91)
    rows = zone_join(pts, polys, res=5, rings_col="rings").collect()
    pdf = pts.toPandas()
    want = {
        (int(r.id), "withempty")
        for r in pdf.itertuples()
        if 0.2 < r.x < 0.8 and 0.2 < r.y < 0.8
    }
    assert {(r["id"], r["poly_id"]) for r in rows} == want and want


def test_uncompact_rejects_finer_cells(spark):
    df = spark.createDataFrame([(int((5 << 56) | 3),)], "tile long")
    with pytest.raises(Exception, match="finer than target res"):
        uncompact_tiles(df, 4).collect()


def test_uncompact_is_narrow(spark):
    from metric_search_spark.plans import count_exchanges

    df = get_spark().createDataFrame([(int((2 << 56) | 1),)], "tile long")
    assert count_exchanges(uncompact_tiles(df, 6)) == 0


def _lb_hits(ax, ay, bx, by, xlo, xhi, ylo, yhi):
    """Liang–Barsky segment-vs-closed-box (independent of the engine's
    separating-axis formulation)."""
    tmin, tmax = 0.0, 1.0
    for lo, hi, a0, d in ((xlo, xhi, ax, bx - ax), (ylo, yhi, ay, by - ay)):
        if d == 0:
            if not (lo <= a0 <= hi):
                return False
        else:
            t0, t1 = (lo - a0) / d, (hi - a0) / d
            tmin = max(tmin, min(t0, t1))
            tmax = min(tmax, max(t0, t1))
    return tmin <= tmax


@pytest.mark.parametrize("res,seed", [(4, 31), (6, 32)])
def test_polyline_tiles_matches_liang_barsky_twin(spark, res, seed):
    from metric_search_spark.operators.pip import polyline_tiles

    rng = np.random.default_rng(seed)
    paths = []
    for j in range(3):
        nv = int(rng.integers(3, 8))
        paths.append(
            (f"l{j}", [(float(rng.random()), float(rng.random())) for _ in range(nv)])
        )
    # one exactly-vertical and one exactly-horizontal segment
    paths.append(("laxis", [(0.31, 0.11), (0.31, 0.77), (0.83, 0.77)]))
    schema = StructType(
        [
            StructField("line_id", StringType()),
            StructField(
                "path",
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [(lid, [{"x": x, "y": y} for x, y in p]) for lid, p in paths], schema
    )
    got = {(r["line_id"], r["tile"]) for r in polyline_tiles(df, res=res).collect()}
    s = 2.0 ** (-res)
    grid = 1 << res

    def morton(cx, cy):
        t = 0
        for b in range(res):
            t |= ((cx >> b) & 1) << (2 * b)
            t |= ((cy >> b) & 1) << (2 * b + 1)
        return (res << 56) | t

    want = set()
    for lid, p in paths:
        for i in range(len(p) - 1):
            ax, ay = p[i]
            bx, by = p[i + 1]
            for cx in range(grid):
                for cy in range(grid):
                    if _lb_hits(
                        ax, ay, bx, by, cx * s, (cx + 1) * s, cy * s, (cy + 1) * s
                    ):
                        want.add((lid, morton(cx, cy)))
    assert got == want and len(got) > 0


def test_polyline_tiles_long_diagonal_exact(spark):
    """A segment spanning the whole unit square: the subdivided candidate
    enumeration (linear in the supercover) must still be EXACT vs the
    full-grid Liang–Barsky twin — subdivision generates candidates only,
    the keep test runs against the original endpoints."""
    from metric_search_spark.operators.pip import polyline_tiles

    res = 8
    path = [(0.0123, 0.0317), (0.9811, 0.9437)]
    schema = StructType(
        [
            StructField("line_id", StringType()),
            StructField(
                "path",
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [("diag", [{"x": x, "y": y} for x, y in path])], schema
    )
    got = {r["tile"] for r in polyline_tiles(df, res=res).collect()}
    s = 2.0 ** (-res)
    grid = 1 << res
    (ax, ay), (bx, by) = path

    def morton(cx, cy):
        t = 0
        for b in range(res):
            t |= ((cx >> b) & 1) << (2 * b)
            t |= ((cy >> b) & 1) << (2 * b + 1)
        return (res << 56) | t

    want = {
        morton(cx, cy)
        for cx in range(grid)
        for cy in range(grid)
        if _lb_hits(ax, ay, bx, by, cx * s, (cx + 1) * s, cy * s, (cy + 1) * s)
    }
    assert got == want
    # linear supercover: a res-8 diagonal touches ~2·256 cells, not 256²
    assert len(got) < 4 * grid


def test_polyline_tiles_cover_sampled_points(spark):
    """Any point sampled along a segment must land (via tile_assign) in a
    tile the rasterizer emitted — the supercover guarantee."""
    from metric_search_spark.functions.spatial import cell_from_xy_col
    from metric_search_spark.operators.pip import polyline_tiles

    res = 7
    path = [(0.05, 0.12), (0.61, 0.83), (0.92, 0.31)]
    schema = StructType(
        [
            StructField("line_id", StringType()),
            StructField(
                "path",
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [("l0", [{"x": x, "y": y} for x, y in path])], schema
    )
    tiles = {r["tile"] for r in polyline_tiles(df, res=res).collect()}
    samples = []
    for i in range(len(path) - 1):
        (ax, ay), (bx, by) = path[i], path[i + 1]
        for t in np.linspace(0, 1, 500):
            samples.append((float(ax + t * (bx - ax)), float(ay + t * (by - ay))))
    sdf = spark.createDataFrame(pd.DataFrame(samples, columns=["x", "y"]))
    pts_tiles = {
        r["t"]
        for r in sdf.select(
            cell_from_xy_col(F.col("x"), F.col("y"), res).alias("t")
        ).collect()
    }
    assert pts_tiles <= tiles


def test_polyline_tiles_one_shuffle(spark):
    """Per-segment enumeration + exact test are narrow; only the final
    distinct shuffles."""
    from metric_search_spark.operators.pip import polyline_tiles
    from metric_search_spark.plans import count_exchanges
    from metric_search_spark.entry_queries import _route_lines_df

    out = polyline_tiles(_route_lines_df(spark), res=6)
    assert count_exchanges(out) == 1


def _seg_d2(px, py, ax, ay, bx, by):
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = 0.0 if len2 == 0 else min(1.0, max(0.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    qx, qy = ax + t * dx, ay + t * dy
    return (px - qx) * (px - qx) + (py - qy) * (py - qy)


@pytest.mark.parametrize("res,radius,seed", [(5, 0.06, 41), (7, 0.02, 42)])
def test_nearest_route_join_matches_brute_twin(spark, res, radius, seed):
    """nearest_route_join (raster index + refine + argmin) vs a python
    all-pairs twin; includes a zero-length (repeated-vertex) segment."""
    from metric_search_spark.operators.pip import nearest_route_join

    rng = np.random.default_rng(seed)
    paths = []
    for j in range(3):
        nv = int(rng.integers(3, 7))
        paths.append(
            (f"r{j}", [(float(rng.random()), float(rng.random())) for _ in range(nv)])
        )
    paths.append(("rdup", [(0.41, 0.43), (0.41, 0.43), (0.62, 0.57)]))
    schema = StructType(
        [
            StructField("line_id", StringType()),
            StructField(
                "path",
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                ),
            ),
        ]
    )
    lines = spark.createDataFrame(
        [(lid, [{"x": x, "y": y} for x, y in p]) for lid, p in paths], schema
    )
    pts = _pts_df(spark, n=500, seed=seed + 100)
    got = {
        (r["id"], r["line_id"], r["seg_idx"], round(r["dist2"], 12))
        for r in nearest_route_join(pts, lines, radius=radius, res=res).collect()
    }
    want = set()
    for row in pts.toPandas().itertuples():
        best = None
        for lid, p in paths:
            for k in range(len(p) - 1):
                d2 = _seg_d2(row.x, row.y, *p[k], *p[k + 1])
                if d2 <= radius * radius:
                    cand = (d2, lid, k)
                    if best is None or cand < best:
                        best = cand
        if best is not None:
            want.add((int(row.id), best[1], best[2], round(best[0], 12)))
    assert got == want and len(want) > 0


def test_nearest_route_join_points_shuffle_only_for_argmin(spark):
    """The POINTS table shuffles exactly once (the per-point argmin on id);
    the only other exchange is the routes-side index dedup — a dim-table
    shuffle that never scales with the points."""
    from metric_search_spark.entry_queries import _route_lines_df
    from metric_search_spark.operators.pip import nearest_route_join
    from metric_search_spark.plans import count_exchanges, exchange_partition_keys

    pts = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        ((F.element_at("embedding", 1) + 1.0) / 2.0).alias("x"),
        ((F.element_at("embedding", 2) + 1.0) / 2.0).alias("y"),
    )
    out = nearest_route_join(pts, _route_lines_df(spark), radius=0.05, res=6)
    assert count_exchanges(out) == 2
    keys = exchange_partition_keys(out)
    assert len(keys) == 2
    point_side = [k for k in keys if k.startswith("id#")]
    route_side = [k for k in keys if "line_id" in k and "_seg_idx" in k]
    assert len(point_side) == 1 and len(route_side) == 1, keys


def test_buffer_tiles_matches_brute_dilation(spark):
    """buffer_tiles vs python Chebyshev dilation with grid clamps, per
    group; k=2 exercises the multi-ring path."""
    from metric_search_spark.operators.tiling import buffer_tiles

    res, k = 4, 2
    rng = np.random.default_rng(97)
    grid = 1 << res
    rows = []
    for g in ("a", "b"):
        for c in _rand_cells(rng, res, 12):
            rows.append((g, int(c)))
    df = spark.createDataFrame(rows, "g string, tile long")
    got = {(r["g"], r["tile"]) for r in buffer_tiles(df, res, k=k, by=["g"]).collect()}

    def coords(cell):
        p = cell & ((1 << 56) - 1)
        cx = cy = 0
        for b in range(res):
            cx |= ((p >> (2 * b)) & 1) << b
            cy |= ((p >> (2 * b + 1)) & 1) << b
        return cx, cy

    def morton(cx, cy):
        t = 0
        for b in range(res):
            t |= ((cx >> b) & 1) << (2 * b)
            t |= ((cy >> b) & 1) << (2 * b + 1)
        return (res << 56) | t

    want = set()
    for g, t in rows:
        cx, cy = coords(t)
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                nx, ny = cx + dx, cy + dy
                if 0 <= nx < grid and 0 <= ny < grid:
                    want.add((g, morton(nx, ny)))
    assert got == want


def test_focal_sum_matches_brute_twin(spark):
    """tile_focal_sum vs a per-cell python scatter at res 4, k ∈ {1, 2}."""
    rng = np.random.default_rng(21)
    n, res = 600, 4
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "x": rng.random(n),
            "y": rng.random(n),
            "v": rng.integers(0, 9, n),
        }
    )
    df = spark.createDataFrame(pdf)
    grid = 1 << res

    def quant(u):
        return min(max(int(np.floor(u * (1 << 31))), 0), (1 << 31) - 1) >> (31 - res)

    def morton(cx, cy):
        t = 0
        for b in range(res):
            t |= ((cx >> b) & 1) << (2 * b)
            t |= ((cy >> b) & 1) << (2 * b + 1)
        return (res << 56) | t

    for k in (1, 2):
        got = {
            (r["tile"], r["focal_cnt"], r["focal_val"])
            for r in tile_focal_sum(df, res, k=k, value_col="v").collect()
        }
        agg = {}
        for _, row in pdf.iterrows():
            cxy = (quant(row.x), quant(row.y))
            c, v = agg.get(cxy, (0, 0))
            agg[cxy] = (c + 1, v + int(row.v))
        recv = {}
        for (cx, cy), (c, v) in agg.items():
            for dx in range(-k, k + 1):
                for dy in range(-k, k + 1):
                    rx, ry = cx + dx, cy + dy
                    if 0 <= rx < grid and 0 <= ry < grid:
                        rc, rv = recv.get((rx, ry), (0, 0))
                        recv[(rx, ry)] = (rc + c, rv + v)
        want = {(morton(cx, cy), c, v) for (cx, cy), (c, v) in recv.items()}
        assert got == want


def test_kring_offsets_variant_matches_cells(spark):
    """kring_cells_col(with_offsets=True) must enumerate exactly the same
    clipped cells as the plain variant, with correct (dx, dy) tags."""
    from metric_search_spark.functions.spatial import kring_cells_col

    res, k = 4, 2
    rng = np.random.default_rng(51)
    pdf = pd.DataFrame({"x": rng.random(200), "y": rng.random(200)})
    df = spark.createDataFrame(pdf)
    from metric_search_spark.operators.tiling import tile_assign

    t = tile_assign(df, res)
    plain = t.select(
        "tile", F.explode(kring_cells_col(F.col("tile"), res, k)).alias("c")
    ).collect()
    tagged = t.select(
        "tile",
        F.explode(kring_cells_col(F.col("tile"), res, k, with_offsets=True)).alias(
            "o"
        ),
    ).collect()
    assert {(r["tile"], r["c"]) for r in plain} == {
        (r["tile"], r["o"]["cell"]) for r in tagged
    }
    # offset tags decode consistently: neighbor grid coords = base + (dx, dy)
    for r in tagged[:200]:
        base, o = r["tile"], r["o"]

        def coords(cell):
            p = cell & ((1 << 56) - 1)
            cx = cy = 0
            for b in range(res):
                cx |= ((p >> (2 * b)) & 1) << b
                cy |= ((p >> (2 * b + 1)) & 1) << b
            return cx, cy

        bx, by = coords(base)
        nx, ny = coords(o["cell"])
        assert (nx - bx, ny - by) == (o["dx"], o["dy"])


@pytest.mark.parametrize("k", [1, 2, 3])
def test_kernel_density_matches_brute_twin_exactly(spark, k):
    """Integer-numerator Epanechnikov weights: the distributed density must
    equal the python twin BIT-EXACTLY (no tolerance) — the sum is exact
    longs, divided once."""
    from metric_search_spark.operators.tiling import tile_kernel_density

    rng = np.random.default_rng(60 + k)
    n, res = 500, 4
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "x": rng.random(n),
            "y": rng.random(n),
            "v": rng.integers(0, 9, n),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r["tile"], r["density"], r["wval"])
        for r in tile_kernel_density(df, res, k=k, value_col="v").collect()
    }
    grid = 1 << res
    denom = float((k + 1) ** 2)

    def quant(u):
        return min(max(int(np.floor(u * (1 << 31))), 0), (1 << 31) - 1) >> (31 - res)

    def morton(cx, cy):
        t = 0
        for b in range(res):
            t |= ((cx >> b) & 1) << (2 * b)
            t |= ((cy >> b) & 1) << (2 * b + 1)
        return (res << 56) | t

    agg = {}
    for row in pdf.itertuples():
        key = (quant(row.x), quant(row.y))
        c, v = agg.get(key, (0, 0))
        agg[key] = (c + 1, v + int(row.v))
    num = {}
    for (cx, cy), (c, v) in agg.items():
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                rx, ry = cx + dx, cy + dy
                w = (k + 1) ** 2 - (dx * dx + dy * dy)
                # kernel support is dx²+dy² < (k+1)²: k=3 ring corners fall
                # outside it and contribute nothing (engine drops them too)
                if 0 <= rx < grid and 0 <= ry < grid and w > 0:
                    nc, nv = num.get((rx, ry), (0, 0))
                    num[(rx, ry)] = (nc + w * c, nv + w * v)
    want = {
        (morton(cx, cy), nc / denom, nv / denom) for (cx, cy), (nc, nv) in num.items()
    }
    assert got == want  # exact float equality, by construction
    assert all(d >= 0 for _, d, _ in got)  # Epanechnikov never negative


def test_kernel_density_two_shuffles_only(spark):
    from metric_search_spark.operators.tiling import tile_kernel_density
    from metric_search_spark.plans import count_exchanges

    pts = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        ((F.element_at("embedding", 1) + 1.0) / 2.0).alias("x"),
        ((F.element_at("embedding", 2) + 1.0) / 2.0).alias("y"),
        "label",
    )
    out = tile_kernel_density(pts, 6, k=2, value_col="label")
    assert count_exchanges(out) == 2


def test_focal_sum_two_shuffles_only(spark):
    """The scatter must run over the AGGREGATED raster: exactly two hash
    exchanges (pre-aggregate by tile, re-aggregate by receiving tile) — the
    input is never exploded (2k+1)² ways."""
    from metric_search_spark.plans import count_exchanges

    pts = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        ((F.element_at("embedding", 1) + 1.0) / 2.0).alias("x"),
        ((F.element_at("embedding", 2) + 1.0) / 2.0).alias("y"),
        "label",
    )
    out = tile_focal_sum(pts, 6, k=1, value_col="label")
    assert count_exchanges(out) == 2
