"""Point-in-polygon join (north rule operator; no analog in the reference —
closest are quota clustering tree.cpp:1354-1430 and the grid graph
generators graph.cpp:317-528).

Two-stage plan, same shape as the metric joins:

stage 1 (coarse): each polygon expands to the Morton cells covering its
    bounding box (Column math over the ring array; polygons are few, so the
    per-element spread chains are cheap) → broadcast equi-join with the
    points' cells. Cells beyond the bbox never meet the polygon.

stage 2 (exact): ray-crossing (even-odd) test as a pure Column aggregate
    over the polygon edges — odd crossings = inside. JVM-side; the DuckDB
    SQL twin (``pip_sql_condition``) uses the same edge enumeration, so the
    oracle agrees boundary-for-boundary (vertices/edges excluded by
    construction in the fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import (
    cell_from_cxy_col,
    cell_from_xy_col,
)

__all__ = [
    "point_in_polygon_join",
    "polygon_tiles",
    "polyline_tiles",
    "segment_intersections_join",
    "nearest_route_join",
    "zonal_stats",
    "polygon_intersects_join",
    "classify_cover",
    "zone_join",
    "pip_condition_col",
    "pip_rings_condition_col",
    "pip_sql_condition",
    "pip_sql_rings_condition",
    "polygon_metrics",
]


def _edge_index_col(n: Column) -> Column:
    """``sequence(1, n)`` that degrades to EMPTY for n < 1. Spark's
    ``sequence`` with start > stop counts DOWN (sequence(1, 0) = [1, 0]),
    so a degenerate ring/path would evaluate element_at(..., 0) and kill
    the whole job with ELEMENT_AT_BY_INDEX_ZERO; an empty array makes it
    contribute nothing instead."""
    return F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))), lambda _: n >= F.lit(1)
    )


def _crossings_col(px: Column, py: Column, ring: Column) -> Column:
    """Ray-crossing COUNT of (px, py) against one closed ring."""
    n = F.size(ring)
    idx = _edge_index_col(n)

    def crossing(i: Column) -> Column:
        a = F.element_at(ring, i.cast("int"))
        b = F.element_at(ring, (F.when(i == n, 1).otherwise(i + 1)).cast("int"))
        ax, ay = a["x"], a["y"]
        bx, by = b["x"], b["y"]
        straddles = (ay > py) != (by > py)
        xint = ax + (py - ay) * (bx - ax) / (by - ay)
        return F.when(straddles & (px < xint), 1).otherwise(0)

    return F.aggregate(idx, F.lit(0), lambda acc, i: acc + crossing(i))


def pip_condition_col(px: Column, py: Column, ring: Column) -> Column:
    """Even-odd crossing test: TRUE iff (px, py) is inside the ring
    (array<struct<x:double, y:double>>, implicitly closed)."""
    return _crossings_col(px, py, ring) % 2 == 1


def pip_rings_condition_col(px: Column, py: Column, rings: Column) -> Column:
    """Even-odd test over a MULTIPOLYGON: ``rings`` is
    array<array<struct<x,y>>> — outer shells, holes, and disjoint parts are
    all just rings under even-odd (a hole ring flips the parity back out);
    crossings simply sum across rings."""
    total = F.aggregate(
        rings, F.lit(0), lambda acc, ring: acc + _crossings_col(px, py, ring)
    )
    return total % 2 == 1


def pip_sql_crossings(px: str, py: str, ring: list[tuple[float, float]]) -> str:
    """Crossing-count sum for one CONCRETE ring, unrolled to arithmetic."""
    terms = []
    n = len(ring)
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({ay!r} > {py}) != ({by!r} > {py}))"
            f" AND ({px} < {ax!r} + ({py} - {ay!r}) * ({bx - ax!r}) / ({by - ay!r}))"
            f" THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def pip_sql_condition(px: str, py: str, ring: list[tuple[float, float]]) -> str:
    """DuckDB twin of pip_condition_col for a CONCRETE ring (list of (x, y)
    vertices known oracle-side): the edge loop unrolls to plain arithmetic —
    the identical comparisons/divisions the Column version evaluates."""
    return f"({pip_sql_crossings(px, py, ring)} % 2 = 1)"


def pip_sql_rings_condition(
    px: str, py: str, rings: list[list[tuple[float, float]]]
) -> str:
    """DuckDB twin of pip_rings_condition_col: crossings sum across rings."""
    total = " + ".join(pip_sql_crossings(px, py, r) for r in rings)
    return f"(({total}) % 2 = 1)"


def _seg_square_hits(
    ax: Column,
    ay: Column,
    bx: Column,
    by: Column,
    x_lo: Column,
    x_hi: Column,
    y_lo: Column,
    y_hi: Column,
) -> Column:
    """EXACT segment-vs-CLOSED-square intersection by separating axes: the
    bboxes overlap on the x- and y-axes AND the square's four corners do
    not all lie strictly on one side of the segment's supporting line (the
    line-normal axis). The ONE predicate behind both the border classifier
    and the polyline rasterizer — a strictness change here moves both in
    lockstep."""
    bbox = (
        (F.greatest(ax, bx) >= x_lo)
        & (F.least(ax, bx) <= x_hi)
        & (F.greatest(ay, by) >= y_lo)
        & (F.least(ay, by) <= y_hi)
    )
    dx = bx - ax
    dy = by - ay

    def cross(px: Column, py: Column) -> Column:
        return dx * (py - ay) - dy * (px - ax)

    c = [cross(x_lo, y_lo), cross(x_hi, y_lo), cross(x_lo, y_hi), cross(x_hi, y_hi)]
    all_pos = c[0] > 0
    all_neg = c[0] < 0
    for ci in c[1:]:
        all_pos = all_pos & (ci > 0)
        all_neg = all_neg & (ci < 0)
    return bbox & ~all_pos & ~all_neg


def _rings_expr(ring_col: str | None, rings_col: str | None) -> Column:
    """array<array<struct<x,y>>> from either a single-ring column (wrapped)
    or a native multipolygon rings column (used as-is)."""
    if rings_col is not None:
        return F.col(rings_col)
    return F.array(F.col(ring_col))


def _bbox_cover(
    polygons: DataFrame, res: int, poly_id_col: str, rings: Column
) -> DataFrame:
    """(poly_id, _rings, _cx, _cy, _cell) for every res-cell in each
    polygon's bounding box (over ALL rings) — the shared coarse stage of the
    pip join and the polyfill. Pure Column math over the rings array; cells
    of different polygons may repeat (the consumers join/filter per
    polygon)."""
    verts = F.flatten(rings)
    xs = F.transform(verts, lambda v: v["x"])
    ys = F.transform(verts, lambda v: v["y"])
    s = 2.0 ** (-res)
    n_grid = 1 << res

    def clampg(c: Column) -> Column:
        return F.greatest(F.lit(0), F.least(F.lit(n_grid - 1), c.cast("long")))

    cx_min = clampg(F.floor(F.array_min(xs) / s))
    cx_max = clampg(F.floor(F.array_max(xs) / s))
    cy_min = clampg(F.floor(F.array_min(ys) / s))
    cy_max = clampg(F.floor(F.array_max(ys) / s))

    return polygons.select(
        F.col(poly_id_col).alias("poly_id"),
        rings.alias("_rings"),
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(cx_min, cx_max),
                    lambda cx: F.transform(
                        F.sequence(cy_min, cy_max),
                        lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
                    ),
                )
            )
        ).alias("_g"),
    ).select(
        "poly_id",
        "_rings",
        F.col("_g.cx").alias("_cx"),
        F.col("_g.cy").alias("_cy"),
        cell_from_cxy_col(F.col("_g.cx"), F.col("_g.cy"), res).alias("_cell"),
    )


def polygon_tiles(
    polygons: DataFrame,
    *,
    res: int = 4,
    poly_id_col: str = "poly_id",
    ring_col: str = "ring",
    rings_col: str | None = None,
    out_col: str = "tile",
) -> DataFrame:
    """Vector→raster polyfill (H3-polyfill semantics over the Morton grid):
    every tile at ``res`` whose CENTER is strictly inside the polygon.
    Bbox cell enumeration + the same even-odd center test as the pip join —
    pure Column math end-to-end, polygons-side only (no point table), so the
    output is itself broadcastable as the raster side of downstream joins.
    Tile keys match ``tiling.tile_assign`` / ``cell_from_xy_col`` exactly.
    Pass ``rings_col`` (array of rings) for multipolygons with holes."""
    s = 2.0 ** (-res)
    cover = _bbox_cover(polygons, res, poly_id_col, _rings_expr(ring_col, rings_col))
    ctr_x = (F.col("_cx") + 0.5) * s
    ctr_y = (F.col("_cy") + 0.5) * s
    return cover.where(
        pip_rings_condition_col(ctr_x, ctr_y, F.col("_rings"))
    ).select("poly_id", F.col("_cell").alias(out_col))


def _segment_candidate_cells(
    lines: DataFrame, res: int, line_id_col: str, path_col: str, pad: int
) -> DataFrame:
    """Candidate (cell × segment) pairs for polyline operators: explode the
    path into indexed segments, subdivide each into cell-length pieces, and
    enumerate each piece's ``pad``-cell-padded bbox — LINEAR in the
    segment's supercover (a long diagonal never pays its bbox cross
    product), ≤ (2+2·pad)² candidates per piece. Candidates are a SUPERSET
    of the cells within ``(pad−1)·s`` of the segment; consumers apply their
    own exact keep test against the ORIGINAL endpoints (columns
    _ax/_ay/_bx/_by + _seg_idx survive), so interpolation rounding never
    changes their output.

    Returns (line_id, _seg_idx, _ax, _ay, _bx, _by, _g.cx, _g.cy); the same
    (cell, segment) pair may repeat across adjacent pieces."""
    s = 2.0 ** (-res)
    n_grid = 1 << res
    path = F.col(path_col)
    nv = F.size(path)
    segs = lines.select(
        F.col(line_id_col).alias("line_id"),
        F.posexplode(
            F.transform(
                _edge_index_col(nv - 1),
                lambda i: F.struct(
                    F.element_at(path, i.cast("int")).alias("a"),
                    F.element_at(path, (i + 1).cast("int")).alias("b"),
                ),
            )
        ).alias("_seg_idx", "_seg"),
    ).select(
        "line_id",
        "_seg_idx",
        F.col("_seg.a.x").alias("_ax"),
        F.col("_seg.a.y").alias("_ay"),
        F.col("_seg.b.x").alias("_bx"),
        F.col("_seg.b.y").alias("_by"),
    )

    seg_dx = F.col("_bx") - F.col("_ax")
    seg_dy = F.col("_by") - F.col("_ay")
    n_sub = F.greatest(
        F.lit(1),
        F.ceil(F.greatest(F.abs(seg_dx), F.abs(seg_dy)) / F.lit(s)).cast("int"),
    )
    subs = segs.withColumn("_n", n_sub).withColumn(
        "_j", F.explode(F.sequence(F.lit(0), F.col("_n") - 1))
    )
    t0 = F.col("_j").cast("double") / F.col("_n")
    t1 = (F.col("_j") + 1).cast("double") / F.col("_n")
    sx0 = F.col("_ax") + seg_dx * t0
    sx1 = F.col("_ax") + seg_dx * t1
    sy0 = F.col("_ay") + seg_dy * t0
    sy1 = F.col("_ay") + seg_dy * t1

    def clampg(c: Column) -> Column:
        return F.greatest(F.lit(0), F.least(F.lit(n_grid - 1), c.cast("long")))

    cx_min = clampg(F.floor(F.least(sx0, sx1) / s) - pad)
    cx_max = clampg(F.floor(F.greatest(sx0, sx1) / s) + pad)
    cy_min = clampg(F.floor(F.least(sy0, sy1) / s) - pad)
    cy_max = clampg(F.floor(F.greatest(sy0, sy1) / s) + pad)
    return subs.select(
        "line_id",
        "_seg_idx",
        "_ax",
        "_ay",
        "_bx",
        "_by",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(cx_min, cx_max),
                    lambda cx: F.transform(
                        F.sequence(cy_min, cy_max),
                        lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
                    ),
                )
            )
        ).alias("_g"),
    )


def polyline_tiles(
    lines: DataFrame,
    *,
    res: int = 6,
    line_id_col: str = "line_id",
    path_col: str = "path",
    out_col: str = "tile",
) -> DataFrame:
    """Supercover rasterization of polylines: every Morton tile at ``res``
    whose CLOSED cell square intersects any segment of the path
    (array<struct<x,y>>, OPEN — consecutive vertices form segments, no
    closing edge) — the GPS-trace→tiles / road-network→raster operator.

    Plan: explode the path into segments, SUBDIVIDE each segment into
    cell-length pieces (so candidate enumeration is LINEAR in the
    segment's supercover — a long diagonal segment never pays its bbox
    cross product), enumerate each piece's one-cell-padded bbox (≤ 16
    candidate cells, constant), and keep candidates passing the exact
    segment-vs-square separating-axis test AGAINST THE ORIGINAL segment —
    subdivision only generates candidates, so interpolation rounding can
    never change the output (the padding absorbs it). Distinct per line;
    one shuffle (the distinct), everything before it narrow Column math.
    Tile keys match ``tiling.tile_assign`` exactly, so the output feeds
    the focal / rollup / compact operators unchanged.

    The DuckDB oracle recomputes intersection via Liang–Barsky parametric
    clipping — a different geometric formulation entirely (entry/exit
    parameters vs separating axes)."""
    s = 2.0 ** (-res)
    cells = _segment_candidate_cells(lines, res, line_id_col, path_col, pad=1)
    x_lo = F.col("_g.cx").cast("double") * s
    y_lo = F.col("_g.cy").cast("double") * s
    hit = _seg_square_hits(
        F.col("_ax"),
        F.col("_ay"),
        F.col("_bx"),
        F.col("_by"),
        x_lo,
        x_lo + s,
        y_lo,
        y_lo + s,
    )
    tile = cell_from_cxy_col(F.col("_g.cx"), F.col("_g.cy"), res)
    return cells.where(hit).select("line_id", tile.alias(out_col)).distinct()


def nearest_route_join(
    points: DataFrame,
    lines: DataFrame,
    *,
    radius: float,
    res: int = 6,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    line_id_col: str = "line_id",
    path_col: str = "path",
) -> DataFrame:
    """Map-matching join: every point snaps to its NEAREST polyline within
    ``radius`` (Euclidean, point-to-segment). Returns
    (id, line_id, seg_idx, dist2) — one row per matched point; points with
    no route within radius drop out. Ties break deterministically on
    (dist2, line_id, seg_idx).

    Plan: the routes rasterize once into a (cell → segment) index padded by
    ``ceil(radius/s)+1`` cells — every segment within ``radius`` of a point
    is PROVABLY present under the point's own cell (the nearest on-segment
    point q is within radius, q's cell is in the unpadded supercover, and
    the pad covers the Chebyshev gap) — then broadcasts; points equi-join
    on their cell (no shuffle on the points side), refine with the exact
    clamped-projection distance, and one aggregation takes the per-point
    argmin. Pick ``res`` so s ≈ radius: the pad (and the index fan-out)
    stays a small constant while each point meets only ring-local
    segments."""
    import math

    s = 2.0 ** (-res)
    pad = int(math.ceil(radius / s)) + 1
    cand = _segment_candidate_cells(lines, res, line_id_col, path_col, pad=pad)
    cell = cell_from_cxy_col(F.col("_g.cx"), F.col("_g.cy"), res)
    index = cand.select(
        "line_id", "_seg_idx", "_ax", "_ay", "_bx", "_by", cell.alias("_cell")
    ).distinct()

    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
        cell_from_xy_col(
            F.col(x_col).cast("double"), F.col(y_col).cast("double"), res
        ).alias("_cell"),
    )
    j = pts.join(F.broadcast(index), "_cell")
    dx = F.col("_bx") - F.col("_ax")
    dy = F.col("_by") - F.col("_ay")
    len2 = dx * dx + dy * dy
    t = F.when(
        len2 > 0,
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                ((F.col("_px") - F.col("_ax")) * dx + (F.col("_py") - F.col("_ay")) * dy)
                / len2,
            ),
        ),
    ).otherwise(F.lit(0.0))
    qx = F.col("_ax") + t * dx
    qy = F.col("_ay") + t * dy
    d2 = (F.col("_px") - qx) * (F.col("_px") - qx) + (F.col("_py") - qy) * (
        F.col("_py") - qy
    )
    scored = j.select(
        "id",
        F.struct(
            d2.alias("d2"), F.col("line_id"), F.col("_seg_idx").alias("seg_idx")
        ).alias("_c"),
    ).where(F.col("_c.d2") <= float(radius) * float(radius))
    return (
        scored.groupBy("id")
        .agg(F.min("_c").alias("_b"))
        .select(
            "id",
            F.col("_b.line_id").alias("line_id"),
            F.col("_b.seg_idx").alias("seg_idx"),
            F.col("_b.d2").alias("dist2"),
        )
    )


def _edges_cross_col(rings_a: Column, rings_b: Column) -> Column:
    """TRUE iff any edge of any ring of A PROPERLY crosses any edge of any
    ring of B (strict orientation-sign test; touching endpoints / collinear
    overlap are measure-zero under generic coordinates and excluded by
    design — pair it with the containment test for interiors-intersect
    semantics)."""

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    def ring_pair(ra: Column, rb: Column) -> Column:
        na, nb = F.size(ra), F.size(rb)

        def edge_a(i: Column) -> Column:
            a1 = F.element_at(ra, i.cast("int"))
            a2 = F.element_at(ra, (F.when(i == na, 1).otherwise(i + 1)).cast("int"))

            def edge_b(j: Column) -> Column:
                b1 = F.element_at(rb, j.cast("int"))
                b2 = F.element_at(
                    rb, (F.when(j == nb, 1).otherwise(j + 1)).cast("int")
                )
                o1 = orient(a1["x"], a1["y"], a2["x"], a2["y"], b1["x"], b1["y"])
                o2 = orient(a1["x"], a1["y"], a2["x"], a2["y"], b2["x"], b2["y"])
                o3 = orient(b1["x"], b1["y"], b2["x"], b2["y"], a1["x"], a1["y"])
                o4 = orient(b1["x"], b1["y"], b2["x"], b2["y"], a2["x"], a2["y"])
                return (o1 * o2 < 0) & (o3 * o4 < 0)

            return F.exists(_edge_index_col(nb), edge_b)

        return F.exists(_edge_index_col(na), edge_a)

    return F.exists(
        rings_a, lambda ra: F.exists(rings_b, lambda rb: ring_pair(ra, rb))
    )


def polygon_intersects_join(
    left: DataFrame,
    right: DataFrame,
    *,
    res: int = 6,
    left_id_col: str = "poly_id",
    right_id_col: str = "poly_id",
    left_ring_col: str = "ring",
    right_ring_col: str = "ring",
    left_rings_col: str | None = None,
    right_rings_col: str | None = None,
) -> DataFrame:
    """Spatial overlay join: (left_id, right_id) for every polygon pair
    whose INTERIORS intersect — a proper edge crossing, or one polygon
    containing the other (decided by a strictly-interior vertex; touching
    boundaries are measure-zero under generic coordinates and excluded).

    The big×big shape (neither side broadcasts): each side classifies its
    cover once (cells that are border or interior — a pair with
    intersecting interiors PROVABLY shares such a cell, since any common
    interior point's cell is non-outside for both), the covers meet in a
    cell-partitioned SHUFFLE equi-join carrying ids only, candidate pairs
    dedup by id (the LSH discipline: geometry never rides the candidate
    explosion), and each surviving pair re-joins its two vertex lists once
    for the O(Ea·Eb) exact refine. Skew from dense cells is bounded by the
    per-cell polygon counts, and the candidate dedup collapses multi-cell
    overlaps before any geometry moves."""
    lrings = _rings_expr(left_ring_col, left_rings_col)
    rrings = _rings_expr(right_ring_col, right_rings_col)
    lcover = classify_cover(
        left, res=res, poly_id_col=left_id_col,
        ring_col=left_ring_col, rings_col=left_rings_col,
    ).select(F.col("poly_id").alias("_lid"), "_cell")
    rcover = classify_cover(
        right, res=res, poly_id_col=right_id_col,
        ring_col=right_ring_col, rings_col=right_rings_col,
    ).select(F.col("poly_id").alias("_rid"), "_cell")
    cand = lcover.join(rcover, "_cell").select("_lid", "_rid").distinct()

    def geom(df: DataFrame, id_col: str, rings: Column, tag: str) -> DataFrame:
        verts = F.flatten(rings)
        xs = F.transform(verts, lambda v: v["x"])
        ys = F.transform(verts, lambda v: v["y"])
        return df.select(
            F.col(id_col).alias(f"_{tag}id"),
            rings.alias(f"_{tag}rings"),
            F.array_min(xs).alias(f"_{tag}x0"),
            F.array_max(xs).alias(f"_{tag}x1"),
            F.array_min(ys).alias(f"_{tag}y0"),
            F.array_max(ys).alias(f"_{tag}y1"),
        )

    pairs = cand.join(geom(left, left_id_col, lrings, "l"), "_lid").join(
        geom(right, right_id_col, rrings, "r"), "_rid"
    )

    # containment: any ring's lead vertex of one side strictly interior to
    # the other (checked per RING, not just the first — a multipolygon
    # island nested with no edge crossing is caught by its own ring; a
    # boundary point strictly inside an open interior implies the
    # interiors intersect, so this never over-reports)
    def any_vertex_in(rings: Column, other: Column) -> Column:
        return F.exists(
            rings,
            lambda ring: pip_rings_condition_col(
                F.element_at(ring, 1)["x"], F.element_at(ring, 1)["y"], other
            ),
        )

    # bbox overlap is NECESSARY for interior intersection — F.when forces
    # the skip, so the O(Ea·Eb) refine evaluates only on bbox-overlapping
    # pairs (the cell join over-generates: two polygons in one dense cell
    # need not come near each other)
    bbox_overlap = (
        (F.col("_lx0") <= F.col("_rx1"))
        & (F.col("_rx0") <= F.col("_lx1"))
        & (F.col("_ly0") <= F.col("_ry1"))
        & (F.col("_ry0") <= F.col("_ly1"))
    )
    refine = (
        _edges_cross_col(F.col("_lrings"), F.col("_rrings"))
        | any_vertex_in(F.col("_lrings"), F.col("_rrings"))
        | any_vertex_in(F.col("_rrings"), F.col("_lrings"))
    )
    hit = F.when(bbox_overlap, refine).otherwise(F.lit(False))
    return pairs.where(hit).select(
        F.col("_lid").alias("left_id"), F.col("_rid").alias("right_id")
    )


def zonal_stats(
    points: DataFrame,
    polygons: DataFrame,
    *,
    res: int = 6,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    value_col: str | None = None,
    poly_id_col: str = "poly_id",
    ring_col: str = "ring",
    rings_col: str | None = None,
) -> DataFrame:
    """Zonal statistics: per-polygon count (and exact integral value sum)
    of the points inside it — the classic raster/vector zonal-stats op,
    composed as zone_join → one aggregation. Inherits the classified
    cover's cost shape (interior points never run the O(edges) test); the
    value column rides THROUGH the zone join (``keep_cols``, no re-join),
    and the only added shuffle is the map-side-combining aggregate whose
    state is one row per polygon no matter how many points flow in."""
    keep: tuple[str, ...] = ()
    if value_col is not None:
        points = points.withColumn("_val", F.col(value_col).cast("long"))
        keep = ("_val",)
    matched = zone_join(
        points,
        polygons,
        res=res,
        id_col=id_col,
        x_col=x_col,
        y_col=y_col,
        poly_id_col=poly_id_col,
        ring_col=ring_col,
        rings_col=rings_col,
        keep_cols=keep,
    )
    aggs = [F.count("*").alias("cnt")]
    if value_col is not None:
        aggs.append(F.sum("_val").alias("val"))
    return matched.groupBy("poly_id").agg(*aggs)


def _edge_in_cell_col(rings: Column, cx: Column, cy: Column, res: int) -> Column:
    """TRUE iff any edge of any ring intersects the CLOSED cell square
    [cx·s, (cx+1)·s] × [cy·s, (cy+1)·s]. EXACT segment-vs-square test by
    separating axes: the bboxes overlap (x- and y-axes) AND the square's
    four corners do not all lie strictly on one side of the segment's
    supporting line (the line-normal axis). Exactness matters for cost,
    not correctness: a bbox-only detector marks every cell in a long
    diagonal edge's bounding box as border, inflating the fraction of
    points that pay the O(edges) even-odd test downstream — the
    separating-axis test keeps border cells to the ~perimeter/s the zone
    join's cost model promises."""
    s = 2.0 ** (-res)
    x_lo = cx.cast("double") * s
    y_lo = cy.cast("double") * s
    x_hi = x_lo + s
    y_hi = y_lo + s

    def ring_hits(ring: Column) -> Column:
        n = F.size(ring)

        def hits(i: Column) -> Column:
            a = F.element_at(ring, i.cast("int"))
            b = F.element_at(
                ring, (F.when(i == n, 1).otherwise(i + 1)).cast("int")
            )
            bbox = (
                (F.greatest(a["x"], b["x"]) >= x_lo)
                & (F.least(a["x"], b["x"]) <= x_hi)
                & (F.greatest(a["y"], b["y"]) >= y_lo)
                & (F.least(a["y"], b["y"]) <= y_hi)
            )
            dx = b["x"] - a["x"]
            dy = b["y"] - a["y"]

            def cross(px: Column, py: Column) -> Column:
                return dx * (py - a["y"]) - dy * (px - a["x"])

            c = [
                cross(x_lo, y_lo),
                cross(x_hi, y_lo),
                cross(x_lo, y_hi),
                cross(x_hi, y_hi),
            ]
            all_pos = c[0] > 0
            all_neg = c[0] < 0
            for ci in c[1:]:
                all_pos = all_pos & (ci > 0)
                all_neg = all_neg & (ci < 0)
            return bbox & ~all_pos & ~all_neg

        return F.exists(_edge_index_col(n), hits)

    return F.exists(rings, ring_hits)


def classify_cover(
    polygons: DataFrame,
    *,
    res: int = 6,
    poly_id_col: str = "poly_id",
    ring_col: str = "ring",
    rings_col: str | None = None,
) -> DataFrame:
    """Full/border classification of each polygon's covering cells at ``res``
    (H3 polyfill-with-interior semantics):

    - ``is_border = true``  — some edge (of any ring) intersects the cell
      square: the cell MAY straddle the boundary, so membership of a point
      inside it needs the exact even-odd test.
    - ``is_border = false`` — no edge touches the closed cell square, so the
      cell is uniformly inside or outside; center-inside keeps it as a FULL
      interior cell (every point in it is inside the polygon, no test needed).
      Cells uniformly outside are dropped here — they can never contribute.

    Pass ``rings_col`` for multipolygons with holes: a cell fully inside a
    hole is uniformly outside (its center's even-odd parity across all rings
    says so) and drops; hole boundaries classify as border like any edge.

    The rings array is nulled out on full cells: the broadcast payload
    carries vertex lists only where a downstream exact test can read them,
    so the broadcast size scales with the boundary (O(perimeter/s) cells
    keep rings) rather than the area.

    Returns (poly_id, _rings, _cell, is_border).
    """
    s = 2.0 ** (-res)
    cover = _bbox_cover(polygons, res, poly_id_col, _rings_expr(ring_col, rings_col))
    ctr_in = pip_rings_condition_col(
        (F.col("_cx") + 0.5) * s, (F.col("_cy") + 0.5) * s, F.col("_rings")
    )
    border = _edge_in_cell_col(F.col("_rings"), F.col("_cx"), F.col("_cy"), res)
    return (
        cover.withColumn("is_border", border)
        .where(F.col("is_border") | ctr_in)
        .select(
            "poly_id",
            F.when(F.col("is_border"), F.col("_rings")).alias("_rings"),
            "_cell",
            "is_border",
        )
    )


def zone_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    res: int = 6,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id_col: str = "poly_id",
    ring_col: str = "ring",
    rings_col: str | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Point-in-polygon join through a FULL/BORDER-classified cover — same
    output as :func:`point_in_polygon_join`, but the O(edges) even-odd test
    runs only for points whose cell straddles the boundary; points landing in
    full interior cells pass through on the equi-join alone. Pass
    ``rings_col`` for multipolygons with holes; ``keep_cols`` carries extra
    point columns through to the output (for downstream aggregation without
    a re-join).

    The 100-TB shape: at resolution r the cover of a polygon has O(area/s²)
    cells but only O(perimeter/s) of them are border cells, so the exact-test
    fraction shrinks like s·perimeter/area as r grows — the dominant cost
    becomes the broadcast hash probe per point, not the per-edge loop. Raise
    ``res`` until border cells are thin, bounded by the broadcast budget
    (full cells carry no ring payload — see :func:`classify_cover`)."""
    cover = classify_cover(
        polygons,
        res=res,
        poly_id_col=poly_id_col,
        ring_col=ring_col,
        rings_col=rings_col,
    )
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
        cell_from_xy_col(
            F.col(x_col).cast("double"), F.col(y_col).cast("double"), res
        ).alias("_cell"),
        *[F.col(c) for c in keep_cols],
    )
    joined = pts.join(F.broadcast(cover), "_cell")
    # full cells short-circuit: TRUE OR <test on null rings> is TRUE
    # row-wise, so the even-odd aggregate only evaluates for border rows
    return joined.where(
        (~F.col("is_border"))
        | pip_rings_condition_col(F.col("_px"), F.col("_py"), F.col("_rings"))
    ).select("id", "poly_id", *keep_cols)


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    *,
    res: int = 4,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    poly_id_col: str = "poly_id",
    ring_col: str = "ring",
    rings_col: str | None = None,
) -> DataFrame:
    """Returns (id, poly_id) for every point strictly inside a polygon.
    Polygons are assumed few enough to broadcast (dims side of a spatial
    star join); points scale arbitrarily. Pass ``rings_col`` for
    multipolygons with holes (even-odd across all rings)."""
    cover = _bbox_cover(
        polygons, res, poly_id_col, _rings_expr(ring_col, rings_col)
    ).select("poly_id", "_rings", "_cell")

    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
        cell_from_xy_col(
            F.col(x_col).cast("double"), F.col(y_col).cast("double"), res
        ).alias("_cell"),
    )

    joined = pts.join(F.broadcast(cover), "_cell")
    return joined.where(
        pip_rings_condition_col(F.col("_px"), F.col("_py"), F.col("_rings"))
    ).select("id", "poly_id")


def polygon_metrics(
    polys: DataFrame,
    *,
    id_col: str = "poly_id",
    ring_col: str = "ring",
    scale_bits: int = 30,
) -> DataFrame:
    """Shoelace polygon metrics: signed area, centroid, vertex count per
    simple ring — the zonal bookkeeping (tile weighting, zone densities)
    next to zonal_stats. Returns (poly_id, n_vertices, area, cx, cy).

    Exactness: vertices quantize to ⌊v·2ˢ⌋ int64 grid coordinates; the
    shoelace cross terms crᵢ = ixᵢ·iyᵢ₊₁ − ixᵢ₊₁·iyᵢ (≤ 2⁶¹, exact long)
    and the centroid numerators (ixᵢ+ixᵢ₊₁)·crᵢ (≤ 2⁹², exact
    decimal(38,0)/HUGEINT) reduce as order-free integer sums; the closing
    divisions (A = |Σcr|/2·2⁻²ˢ, C = Σnum/(3·Σcr)·2⁻ˢ) are fixed IEEE
    chains on identical exact integers in both engines, with the 2ᵏ
    un-scalings pure exponent shifts. Signs cancel between numerator and
    Σcr, so centroid is orientation-independent; area is |·| (unsigned).

    Plan shape: ONE posexplode + lead window per ring (partitioned by
    polygon — rings are per-row small, the window never sees cross-polygon
    data) + one map-side-combined aggregate. Degenerate rings (< 3
    vertices or zero area) drop."""
    dec = "decimal(38,0)"
    verts = polys.select(
        F.col(id_col).alias("pid"),
        F.posexplode(F.col(ring_col)).alias("i", "v"),
    ).select(
        "pid",
        "i",
        F.floor(F.col("v.x") * F.lit(float(1 << scale_bits)))
        .cast("long")
        .alias("ix"),
        F.floor(F.col("v.y") * F.lit(float(1 << scale_bits)))
        .cast("long")
        .alias("iy"),
    )
    w = Window.partitionBy("pid").orderBy("i")
    # the ring-closing wrap vertex must be i=0 BY ORDER, not by arrival:
    # first() over a partitionBy-only window reads whatever row order the
    # exchange produced — an ordered full-frame first_value pins it
    wf = Window.partitionBy("pid").orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    nxt = verts.select(
        "pid",
        "ix",
        "iy",
        F.coalesce(F.lead("ix").over(w), F.first("ix").over(wf)).alias("jx"),
        F.coalesce(F.lead("iy").over(w), F.first("iy").over(wf)).alias("jy"),
    )
    cr = F.col("ix") * F.col("jy") - F.col("jx") * F.col("iy")
    agg = (
        nxt.select(
            "pid",
            cr.cast(dec).alias("cr"),
            ((F.col("ix") + F.col("jx")).cast(dec) * cr.cast(dec)).alias("cxn"),
            ((F.col("iy") + F.col("jy")).cast(dec) * cr.cast(dec)).alias("cyn"),
        )
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("cr").alias("a2"),
            F.sum("cxn").alias("sx"),
            F.sum("cyn").alias("sy"),
        )
    )
    s2 = float(1 << (2 * scale_bits))
    s1 = float(1 << scale_bits)
    a3 = F.col("a2").cast("double") * F.lit(3.0)
    return agg.where((F.col("n_vertices") >= 3) & (F.col("a2") != 0)).select(
        F.col("pid").alias(id_col),
        "n_vertices",
        (F.abs(F.col("a2")).cast("double") * F.lit(0.5) / F.lit(s2)).alias("area"),
        (F.col("sx").cast("double") / a3 / F.lit(s1)).alias("cx"),
        (F.col("sy").cast("double") / a3 / F.lit(s1)).alias("cy"),
    )


def segment_intersections_join(
    lines: DataFrame,
    *,
    res: int = 5,
    line_id_col: str = "line_id",
    path_col: str = "path",
) -> DataFrame:
    """Polyline × polyline PROPER-crossing join — where do routes cross?
    (network conflation, trajectory conflict detection). A proper crossing
    is strict double-straddling: each segment's endpoints lie strictly on
    opposite sides of the other's supporting line (all four orientation
    products < 0); touching endpoints and collinear overlaps are excluded
    by definition — callers wanting touch semantics relax the strict
    inequalities.

    Plan: both sides index into the exact supercover (the polyline_tiles
    candidate machinery: cell-length subdivision + padded bbox + exact
    separating-axis keep, so a crossing's containing cell is provably in
    BOTH segments' cell sets), then ONE cell equi-join (line_a < line_b —
    distinct lines only), distinct on the segment-pair key, and the exact
    orientation filter + parametric intersection point. Never a segment ×
    segment product: candidates are co-located by cell exactly like every
    other spatial join in the engine; the distinct bounds repeated cells
    per pair. Intersection point: t = cross(c−a, d−c)/cross(b−a, d−c),
    evaluated in the same IEEE order as the DuckDB twin.

    Returns (line_a, seg_a, line_b, seg_b, ix, iy), round(12) points."""
    s = 2.0 ** (-res)
    cells = _segment_candidate_cells(lines, res, line_id_col, path_col, pad=1)
    x_lo = F.col("_g.cx").cast("double") * s
    y_lo = F.col("_g.cy").cast("double") * s
    hit = _seg_square_hits(
        F.col("_ax"),
        F.col("_ay"),
        F.col("_bx"),
        F.col("_by"),
        x_lo,
        x_lo + s,
        y_lo,
        y_lo + s,
    )
    seg_cells = (
        cells.where(hit)
        .select(
            "line_id",
            "_seg_idx",
            "_ax",
            "_ay",
            "_bx",
            "_by",
            F.col("_g.cx").alias("cx"),
            F.col("_g.cy").alias("cy"),
        )
        .distinct()
    )
    a = seg_cells.select(
        F.col("line_id").alias("line_a"),
        F.col("_seg_idx").alias("seg_a"),
        F.col("_ax").alias("ax"),
        F.col("_ay").alias("ay"),
        F.col("_bx").alias("bx"),
        F.col("_by").alias("by"),
        "cx",
        "cy",
    )
    b = seg_cells.select(
        F.col("line_id").alias("line_b"),
        F.col("_seg_idx").alias("seg_b"),
        F.col("_ax").alias("cx2x"),
        F.col("_ay").alias("cx2y"),
        F.col("_bx").alias("dx2x"),
        F.col("_by").alias("dx2y"),
        "cx",
        "cy",
    )
    pairs = (
        a.join(b, ["cx", "cy"])
        .where(F.col("line_a") < F.col("line_b"))
        .select(
            "line_a",
            "seg_a",
            "line_b",
            "seg_b",
            "ax",
            "ay",
            "bx",
            "by",
            "cx2x",
            "cx2y",
            "dx2x",
            "dx2y",
        )
        .distinct()
    )

    def cross2(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")
    cx_, cy_ = F.col("cx2x"), F.col("cx2y")
    dx_, dy_ = F.col("dx2x"), F.col("dx2y")
    d1 = cross2(ax, ay, bx, by, cx_, cy_)
    d2 = cross2(ax, ay, bx, by, dx_, dy_)
    d3 = cross2(cx_, cy_, dx_, dy_, ax, ay)
    d4 = cross2(cx_, cy_, dx_, dy_, bx, by)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)
    denom = (bx - ax) * (dy_ - cy_) - (by - ay) * (dx_ - cx_)
    t = ((cx_ - ax) * (dy_ - cy_) - (cy_ - ay) * (dx_ - cx_)) / denom
    return pairs.where(proper).select(
        "line_a",
        F.col("seg_a").cast("long").alias("seg_a"),
        "line_b",
        F.col("seg_b").cast("long").alias("seg_b"),
        F.round(ax + t * (bx - ax), 12).alias("ix"),
        F.round(ay + t * (by - ay), 12).alias("iy"),
    )


def line_of_sight(
    pairs: DataFrame,
    obstacles: DataFrame,
    *,
    res: int = 6,
    pair_id_col: str = "pair_id",
    obstacle_tile_col: str = "tile",
) -> DataFrame:
    """Raster line-of-sight: for each sight line (pair_id, ax, ay, bx, by),
    is the straight segment blocked by any obstacle tile? The visibility
    primitive of viewshed / coverage / mesh-connectivity analyses, as a
    pure composition of existing machinery: the segment's SUPERCOVER
    tiles (exact separating-axis test — the ``polyline_tiles`` kernel)
    joined against the obstacle tile set.

    Semantics: blocked ⟺ the CLOSED segment a→b intersects the CLOSED
    square of an obstacle tile (endpoints sitting inside an obstacle
    count — the conservative reading every occlusion test wants).
    Returns (pair_id, blocked, n_blocking) for EVERY input pair —
    n_blocking = distinct obstacle tiles touched.

    Scale shape: candidate enumeration is linear in each segment's
    supercover (cell-length subdivision, ≤16-cell padded bboxes — see
    ``_segment_candidate_cells``); the obstacle join is a tile equi-join
    (broadcastable when the obstacle raster is small, hash otherwise);
    one aggregate per pair. No theta-join, no UDF."""
    lines = pairs.select(
        F.col(pair_id_col).alias("line_id"),
        F.array(
            F.struct(
                F.col("ax").cast("double").alias("x"),
                F.col("ay").cast("double").alias("y"),
            ),
            F.struct(
                F.col("bx").cast("double").alias("x"),
                F.col("by").cast("double").alias("y"),
            ),
        ).alias("path"),
    )
    tiles = polyline_tiles(lines, res=res)
    obs = obstacles.select(F.col(obstacle_tile_col).alias("tile")).distinct()
    hits = (
        tiles.join(obs, "tile")
        .groupBy("line_id")
        .agg(F.count("*").alias("n_blocking"))
    )
    return (
        pairs.select(F.col(pair_id_col).alias("pair_id"))
        .distinct()
        .join(hits.withColumnRenamed("line_id", "pair_id"), "pair_id", "left")
        .select(
            "pair_id",
            F.coalesce("n_blocking", F.lit(0)).cast("long").alias("n_blocking"),
        )
        .withColumn("blocked", F.col("n_blocking") > 0)
    )


__all__ += ["line_of_sight"]
