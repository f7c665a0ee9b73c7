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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import cell_from_xy_col, spread_bits_col

__all__ = ["point_in_polygon_join", "pip_condition_col", "pip_sql_condition"]


def pip_condition_col(px: Column, py: Column, ring: Column) -> Column:
    """Even-odd crossing test: TRUE iff (px, py) is inside the ring
    (array<struct<x:double, y:double>>, implicitly closed)."""
    n = F.size(ring)
    idx = F.sequence(F.lit(1), n)

    def crossing(i: Column) -> Column:
        a = F.element_at(ring, i.cast("int"))
        b = F.element_at(ring, (F.when(i == n, 1).otherwise(i + 1)).cast("int"))
        ax, ay = a["x"], a["y"]
        bx, by = b["x"], b["y"]
        straddles = (ay > py) != (by > py)
        xint = ax + (py - ay) * (bx - ax) / (by - ay)
        return F.when(straddles & (px < xint), 1).otherwise(0)

    return F.aggregate(idx, F.lit(0), lambda acc, i: acc + crossing(i)) % 2 == 1


def pip_sql_condition(px: str, py: str, ring: list[tuple[float, float]]) -> str:
    """DuckDB twin of pip_condition_col for a CONCRETE ring (list of (x, y)
    vertices known oracle-side): the edge loop unrolls to plain arithmetic —
    the identical comparisons/divisions the Column version evaluates."""
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
    return "((" + " + ".join(terms) + ") % 2 = 1)"


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
) -> DataFrame:
    """Returns (id, poly_id) for every point strictly inside a polygon.
    Polygons are assumed few enough to broadcast (dims side of a spatial
    star join); points scale arbitrarily."""
    ring = F.col(ring_col)
    xs = F.transform(ring, lambda v: v["x"])
    ys = F.transform(ring, lambda v: v["y"])
    s = 2.0 ** (-res)
    n_grid = 1 << res

    def clampg(c: Column) -> Column:
        return F.greatest(F.lit(0), F.least(F.lit(n_grid - 1), c.cast("long")))

    cx_min = clampg(F.floor(F.array_min(xs) / s))
    cx_max = clampg(F.floor(F.array_max(xs) / s))
    cy_min = clampg(F.floor(F.array_min(ys) / s))
    cy_max = clampg(F.floor(F.array_max(ys) / s))

    cover = polygons.select(
        F.col(poly_id_col).alias("poly_id"),
        ring.alias("_ring"),
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(cx_min, cx_max),
                    lambda cx: F.transform(
                        F.sequence(cy_min, cy_max),
                        lambda cy: F.lit(res << 56)
                        + spread_bits_col(cx).bitwiseOR(
                            F.shiftleft(spread_bits_col(cy), 1)
                        ),
                    ),
                )
            )
        ).alias("_cell"),
    )

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
        pip_condition_col(F.col("_px"), F.col("_py"), F.col("_ring"))
    ).select("id", "poly_id")
