"""D8 flow routing over the occupied tile raster: steepest-gradient
pointers, flow accumulation, and basin (mode) labeling.

The classic raster-hydrology trio (O'Callaghan & Mark 1984 D8 flow
direction; flow accumulation = contributing cells; watershed = basin of
the terminal cell) applied to a DENSITY surface: each occupied tile
points at its strictly-denser 8-neighbor with the steepest rise — i.e.
grid mode-seeking (the discrete mean-shift / DENCLUE hill-climb), where
basins are the attraction regions of local density maxima. Running it
uphill on counts instead of downhill on elevations changes nothing
algorithmically (negate the surface); counts are what a point table
gives us exactly.

Exactness: the "steepest" comparison is rise/dist with dist ∈ {1, √2}.
Comparing rise²/dist² cross-multiplied by the only two dist² values
turns the argmax key into the exact integer ``rise² · (2/dist²)`` =
``2·rise²`` for axis neighbors, ``rise²`` for diagonals — no floats
anywhere, so the result is bit-identical across engines. Ties break to
the smallest neighbor tile id. Flow requires a STRICTLY denser
neighbor, so pointer chains strictly ascend the surface and the flow
graph is a forest — acyclicity (and loop termination) by construction.

100-TB shape (the label_regions argument): the only full-data pass is
the occupancy aggregate; everything after runs on the occupied-cell
table, ≤ 4^res rows regardless of input size. Neighbor candidates are
eight shifted EQUI-joins of that table with itself (no theta-join);
the accumulation peel and the pointer-doubling mode resolution are
loops over the raster, with rounds bounded by the longest strictly-
ascending chain (peel) / its log₂ (doubling) — a property of the
surface, never of the input row count. Per-round results are eager
localCheckpoints with superseded generations released deterministically
(the CC/BFS lineage pattern).

Returns one row per occupied tile:
  (tile, elev, flow_to, mode, acc)
  - elev: the cell's point count (the density surface)
  - flow_to: the D8 steepest-ascent neighbor tile (NULL at local maxima)
  - mode: terminal tile of the pointer chain — the basin label
  - acc: 1 + Σ acc(upstream) = number of cells whose chains pass
    through this tile (inclusive), the accumulation raster
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import cell_from_cxy_col, quantize_col
from metric_search_spark.operators.graph import _release_checkpoint

__all__ = ["d8_flow"]

_D8_OFFSETS = [
    (1, 0), (-1, 0), (0, 1), (0, -1),
    (1, 1), (1, -1), (-1, 1), (-1, -1),
]


def d8_flow(
    df: DataFrame,
    res: int,
    *,
    x_col: str = "x",
    y_col: str = "y",
    max_rounds: int = 4096,
) -> DataFrame:
    """D8 steepest-ascent flow over the occupied res-``res`` tile raster
    of normalized [0,1) points. See module docstring for semantics."""
    if not 1 <= res <= 27:
        raise ValueError(f"resolution {res} out of [1, 27]")
    shift = 31 - res
    lim = 1 << res
    occ = (
        df.select(
            F.shiftright(quantize_col(F.col(x_col).cast("double")), shift).alias("cx"),
            F.shiftright(quantize_col(F.col(y_col).cast("double")), shift).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("elev"))
        .withColumn("tile", cell_from_cxy_col(F.col("cx"), F.col("cy"), res))
        .localCheckpoint(eager=True)
    )

    # --- D8 direction: eight shifted equi-joins, exact-integer argmax ---
    legs = []
    right = occ.select(
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
        F.col("tile").alias("nbr"),
        F.col("elev").alias("nbr_elev"),
    )
    for dx, dy in _D8_OFFSETS:
        nx, ny = F.col("cx") + dx, F.col("cy") + dy
        legs.append(
            occ.where((nx >= 0) & (nx < lim) & (ny >= 0) & (ny < lim)).select(
                "tile",
                "elev",
                nx.alias("jx"),
                ny.alias("jy"),
                F.lit(dx * dx + dy * dy).alias("d2"),
            )
        )
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)
    cand = cand.join(right, ["jx", "jy"]).where(F.col("nbr_elev") > F.col("elev"))
    rise = F.col("nbr_elev") - F.col("elev")
    # rise²·(2/d2) ∈ ℤ because d2 ∈ {1, 2}; ties → smallest neighbor id
    key = (rise * rise * F.when(F.col("d2") == 1, 2).otherwise(1)).cast("long")
    flow = (
        cand.groupBy("tile")
        .agg(F.max(F.struct(key.alias("key"), (-F.col("nbr")).alias("neg"))).alias("m"))
        .select("tile", (-F.col("m.neg")).alias("flow_to"))
    )
    state = (
        occ.join(flow, "tile", "left")
        .join(
            flow.groupBy(F.col("flow_to").alias("tile")).agg(
                F.count("*").alias("pend")
            ),
            "tile",
            "left",
        )
        .select(
            "tile",
            "elev",
            "flow_to",
            F.lit(1).cast("long").alias("acc"),
            F.coalesce(F.col("pend"), F.lit(0)).cast("long").alias("pend"),
            F.lit(False).alias("pushed"),
        )
        .localCheckpoint(eager=True)
    )
    _release_checkpoint(occ)

    # --- accumulation: topological peel, upstream-first ---
    # A cell "pushes" its acc to flow_to once all its own inflow has
    # arrived (pend == 0). Each edge delivers exactly once; rounds =
    # longest ascending chain + 1, raster-bounded.
    for _ in range(max_rounds):
        mover = (F.col("pend") == 0) & F.col("flow_to").isNotNull() & ~F.col("pushed")
        movers = state.where(mover).select("flow_to", "acc")
        if movers.isEmpty():
            break
        contrib = movers.groupBy(F.col("flow_to").alias("tile")).agg(
            F.sum("acc").alias("add"), F.count("*").alias("ndel")
        )
        nxt = (
            state.withColumn("_mover", mover)
            .join(contrib, "tile", "left")
            .select(
                "tile",
                "elev",
                "flow_to",
                (F.col("acc") + F.coalesce(F.col("add"), F.lit(0))).alias("acc"),
                (F.col("pend") - F.coalesce(F.col("ndel"), F.lit(0))).alias("pend"),
                (F.col("pushed") | F.col("_mover")).alias("pushed"),
            )
            .localCheckpoint(eager=True)
        )
        _release_checkpoint(state)
        state = nxt
    else:
        raise RuntimeError(f"d8_flow accumulation did not settle in {max_rounds} rounds")

    # --- mode labels: pointer doubling to the chain terminal ---
    ptr = state.select(
        "tile", F.coalesce("flow_to", "tile").alias("ptr")
    ).localCheckpoint(eager=True)
    interior = state.where(F.col("flow_to").isNotNull()).select(
        F.col("tile").alias("ptile")
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # converged when no pointer rests on a cell that still flows on
        if ptr.join(interior, ptr.ptr == F.col("ptile")).isEmpty():
            break
        hop = ptr.select(F.col("tile").alias("htile"), F.col("ptr").alias("hptr"))
        nxt = (
            ptr.join(hop, ptr.ptr == F.col("htile"))
            .select("tile", F.col("hptr").alias("ptr"))
            .localCheckpoint(eager=True)
        )
        _release_checkpoint(ptr)
        ptr = nxt
    else:
        raise RuntimeError(f"d8_flow mode doubling did not settle in {max_rounds} rounds")

    out = state.join(ptr.select("tile", F.col("ptr").alias("mode")), "tile").select(
        "tile", "elev", "flow_to", "mode", "acc"
    )
    _release_checkpoint(interior)
    return out


_HORN_W = [
    # (dx, dy, wx, wy): wx = dx*(2-|dy|), wy = dy*(2-|dx|) — the Horn
    # (1981) 3x3 kernel weights for both gradients in one neighbor pass
    (1, 0, 2, 0), (-1, 0, -2, 0), (0, 1, 0, 2), (0, -1, 0, -2),
    (1, 1, 1, 1), (1, -1, 1, -1), (-1, 1, -1, 1), (-1, -1, -1, -1),
]


def slope_aspect(
    df: DataFrame,
    res: int,
    *,
    x_col: str = "x",
    y_col: str = "y",
    light: tuple[int, int, int] = (-1, 1, 2),
) -> DataFrame:
    """Horn (1981) slope / aspect / hillshade over the occupied tile
    raster of the density surface — the terrain-derivative companion of
    :func:`d8_flow`: where D8 answers "which neighbor do I drain to",
    Horn's 3×3 weighted gradients answer "how steep and which way does
    the surface face", the slope/aspect/hillshade triple of every raster
    GIS, computed here on point counts (elevation := per-tile count,
    unoccupied := 0).

    Exact integer end-to-end:
    - gx = Σ z·dx·(2−|dy|), gy = Σ z·dy·(2−|dx|) over the 8 neighbors —
      integer weighted sums; g2 = gx²+gy² is the (unnormalized) squared
      slope numerator.
    - aspect8: steepest-ASCENT octant of (gx, gy), codes 0..7 =
      E,NE,N,NW,W,SW,S,SE and 8 = flat. The 22.5° octant boundaries are
      decided EXACTLY: |gy| < (√2−1)|gx| ⟺ (|gx|+|gy|)² < 2·gx² — all
      integers, and since √2−1 is irrational no nonzero integer pair
      ever lands ON a boundary, so the classification is total and
      tie-free by arithmetic, not by convention.
    - shade: the unnormalized hillshade dot product n·L with surface
      normal n = (−gx, −gy, 8) and integer light vector ``light``
      (default NW-ish (−1, 1, 2)): negative ⟺ self-shadowed.

    Emitted for every OCCUPIED interior cell (all 8 neighbors
    in-bounds); border cells are excluded rather than padded. Plan
    shape: one occupancy aggregate (the only full-data pass), then ONE
    union of 8 shifted equi-join legs over the ≤4^res occupied-cell
    table and one aggregate — no theta-join, no UDF, identical to
    d8_flow's candidate shape. Returns
    (tile, elev, gx, gy, g2, aspect8, shade)."""
    if not 1 <= res <= 27:
        raise ValueError(f"resolution {res} out of [1, 27]")
    lx, ly, lz = (int(v) for v in light)
    shift = 31 - res
    lim = 1 << res
    occ = (
        df.select(
            F.shiftright(quantize_col(F.col(x_col).cast("double")), shift).alias("cx"),
            F.shiftright(quantize_col(F.col(y_col).cast("double")), shift).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("elev"))
    )
    interior = occ.where(
        (F.col("cx") >= 1) & (F.col("cx") <= lim - 2)
        & (F.col("cy") >= 1) & (F.col("cy") <= lim - 2)
    )
    right = occ.select(
        F.col("cx").alias("jx"), F.col("cy").alias("jy"),
        F.col("elev").alias("z"),
    )
    legs = []
    for dx, dy, wx, wy in _HORN_W:
        legs.append(
            interior.select(
                "cx", "cy",
                (F.col("cx") + dx).alias("jx"),
                (F.col("cy") + dy).alias("jy"),
                F.lit(wx).alias("wx"), F.lit(wy).alias("wy"),
            )
        )
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)
    grads = (
        cand.join(right, ["jx", "jy"])
        .groupBy("cx", "cy")
        .agg(
            F.sum(F.col("z") * F.col("wx")).alias("gx"),
            F.sum(F.col("z") * F.col("wy")).alias("gy"),
        )
    )
    out = interior.join(grads, ["cx", "cy"], "left").select(
        "cx", "cy", "elev",
        F.coalesce("gx", F.lit(0)).cast("long").alias("gx"),
        F.coalesce("gy", F.lit(0)).cast("long").alias("gy"),
    )
    gx, gy = F.col("gx"), F.col("gy")
    ax, ay = F.abs(gx), F.abs(gy)
    s = (ax + ay) * (ax + ay)
    diag = (s > 2 * ax * ax) & (s > 2 * ay * ay)
    aspect = (
        F.when((gx == 0) & (gy == 0), 8)
        .when(diag & (gx > 0) & (gy > 0), 1)
        .when(diag & (gx < 0) & (gy > 0), 3)
        .when(diag & (gx < 0) & (gy < 0), 5)
        .when(diag & (gx > 0) & (gy < 0), 7)
        .when(ax > ay, F.when(gx > 0, 0).otherwise(4))
        .otherwise(F.when(gy > 0, 2).otherwise(6))
    )
    return out.select(
        cell_from_cxy_col(F.col("cx"), F.col("cy"), res).alias("tile"),
        F.col("elev").cast("long").alias("elev"),
        "gx", "gy",
        (gx * gx + gy * gy).cast("long").alias("g2"),
        aspect.cast("long").alias("aspect8"),
        ((-lx) * gx + (-ly) * gy + F.lit(8 * lz)).cast("long").alias("shade"),
    )


__all__ += ["slope_aspect"]


# marching-squares segment counts per case under THIS bit layout
# (b00=1, b10=2, b01=4, b11=8): the saddles are the DIAGONAL pairs —
# cases 6 (b10|b01) and 9 (b00|b11) — not the 5/10 of the perimeter
# bit-order convention; 5/10 here are the left/right edges (1 segment)
_MS_SEGS = [0, 1, 1, 1, 1, 1, 2, 1, 1, 2, 1, 1, 1, 1, 1, 0]


def contour_cases(
    df: DataFrame,
    res: int,
    thresholds: list[int],
    *,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Marching-squares contour extraction (the GDAL contour classic)
    over the occupied-tile density raster: for every 2×2 corner block
    and every integer threshold, the 4-bit case index
    ``b00 | b10<<1 | b01<<2 | b11<<3`` with ``b = (count ≥ t)`` and the
    per-case segment count (the diagonal saddles 6/9 emit 2). Pure
    integer comparisons — no interpolation, so the histogram is exact
    and engine-independent.

    Block universe: anchors (cx, cy) with all four corners in-grid and
    AT LEAST ONE OCCUPIED corner — all-empty blocks are case 0 at every
    threshold and carry no contour, so the engine never enumerates the
    4^res grid: occupied cells explode to their ≤4 containing blocks
    (one distinct), corners arrive by four shifted equi-join legs
    (the slope_aspect shape). Returns one row per (t, cs) with
    n_blocks and segs = n_blocks · segments(cs), cases with zero
    blocks omitted."""
    if not 1 <= res <= 27:
        raise ValueError(f"resolution {res} out of [1, 27]")
    if not thresholds:
        raise ValueError("need at least one threshold")
    shift = 31 - res
    lim = 1 << res
    occ = (
        df.select(
            F.shiftright(quantize_col(F.col(x_col).cast("double")), shift).alias("cx"),
            F.shiftright(quantize_col(F.col(y_col).cast("double")), shift).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("z"))
    )
    anchors = (
        occ.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (F.col("cx") - dx).alias("ax"),
                            (F.col("cy") - dy).alias("ay"),
                        )
                        for dx in (0, 1)
                        for dy in (0, 1)
                    ]
                )
            ).alias("a")
        )
        .select(F.col("a.ax").alias("ax"), F.col("a.ay").alias("ay"))
        .where(
            (F.col("ax") >= 0) & (F.col("ax") <= lim - 2)
            & (F.col("ay") >= 0) & (F.col("ay") <= lim - 2)
        )
        .distinct()
    )
    g = anchors
    for name, dx, dy in (
        ("z00", 0, 0), ("z10", 1, 0), ("z01", 0, 1), ("z11", 1, 1),
    ):
        corner = occ.select(
            (F.col("cx") - dx).alias("ax"),
            (F.col("cy") - dy).alias("ay"),
            F.col("z").alias(name),
        )
        g = g.join(corner, ["ax", "ay"], "left")
    g = g.select(
        "ax", "ay",
        *[F.coalesce(c, F.lit(0)).alias(c) for c in ("z00", "z10", "z01", "z11")],
    )
    t = F.explode(F.array(*[F.lit(int(v)) for v in thresholds])).alias("t")
    wt = g.select("z00", "z10", "z01", "z11", t)
    case = (
        (F.col("z00") >= F.col("t")).cast("int")
        + (F.col("z10") >= F.col("t")).cast("int") * 2
        + (F.col("z01") >= F.col("t")).cast("int") * 4
        + (F.col("z11") >= F.col("t")).cast("int") * 8
    )
    segs = F.element_at(
        F.array(*[F.lit(s) for s in _MS_SEGS]), F.col("cs") + 1
    )
    return (
        wt.select("t", case.alias("cs"))
        .groupBy("t", "cs")
        .agg(F.count("*").alias("n_blocks"))
        .select(
            F.col("t").cast("long").alias("t"),
            F.col("cs").cast("long").alias("cs"),
            F.col("n_blocks").cast("long").alias("n_blocks"),
            (F.col("n_blocks") * segs).cast("long").alias("segs"),
        )
    )


__all__ += ["contour_cases"]


def distance_transform(
    df: DataFrame,
    res: int,
    *,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Exact squared Euclidean distance transform of the occupied-tile
    raster (the GIS "euclidean distance" surface): every res-``res``
    tile gets the exact integer d² (in cell units) to its nearest
    OCCUPIED tile — 0 on occupied tiles. The proximity layer feeding
    buffering, siting, and cost-surface analyses.

    Exact by decomposition: the 2-D min separates —
    ``d²(x,y) = min_{x'} ((x−x')² + D1(x', y))`` with
    ``D1(x, y) = min_{y' occupied in column x} (y−y')²`` — so two
    grouped passes (per column, then per row) of exact integer minima
    give the true Euclidean d², not a chamfer approximation. Each pass
    is one ``applyInPandas`` group per grid line with an O(W²)
    vectorized brute min (W = 2^res; exact; the Felzenszwalb
    lower-envelope scan is the O(W) drop-in at higher res — same
    grouping, same contract). Empty columns carry an INF sentinel that
    can never win once any tile is occupied.

    Contract: the FULL 4^res grid materializes (a distance surface is
    defined everywhere) — executor-side via sequence/posexplode, never
    the driver; size res to the raster you actually want (res ≤ 12 ≈
    16M cells is comfortable; the operator refuses res > 14). On an
    all-empty input every cell reports the INF sentinel (1 << 40) —
    callers treating d2 ≥ INF as "no target anywhere" stay correct.
    Returns (tile, d2)."""
    if not 1 <= res <= 14:
        raise ValueError(f"resolution {res} out of [1, 14] (full-grid op)")
    shift = 31 - res
    lim = 1 << res
    inf = 1 << 40
    occ = (
        df.select(
            F.shiftright(quantize_col(F.col(x_col).cast("double")), shift).alias("cx"),
            F.shiftright(quantize_col(F.col(y_col).cast("double")), shift).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("_n"))
        .select("cx", "cy")
    )
    spark = df.sparkSession
    cols = spark.range(lim).select(F.col("id").cast("long").alias("cx"))
    grid_col = cols.select(
        "cx", F.explode(F.expr(f"sequence(0, {lim - 1})")).alias("cy")
    )
    marked = grid_col.join(
        occ.withColumn("_occ", F.lit(1)), ["cx", "cy"], "left"
    )

    import pandas as pd

    def col_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        ys = pdf["cy"].to_numpy()
        occ_ys = pdf.loc[pdf["_occ"].notna(), "cy"].to_numpy()
        if len(occ_ys) == 0:
            d1 = np.full(len(ys), inf, dtype=np.int64)
        else:
            diff = ys[:, None] - occ_ys[None, :]
            d1 = (diff * diff).min(axis=1).astype(np.int64)
        return pd.DataFrame({"cx": pdf["cx"], "cy": ys, "d1": d1})

    p1 = marked.groupBy("cx").applyInPandas(
        col_pass, schema="cx long, cy long, d1 long"
    )

    def row_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf["cx"].to_numpy()
        d1 = pdf["d1"].to_numpy()
        diff = xs[:, None] - xs[None, :]
        d2 = (diff * diff + d1[None, :]).min(axis=1)
        return pd.DataFrame({"cx": xs, "cy": pdf["cy"], "d2": d2})

    out = p1.groupBy("cy").applyInPandas(
        row_pass, schema="cx long, cy long, d2 long"
    )
    return out.select(
        cell_from_cxy_col(F.col("cx"), F.col("cy"), res).alias("tile"),
        F.col("d2").cast("long").alias("d2"),
    )


__all__ += ["distance_transform"]
