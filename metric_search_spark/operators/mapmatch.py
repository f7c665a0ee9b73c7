"""HMM map matching (Viterbi) of trajectories onto a polyline network.

The real map-matching algorithm (Newson & Krumm 2009's shape, integerized):
each trajectory point emits a candidate set of nearby routes; the matched
route sequence minimizes Σ emission + λ·(route switches) over the whole
trajectory — a greedy per-point snap (``pip.nearest_route_join``) flips
routes on every noisy point near an intersection, while the Viterbi path
pays λ per switch and stays coherent.

Integer-exact by discretization: routes rasterize to their supercover
tile sets at ``res`` (``pip.polyline_tiles`` — exact separating-axis
test), a point's emission for route r is the MINIMUM squared grid
distance from its cell to r's tiles (candidates only within Chebyshev
``radius_cells``), and the switch penalty is an integer — so every DP
value is an exact int64 and the optimal path is engine-independent.
Tie-breaks are fully specified: the final state is the (cost, line_id)
minimum, and each backtrack step picks the (prev_cost + switch, line_id)
minimum — i.e. among optimal paths, the reverse-lexicographically
smallest route sequence. A trajectory with ANY point having no candidate
route within the radius is omitted entirely (the contract a caller can
see; partial matches would silently re-anchor the DP).

100-TB shape: the route-tile index is perimeter-scale and broadcasts;
points fan out to their (2K+1)² ring cells (pure Column math) and
equi-join the index — no theta-join — then one map-side-combined min
aggregate forms (traj, seq, line, emission). The DP runs once per
trajectory inside ``applyInPandas`` over its bounded candidate list
(states = nearby routes, not all routes); trajectories are independent,
so the stage scales with the trajectory count. Rasterization cost and
DuckDB-twin shape: see ``pip.polyline_tiles``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import (
    cell_from_cxy_col,
    cell_xy_cols,
    quantize_col,
)
from metric_search_spark.operators.pip import polyline_tiles

__all__ = ["viterbi_match", "viterbi_path"]


def viterbi_path(
    cands: list[tuple[int, str, int]], n: int, switch_cost: int
) -> tuple[list[str], int] | None:
    """Reference DP over candidate triples (seq, line, emission) with seq
    ∈ 0..n−1: returns (matched line per seq, total cost), or None if some
    seq has no candidate. Pure python — shared by the Spark kernel and
    the tests' brute twin validation."""
    by_seq: dict[int, dict[str, int]] = {}
    for seq, line, em in cands:
        cur = by_seq.setdefault(int(seq), {})
        em = int(em)
        if line not in cur or em < cur[line]:
            cur[line] = em
    if set(by_seq) != set(range(n)):
        return None
    dp: list[dict[str, int]] = [dict(by_seq[0])]
    for t in range(1, n):
        prev = dp[-1]
        base = min(prev.values())
        row = {}
        for line, em in by_seq[t].items():
            stay = prev.get(line)
            best = base + switch_cost if stay is None else min(stay, base + switch_cost)
            row[line] = em + best
        dp.append(row)
    total, last = min((c, r) for r, c in dp[n - 1].items())
    path = [last]
    for t in range(n - 1, 0, -1):
        r = path[-1]
        _, pick = min(
            (c + (0 if line == r else switch_cost), line)
            for line, c in dp[t - 1].items()
        )
        path.append(pick)
    path.reverse()
    return path, int(total)


def viterbi_match(
    traj: DataFrame,
    lines: DataFrame,
    *,
    res: int = 6,
    radius_cells: int = 3,
    switch_cost: int = 3,
    traj_col: str = "traj_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
    line_id_col: str = "line_id",
    path_col: str = "path",
) -> DataFrame:
    """Match each trajectory (rows (traj_id, seq, x, y), seq = 0..n−1
    distinct per trajectory) onto the polyline network. Returns one row
    per point of every FULLY covered trajectory:
      (traj_id, seq, line_id, cost)  — cost = the trajectory's optimal
    total (emissions + switch_cost · switches), constant per trajectory.
    """
    if radius_cells < 1:
        raise ValueError(f"radius_cells {radius_cells} must be >= 1")
    if switch_cost < 0:
        raise ValueError(f"switch_cost {switch_cost} must be >= 0")
    k = radius_cells
    shift = 31 - res
    lim = 1 << res

    tiles = polyline_tiles(lines, res=res, line_id_col=line_id_col, path_col=path_col)
    tcx, tcy = cell_xy_cols(F.col("tile"))
    index = tiles.select("line_id", tcx.alias("_tx"), tcy.alias("_ty")).withColumn(
        "_cell", cell_from_cxy_col(F.col("_tx"), F.col("_ty"), res)
    )

    pts = traj.select(
        F.col(traj_col).alias("traj_id"),
        F.col(seq_col).cast("long").alias("seq"),
        F.shiftright(quantize_col(F.col(x_col).cast("double")), shift).alias("_px"),
        F.shiftright(quantize_col(F.col(y_col).cast("double")), shift).alias("_py"),
    )
    counts = pts.groupBy("traj_id").agg(F.count("*").alias("_n"))

    # point → its (2k+1)² ring cells, pure Column fan-out, then one
    # broadcast equi-join against the tile index
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-k, k + 1)
            for dy in range(-k, k + 1)
        ]
    )
    ring = pts.select(
        "traj_id", "seq", "_px", "_py", F.explode(offs).alias("_o")
    ).select(
        "traj_id",
        "seq",
        "_px",
        "_py",
        (F.col("_px") + F.col("_o.dx")).alias("_rx"),
        (F.col("_py") + F.col("_o.dy")).alias("_ry"),
    ).where(
        (F.col("_rx") >= 0) & (F.col("_rx") < lim)
        & (F.col("_ry") >= 0) & (F.col("_ry") < lim)
    ).withColumn("_cell", cell_from_cxy_col(F.col("_rx"), F.col("_ry"), res))

    dpx = F.col("_px") - F.col("_tx")
    dpy = F.col("_py") - F.col("_ty")
    cand = (
        ring.join(F.broadcast(index), "_cell")
        .groupBy("traj_id", "seq", "line_id")
        .agg(F.min(dpx * dpx + dpy * dpy).alias("em"))
        .join(counts, "traj_id")
    )

    tt = traj.schema[traj_col].dataType.simpleString()
    lt = lines.schema[line_id_col].dataType.simpleString()
    out_schema = f"traj_id {tt}, seq long, line_id {lt}, cost long"
    sc = int(switch_cost)

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["_n"].iloc[0])
        got = viterbi_path(
            list(zip(pdf["seq"], pdf["line_id"], pdf["em"])), n, sc
        )
        if got is None:
            return pdf.iloc[:0][["traj_id", "seq", "line_id"]].assign(cost=0)
        path, total = got
        return pd.DataFrame(
            {
                "traj_id": [key[0]] * n,
                "seq": range(n),
                "line_id": path,
                "cost": [total] * n,
            }
        )

    return cand.groupBy("traj_id").applyInPandas(kernel, schema=out_schema)
