"""Per-group 2-D convex hull — the boundary verb of the geospatial tier.

The metric_search reference keeps points in a metric index and answers
"what encloses this set" questions via traversals (tree.cpp's covering
invariant IS a hull-like enclosure per level); a Spark-native engine wants
the planar answer as a relational operator: for each group, the convex
polygon of its (x, y) points.

Distributed decomposition (hull-of-hulls identity): a vertex of
hull(S) that lies in any subset T ⊆ S is also a vertex of hull(T), so
per-Arrow-batch local hulls are a SOUND candidate prefilter — the global
hull is the hull of the union of batch hulls. Stage 1 runs inside the
scan (mapInPandas, NO shuffle) and shrinks each batch×group to its local
hull, typically O(log n) points; only those candidates shuffle to their
group for the exact stage-2 hull (applyInPandas). The per-batch kernel is
the Akl–Toussaint vectorized prefilter (drop everything strictly inside
the ≤8-gon of coordinate/diagonal extremes — one numpy pass kills the
interior mass) followed by Andrew's monotone chain on the surviving
fringe, so the sequential stack loop touches O(hull) points, not O(n).

Degeneracies: strict-turn chains (pop on cross ≤ 0) return only corner
vertices — collinear boundary points and coincident duplicates are NOT
vertices (measure-zero for continuous coordinates; an integer-snapped
input that needs boundary points would use a non-strict chain). Groups of
1–2 points return all their points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["convex_hull", "hull_indices"]


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def hull_indices(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the strict convex hull of (x, y) in CCW order starting
    at the lexicographically smallest point (Andrew's monotone chain,
    strict turns: collinear/duplicate points are dropped)."""
    n = len(x)
    if n <= 2:
        return np.arange(n) if n < 2 or (x[0], y[0]) != (x[1], y[1]) else np.array([0])
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    lower: list[int] = []
    for i in range(n):
        while len(lower) >= 2 and (
            _cross(
                xs[lower[-2]], ys[lower[-2]], xs[lower[-1]], ys[lower[-1]], xs[i], ys[i]
            )
            <= 0
        ):
            lower.pop()
        lower.append(i)
    upper: list[int] = []
    for i in range(n - 1, -1, -1):
        while len(upper) >= 2 and (
            _cross(
                xs[upper[-2]], ys[upper[-2]], xs[upper[-1]], ys[upper[-1]], xs[i], ys[i]
            )
            <= 0
        ):
            upper.pop()
        upper.append(i)
    idx = lower[:-1] + upper[:-1]
    return order[np.asarray(idx, dtype=np.int64)]


def _akl_toussaint(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: False only for points STRICTLY inside the
    polygon of the 8 directional extremes (min/max of x, y, x+y, x−y) —
    a vectorized O(n) cut that is sound (strict interior ⇒ not a hull
    vertex) and typically removes the bulk of the batch."""
    if len(x) <= 8:
        return np.ones(len(x), dtype=bool)
    s, d = x + y, x - y
    ext = np.unique(
        np.array(
            [
                np.argmin(x), np.argmax(x), np.argmin(y), np.argmax(y),
                np.argmin(s), np.argmax(s), np.argmin(d), np.argmax(d),
            ]
        )
    )
    hull = hull_indices(x[ext], y[ext])
    hx, hy = x[ext][hull], y[ext][hull]
    if len(hx) < 3:
        return np.ones(len(x), dtype=bool)
    # strictly inside ⇔ strictly left of EVERY CCW edge
    inside = np.ones(len(x), dtype=bool)
    for i in range(len(hx)):
        ax, ay = hx[i], hy[i]
        bx, by = hx[(i + 1) % len(hx)], hy[(i + 1) % len(hx)]
        inside &= (bx - ax) * (y - ay) - (by - ay) * (x - ax) > 0
    return ~inside


def _local_hull(pdf: pd.DataFrame, by: list[str], x_col: str, y_col: str) -> pd.DataFrame:
    outs = []
    for _, g in pdf.groupby(by, sort=False, dropna=False):
        x = g[x_col].to_numpy(dtype=np.float64)
        y = g[y_col].to_numpy(dtype=np.float64)
        keep = _akl_toussaint(x, y)
        sub = g.iloc[np.nonzero(keep)[0]]
        idx = hull_indices(
            sub[x_col].to_numpy(dtype=np.float64),
            sub[y_col].to_numpy(dtype=np.float64),
        )
        outs.append(sub.iloc[idx])
    return pd.concat(outs) if outs else pdf.iloc[:0]


def convex_hull(
    df: DataFrame,
    by: list[str],
    *,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """Per-group strict convex hull: returns (by…, id, x, y, seq) with seq
    the 0-based CCW position starting at the lexicographically smallest
    vertex. Stage 1 (candidate hulls) runs shuffle-free inside the scan;
    only candidates shuffle on the group key."""
    cols = list(by) + [id_col, x_col, y_col]
    pts = df.select(*cols)
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in pts.schema)
    out_schema = in_schema + ", seq long"

    def stage1(batches):
        for pdf in batches:
            yield _local_hull(pdf, list(by), x_col, y_col)

    def stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        idx = hull_indices(
            pdf[x_col].to_numpy(dtype=np.float64),
            pdf[y_col].to_numpy(dtype=np.float64),
        )
        out = pdf.iloc[idx].copy()
        out["seq"] = np.arange(len(idx), dtype=np.int64)
        return out

    cand = pts.mapInPandas(stage1, schema=in_schema)
    return cand.groupBy(*by).applyInPandas(lambda _, g: stage2(g), schema=out_schema)
