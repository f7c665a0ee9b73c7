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

__all__ = ["convex_hull", "hull_indices", "antipodal_pairs", "hull_diameter"]


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


def antipodal_pairs(hx: np.ndarray, hy: np.ndarray) -> list[tuple[int, int]]:
    """Rotating calipers (Preparata–Shamos 1985 §4.2.3) over a STRICT CCW
    hull: enumerate the antipodal vertex pairs — the candidate set that
    provably contains every diameter pair — in O(h) instead of the O(h²)
    all-pairs scan. For each hull edge (i, i+1) the opposite pointer j
    advances while the triangle area area2(i, i+1, j+1) exceeds
    area2(i, i+1, j); both (i, j) and (i+1, j) are antipodal. Areas are
    integer cross products (exact for ≤ 2⁶-bit grid coordinates), so the
    walk is deterministic. h ≤ 2 degenerates to the only pair / nothing."""
    m = len(hx)
    if m < 2:
        return []
    if m == 2:
        return [(0, 1)]

    def area2(i: int, j: int, k: int) -> np.int64:
        return _cross(hx[i], hy[i], hx[j], hy[j], hx[k], hy[k])

    pairs: list[tuple[int, int]] = []
    j = 1
    for i in range(m):
        i1 = (i + 1) % m
        while area2(i, i1, (j + 1) % m) > area2(i, i1, j):
            j = (j + 1) % m
        pairs.append((i, j))
        pairs.append((i1, j))
        # collinear caliper support: the NEXT vertex is equally far from
        # this edge — it is antipodal to the edge too
        if area2(i, i1, (j + 1) % m) == area2(i, i1, j):
            pairs.append((i, (j + 1) % m))
            pairs.append((i1, (j + 1) % m))
    return pairs


def hull_diameter(
    df: DataFrame,
    by: list[str],
    *,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
    res: int = 25,
) -> DataFrame:
    """Per-group planar diameter — the farthest point pair — via convex
    hull + rotating calipers, on the res-bit quantized grid so every
    arithmetic step is EXACT: coordinates ≤ 2²⁵ make cross products ≤ 2⁵¹
    (below the 2⁵³ float64-exact bound, so the shared hull kernel is
    integer-exact) and squared distances ≤ 2⁵¹ in int64.

    Returns one row per group with ≥ 2 points:
      (by…, diam2, a_id, b_id)
    diam2 = max squared grid distance; (a_id, b_id) = the
    lexicographically smallest (min, max)-sorted id pair among ALL pairs
    attaining it (duplicate coordinates included — each distinct
    coordinate carries its minimum id through the hull stages, which is
    sufficient: for a coordinate pair the best id pair is
    (min ids(p), min ids(q)) sorted). A group whose points all share one
    grid cell has diam2 = 0 and the two smallest ids.

    Scale shape: points dedupe to distinct grid coordinates with ONE
    map-side-combining aggregate; the hull prefilter runs shuffle-free
    inside the scan (convex_hull stage 1); only O(hull) candidate
    vertices per group shuffle. The calipers walk touches each group's
    ≤ O(log n)-vertex hull once."""
    if not 1 <= res <= 25:
        raise ValueError(f"res {res} out of [1, 25] (exactness bound)")
    from pyspark.sql import functions as F

    from metric_search_spark.functions.spatial import quantize_col

    shift = 31 - res
    q = df.select(
        *by,
        F.shiftright(quantize_col(F.col(x_col).cast("double")), shift).alias("qx"),
        F.shiftright(quantize_col(F.col(y_col).cast("double")), shift).alias("qy"),
        F.col(id_col).alias("_pid"),
    )
    coords = q.groupBy(*by, "qx", "qy").agg(
        F.min("_pid").alias("id1"), F.count("*").alias("npts")
    )

    by_t = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.select(*by).schema
    )
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"{by_t}, diam2 long, a_id {id_t}, b_id {id_t}"

    def diam(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["qx"].to_numpy(dtype=np.int64)
        y = pdf["qy"].to_numpy(dtype=np.int64)
        ids = pdf["id1"].to_numpy()
        head = pdf.iloc[:1][list(by)].reset_index(drop=True)
        if len(pdf) == 1:
            # all points in one grid cell: diameter 0 over ≥2 duplicates
            if int(pdf["npts"].iloc[0]) < 2:
                return pdf.iloc[:0][list(by)].assign(
                    diam2=np.int64(0), a_id=ids[:0], b_id=ids[:0]
                )
            two = np.sort(pdf["_dup_ids"].iloc[0])[:2]
            return head.assign(
                diam2=np.int64(0), a_id=two[0], b_id=two[1]
            )
        hull = hull_indices(x.astype(np.float64), y.astype(np.float64))
        hx, hy = x[hull], y[hull]
        hid = ids[hull]
        cand = antipodal_pairs(hx, hy)
        d2 = np.array(
            [
                (hx[i] - hx[j]) ** 2 + (hy[i] - hy[j]) ** 2
                for i, j in cand
            ],
            dtype=np.int64,
        )
        best = d2.max()
        pair = min(
            tuple(sorted((hid[i], hid[j])))
            for (i, j), v in zip(cand, d2)
            if v == best
        )
        return head.assign(diam2=best, a_id=pair[0], b_id=pair[1])

    # single-grid-cell groups need their two smallest ids, which the
    # min-id dedupe discards: fetch them only for those (rare, tiny) groups
    singles = (
        coords.groupBy(*by)
        .agg(F.count("*").alias("ncells"))
        .where(F.col("ncells") == 1)
        .select(*by)
    )
    dup_ids = (
        q.join(singles, list(by))
        .groupBy(*by)
        .agg(F.slice(F.sort_array(F.collect_list("_pid")), 1, 2).alias("_dup_ids"))
    )
    coords = coords.join(dup_ids, list(by), "left")
    return coords.groupBy(*by).applyInPandas(diam, schema=out_schema)


def mec_candidates(pts: list[tuple[int, int, int]]) -> list[dict]:
    """Exact candidate circles for the minimum enclosing circle of integer
    points (x, y, id): every point pair (diametral circle) and every
    non-collinear triple (circumcircle), each represented EXACTLY as
    center (nx/d, ny/d) with d > 0 gcd-reduced, plus R = d²·r² recomputed
    from the reduced representation — so two candidate sets defining the
    SAME circle produce identical (d, nx, ny, R) tuples. Pure python ints
    (no overflow at any res); shared by the Spark kernel and tests."""
    from math import gcd

    out = []
    n = len(pts)
    for i in range(n):
        xi, yi, ii = pts[i]
        for j in range(i + 1, n):
            xj, yj, jj = pts[j]
            d, nx, ny = 2, xi + xj, yi + yj
            g = gcd(d, gcd(nx, ny)) or 1
            d, nx, ny = d // g, nx // g, ny // g
            r = (d * xi - nx) ** 2 + (d * yi - ny) ** 2
            a, b = sorted((ii, jj))
            out.append(
                {"d": d, "nx": nx, "ny": ny, "R": r, "a": a, "b": b, "c": None}
            )
            for k in range(j + 1, n):
                xk, yk, kk = pts[k]
                dd = 2 * (xi * (yj - yk) + xj * (yk - yi) + xk * (yi - yj))
                if dd == 0:
                    continue
                ax2 = xi * xi + yi * yi
                bx2 = xj * xj + yj * yj
                cx2 = xk * xk + yk * yk
                cnx = ax2 * (yj - yk) + bx2 * (yk - yi) + cx2 * (yi - yj)
                cny = ax2 * (xk - xj) + bx2 * (xi - xk) + cx2 * (xj - xi)
                if dd < 0:
                    dd, cnx, cny = -dd, -cnx, -cny
                g = gcd(dd, gcd(abs(cnx), abs(cny))) or 1
                dd, cnx, cny = dd // g, cnx // g, cny // g
                r = (dd * xi - cnx) ** 2 + (dd * yi - cny) ** 2
                a, b, c = sorted((ii, jj, kk))
                out.append(
                    {"d": dd, "nx": cnx, "ny": cny, "R": r, "a": a, "b": b, "c": c}
                )
    return out


def mec_exact(pts: list[tuple[int, int, int]]) -> dict | None:
    """Minimum enclosing circle of integer points (x, y, id), exact: the
    smallest valid (all-enclosing) candidate by the cross-multiplied
    rational comparison R₁·d₂² vs R₂·d₁²; among candidates representing
    the (unique) MEC, the defining set breaks ties to (pair before
    triple, then smallest sorted ids). Returns {r2n, r2d, a, b, c} with
    r2n/r2d = r² in lowest terms, or None for < 2 points."""
    from math import gcd

    if len(pts) < 2:
        return None
    best = None
    for cand in mec_candidates(pts):
        d, nx, ny, r = cand["d"], cand["nx"], cand["ny"], cand["R"]
        if any(
            (d * x - nx) ** 2 + (d * y - ny) ** 2 > r for x, y, _ in pts
        ):
            continue
        key = (
            cand["c"] is not None,
            cand["a"],
            cand["b"],
            cand["c"] if cand["c"] is not None else -1,
        )
        if best is None:
            best, bkey = cand, key
            continue
        lhs = r * best["d"] ** 2
        rhs = best["R"] * d * d
        if lhs < rhs or (lhs == rhs and key < bkey):
            best, bkey = cand, key
    g = gcd(best["R"], best["d"] ** 2) or 1
    return {
        "r2n": best["R"] // g,
        "r2d": best["d"] ** 2 // g,
        "a": best["a"],
        "b": best["b"],
        "c": best["c"],
    }


def min_enclosing_circle(
    df: DataFrame,
    by: list[str],
    *,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
    res: int = 9,
) -> DataFrame:
    """Per-group minimum enclosing circle — the bounding circle a spatial
    index stores per node — EXACT on the res-bit quantized grid: the MEC
    is unique and determined by 2 or 3 hull vertices, so the kernel
    enumerates candidate circles over the group's convex hull (same
    prefilter pipeline as hull_diameter), keeps the enclosing ones by
    exact integer tests, and takes the rational minimum by
    cross-multiplication — no floats anywhere. res ≤ 9 keeps every
    intermediate in int64 EVEN FOR A SQL TWIN (R ≤ ~2⁵⁹; only the
    minimality cross-compare needs 128-bit, which DuckDB's HUGEINT and
    python ints both have).

    Returns one row per group with ≥ 2 points:
      (by…, r2n, r2d, a_id, b_id, c_id)
    r2n/r2d = r² in lowest terms (grid units²); (a_id, b_id[, c_id]) =
    the defining points — minimum ids at their coordinates, pair
    preferred over triple, then smallest sorted ids (the MEC itself is
    unique; only its defining-set label needs the tie-break). A
    single-grid-cell group yields r² = 0 with its two smallest ids.

    Scale shape: identical to hull_diameter — one dedupe aggregate to
    distinct grid coordinates (min id each), shuffle-free per-batch hull
    prefilter, per-group kernel over the tiny hull."""
    if not 1 <= res <= 9:
        raise ValueError(f"res {res} out of [1, 9] (int64 twin bound)")
    from pyspark.sql import functions as F

    from metric_search_spark.functions.spatial import quantize_col

    shift = 31 - res
    q = df.select(
        *by,
        F.shiftright(quantize_col(F.col(x_col).cast("double")), shift).alias("qx"),
        F.shiftright(quantize_col(F.col(y_col).cast("double")), shift).alias("qy"),
        F.col(id_col).alias("_pid"),
    )
    coords = q.groupBy(*by, "qx", "qy").agg(
        F.min("_pid").alias("id1"), F.count("*").alias("npts")
    )
    singles = (
        coords.groupBy(*by)
        .agg(F.count("*").alias("ncells"))
        .where(F.col("ncells") == 1)
        .select(*by)
    )
    dup_ids = (
        q.join(singles, list(by))
        .groupBy(*by)
        .agg(F.slice(F.sort_array(F.collect_list("_pid")), 1, 2).alias("_dup_ids"))
    )
    coords = coords.join(dup_ids, list(by), "left")

    by_t = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.select(*by).schema
    )
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{by_t}, r2n long, r2d long, a_id {id_t}, b_id {id_t}, c_id {id_t}"
    )

    def kern(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        head = pdf.iloc[:1][list(by)].reset_index(drop=True)
        if len(pdf) == 1:
            if int(pdf["npts"].iloc[0]) < 2:
                return pdf.iloc[:0][list(by)].assign(
                    r2n=np.int64(0), r2d=np.int64(0),
                    a_id=pdf["id1"][:0], b_id=pdf["id1"][:0], c_id=pdf["id1"][:0],
                )
            two = sorted(pdf["_dup_ids"].iloc[0])[:2]
            return head.assign(
                r2n=np.int64(0), r2d=np.int64(1),
                a_id=two[0], b_id=two[1], c_id=None,
            )
        x = pdf["qx"].to_numpy(dtype=np.int64)
        y = pdf["qy"].to_numpy(dtype=np.int64)
        ids = pdf["id1"].to_numpy()
        hull = hull_indices(x.astype(np.float64), y.astype(np.float64))
        pts = [(int(x[i]), int(y[i]), ids[i]) for i in hull]
        got = mec_exact(pts)
        return head.assign(
            r2n=got["r2n"], r2d=got["r2d"],
            a_id=got["a"], b_id=got["b"], c_id=got["c"],
        )

    return coords.groupBy(*by).applyInPandas(kern, schema=out_schema)


__all__ += ["mec_candidates", "mec_exact", "min_enclosing_circle"]
