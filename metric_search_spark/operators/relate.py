"""Robust polygon relate join: EXACT topological classification
(overlaps / touches) of integer-coordinate simple polygons — the
degenerate-input completion of polygon_intersects_join.

polygon_intersects_join (pip.py) assumes generic position: boundaries
that merely TOUCH (shared edge, vertex-on-edge, identical rings) are
measure-zero under float coordinates and report as non-intersecting.
Real cadastral / tile / admin data is integer-snapped, where those
configurations are the NORM. This module decides the relation with NO
epsilons and NO floats anywhere in the semantics:

- coordinates are integers; every predicate is exact integer arithmetic
  (Python bigints on the Spark side, HUGEINT on the DuckDB side);
- contact points of two integer segments are exact rationals; edges are
  split at every contact and each OPEN piece is classified IN/ON/OUT of
  the other polygon by exact rational point location (piece midpoints —
  classification along an open piece is constant because it can only
  change at a boundary contact, and every contact is a split point);
- the decision is a theorem, not a tolerance:
    * any proper edge crossing, or any boundary piece (or vertex, for
      disjoint boundaries) strictly interior to the other polygon
      => interiors intersect => 'overlaps';
    * no such witness but every piece of BOTH boundaries lies ON the
      other boundary => the rings are equal point sets => identical
      regions => 'overlaps' (a simple closed curve has no proper
      simple-closed subset, so all-ON one side forces all-ON both);
    * no witness, boundaries meet somewhere => 'touches';
    * otherwise containment-or-disjoint via one exact vertex test.

Plan shape (the LSH discipline, big x big): each side covers its integer
bbox with coarse grid cells, candidates meet in ONE cell equi-join
carrying ids only (two polygons that overlap OR touch have intersecting
bboxes, hence share a cover cell — conservative recall is provable),
pairs dedup by id, and each surviving pair re-joins its two vertex lists
once for the exact O(Ea*Eb) refine in an Arrow-batched kernel. No
cartesian product; skew bounded by per-cell polygon counts.

Reference parity: extends the reference's metric contract
(n-api/metric_distance/metric_distance.hpp, details/Standards.hpp) to
topological predicates with exact rational arithmetic; the
candidate/refine split mirrors the cover-then-prune discipline of the
reference's tree traversals (details/tree.cpp:635-690).
"""

from __future__ import annotations

from collections.abc import Iterator
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "relate_rings",
    "polygon_relate_join",
    "synth_lattice_polys",
    "synth_lattice_polys_sql",
    "polygon_relate_sql",
    "intersection_area2",
    "polygon_area_join",
    "polygon_area_sql",
    "multipolygon_relate_join",
    "synth_lattice_multipolys",
    "synth_lattice_multipolys_sql",
    "multipolygon_relate_sql",
]


# ------------------------------------------------------ exact kernel


def _orient(ax, ay, bx, by, cx, cy):
    """Sign area of (a,b,c) doubled — exact (ints or Fractions)."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _within(lo, hi, v):
    return (lo <= v <= hi) if lo <= hi else (hi <= v <= lo)


def _edge_contacts(p, q, u, v):
    """Contacts of segment p->q with segment u->v as a list of exact
    Fraction parameters t along p->q, plus (proper_crossing, any_contact)
    flags. Covers proper crossings, endpoint-on-segment (both
    directions), and collinear overlap (its clamped endpoints)."""
    o1 = _orient(p[0], p[1], q[0], q[1], u[0], u[1])
    o2 = _orient(p[0], p[1], q[0], q[1], v[0], v[1])
    o3 = _orient(u[0], u[1], v[0], v[1], p[0], p[1])
    o4 = _orient(u[0], u[1], v[0], v[1], q[0], q[1])
    ts: list[Fraction] = []
    proper = False
    contact = False
    if o1 == 0 and o2 == 0:
        # collinear lines: project u, v on p->q; overlap of [0,1] with
        # [t_u, t_v] (if any) contributes its clamped endpoints
        dx, dy = q[0] - p[0], q[1] - p[1]
        den = dx * dx + dy * dy
        if den == 0:
            return ts, proper, contact
        tu = Fraction((u[0] - p[0]) * dx + (u[1] - p[1]) * dy, den)
        tv = Fraction((v[0] - p[0]) * dx + (v[1] - p[1]) * dy, den)
        lo, hi = (tu, tv) if tu <= tv else (tv, tu)
        lo2, hi2 = max(lo, Fraction(0)), min(hi, Fraction(1))
        if lo2 <= hi2:
            contact = True
            ts.extend((lo2, hi2))
        return ts, proper, contact
    if o1 * o2 < 0 and o3 * o4 < 0:
        # proper crossing: t along p->q from the two side-values of u->v
        ts.append(Fraction(o3, o3 - o4))
        return ts, True, True
    # degenerate endpoint contacts
    if o1 == 0 and _within(p[0], q[0], u[0]) and _within(p[1], q[1], u[1]):
        dx, dy = q[0] - p[0], q[1] - p[1]
        den = dx * dx + dy * dy
        if den:
            ts.append(Fraction((u[0] - p[0]) * dx + (u[1] - p[1]) * dy, den))
            contact = True
    if o2 == 0 and _within(p[0], q[0], v[0]) and _within(p[1], q[1], v[1]):
        dx, dy = q[0] - p[0], q[1] - p[1]
        den = dx * dx + dy * dy
        if den:
            ts.append(Fraction((v[0] - p[0]) * dx + (v[1] - p[1]) * dy, den))
            contact = True
    if o3 == 0 and _within(u[0], v[0], p[0]) and _within(u[1], v[1], p[1]):
        ts.append(Fraction(0))
        contact = True
    if o4 == 0 and _within(u[0], v[0], q[0]) and _within(u[1], v[1], q[1]):
        ts.append(Fraction(1))
        contact = True
    return ts, proper, contact


def _classify_point(mx, my, ring):
    """Exact location of rational point (mx, my) vs integer ring:
    'on' | 'in' | 'out' (even-odd; standard strict-> straddle rule is
    exact for points not on the boundary, which the ON check removes)."""
    n = len(ring)
    for i in range(n):
        u, v = ring[i], ring[(i + 1) % n]
        if _orient(u[0], u[1], v[0], v[1], mx, my) == 0 and _within(
            u[0], v[0], mx
        ) and _within(u[1], v[1], my):
            return "on"
    inside = False
    for i in range(n):
        u, v = ring[i], ring[(i + 1) % n]
        if (u[1] > my) != (v[1] > my):
            # x of edge at height my, compared to mx — exact
            x_at = u[0] + (my - u[1]) * Fraction(v[0] - u[0], v[1] - u[1])
            if x_at > mx:
                inside = not inside
    return "in" if inside else "out"


def relate_rings(a, b):
    """Exact relation of two integer-coordinate simple rings:
    'overlaps' (interiors intersect), 'touches' (boundaries meet,
    interiors disjoint), or 'disjoint'. Orientation-agnostic; each ring
    a list of (x, y) int pairs, implicit closure."""
    half = Fraction(1, 2)
    overlap = False
    contact_any = False
    all_on = [True, True]
    for side, (P, Q) in enumerate(((a, b), (b, a))):
        np_ = len(P)
        for i in range(np_):
            p, q = P[i], P[(i + 1) % np_]
            ts = {Fraction(0), Fraction(1)}
            for j in range(len(Q)):
                u, v = Q[j], Q[(j + 1) % len(Q)]
                t_list, proper, contact = _edge_contacts(p, q, u, v)
                if proper:
                    overlap = True
                if contact:
                    contact_any = True
                for t in t_list:
                    if 0 <= t <= 1:
                        ts.add(t)
            ordered = sorted(ts)
            for t0, t1 in zip(ordered, ordered[1:]):
                tm = (t0 + t1) * half
                mx = p[0] + tm * (q[0] - p[0])
                my = p[1] + tm * (q[1] - p[1])
                cls = _classify_point(mx, my, Q)
                if cls == "in":
                    overlap = True
                elif cls != "on":
                    all_on[side] = False
    if overlap or (all_on[0] and all_on[1]):
        return "overlaps"
    if contact_any:
        return "touches"
    # boundaries fully disjoint: containment is all-or-nothing
    if _classify_point(Fraction(a[0][0]), Fraction(a[0][1]), b) == "in":
        return "overlaps"
    if _classify_point(Fraction(b[0][0]), Fraction(b[0][1]), a) == "in":
        return "overlaps"
    return "disjoint"


# --------------------------------------------------------- operator


def polygon_relate_join(
    left: DataFrame,
    right: DataFrame,
    *,
    cell: int = 8192,
    id_col: str = "gid",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """(a_gid, b_gid, relate) for every cross pair whose closures
    intersect — relate 'overlaps' when the INTERIORS intersect (proper
    crossing, containment, identical rings, or a boundary piece inside),
    'touches' when only the boundaries meet (shared edges, vertex
    contacts, collinear runs). Disjoint pairs are absent. Exact integer/
    rational semantics — see the module docstring for the theorem.

    Candidates: integer-bbox cover on a coarse ``cell`` grid, ONE cell
    equi-join carrying ids only, id-distinct, then one geometry re-join
    feeding the exact Arrow-batched refine. Intersecting closures =>
    intersecting bboxes => a shared cover cell, so recall is exact."""

    def cover(df: DataFrame, tag: str) -> DataFrame:
        xs, ys = F.col(xs_col), F.col(ys_col)
        return (
            df.select(
                F.col(id_col).alias(f"_{tag}id"),
                F.floor(F.array_min(xs) / cell).alias("_x0"),
                F.floor(F.array_max(xs) / cell).alias("_x1"),
                F.floor(F.array_min(ys) / cell).alias("_y0"),
                F.floor(F.array_max(ys) / cell).alias("_y1"),
            )
            .withColumn("_cx", F.explode(F.sequence("_x0", "_x1")))
            .withColumn("_cy", F.explode(F.sequence("_y0", "_y1")))
            .select(f"_{tag}id", (F.col("_cx") * 1_048_576 + F.col("_cy")).alias("_cell"))
        )

    cand = (
        cover(left, "l")
        .join(cover(right, "r"), "_cell")
        .select("_lid", "_rid")
        .distinct()
    )
    lg = left.select(
        F.col(id_col).alias("_lid"),
        F.col(xs_col).alias("_lxs"),
        F.col(ys_col).alias("_lys"),
    )
    rg = right.select(
        F.col(id_col).alias("_rid"),
        F.col(xs_col).alias("_rxs"),
        F.col(ys_col).alias("_rys"),
    )
    pairs = cand.join(lg, "_lid").join(rg, "_rid")

    def refine(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_rel = [], [], []
            for la, ra, lxs, lys, rxs, rys in zip(
                pdf["_lid"], pdf["_rid"], pdf["_lxs"], pdf["_lys"],
                pdf["_rxs"], pdf["_rys"],
            ):
                ring_a = list(zip((int(x) for x in lxs), (int(y) for y in lys)))
                ring_b = list(zip((int(x) for x in rxs), (int(y) for y in rys)))
                rel = relate_rings(ring_a, ring_b)
                if rel != "disjoint":
                    out_a.append(int(la))
                    out_b.append(int(ra))
                    out_rel.append(rel)
            yield pd.DataFrame(
                {"a_gid": pd.Series(out_a, dtype="int64"),
                 "b_gid": pd.Series(out_b, dtype="int64"),
                 "relate": pd.Series(out_rel, dtype="object")}
            )

    return pairs.mapInPandas(
        refine, schema="a_gid long, b_gid long, relate string"
    )


# ---------------------------------------------------------- fixture

_LAT_M = 2147483647
_LAT_A = 48271


def _lat_hash(x: int, seed: int) -> int:
    """MINSTD-double + xorshift — the sampling.hash_col integer stream,
    re-expressed driver-side (both call sites build fixtures on the
    driver, so no cross-engine risk; tests/test_relate.py pins this
    against the Column implementation so silent drift between the two
    cannot change fixtures unnoticed — ADVICE r4)."""
    v = ((x + 131071 * seed) % _LAT_M + _LAT_M) % _LAT_M + 1
    h1 = (v * _LAT_A) % _LAT_M
    h1x = h1 ^ (h1 >> 13)
    return ((h1x % _LAT_M) * _LAT_A) % _LAT_M


def _lattice_ring(gid: int, seed: int) -> tuple[list[int], list[int]]:
    """Deterministic lattice polygon for gid: anchors and sizes are
    multiples of 1000 inside [0, 70000], so shared edges, vertex
    touches, collinear runs, containment, and identical rings all occur
    at high frequency — the degenerate regimes this operator exists
    for. Every 6th polygon (gid % 6 == 5) REUSES the geometry of
    gid - 3: with an even/odd left-right split that plants exact
    duplicate cross pairs."""
    src = gid - 3 if gid % 6 == 5 else gid
    ax = (_lat_hash(src, seed + 1) % 57) * 1000
    ay = (_lat_hash(src, seed + 2) % 57) * 1000
    w = (1 + _lat_hash(src, seed + 3) % 5) * 1000
    h = (1 + _lat_hash(src, seed + 4) % 5) * 1000
    shape = _lat_hash(src, seed + 5) % 4
    if shape == 0:
        xs = [ax, ax + w, ax + w, ax]
        ys = [ay, ay, ay + h, ay + h]
    elif shape == 1:
        xs = [ax, ax + w, ax]
        ys = [ay, ay, ay + h]
    elif shape == 2:
        s = (_lat_hash(src, seed + 6) % 3) * 1000
        xs = [ax, ax + w, ax + w + s, ax + s]
        ys = [ay, ay, ay + h, ay + h]
    else:
        xs = [ax + w, ax + 2 * w, ax + w, ax]
        ys = [ay, ay + h, ay + 2 * h, ay + h]
    return xs, ys


def synth_lattice_polys(spark, n: int, *, seed: int = 0) -> DataFrame:
    """(gid, xs, ys) integer-lattice polygon fixture — driver-side
    generated (n is small: the relate join is quadratic-refine on
    candidates, the fixture exists to exercise degeneracies), exactly
    reproducible in SQL (synth_lattice_polys_sql)."""
    rows = []
    for gid in range(n):
        xs, ys = _lattice_ring(gid, seed)
        rows.append((gid, xs, ys))
    return spark.createDataFrame(
        rows, "gid long, xs array<long>, ys array<long>"
    )


def synth_lattice_polys_sql(n: int, *, seed: int = 0) -> str:
    """DuckDB twin of synth_lattice_polys: VALUES with the same
    integers (the generator is driver-side either way; embedding the
    literals keeps the twin engine-independent)."""
    vals = []
    for gid in range(n):
        xs, ys = _lattice_ring(gid, seed)
        vals.append(
            f"({gid}, {list(xs)}::BIGINT[], {list(ys)}::BIGINT[])"
        )
    return (
        "SELECT * FROM (VALUES " + ", ".join(vals) + ") t(gid, xs, ys)"
    )


# ------------------------------------------------------- DuckDB twin

_H80 = "CAST('1208925819614629174706176' AS HUGEINT)"  # 2^80


def polygon_relate_sql(
    polys_sql: str,
    left_pred: str = "a.gid % 2 = 0",
    right_pred: str = "b.gid % 2 = 1",
) -> str:
    """DuckDB twin of polygon_relate_join over BRUTE-FORCE cross pairs
    (left_pred x right_pred, default gid parity — grid/cover-
    independent): the same
    exact decision procedure, mechanized relationally. Rationals ride as
    (numerator, POSITIVE denominator) BIGINT pairs promoted to HUGEINT
    where products need it; the split-point ordering uses the exact
    integer key floor(tn*2^80/td) — contact denominators are < 2^33, so
    distinct rationals differ by > 2^-66 and the key is a faithful total
    order AND equality (dedupe + lead() windowing both ride it). Piece
    midpoints, ON tests, and the even-odd ray cast all cross-multiply
    into HUGEINT; bounds: |coord| <= 2^17, den <= 2^33, so the largest
    product stays under 2^113 << 2^127."""
    return f"""
WITH polys AS ({polys_sql}),
pairs AS (
  SELECT a.gid AS a_gid, b.gid AS b_gid,
         a.xs AS axs, a.ys AS ays, b.xs AS bxs, b.ys AS bys
  FROM polys a JOIN polys b ON ({left_pred}) AND ({right_pred})
),
sides AS (
  SELECT a_gid, b_gid, 0 AS side, axs AS pxs, ays AS pys, bxs AS qxs, bys AS qys FROM pairs
  UNION ALL
  SELECT a_gid, b_gid, 1 AS side, bxs AS pxs, bys AS pys, axs AS qxs, ays AS qys FROM pairs
),
pedges AS (
  SELECT a_gid, b_gid, side, pxs, pys, qxs, qys, i,
         pxs[i + 1] AS px, pys[i + 1] AS py,
         pxs[(i + 1) % len(pxs) + 1] AS qx, pys[(i + 1) % len(pys) + 1] AS qy
  FROM sides, unnest(range(len(pxs))) AS t(i)
),
epairs AS (
  SELECT e.*, j,
         qxs[j + 1] AS ux, qys[j + 1] AS uy,
         qxs[(j + 1) % len(qxs) + 1] AS vx, qys[(j + 1) % len(qys) + 1] AS vy
  FROM pedges e, unnest(range(len(qxs))) AS t(j)
),
geom AS (
  SELECT *,
         (qx - px) * (uy - py) - (qy - py) * (ux - px) AS o1,
         (qx - px) * (vy - py) - (qy - py) * (vx - px) AS o2,
         (vx - ux) * (py - uy) - (vy - uy) * (px - ux) AS o3,
         (vx - ux) * (qy - uy) - (vy - uy) * (qx - ux) AS o4,
         (qx - px) * (qx - px) + (qy - py) * (qy - py) AS den,
         (ux - px) * (qx - px) + (uy - py) * (qy - py) AS dotu,
         (vx - px) * (qx - px) + (vy - py) * (qy - py) AS dotv
  FROM epairs
),
flags AS (
  SELECT a_gid, b_gid, side, i, j,
         o1 * o2 < 0 AND o3 * o4 < 0 AS proper,
         CASE
           WHEN o1 = 0 AND o2 = 0 THEN
             den > 0 AND GREATEST(LEAST(dotu, dotv), 0)
                         <= LEAST(GREATEST(dotu, dotv), den)
           WHEN o1 * o2 < 0 AND o3 * o4 < 0 THEN TRUE
           ELSE (o1 = 0 AND ux BETWEEN LEAST(px, qx) AND GREATEST(px, qx)
                        AND uy BETWEEN LEAST(py, qy) AND GREATEST(py, qy))
             OR (o2 = 0 AND vx BETWEEN LEAST(px, qx) AND GREATEST(px, qx)
                        AND vy BETWEEN LEAST(py, qy) AND GREATEST(py, qy))
             OR (o3 = 0 AND px BETWEEN LEAST(ux, vx) AND GREATEST(ux, vx)
                        AND py BETWEEN LEAST(uy, vy) AND GREATEST(uy, vy))
             OR (o4 = 0 AND qx BETWEEN LEAST(ux, vx) AND GREATEST(ux, vx)
                        AND qy BETWEEN LEAST(uy, vy) AND GREATEST(uy, vy))
         END AS contact,
         CASE
           WHEN o1 = 0 AND o2 = 0 THEN
             CASE WHEN den > 0 AND GREATEST(LEAST(dotu, dotv), 0)
                              <= LEAST(GREATEST(dotu, dotv), den)
                  THEN [struct_pack(tn := GREATEST(LEAST(dotu, dotv), 0), td := den),
                        struct_pack(tn := LEAST(GREATEST(dotu, dotv), den), td := den)]
                  ELSE [] END
           WHEN o1 * o2 < 0 AND o3 * o4 < 0 THEN
             CASE WHEN o3 - o4 > 0 THEN [struct_pack(tn := o3, td := o3 - o4)]
                  ELSE [struct_pack(tn := -o3, td := o4 - o3)] END
           ELSE
             CASE WHEN o1 = 0 AND den > 0
                       AND ux BETWEEN LEAST(px, qx) AND GREATEST(px, qx)
                       AND uy BETWEEN LEAST(py, qy) AND GREATEST(py, qy)
                  THEN [struct_pack(tn := dotu, td := den)] ELSE [] END
             || CASE WHEN o2 = 0 AND den > 0
                       AND vx BETWEEN LEAST(px, qx) AND GREATEST(px, qx)
                       AND vy BETWEEN LEAST(py, qy) AND GREATEST(py, qy)
                  THEN [struct_pack(tn := dotv, td := den)] ELSE [] END
             || CASE WHEN o3 = 0
                       AND px BETWEEN LEAST(ux, vx) AND GREATEST(ux, vx)
                       AND py BETWEEN LEAST(uy, vy) AND GREATEST(uy, vy)
                  THEN [struct_pack(tn := CAST(0 AS BIGINT), td := CAST(1 AS BIGINT))] ELSE [] END
             || CASE WHEN o4 = 0
                       AND qx BETWEEN LEAST(ux, vx) AND GREATEST(ux, vx)
                       AND qy BETWEEN LEAST(uy, vy) AND GREATEST(uy, vy)
                  THEN [struct_pack(tn := CAST(1 AS BIGINT), td := CAST(1 AS BIGINT))] ELSE [] END
         END AS ts
  FROM geom
),
pair_flags AS (
  SELECT a_gid, b_gid,
         bool_or(proper) AS proper_any,
         bool_or(contact) AS contact_any
  FROM flags GROUP BY a_gid, b_gid
),
splits_raw AS (
  SELECT a_gid, b_gid, side, i, t.tn AS tn, t.td AS td
  FROM flags, unnest(ts) AS u(t)
  UNION ALL
  SELECT a_gid, b_gid, side, i, 0, 1 FROM pedges
  UNION ALL
  SELECT a_gid, b_gid, side, i, 1, 1 FROM pedges
),
splits AS (
  SELECT a_gid, b_gid, side, i,
         CAST(tn AS HUGEINT) * {_H80} // CAST(td AS HUGEINT) AS key,
         min_by(tn, td) AS tn, min(td) AS td
  FROM splits_raw
  GROUP BY a_gid, b_gid, side, i,
           CAST(tn AS HUGEINT) * {_H80} // CAST(td AS HUGEINT)
),
pieces0 AS (
  SELECT a_gid, b_gid, side, i, tn, td,
         lead(tn) OVER w AS tn2, lead(td) OVER w AS td2
  FROM splits
  WINDOW w AS (PARTITION BY a_gid, b_gid, side, i ORDER BY key)
),
pieces AS (
  SELECT p.a_gid, p.b_gid, p.side, p.i,
         CAST(p.tn AS HUGEINT) * p.td2 + CAST(p.tn2 AS HUGEINT) * p.td AS mn,
         2 * CAST(p.td AS HUGEINT) * p.td2 AS md,
         e.px, e.py, e.qx, e.qy, e.qxs, e.qys
  FROM pieces0 p
  JOIN pedges e USING (a_gid, b_gid, side, i)
  WHERE p.tn2 IS NOT NULL
),
mids AS (
  SELECT a_gid, b_gid, side, i, mn, md, qxs, qys,
         px * md + mn * (qx - px) AS mxn,
         py * md + mn * (qy - py) AS myn
  FROM pieces
),
mid_cls AS (
  SELECT m.a_gid, m.b_gid, m.side, m.i, m.mn,
         bool_or(
           (vx - ux) * (m.myn - uy * m.md) - (vy - uy) * (m.mxn - ux * m.md) = 0
           AND m.mxn BETWEEN LEAST(ux * m.md, vx * m.md) AND GREATEST(ux * m.md, vx * m.md)
           AND m.myn BETWEEN LEAST(uy * m.md, vy * m.md) AND GREATEST(uy * m.md, vy * m.md)
         ) AS on_any,
         sum(CASE WHEN (uy * m.md > m.myn) <> (vy * m.md > m.myn)
                   AND ((ux * m.md - m.mxn) * (vy - uy)
                        + (m.myn - uy * m.md) * (vx - ux)) * (vy - uy) > 0
              THEN 1 ELSE 0 END) % 2 = 1 AS odd
  FROM mids m, unnest(range(len(m.qxs))) AS t(j),
       LATERAL (SELECT m.qxs[j + 1] AS ux, m.qys[j + 1] AS uy,
                       m.qxs[(j + 1) % len(m.qxs) + 1] AS vx,
                       m.qys[(j + 1) % len(m.qys) + 1] AS vy) e
  GROUP BY m.a_gid, m.b_gid, m.side, m.i, m.mn
),
side_agg AS (
  SELECT a_gid, b_gid, side,
         bool_or(NOT on_any AND odd) AS any_in,
         bool_and(on_any) AS all_on
  FROM mid_cls GROUP BY a_gid, b_gid, side
),
pair_sides AS (
  SELECT a_gid, b_gid,
         bool_or(any_in) AS any_in,
         bool_and(all_on) AS all_on_both
  FROM side_agg GROUP BY a_gid, b_gid
),
verts AS (
  SELECT s.a_gid, s.b_gid, s.side,
         bool_or(
           ((s.pxs[1] - ux) * (vy - uy) - (s.pys[1] - uy) * (vx - ux)) = 0
           AND s.pxs[1] BETWEEN LEAST(ux, vx) AND GREATEST(ux, vx)
           AND s.pys[1] BETWEEN LEAST(uy, vy) AND GREATEST(uy, vy)
         ) AS v_on,
         sum(CASE WHEN (uy > s.pys[1]) <> (vy > s.pys[1])
                   AND ((ux - s.pxs[1]) * (vy - uy)
                        + (s.pys[1] - uy) * (vx - ux)) * (vy - uy) > 0
              THEN 1 ELSE 0 END) % 2 = 1 AS v_odd
  FROM sides s, unnest(range(len(s.qxs))) AS t(j),
       LATERAL (SELECT s.qxs[j + 1] AS ux, s.qys[j + 1] AS uy,
                       s.qxs[(j + 1) % len(s.qxs) + 1] AS vx,
                       s.qys[(j + 1) % len(s.qys) + 1] AS vy) e
  GROUP BY s.a_gid, s.b_gid, s.side
),
vert_any AS (
  SELECT a_gid, b_gid, bool_or(NOT v_on AND v_odd) AS v_in
  FROM verts GROUP BY a_gid, b_gid
)
SELECT f.a_gid, f.b_gid,
       CASE WHEN f.proper_any OR s.any_in OR s.all_on_both THEN 'overlaps'
            WHEN f.contact_any THEN 'touches'
            WHEN v.v_in THEN 'overlaps'
       END AS relate
FROM pair_flags f
JOIN pair_sides s USING (a_gid, b_gid)
JOIN vert_any v USING (a_gid, b_gid)
WHERE f.proper_any OR s.any_in OR s.all_on_both OR f.contact_any OR v.v_in
"""


# ------------------------------------------- intersection area (pinned)


def _shoelace2(ring):
    s = 0
    n = len(ring)
    for i in range(n):
        j = (i + 1) % n
        s += ring[i][0] * ring[j][1] - ring[j][0] * ring[i][1]
    return s


def _ccw(ring):
    return ring if _shoelace2(ring) >= 0 else ring[::-1]


def intersection_area2(a, b):
    """2x the area of A∩B for integer-coordinate simple rings, by
    Green's theorem over EXACTLY-classified boundary pieces — no
    clipping algorithm, no epsilons in the topology:

      2*area(A∩B) = sum over directed pieces of dA that are strictly IN
      B, or ON dB RUNNING THE SAME DIRECTION (the shared segment bounds
      the intersection once; opposite-direction coincident edges bound
      zero width and are skipped), of (x0*y1 - x1*y0), plus the same
      over pieces of dB strictly IN A.

    Both rings are normalized CCW first (exact shoelace sign). Piece
    endpoints are exact rationals; the MEASURE accumulates in a PINNED
    float dataflow — num/den each rounds to double, one division, the
    cross term, a left-to-right fold in (side, edge, t) order — which
    the DuckDB twin replays literally, so the exported scaled BIGINT
    matches bit-for-bit. Returns the float 2*area (exact zero for
    touch-only and disjoint pairs: no piece qualifies)."""
    a = _ccw([(int(x), int(y)) for x, y in a])
    b = _ccw([(int(x), int(y)) for x, y in b])
    total = 0.0
    for side, (P, Q) in enumerate(((a, b), (b, a))):
        np_ = len(P)
        for i in range(np_):
            p, q = P[i], P[(i + 1) % np_]
            ts = {Fraction(0), Fraction(1)}
            for j in range(len(Q)):
                u, v = Q[j], Q[(j + 1) % len(Q)]
                t_list, _, _ = _edge_contacts(p, q, u, v)
                for t in t_list:
                    if 0 <= t <= 1:
                        ts.add(t)
            ordered = sorted(ts)
            dx, dy = q[0] - p[0], q[1] - p[1]
            for t0, t1 in zip(ordered, ordered[1:]):
                tm = (t0 + t1) * Fraction(1, 2)
                mx = p[0] + tm * (q[0] - p[0])
                my = p[1] + tm * (q[1] - p[1])
                cls = _classify_point(mx, my, Q)
                keep = cls == "in"
                if not keep and cls == "on" and side == 0:
                    # same-direction coincident edge? (unique containing
                    # Q edge: piece interiors never hold a Q vertex)
                    for j in range(len(Q)):
                        u, v = Q[j], Q[(j + 1) % len(Q)]
                        if _orient(u[0], u[1], v[0], v[1], mx, my) == 0 and _within(
                            u[0], v[0], mx
                        ) and _within(u[1], v[1], my):
                            keep = dx * (v[0] - u[0]) + dy * (v[1] - u[1]) > 0
                            break
                if keep:
                    # pinned float endpoints: int->double rounds, ONE
                    # division each, cross term, left-to-right fold
                    n0x, d0 = (
                        p[0] * t0.denominator + t0.numerator * dx,
                        t0.denominator,
                    )
                    n0y = p[1] * t0.denominator + t0.numerator * dy
                    n1x, d1 = (
                        p[0] * t1.denominator + t1.numerator * dx,
                        t1.denominator,
                    )
                    n1y = p[1] * t1.denominator + t1.numerator * dy
                    x0 = float(n0x) / float(d0)
                    y0 = float(n0y) / float(d0)
                    x1 = float(n1x) / float(d1)
                    y1 = float(n1y) / float(d1)
                    total = total + (x0 * y1 - x1 * y0)
    return total


def polygon_area_join(
    left: DataFrame,
    right: DataFrame,
    *,
    cell: int = 8192,
    id_col: str = "gid",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """(a_gid, b_gid, area2_q) for every cross pair with POSITIVE
    intersection area: area2_q = floor(2*area(A∩B) * 2^20) over the
    exact-classification pinned-float measure (intersection_area2).
    Touch-only pairs contribute exact zero and are absent.

    Invariant scope (ADVICE r4): "this pair set equals
    polygon_relate_join's 'overlaps' rows" is a FIXTURE-SCOPED pin
    (lattice polygons whose intersections are far from degenerate), not
    a universal guarantee — the relate classification is exact rational
    while the a2 > 0 filter here is the pinned float fold, so an
    adversarial pair with a positive but ≲2⁻⁵⁰ intersection could
    cancel to ≤ 0.0 in the fold and drop from this join while relate
    still reports 'overlaps' (both engines consistently — no hash risk,
    only a semantic caveat for exotic inputs). Same candidate cover +
    Arrow refine plan as polygon_relate_join."""

    def cover(df: DataFrame, tag: str) -> DataFrame:
        xs, ys = F.col(xs_col), F.col(ys_col)
        return (
            df.select(
                F.col(id_col).alias(f"_{tag}id"),
                F.floor(F.array_min(xs) / cell).alias("_x0"),
                F.floor(F.array_max(xs) / cell).alias("_x1"),
                F.floor(F.array_min(ys) / cell).alias("_y0"),
                F.floor(F.array_max(ys) / cell).alias("_y1"),
            )
            .withColumn("_cx", F.explode(F.sequence("_x0", "_x1")))
            .withColumn("_cy", F.explode(F.sequence("_y0", "_y1")))
            .select(f"_{tag}id", (F.col("_cx") * 1_048_576 + F.col("_cy")).alias("_cell"))
        )

    cand = (
        cover(left, "l")
        .join(cover(right, "r"), "_cell")
        .select("_lid", "_rid")
        .distinct()
    )
    lg = left.select(
        F.col(id_col).alias("_lid"),
        F.col(xs_col).alias("_lxs"),
        F.col(ys_col).alias("_lys"),
    )
    rg = right.select(
        F.col(id_col).alias("_rid"),
        F.col(xs_col).alias("_rxs"),
        F.col(ys_col).alias("_rys"),
    )
    pairs = cand.join(lg, "_lid").join(rg, "_rid")

    def refine(batches: Iterator) -> Iterator:
        import math as _m

        import pandas as pd

        for pdf in batches:
            out_a, out_b, out_q = [], [], []
            for la, ra, lxs, lys, rxs, rys in zip(
                pdf["_lid"], pdf["_rid"], pdf["_lxs"], pdf["_lys"],
                pdf["_rxs"], pdf["_rys"],
            ):
                ring_a = list(zip((int(x) for x in lxs), (int(y) for y in lys)))
                ring_b = list(zip((int(x) for x in rxs), (int(y) for y in rys)))
                a2 = intersection_area2(ring_a, ring_b)
                if a2 > 0.0:
                    out_a.append(int(la))
                    out_b.append(int(ra))
                    out_q.append(_m.floor(a2 * 1048576.0))
            yield pd.DataFrame(
                {"a_gid": pd.Series(out_a, dtype="int64"),
                 "b_gid": pd.Series(out_b, dtype="int64"),
                 "area2_q": pd.Series(out_q, dtype="int64")}
            )

    return pairs.mapInPandas(
        refine, schema="a_gid long, b_gid long, area2_q long"
    )


def polygon_area_sql(polys_sql: str) -> str:
    """DuckDB twin of polygon_area_join over brute-force cross pairs:
    the same exact piece classification as polygon_relate_sql, the same
    keep rule (strictly-IN pieces both sides; ON pieces of side A only
    when the coincident edge runs the SAME direction), and the same
    PINNED float measure — t-fractions reduce by gcd first (Python's
    Fraction is canonical, and float(g*n)/float(g*d) != float(n)/float(d)
    for non-power-of-2 g), each endpoint rounds int->double and divides
    once, cross terms fold left-to-right in (side, edge, t) order."""
    return f"""
WITH polys0 AS ({polys_sql}),
polys AS (
  SELECT gid,
         CASE WHEN s2 >= 0 THEN xs ELSE list_reverse(xs) END AS xs,
         CASE WHEN s2 >= 0 THEN ys ELSE list_reverse(ys) END AS ys
  FROM (
    SELECT gid, xs, ys,
           list_sum(list_transform(range(len(xs)), i ->
             xs[i + 1] * ys[(i + 1) % len(ys) + 1]
             - xs[(i + 1) % len(xs) + 1] * ys[i + 1])) AS s2
    FROM polys0
  )
),
pairs AS (
  SELECT a.gid AS a_gid, b.gid AS b_gid,
         a.xs AS axs, a.ys AS ays, b.xs AS bxs, b.ys AS bys
  FROM polys a JOIN polys b ON a.gid % 2 = 0 AND b.gid % 2 = 1
),
sides AS (
  SELECT a_gid, b_gid, 0 AS side, axs AS pxs, ays AS pys, bxs AS qxs, bys AS qys FROM pairs
  UNION ALL
  SELECT a_gid, b_gid, 1 AS side, bxs AS pxs, bys AS pys, axs AS qxs, ays AS qys FROM pairs
),
pedges AS (
  SELECT a_gid, b_gid, side, pxs, pys, qxs, qys, i,
         pxs[i + 1] AS px, pys[i + 1] AS py,
         pxs[(i + 1) % len(pxs) + 1] AS qx, pys[(i + 1) % len(pys) + 1] AS qy
  FROM sides, unnest(range(len(pxs))) AS t(i)
),
epairs AS (
  SELECT e.*, j,
         qxs[j + 1] AS ux, qys[j + 1] AS uy,
         qxs[(j + 1) % len(qxs) + 1] AS vx, qys[(j + 1) % len(qys) + 1] AS vy
  FROM pedges e, unnest(range(len(qxs))) AS t(j)
),
geom AS (
  SELECT *,
         (qx - px) * (uy - py) - (qy - py) * (ux - px) AS o1,
         (qx - px) * (vy - py) - (qy - py) * (vx - px) AS o2,
         (vx - ux) * (py - uy) - (vy - uy) * (px - ux) AS o3,
         (vx - ux) * (qy - uy) - (vy - uy) * (qx - ux) AS o4,
         (qx - px) * (qx - px) + (qy - py) * (qy - py) AS den,
         (ux - px) * (qx - px) + (uy - py) * (qy - py) AS dotu,
         (vx - px) * (qx - px) + (vy - py) * (qy - py) AS dotv
  FROM epairs
),
tarms AS (
  SELECT a_gid, b_gid, side, i,
         CASE
           WHEN o1 = 0 AND o2 = 0 THEN
             CASE WHEN den > 0 AND GREATEST(LEAST(dotu, dotv), 0)
                              <= LEAST(GREATEST(dotu, dotv), den)
                  THEN [struct_pack(tn := GREATEST(LEAST(dotu, dotv), 0), td := den),
                        struct_pack(tn := LEAST(GREATEST(dotu, dotv), den), td := den)]
                  ELSE [] END
           WHEN o1 * o2 < 0 AND o3 * o4 < 0 THEN
             CASE WHEN o3 - o4 > 0 THEN [struct_pack(tn := o3, td := o3 - o4)]
                  ELSE [struct_pack(tn := -o3, td := o4 - o3)] END
           ELSE
             CASE WHEN o1 = 0 AND den > 0
                       AND ux BETWEEN LEAST(px, qx) AND GREATEST(px, qx)
                       AND uy BETWEEN LEAST(py, qy) AND GREATEST(py, qy)
                  THEN [struct_pack(tn := dotu, td := den)] ELSE [] END
             || CASE WHEN o2 = 0 AND den > 0
                       AND vx BETWEEN LEAST(px, qx) AND GREATEST(px, qx)
                       AND vy BETWEEN LEAST(py, qy) AND GREATEST(py, qy)
                  THEN [struct_pack(tn := dotv, td := den)] ELSE [] END
             || CASE WHEN o3 = 0
                       AND px BETWEEN LEAST(ux, vx) AND GREATEST(ux, vx)
                       AND py BETWEEN LEAST(uy, vy) AND GREATEST(uy, vy)
                  THEN [struct_pack(tn := CAST(0 AS BIGINT), td := CAST(1 AS BIGINT))] ELSE [] END
             || CASE WHEN o4 = 0
                       AND qx BETWEEN LEAST(ux, vx) AND GREATEST(ux, vx)
                       AND qy BETWEEN LEAST(uy, vy) AND GREATEST(uy, vy)
                  THEN [struct_pack(tn := CAST(1 AS BIGINT), td := CAST(1 AS BIGINT))] ELSE [] END
         END AS ts
  FROM geom
),
splits_raw AS (
  SELECT a_gid, b_gid, side, i,
         t.tn // gcd(t.tn, t.td) AS tn, t.td // gcd(t.tn, t.td) AS td
  FROM tarms, unnest(ts) AS u(t)
  UNION ALL
  SELECT a_gid, b_gid, side, i, 0, 1 FROM pedges
  UNION ALL
  SELECT a_gid, b_gid, side, i, 1, 1 FROM pedges
),
splits AS (
  SELECT a_gid, b_gid, side, i,
         CAST(tn AS HUGEINT) * {_H80} // CAST(td AS HUGEINT) AS key,
         min(tn) AS tn, min(td) AS td
  FROM splits_raw
  GROUP BY a_gid, b_gid, side, i,
           CAST(tn AS HUGEINT) * {_H80} // CAST(td AS HUGEINT)
),
pieces0 AS (
  SELECT a_gid, b_gid, side, i, tn, td,
         lead(tn) OVER w AS tn2, lead(td) OVER w AS td2,
         key
  FROM splits
  WINDOW w AS (PARTITION BY a_gid, b_gid, side, i ORDER BY key)
),
pieces AS (
  SELECT p.a_gid, p.b_gid, p.side, p.i, p.key,
         p.tn, p.td, p.tn2, p.td2,
         CAST(p.tn AS HUGEINT) * p.td2 + CAST(p.tn2 AS HUGEINT) * p.td AS mn,
         2 * CAST(p.td AS HUGEINT) * p.td2 AS md,
         e.px, e.py, e.qx, e.qy, e.qx - e.px AS dx, e.qy - e.py AS dy,
         e.qxs, e.qys
  FROM pieces0 p
  JOIN pedges e USING (a_gid, b_gid, side, i)
  WHERE p.tn2 IS NOT NULL
),
mids AS (
  SELECT *,
         px * md + mn * dx AS mxn,
         py * md + mn * dy AS myn
  FROM pieces
),
mid_cls AS (
  SELECT m.a_gid, m.b_gid, m.side, m.i, m.key,
         any_value(m.tn) AS tn, any_value(m.td) AS td,
         any_value(m.tn2) AS tn2, any_value(m.td2) AS td2,
         any_value(m.px) AS px, any_value(m.py) AS py,
         any_value(m.dx) AS dx, any_value(m.dy) AS dy,
         bool_or(
           (vx - ux) * (m.myn - uy * m.md) - (vy - uy) * (m.mxn - ux * m.md) = 0
           AND m.mxn BETWEEN LEAST(ux * m.md, vx * m.md) AND GREATEST(ux * m.md, vx * m.md)
           AND m.myn BETWEEN LEAST(uy * m.md, vy * m.md) AND GREATEST(uy * m.md, vy * m.md)
         ) AS on_any,
         bool_or(
           (vx - ux) * (m.myn - uy * m.md) - (vy - uy) * (m.mxn - ux * m.md) = 0
           AND m.mxn BETWEEN LEAST(ux * m.md, vx * m.md) AND GREATEST(ux * m.md, vx * m.md)
           AND m.myn BETWEEN LEAST(uy * m.md, vy * m.md) AND GREATEST(uy * m.md, vy * m.md)
           AND m.dx * (vx - ux) + m.dy * (vy - uy) > 0
         ) AS same_dir,
         sum(CASE WHEN (uy * m.md > m.myn) <> (vy * m.md > m.myn)
                   AND ((ux * m.md - m.mxn) * (vy - uy)
                        + (m.myn - uy * m.md) * (vx - ux)) * (vy - uy) > 0
              THEN 1 ELSE 0 END) % 2 = 1 AS odd
  FROM mids m, unnest(range(len(m.qxs))) AS t(j),
       LATERAL (SELECT m.qxs[j + 1] AS ux, m.qys[j + 1] AS uy,
                       m.qxs[(j + 1) % len(m.qxs) + 1] AS vx,
                       m.qys[(j + 1) % len(m.qys) + 1] AS vy) e
  GROUP BY m.a_gid, m.b_gid, m.side, m.i, m.key
),
contribs AS (
  SELECT a_gid, b_gid, side, i, key,
         (CAST(px * td + tn * dx AS DOUBLE) / CAST(td AS DOUBLE))
           * (CAST(py * td2 + tn2 * dy AS DOUBLE) / CAST(td2 AS DOUBLE))
         - (CAST(px * td2 + tn2 * dx AS DOUBLE) / CAST(td2 AS DOUBLE))
           * (CAST(py * td + tn * dy AS DOUBLE) / CAST(td AS DOUBLE)) AS c
  FROM mid_cls
  WHERE (NOT on_any AND odd) OR (side = 0 AND on_any AND same_dir)
),
sums AS (
  SELECT a_gid, b_gid,
         list_reduce(list(c ORDER BY side, i, key), (x, y) -> x + y) AS total
  FROM contribs GROUP BY a_gid, b_gid
)
SELECT a_gid, b_gid,
       CAST(FLOOR(total * CAST('1048576' AS DOUBLE)) AS BIGINT) AS area2_q
FROM sums WHERE total > 0
"""


# ------------------------------------------------ multipolygon relate

_MP_RINGS = 8  # ring-id packing: rid = gid * _MP_RINGS + ring_idx


def multipolygon_relate_join(
    left: DataFrame,
    right: DataFrame,
    *,
    cell: int = 8192,
) -> DataFrame:
    """(a_gid, b_gid, relate) for MULTIPOLYGONS — disjoint-island (or
    even mutually-overlapping) ring collections under UNION semantics:
    interiors(A) = union of its rings' interiors, so A overlaps B iff
    ANY ring pair overlaps, and touches iff no pair overlaps but some
    pair touches. Input: one row per ring, (gid, ring_idx, xs, ys),
    ring_idx < 8. Plan: pack rid = gid*8 + ring_idx, run the ring-level
    exact relate join (same candidate cover + Arrow refine), then ONE
    (a_gid, b_gid) aggregate folds ring relations to the multipolygon
    relation. Holes are out of scope (islands only) — a hole-aware
    relate needs subtractive classification, documented here rather
    than approximated."""
    def pack(df: DataFrame) -> DataFrame:
        bad = F.when(
            (F.col("ring_idx") < 0) | (F.col("ring_idx") >= _MP_RINGS),
            F.raise_error(
                F.lit("multipolygon_relate_join: ring_idx must be in [0, 8)")
            ).cast("long"),
        ).otherwise(F.col("ring_idx"))
        return df.select(
            (F.col("gid") * _MP_RINGS + bad).alias("gid"), "xs", "ys"
        )

    rings = polygon_relate_join(pack(left), pack(right), cell=cell)
    return (
        rings.groupBy(
            F.expr(f"a_gid DIV {_MP_RINGS}").alias("a_gid"),
            F.expr(f"b_gid DIV {_MP_RINGS}").alias("b_gid"),
        )
        .agg(
            F.max(F.col("relate") == "overlaps").alias("_ov")
        )
        .select(
            "a_gid",
            "b_gid",
            F.when(F.col("_ov"), F.lit("overlaps"))
            .otherwise(F.lit("touches"))
            .alias("relate"),
        )
    )


def synth_lattice_multipolys(spark, n_mp: int, *, seed: int = 0) -> DataFrame:
    """(gid, ring_idx, xs, ys) multipolygon fixture: each gid carries
    1 + hash%3 islands drawn from the same degeneracy-dense lattice
    generator (ring r of multipolygon g uses source id g*4 + r, so
    islands collide with OTHER multipolygons' islands at the fixture's
    usual shared-edge / identical-ring rates)."""
    rows = []
    for gid in range(n_mp):
        k = 1 + _lat_hash(gid, seed + 9) % 3
        for r in range(k):
            xs, ys = _lattice_ring(gid * 4 + r, seed)
            rows.append((gid, r, xs, ys))
    return spark.createDataFrame(
        rows, "gid long, ring_idx long, xs array<long>, ys array<long>"
    )


def synth_lattice_multipolys_sql(n_mp: int, *, seed: int = 0) -> str:
    """Ring rows PRE-PACKED as rid = gid*8 + ring_idx (the twin operates
    at ring level and re-derives gid = rid // 8)."""
    vals = []
    for gid in range(n_mp):
        k = 1 + _lat_hash(gid, seed + 9) % 3
        for r in range(k):
            xs, ys = _lattice_ring(gid * 4 + r, seed)
            vals.append(
                f"({gid * _MP_RINGS + r}, {list(xs)}::BIGINT[], {list(ys)}::BIGINT[])"
            )
    return "SELECT * FROM (VALUES " + ", ".join(vals) + ") t(gid, xs, ys)"


def multipolygon_relate_sql(ring_polys_sql: str) -> str:
    """DuckDB twin: the ring-level brute-force relate (pair split on the
    MULTIPOLYGON id parity, (rid//8) % 2) aggregated to multipolygon
    pairs under the same union-semantics fold."""
    inner = polygon_relate_sql(
        ring_polys_sql,
        left_pred=f"(a.gid // {_MP_RINGS}) % 2 = 0",
        right_pred=f"(b.gid // {_MP_RINGS}) % 2 = 1",
    )
    return f"""
WITH ring_rel AS ({inner})
SELECT a_gid // {_MP_RINGS} AS a_gid, b_gid // {_MP_RINGS} AS b_gid,
       CASE WHEN bool_or(relate = 'overlaps') THEN 'overlaps'
            ELSE 'touches' END AS relate
FROM ring_rel
GROUP BY 1, 2
"""
