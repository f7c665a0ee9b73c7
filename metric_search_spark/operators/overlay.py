"""Polygon overlay: Sutherland–Hodgman clipping of subject polygons
against a convex clip window, with exact-replay float semantics.

The vector-overlay primitive (parcel ∩ zone, AOI ∩ admin boundary,
viewport culling) the north rule's point-in-polygon / polyfill family
leads up to: every subject polygon is clipped edge-by-edge against a
CONVEX window (Sutherland & Hodgman 1974) and reduced to its clipped
vertex count and signed shoelace area.

Determinism contract (the TWED-oracle technique applied to geometry):
no epsilons, no normalization — every arithmetic step is a fixed
left-to-right IEEE float64 dataflow both engines replay literally:

- inside(P) for clip edge A→B is the sign (≥ 0) of the cross product
  ``(bx−ax)·(py−ay) − (by−ay)·(px−ax)`` — one fixed expression;
- the edge intersection uses the two side values s₁, s₂ of that same
  expression: ``t = s₁/(s₁−s₂)``, ``I = C + t·(D−C)`` componentwise;
- the clipped area is ``0.5 · Σᵢ (xᵢ·y₍ᵢ₊₁₎ − x₍ᵢ₊₁₎·yᵢ)`` folded
  LEFT-TO-RIGHT over the final ring (list_sum parity, as pca/mmr pin).

So a DuckDB twin carrying the vertex ring through a recursive CTE
(lists of doubles, flatten-of-cases per clip edge) matches every output
bit-for-bit — a wrong emission rule, a flipped orientation, or a
different fold order all move the hash.

Scale shape: the clip window is a tiny broadcast constant; subjects are
independent rows — ONE mapInPandas pass, zero shuffle, output one row
per polygon. Per-polygon work is O(E·V) on ≤kilobyte rings (the heavy
axis — polygon count — is the Arrow-partitioned one). Clip windows must
be convex and counter-clockwise; subject rings are any simple polygon,
either orientation (area is signed: CCW > 0)."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["clip_area", "overlay_join", "synth_polygons"]


def _clip_ring(
    vx: list[float],
    vy: list[float],
    edges: list[tuple[float, float, float, float]],
) -> tuple[list[float], list[float], float]:
    """One Sutherland–Hodgman pass: ring (vx, vy) against the convex CCW
    edge list; returns (clipped vx, vy, doubled shoelace area). Every op
    is the pinned left-to-right IEEE dataflow the SQL twins replay."""
    for ax, ay, bx, by in edges:
        n = len(vx)
        if n == 0:
            break
        nx: list[float] = []
        ny: list[float] = []
        for i in range(n):
            px, py = vx[i], vy[i]  # current
            qx, qy = vx[i - 1], vy[i - 1]  # previous
            sc = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            sp = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
            if sc >= 0.0:
                if not sp >= 0.0:
                    t = sp / (sp - sc)
                    nx.append(qx + t * (px - qx))
                    ny.append(qy + t * (py - qy))
                nx.append(px)
                ny.append(py)
            elif sp >= 0.0:
                t = sp / (sp - sc)
                nx.append(qx + t * (px - qx))
                ny.append(qy + t * (py - qy))
        vx, vy = nx, ny
    n = len(vx)
    a2 = 0.0
    for i in range(n):  # left-to-right fold — the pinned order
        j = (i + 1) % n
        a2 += vx[i] * vy[j] - vx[j] * vy[i]
    return vx, vy, a2


def _validate_convex_ccw(clip: list[tuple[float, float]]) -> None:
    n = len(clip)
    if n < 3:
        raise ValueError("clip window needs >= 3 vertices")
    for i in range(n):
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        cx, cy = clip[(i + 2) % n]
        if (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) <= 0:
            raise ValueError(
                "clip window must be strictly convex and counter-clockwise"
            )


def clip_area(
    subjects: DataFrame,
    clip: list[tuple[float, float]],
    *,
    id_col: str = "poly_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> DataFrame:
    """Clip every subject ring against the convex CCW window ``clip``.
    Returns (poly_id, n_out, area2) — clipped vertex count and the
    TWICE-signed shoelace area of the clipped ring (area = area2/2;
    kept doubled so the value is the raw fold, divided nowhere)."""
    _validate_convex_ccw(clip)
    edges = [
        (clip[i][0], clip[i][1], clip[(i + 1) % len(clip)][0],
         clip[(i + 1) % len(clip)][1])
        for i in range(len(clip))
    ]
    it = subjects.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, nouts, areas = [], [], []
            for pid, xs, ys in zip(pdf[id_col], pdf[xs_col], pdf[ys_col]):
                vx, vy, a2 = _clip_ring(
                    [float(v) for v in xs], [float(v) for v in ys], edges
                )
                ids.append(pid)
                nouts.append(len(vx))
                areas.append(a2)
            yield pd.DataFrame(
                {"poly_id": ids, "n_out": nouts, "area2": areas}
            )

    return subjects.mapInPandas(
        gen, schema=f"poly_id {it}, n_out long, area2 double"
    )


def overlay_join(
    subjects: DataFrame,
    zones: DataFrame,
    *,
    res: int = 3,
    id_col: str = "poly_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
    zone_id_col: str = "zone_id",
    zxs_col: str = "zxs",
    zys_col: str = "zys",
) -> DataFrame:
    """Polygon-overlay JOIN — the scale shape of :func:`clip_area`: every
    (subject, zone) pair whose clipped intersection is non-empty, with
    its vertex count and doubled shoelace area. Zones must be convex CCW
    rings (validated per row); subjects are any simple ring.

    Plan: bbox→tile candidate pairing at coarse ``res`` (each ring
    explodes to the tiles of its closed bbox — an EQUI-join on (tx, ty),
    never |subjects|·|zones|), id-only DISTINCT, both rings re-join, one
    mapInPandas clip per candidate. Bbox-overlap is implied by
    intersection, so the prefilter has NO false negatives — the
    all-pairs SQL twin proves it on every run (a pair the tiles missed
    would appear in the oracle and flip the hash). Returns
    (poly_id, zone_id, n_out, area2) with n_out > 0."""
    s = float(2.0 ** (-res))
    lim = (1 << res) - 1

    def tiles_of(df: DataFrame, idc: str, xc: str, yc: str, alias: str):
        tx0 = F.greatest(
            F.lit(0), F.least(F.lit(lim), F.floor(F.array_min(xc) / s))
        )
        tx1 = F.greatest(
            F.lit(0), F.least(F.lit(lim), F.floor(F.array_max(xc) / s))
        )
        ty0 = F.greatest(
            F.lit(0), F.least(F.lit(lim), F.floor(F.array_min(yc) / s))
        )
        ty1 = F.greatest(
            F.lit(0), F.least(F.lit(lim), F.floor(F.array_max(yc) / s))
        )
        return (
            df.select(
                F.col(idc).alias(alias),
                F.explode(F.sequence(tx0, tx1)).alias("tx"),
                ty0.alias("_y0"),
                ty1.alias("_y1"),
            )
            .select(
                alias, "tx", F.explode(F.sequence("_y0", "_y1")).alias("ty")
            )
        )

    st = tiles_of(subjects, id_col, xs_col, ys_col, "poly_id")
    zt = tiles_of(zones, zone_id_col, zxs_col, zys_col, "zone_id")
    cand = st.join(zt, ["tx", "ty"]).select("poly_id", "zone_id").distinct()
    sside = subjects.select(
        F.col(id_col).alias("poly_id"),
        F.col(xs_col).alias("_sx"),
        F.col(ys_col).alias("_sy"),
    )
    zside = zones.select(
        F.col(zone_id_col).alias("zone_id"),
        F.col(zxs_col).alias("_zx"),
        F.col(zys_col).alias("_zy"),
    )
    paired = cand.join(sside, "poly_id").join(zside, "zone_id")
    it = subjects.schema[id_col].dataType.simpleString()
    zt_t = zones.schema[zone_id_col].dataType.simpleString()

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pids, zids, nouts, areas = [], [], [], []
            for pid, zid, sx, sy, zx, zy in zip(
                pdf["poly_id"], pdf["zone_id"], pdf["_sx"], pdf["_sy"],
                pdf["_zx"], pdf["_zy"],
            ):
                zc = [(float(a), float(b)) for a, b in zip(zx, zy)]
                _validate_convex_ccw(zc)
                edges = [
                    (zc[i][0], zc[i][1], zc[(i + 1) % len(zc)][0],
                     zc[(i + 1) % len(zc)][1])
                    for i in range(len(zc))
                ]
                vx, vy, a2 = _clip_ring(
                    [float(v) for v in sx], [float(v) for v in sy], edges
                )
                if len(vx) == 0:
                    continue
                pids.append(pid)
                zids.append(zid)
                nouts.append(len(vx))
                areas.append(a2)
            yield pd.DataFrame(
                {
                    "poly_id": pids,
                    "zone_id": zids,
                    "n_out": nouts,
                    "area2": areas,
                }
            )

    return paired.mapInPandas(
        gen,
        schema=f"poly_id {it}, zone_id {zt_t}, n_out long, area2 double",
    )


def synth_polygons(
    n: int, *, seed: int = 97, max_verts: int = 9
) -> list[tuple[int, list[float], list[float]]]:
    """Deterministic star-shaped (hence simple) CCW test polygons from a
    MINSTD stream: ``n`` rings of 3..max_verts vertices at radial
    distances around grid-scattered centers in the unit square. Pure
    integer LCG + a fixed float dataflow, so the SQL twin can embed the
    verbatim coordinates (repr round-trips float64 exactly)."""
    s = seed

    def nxt() -> int:
        nonlocal s
        s = (s * 48271) % 2147483647
        return s

    out = []
    for pid in range(n):
        k = 3 + nxt() % (max_verts - 2)
        cx = (nxt() % 1000) / 1000.0
        cy = (nxt() % 1000) / 1000.0
        xs, ys = [], []
        for j in range(k):
            # tangent-half-angle point on the circle: t strictly
            # increasing across vertices ⇒ angle strictly increasing ⇒
            # star-shaped simple CCW ring — NO libm, pure rational IEEE
            t = -8.0 + 16.0 * (j + (nxt() % 512) / 1024.0) / k
            den = 1.0 + t * t
            ux = (1.0 - t * t) / den
            uy = 2.0 * t / den
            r = 0.02 + (nxt() % 1000) / 1000.0 * 0.25
            xs.append(cx + r * ux)
            ys.append(cy + r * uy)
        # the tangent parametrization leaves an angular gap near ±π, so
        # a thin ring may not enclose its center and come out clockwise
        # — enforce the CCW contract by reversing those (still simple)
        a2 = 0.0
        for i in range(k):
            j2 = (i + 1) % k
            a2 += xs[i] * ys[j2] - xs[j2] * ys[i]
        if a2 < 0.0:
            xs.reverse()
            ys.reverse()
        out.append((pid, xs, ys))
    return out
