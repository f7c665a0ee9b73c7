"""Sutherland–Hodgman clip: exact hand geometries (binary-fraction
coords so areas are exact doubles), orientation sign, boundary
inclusivity, empty results, and convexity validation."""

from __future__ import annotations

import pytest

from metric_search_spark.operators.overlay import (
    _validate_convex_ccw,
    clip_area,
    synth_polygons,
)
from tests.sparkutil import get_spark

_SQ = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75)]


def _run(polys, clip=_SQ):
    spark = get_spark()
    df = spark.createDataFrame(
        polys, "poly_id long, xs array<double>, ys array<double>"
    )
    return {r.poly_id: r for r in clip_area(df, clip).collect()}


def test_inside_outside_and_crossing():
    got = _run(
        [
            # fully inside: kept verbatim, area2 = 2 * 0.125^2... (0.25 side)
            (0, [0.4, 0.6, 0.6, 0.4], [0.4, 0.4, 0.6, 0.6]),
            # fully outside (left of window)
            (1, [0.0, 0.1, 0.1, 0.0], [0.0, 0.0, 0.1, 0.1]),
            # big square containing the window: clips TO the window
            (2, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]),
            # right half sticks out: clipped at x = 0.75
            (3, [0.5, 1.0, 1.0, 0.5], [0.3, 0.3, 0.7, 0.7]),
        ]
    )
    assert got[0].n_out == 4
    assert got[0].area2 == pytest.approx(0.08, rel=1e-12)
    assert (got[1].n_out, got[1].area2) == (0, 0.0)
    assert got[2].area2 == 2 * 0.5 * 0.5  # exactly the window
    assert got[3].area2 == pytest.approx(0.2, rel=1e-12)


def test_orientation_sign_and_boundary_touch():
    got = _run(
        [
            # clockwise ring -> negative area
            (0, [0.4, 0.4, 0.6, 0.6], [0.4, 0.6, 0.6, 0.4]),
            # edge-sharing square: boundary counts inside (sc >= 0)
            (1, [0.25, 0.5, 0.5, 0.25], [0.25, 0.25, 0.5, 0.5]),
        ]
    )
    assert got[0].area2 == pytest.approx(-0.08, rel=1e-12)
    assert got[1].n_out == 4 and got[1].area2 == 2 * 0.0625


def test_triangle_cut_exact():
    # right triangle (0.5,0.5)-(1.0,0.5)-(0.5,1.0) ∩ window [0.25,0.75]²
    # = the full square [0.5,0.75]² (the hypotenuse x+y=1.5 grazes its
    # corner exactly) -> area2 = 2 · 0.25² = 0.125, exact in binary
    got = _run([(0, [0.5, 1.0, 0.5], [0.5, 0.5, 1.0])])
    assert got[0].area2 == 0.125


def test_fixture_mix_and_validation():
    subs = synth_polygons(48)
    clip = [(0.2, 0.35), (0.5, 0.15), (0.8, 0.35), (0.7, 0.75), (0.3, 0.75)]
    got = _run(subs, clip)
    kinds = {"empty": 0, "nonempty": 0}
    for pid, xs, ys in subs:
        r = got[pid]
        if r.n_out == 0:
            assert r.area2 == 0.0
            kinds["empty"] += 1
        else:
            assert r.area2 > 0.0  # CCW fixtures stay CCW
            kinds["nonempty"] += 1
    assert kinds["empty"] > 0 and kinds["nonempty"] > 0
    with pytest.raises(ValueError):
        _validate_convex_ccw([(0, 0), (1, 0)])
    with pytest.raises(ValueError):  # clockwise square
        _validate_convex_ccw([(0, 0), (0, 1), (1, 1), (1, 0)])


def test_overlay_join_matches_allpairs_bruteforce():
    from metric_search_spark.operators.overlay import (
        _clip_ring,
        overlay_join,
    )

    spark = get_spark()
    subs = synth_polygons(24)
    zones = [
        (0, [0.2, 0.5, 0.8, 0.7, 0.3], [0.35, 0.15, 0.35, 0.75, 0.75]),
        (1, [0.05, 0.35, 0.35, 0.05], [0.05, 0.05, 0.3, 0.3]),
        (2, [0.55, 0.95, 0.95, 0.55], [0.55, 0.55, 0.95, 0.95]),
    ]
    sdf = spark.createDataFrame(
        subs, "poly_id long, xs array<double>, ys array<double>"
    )
    zdf = spark.createDataFrame(
        zones, "zone_id long, zxs array<double>, zys array<double>"
    )
    got = {
        (r.poly_id, r.zone_id): (r.n_out, r.area2)
        for r in overlay_join(sdf, zdf, res=3).collect()
    }
    want = {}
    for pid, xs, ys in subs:
        for zid, zxs, zys in zones:
            ne = len(zxs)
            edges = [
                (zxs[i], zys[i], zxs[(i + 1) % ne], zys[(i + 1) % ne])
                for i in range(ne)
            ]
            vx, vy, a2 = _clip_ring(list(xs), list(ys), edges)
            if vx:
                want[(pid, zid)] = (len(vx), a2)
    assert got == want  # bitwise: prefilter is complete, clip identical


def test_overlay_join_rejects_nonconvex_zone():
    from metric_search_spark.operators.overlay import overlay_join

    spark = get_spark()
    sdf = spark.createDataFrame(
        [(0, [0.1, 0.9, 0.9, 0.1], [0.1, 0.1, 0.9, 0.9])],
        "poly_id long, xs array<double>, ys array<double>",
    )
    # clockwise zone overlapping the subject -> kernel must raise
    zdf = spark.createDataFrame(
        [(0, [0.2, 0.2, 0.8, 0.8], [0.2, 0.8, 0.8, 0.2])],
        "zone_id long, zxs array<double>, zys array<double>",
    )
    with pytest.raises(Exception, match="convex"):
        overlay_join(sdf, zdf, res=3).collect()


def test_area2_e12_quantization_margin():
    """The clip_polygons / overlay_join_polygons driver queries emit
    ⌊area2·10¹² + ½⌋ as BIGINT because DuckDB's list-sum accumulation
    order is not the kernel's pinned left fold (r5 strict sweep: ≤2e-16
    cross-engine deltas in the raw double). This certifies the fixture
    margin that makes the quantization flip-proof: every scaled area sits
    ≥1e-3 e12-units from a floor boundary — >5× the worst observed
    cross-engine delta (1.7e-4 e12-units)."""
    from metric_search_spark.operators.overlay import _clip_ring

    clip = [(0.2, 0.35), (0.5, 0.15), (0.8, 0.35), (0.7, 0.75), (0.3, 0.75)]
    zones = [
        ([0.2, 0.5, 0.8, 0.7, 0.3], [0.35, 0.15, 0.35, 0.75, 0.75]),
        ([0.05, 0.35, 0.35, 0.05], [0.05, 0.05, 0.3, 0.3]),
        ([0.6, 0.95, 0.8], [0.05, 0.1, 0.3]),
        ([0.05, 0.45, 0.4, 0.1], [0.55, 0.6, 0.95, 0.9]),
        ([0.55, 0.95, 0.95, 0.55], [0.55, 0.55, 0.95, 0.95]),
        ([0.85, 0.95, 0.95, 0.85], [0.35, 0.35, 0.5, 0.5]),
    ]

    def edges_of(pts):
        n = len(pts)
        return [
            (pts[i][0], pts[i][1], pts[(i + 1) % n][0], pts[(i + 1) % n][1])
            for i in range(n)
        ]

    areas = []
    for _pid, xs, ys in synth_polygons(48):
        _, _, a2 = _clip_ring(list(xs), list(ys), edges_of(clip))
        areas.append(a2)
    for zxs, zys in zones:
        ze = edges_of(list(zip(zxs, zys)))
        for _pid, xs, ys in synth_polygons(48):
            vx, _, a2 = _clip_ring(list(xs), list(ys), ze)
            if vx:
                areas.append(a2)
    assert len(areas) == 48 + 65  # the two queries' row counts
    for a in areas:
        s = a * 1e12 + 0.5
        assert abs(s - round(s)) >= 1e-3, a
