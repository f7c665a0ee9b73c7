"""Geohash pins: the engine's spread-mask encode matches (a) the DuckDB
per-bit-sum twin, (b) an independent classic bisection implementation of
the public geohash definition, and (c) the published example value; the
truncation/prefix property holds across precisions; invalid precisions
are rejected."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from metric_search_spark.operators.geo import (
    _GH_ALPHABET,
    geohash_cells,
    geohash_sql,
    synth_places,
    synth_places_sql,
)
from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _bisect_geohash(lat: float, lon: float, precision: int) -> str:
    """Classic interval-bisection geohash (the textbook algorithm) — an
    independent implementation of the same public definition: refine
    [-90,90] / [-180,180] one bit at a time, longitude first, emitting
    5-bit base-32 groups. Shares no arithmetic with the engine's integer
    quantize + Morton spread."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    acc = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                acc = acc * 2 + 1
                lon_lo = mid
            else:
                acc = acc * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                acc = acc * 2 + 1
                lat_lo = mid
            else:
                acc = acc * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_GH_ALPHABET[acc])
            acc, bits = 0, 0
    return "".join(out)


def test_known_value(spark):
    """The published geohash example: (57.64911, 10.40744) ->
    u4pruydqqvj; our even precisions must emit its prefixes."""
    df = spark.createDataFrame(
        [(0, 57_649_110, 10_407_440)],
        "place_id long, lat_udeg long, lon_udeg long",
    )
    assert geohash_cells(df, 8).collect()[0]["gh"] == "u4pruydq"
    assert geohash_cells(df, 10).collect()[0]["gh"] == "u4pruydqqv"


def test_duckdb_twin_parity(spark):
    got = (
        geohash_cells(synth_places(spark, 400, seed=7), 8)
        .toPandas()
        .sort_values("place_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(geohash_sql(synth_places_sql(400, seed=7), 8))
        .df()
        .sort_values("place_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_bisection_twin_parity(spark):
    """Engine vs the classic float-bisection algorithm on the fixture.
    The integer quantizer floors (udeg + span/2) * 2^bits / span exactly;
    bisection refines float midpoints — same definition, disjoint
    arithmetic. Fixture coordinates are whole microdegrees (exact
    doubles), so both land in the same cell for every row."""
    rows = (
        geohash_cells(synth_places(spark, 300, seed=3), 8)
        .join(synth_places(spark, 300, seed=3), "place_id")
        .collect()
    )
    for r in rows:
        assert r["gh"] == _bisect_geohash(
            r["lat_udeg"] / 1e6, r["lon_udeg"] / 1e6, 8
        ), r


def test_prefix_property(spark):
    """Truncation property: the precision-8 geohash starts with the
    precision-4 and precision-6 geohashes (what makes gh prefixes valid
    shard keys)."""
    p = synth_places(spark, 200, seed=11)
    g8 = {r["place_id"]: r["gh"] for r in geohash_cells(p, 8).collect()}
    for prec in (4, 6):
        for r in geohash_cells(p, prec).collect():
            assert g8[r["place_id"]].startswith(r["gh"]), (prec, r)


def test_gh4_is_prefix(spark):
    for r in geohash_cells(synth_places(spark, 50, seed=5), 8).collect():
        assert r["gh4"] == r["gh"][:4]


def test_precision_validation(spark):
    p = synth_places(spark, 10, seed=1)
    for bad in (0, 1, 3, 7, 13, 14):
        with pytest.raises(ValueError, match="precision"):
            geohash_cells(p, bad)
    with pytest.raises(ValueError, match="precision"):
        geohash_sql("SELECT 1", 5)


def test_boundary_clamp(spark):
    """lon=+180 / lat=+90 quantize one past the top cell; the clamp keeps
    them in-range (z...z top corner, 0...0 bottom)."""
    df = spark.createDataFrame(
        [(0, 90_000_000, 180_000_000), (1, -90_000_000, -180_000_000)],
        "place_id long, lat_udeg long, lon_udeg long",
    )
    out = {r["place_id"]: r["gh"] for r in geohash_cells(df, 8).collect()}
    assert out[0] == "z" * 8
    assert out[1] == "0" * 8


def test_kring_semantics(spark):
    """Neighbor grid: a mid-grid point emits 9 cells whose decoded
    quantized coords are exactly the ±1 offsets; each neighbor's gh is the
    geohash of the offset cell (checked against the bisection twin via
    cell-center coordinates); lon wraps at the antimeridian; lat clamps at
    the poles (6 cells, not 9)."""
    from metric_search_spark.operators.geo import geohash_kring

    prec = 8
    bits = 5 * prec // 2  # 20 per axis
    df = spark.createDataFrame(
        [
            (0, 10_000_000, 20_000_000),     # mid-grid
            (1, 89_999_999, 179_999_999),    # near north pole + antimeridian
            (2, -90_000_000, -180_000_000),  # exact south-west corner
        ],
        "place_id long, lat_udeg long, lon_udeg long",
    )
    out = geohash_kring(df, prec).collect()
    by_place = {}
    for r in out:
        by_place.setdefault(r["place_id"], {})[(r["dx"], r["dy"])] = r["gh"]
    # mid-grid: full 9-ring, center equals the plain geohash
    from metric_search_spark.operators.geo import geohash_cells

    g0 = geohash_cells(df, prec).collect()
    center = {r["place_id"]: r["gh"] for r in g0}
    assert len(by_place[0]) == 9
    assert by_place[0][(0, 0)] == center[0]
    # each neighbor decodes to the offset cell: recompute via bisection on
    # the neighbor cell's center coordinates
    n = 1 << bits
    latq0 = (10_000_000 + 90_000_000) * n // 180_000_000
    lonq0 = (20_000_000 + 180_000_000) * n // 360_000_000
    for (dx, dy), gh in by_place[0].items():
        clat = ((latq0 + dy) + 0.5) * 180.0 / n - 90.0
        clon = ((lonq0 + dx) + 0.5) * 360.0 / n - 180.0
        assert gh == _bisect_geohash(clat, clon, prec), (dx, dy)
    # north pole: dy=+1 rows drop (clamp) -> 6 cells; antimeridian wraps
    assert len(by_place[1]) == 6
    assert all(dy <= 0 for (dx, dy) in by_place[1])
    east = by_place[1][(1, 0)]
    # lon wrap: (max lonq + 1) % n == 0 -> the '0...' column, i.e. lon bits
    # all zero -> decoded center lon is just west of -180 + half cell
    assert east == _bisect_geohash(
        (( (89_999_999 + 90_000_000) * n // 180_000_000) + 0.5) * 180.0 / n - 90.0,
        -180.0 + 0.5 * 360.0 / n,
        prec,
    )
    # south-west corner: dy=-1 drops, dx=-1 wraps -> 6 cells
    assert len(by_place[2]) == 6
    assert all(dy >= 0 for (dx, dy) in by_place[2])


def test_kring_duckdb_twin_parity(spark):
    from metric_search_spark.operators.geo import (
        geohash_kring,
        geohash_kring_sql,
    )

    got = (
        geohash_kring(synth_places(spark, 300, seed=7), 8)
        .toPandas()
        .sort_values(["place_id", "dx", "dy"])
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(geohash_kring_sql(synth_places_sql(300, seed=7), 8))
        .df()
        .sort_values(["place_id", "dx", "dy"])
        .reset_index(drop=True)
    )
    want["dx"] = want["dx"].astype("int32")
    want["dy"] = want["dy"].astype("int32")
    pd.testing.assert_frame_equal(
        got.astype({"dx": "int32", "dy": "int32"}), want
    )
