"""Deterministic geodesy: bit-reproducible haversine radius joins over
lat/lon in integer microdegrees.

Everything else in this engine lives on the planar unit square (cells.py
Morton lattice); real geo corpora carry WGS-style lat/lon, where "within
r meters" is a GREAT-CIRCLE predicate. The blocker for an exact cross-
engine operator is trig: `sin`/`cos`/`asin` are not correctly-rounded
IEEE operations, so JVM `Math.sin`, glibc, and DuckDB's bundled libm can
disagree in the last ulps — enough to flip a boundary pair and break a
bit-exact oracle. This module therefore PINS the trigonometry: fixed
Taylor/Horner polynomials evaluated with only IEEE `+ − × ÷ sqrt`
(all correctly rounded by the standard), written once as an ANSI SQL
expression string and used verbatim on BOTH sides — Spark parses it with
`F.expr`, DuckDB parses the same text — so every engine computes the
same double bit-for-bit. The polynomial error (≤3e-10 for |lat| ≤ 60°)
is orders of magnitude below any geodetic model error; the SEMANTICS are
"this exact polynomial", which is what makes the operator auditable.

haversine_radius_join is the geodetic analog of the planar cell
range-join: quantize lat/lon to an r-sized microdegree grid, replicate
the left side to the 3×5 (lat×lon) cell window that provably covers the
radius for |lat| ≤ 60° (lon shrinks by cos φ ≥ 0.5 there — the window
math is in the docstring), equi-join on the cell, then apply the pinned
haversine predicate to candidates only. ONE bounded-fan-out shuffle, no
Python, no cartesian product — the same plan at 4×10³ or 4×10⁹ points.

Reference parity: the reference's metric plug-ins are exact-arithmetic
kernels over a fixed formula (src/include/metric_search/details/
metrics.hpp); this module extends that contract to spherical distance.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_search_spark.operators.sampling import hash_col, sample_hash_sql

__all__ = [
    "EARTH_R_M",
    "sin_poly_sql",
    "cos_poly_sql",
    "asin_poly_sql",
    "hav_sql",
    "hav_threshold",
    "synth_places",
    "synth_places_sql",
    "haversine_radius_join",
    "haversine_pairs_sql",
]

EARTH_R_M = 6_371_000.0  # spherical model radius (the haversine sphere)

# microdegrees → radians, and the conservative "microdegrees per meter"
# bound used for grid sizing: one meter of great-circle arc subtends
# (180/π)/R degrees ≈ 8.99320 µdeg — CELL = ceil(9·r) µdeg always covers it
_RAD_PER_UDEG = math.pi / 180.0 / 1e6
_UDEG_PER_M = 1e6 * 180.0 / (math.pi * EARTH_R_M)  # 8.99320...
_MAX_ABS_LAT_UDEG = 60_000_000  # cos φ ≥ 0.5 ⇒ the 3×5 window is exact


def _d(x: float) -> str:
    """A double literal both Spark SQL and DuckDB parse to the same bits.
    Bare decimals are DECIMAL in Spark SQL (different arithmetic!), so
    every constant goes through CAST('…' AS DOUBLE); repr() round-trips."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _horner(x2: str, coeffs: list[float]) -> str:
    """(c0 + x2*(c1 + x2*(…))) with explicit parens — association order is
    part of the pinned semantics (float + and × are not associative)."""
    expr = _d(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        expr = f"({_d(c)} + ({x2}) * {expr})"
    return expr


def sin_poly_sql(x: str) -> str:
    """Pinned sine: 6-term odd Taylor, Horner form. |err| ≤ 3e-10 for
    |x| ≤ 1.05 rad; grows to ~1.3e-8 at 1.4 rad (only far pairs, where
    hav ≫ any radius threshold, reach that range)."""
    x2 = f"(({x}) * ({x}))"
    return f"(({x}) * {_horner(x2, [1.0, -1.0 / 6, 1.0 / 120, -1.0 / 5040, 1.0 / 362880, -1.0 / 39916800])})"


def cos_poly_sql(x: str) -> str:
    """Pinned cosine: 7-term even Taylor. |err| ≤ 2e-11 for |x| ≤ 1.05."""
    x2 = f"(({x}) * ({x}))"
    return _horner(
        x2,
        [1.0, -0.5, 1.0 / 24, -1.0 / 720, 1.0 / 40320, -1.0 / 3628800, 1.0 / 479001600],
    )


def asin_poly_sql(x: str) -> str:
    """Pinned arcsine for SMALL x (≤ sin(r/2R), r ≤ tens of km): 4-term
    series — relative error < 1e-12 for x ≤ 0.01."""
    x2 = f"(({x}) * ({x}))"
    return f"(({x}) * {_horner(x2, [1.0, 1.0 / 6, 3.0 / 40, 15.0 / 336])})"


def hav_sql(alat: str, alon: str, blat: str, blon: str) -> str:
    """Haversine of the great-circle angle between two (lat, lon) pairs in
    INTEGER MICRODEGREE columns: sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2),
    entirely in pinned polynomials — one expression string, two engines,
    identical doubles."""
    rad = _d(_RAD_PER_UDEG)
    half = _d(0.5)
    dphi2 = f"((({blat}) - ({alat})) * {rad} * {half})"
    dlam2 = f"((({blon}) - ({alon})) * {rad} * {half})"
    phi_a = f"(({alat}) * {rad})"
    phi_b = f"(({blat}) * {rad})"
    s1 = sin_poly_sql(dphi2)
    s2 = sin_poly_sql(dlam2)
    return (
        f"(({s1}) * ({s1}) + {cos_poly_sql(phi_a)} * {cos_poly_sql(phi_b)}"
        f" * ({s2}) * ({s2}))"
    )


def hav_threshold(radius_m: float) -> float:
    """sin²(r / 2R) — computed ONCE driver-side with libm and inlined as
    the same literal in both engines, so the boundary is a shared
    constant, not a per-engine trig call."""
    s = math.sin(radius_m / (2.0 * EARTH_R_M))
    return s * s


def _pair_cols_sql(hav: str) -> tuple[str, str]:
    """(hav_e18, dist_mm) output expressions from a hav expression —
    exact BIGINTs after a shared float pipeline, so hashes compare."""
    hav_e18 = f"CAST(FLOOR(({hav}) * {_d(1e18)}) AS BIGINT)"
    dist = f"({asin_poly_sql(f'SQRT({hav})')} * {_d(2.0 * EARTH_R_M * 1000.0)})"
    return hav_e18, f"CAST(FLOOR({dist}) AS BIGINT)"


# ------------------------------------------------------------------ fixture

_N_HOT = 12


def synth_places(
    spark: SparkSession, n: int, *, seed: int = 0
) -> DataFrame:
    """Deterministic places fixture: n points in _N_HOT hotspot clusters.
    Hotspot centers are hash-derived within ±50°/±80° (µdeg), jitter
    ±60,000 µdeg (≈ ±6.7 km) — dense enough that a 500 m radius join has
    thousands of true pairs but |lat| stays well inside the 60° window
    guarantee. Exact-integer reproducible in SQL (synth_places_sql)."""
    ids = spark.range(n).select(F.col("id").cast("long").alias("place_id"))
    hot = F.col("place_id") % _N_HOT
    lat_c = hash_col(hot, seed + 11) % 100_000_001 - 50_000_000
    lon_c = hash_col(hot, seed + 12) % 160_000_001 - 80_000_000
    lat = lat_c + hash_col(F.col("place_id"), seed + 1) % 120_001 - 60_000
    lon = lon_c + hash_col(F.col("place_id"), seed + 2) % 120_001 - 60_000
    return ids.select(
        "place_id",
        lat.cast("long").alias("lat_udeg"),
        lon.cast("long").alias("lon_udeg"),
    )


def synth_places_sql(n: int, *, seed: int = 0) -> str:
    """DuckDB twin of synth_places — same MINSTD streams, same integers."""
    hot = f"(place_id % {_N_HOT})"
    lat_c = f"({sample_hash_sql(hot, seed + 11)}) % 100000001 - 50000000"
    lon_c = f"({sample_hash_sql(hot, seed + 12)}) % 160000001 - 80000000"
    lat = f"({lat_c}) + ({sample_hash_sql('place_id', seed + 1)}) % 120001 - 60000"
    lon = f"({lon_c}) + ({sample_hash_sql('place_id', seed + 2)}) % 120001 - 60000"
    return (
        f"SELECT place_id, CAST({lat} AS BIGINT) AS lat_udeg,"
        f" CAST({lon} AS BIGINT) AS lon_udeg"
        f" FROM (SELECT unnest(range({n})) AS place_id)"
    )


# ------------------------------------------------------------------ operator


def haversine_radius_join(
    places: DataFrame, radius_m: float
) -> DataFrame:
    """All unordered pairs of places within radius_m meters of great-circle
    distance (pinned-polynomial haversine, STRICT <), as
    (a_id, b_id, hav_e18, dist_mm) with a_id < b_id.

    Plan: grid cells of CELL = ceil(9·r) µdeg per axis. A pair within r
    satisfies |Δlat| ≤ r·8.9933 µdeg < CELL (±1 lat cell) and, for
    |lat| ≤ 60° (cos φ ≥ ½), |Δlon| ≤ r·8.9933/cos φ ≤ 17.99·r < 2·CELL
    (±2 lon cells) — so replicating the LEFT side to its 3×5 cell window
    and equi-joining on (lat_cell, lon_cell) provably yields every
    qualifying pair exactly once (the right row has one cell; the window
    keys are distinct). ONE shuffle with constant fan-out 15, candidates
    filtered by the shared-expression predicate — no Python, no cartesian,
    no trig outside the pinned polynomials. Latitudes beyond ±60° raise
    (widen the window as sec(max_lat) to lift the limit); longitudes must
    not straddle the antimeridian (the fixture never does).
    """
    cell = int(math.ceil(9.0 * radius_m))
    guard = F.when(
        F.abs(F.col("lat_udeg")) > _MAX_ABS_LAT_UDEG,
        F.raise_error(
            F.lit("haversine_radius_join: |lat| > 60 deg breaks the 3x5 window guarantee")
        ).cast("long"),
    ).otherwise(F.col("lat_udeg"))
    p = places.select(
        F.col("place_id"),
        guard.alias("lat_udeg"),
        F.col("lon_udeg"),
        F.floor(F.col("lat_udeg") / F.lit(cell)).alias("lc"),
        F.floor(F.col("lon_udeg") / F.lit(cell)).alias("mc"),
    )
    win = [(i, j) for i in (-1, 0, 1) for j in (-2, -1, 0, 1, 2)]
    left = p.select(
        F.col("place_id").alias("a_id"),
        F.col("lat_udeg").alias("alat"),
        F.col("lon_udeg").alias("alon"),
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("lc") + F.lit(i)).alias("lc"),
                    (F.col("mc") + F.lit(j)).alias("mc"),
                )
                for i, j in win
            ])
        ).alias("w"),
    ).select("a_id", "alat", "alon", F.col("w.lc").alias("lc"), F.col("w.mc").alias("mc"))
    right = p.select(
        F.col("place_id").alias("b_id"),
        F.col("lat_udeg").alias("blat"),
        F.col("lon_udeg").alias("blon"),
        "lc",
        "mc",
    )
    hav = hav_sql("alat", "alon", "blat", "blon")
    hav_e18, dist_mm = _pair_cols_sql(hav)
    thr = _d(hav_threshold(radius_m))
    cand = left.join(right, ["lc", "mc"]).where(
        (F.col("a_id") < F.col("b_id")) & F.expr(f"({hav}) < {thr}")
    )
    return cand.select(
        "a_id",
        "b_id",
        F.expr(hav_e18).alias("hav_e18"),
        F.expr(dist_mm).alias("dist_mm"),
    )


def haversine_pairs_sql(places_sql: str, radius_m: float) -> str:
    """Brute-force DuckDB twin: ALL n² pairs, the SAME pinned-polynomial
    predicate and output arithmetic — fully independent of the grid."""
    hav = hav_sql("a.lat_udeg", "a.lon_udeg", "b.lat_udeg", "b.lon_udeg")
    hav_e18, dist_mm = _pair_cols_sql(hav)
    thr = _d(hav_threshold(radius_m))
    return f"""
WITH places AS ({places_sql})
SELECT a.place_id AS a_id, b.place_id AS b_id,
       {hav_e18} AS hav_e18, {dist_mm} AS dist_mm
FROM places a JOIN places b ON a.place_id < b.place_id
WHERE ({hav}) < {thr}
"""
