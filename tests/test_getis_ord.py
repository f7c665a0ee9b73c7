"""Getis-Ord Gi* over the occupied tile lattice: textbook-formula parity
on a hand raster (queen weights over occupied cells + self)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import cell_xy_cols
from metric_search_spark.operators.tiling import getis_ord
from tests.sparkutil import get_spark

# res-2 (4x4) raster; (cx, cy) -> point count z
_CELLS = {
    (0, 0): 5,
    (1, 0): 3,
    (0, 1): 1,
    (2, 2): 7,
    (3, 3): 2,
}


def _expected():
    n = len(_CELLS)
    s = sum(_CELLS.values())
    q = sum(z * z for z in _CELLS.values())
    out = {}
    for (cx, cy), z in _CELLS.items():
        nbrs = [
            _CELLS[(cx + dx, cy + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in _CELLS
        ]
        w = len(nbrs) + 1
        zns = sum(nbrs) + z
        num = n * zns - s * w
        gi = num / math.sqrt((n * q - s * s) * (n * w - w * w) / (n - 1))
        out[(cx, cy)] = (z, w, round(gi, 12))
    return out


def test_gi_star_matches_textbook_formula():
    spark = get_spark()
    rows = []
    i = 0
    for (cx, cy), z in _CELLS.items():
        for _ in range(z):
            rows.append(((cx + 0.5) / 4.0, (cy + 0.5) / 4.0, i, 0))
            i += 1
    emb = spark.createDataFrame(rows, "x double, y double, id long, label long")
    cx, cy = cell_xy_cols(F.col("tile"))
    got = {
        (r.cx, r.cy): (r.z, r.w_star, r.gi_star)
        for r in getis_ord(emb, 2)
        .select(cx.alias("cx"), cy.alias("cy"), "z", "w_star", "gi_star")
        .collect()
    }
    assert got == _expected()


def test_gi_star_hotspot_sign():
    """A high-count cell surrounded by high counts scores positive; an
    isolated low-count cell scores negative."""
    spark = get_spark()
    cells = {(0, 0): 9, (1, 0): 9, (0, 1): 9, (1, 1): 9, (3, 3): 1}
    rows = []
    i = 0
    for (cx, cy), z in cells.items():
        for _ in range(z):
            rows.append(((cx + 0.5) / 4.0, (cy + 0.5) / 4.0, i, 0))
            i += 1
    emb = spark.createDataFrame(rows, "x double, y double, id long, label long")
    cx, cy = cell_xy_cols(F.col("tile"))
    got = {
        (r.cx, r.cy): r.gi_star
        for r in getis_ord(emb, 2)
        .select(cx.alias("cx"), cy.alias("cy"), "gi_star")
        .collect()
    }
    assert got[(0, 0)] > 0 and got[(1, 1)] > 0
    assert got[(3, 3)] < 0
