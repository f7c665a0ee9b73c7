"""Hilbert-curve cell keys: parity with the classic python xy2d walk,
bijectivity, the unit-step adjacency property Morton lacks, and the
DuckDB recursive-CTE twin."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import (
    hilbert_from_cxy_col,
    hilbert_sql,
)
from tests.sparkutil import get_spark


def _xy2d(res: int, x: int, y: int) -> int:
    n = 1 << res
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _full_lattice(spark, res: int):
    n = 1 << res
    cells = [(cx, cy) for cx in range(n) for cy in range(n)]
    df = spark.createDataFrame(cells, "cx long, cy long")
    got = {
        (r.cx, r.cy): r.h
        for r in df.select(
            "cx", "cy", hilbert_from_cxy_col(F.col("cx"), F.col("cy"), res).alias("h")
        ).collect()
    }
    return cells, got


@pytest.mark.parametrize("res", [1, 2, 3, 5])
def test_matches_reference_walk_and_bijective(res):
    spark = get_spark()
    cells, got = _full_lattice(spark, res)
    n = 1 << res
    assert got == {(cx, cy): _xy2d(res, cx, cy) for cx, cy in cells}
    assert sorted(got.values()) == list(range(n * n))


def test_unit_steps_are_4_adjacent():
    """THE Hilbert property: walking the key order visits 4-adjacent cells
    only — every consecutive pair differs by exactly one unit in exactly
    one axis. (Morton violates this at every quadrant seam.)"""
    spark = get_spark()
    res = 4
    cells, got = _full_lattice(spark, res)
    by_key = {h: c for c, h in got.items()}
    for h in range(len(cells) - 1):
        (x0, y0), (x1, y1) = by_key[h], by_key[h + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (h, by_key[h], by_key[h + 1])


def test_duckdb_recursive_twin_matches():
    import duckdb

    spark = get_spark()
    res = 3
    cells, got = _full_lattice(spark, res)
    con = duckdb.connect()
    con.register("cells", pd.DataFrame(cells, columns=["cx", "cy"]))
    dd = {
        (r[0], r[1]): r[2]
        for r in con.execute(hilbert_sql("cx", "cy", res, "cells")).fetchall()
    }
    assert dd == got


def test_res_guard():
    with pytest.raises(ValueError, match="out of"):
        hilbert_from_cxy_col(F.lit(0), F.lit(0), 9)


def test_with_hilbert_staged_matches_inline_and_codegens():
    """The staged per-level walk (with_hilbert) is bit-identical to the
    inline Column, and — the regression this exists for — its plan
    COMPILES under whole-stage codegen: the inline tree grows ~4^res and
    blew the res-6 hash-aggregate past Janino's 64 KB method limit,
    silently dropping the stage to interpreted execution. codegen.fallback
    =false makes any compile failure fatal instead of silent."""
    from metric_search_spark.functions.spatial import with_hilbert

    spark = get_spark()
    res = 6
    n = 1 << res
    cells = [(cx, cy) for cx in range(0, n, 3) for cy in range(0, n, 5)]
    df = spark.createDataFrame(cells, "cx long, cy long")
    want = {
        (r.cx, r.cy): r.h
        for r in df.select(
            "cx", "cy",
            hilbert_from_cxy_col(F.col("cx"), F.col("cy"), res).alias("h"),
        ).collect()
    }
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        got = {
            (r.cx, r.cy): r.hkey
            for r in with_hilbert(
                df, F.col("cx"), F.col("cy"), res
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)
    assert got == want
