"""Column-expression spatial math must match the numpy kernels bit-for-bit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from metric_search_spark import cells
from metric_search_spark.functions import spatial

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def coords():
    rng = np.random.default_rng(3)
    x = rng.random(500)
    y = rng.random(500)
    return x, y


def test_phash_and_coords_roundtrip(spark, coords):
    x, y = coords
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    got = (
        df.select(spatial.phash_col(F.col("x"), F.col("y")).alias("p"))
        .toPandas()["p"]
        .to_numpy()
    )
    want = cells.phash_from_xy(x, y)
    assert (got == want).all()
    df2 = spark.createDataFrame(pd.DataFrame({"p": want}))
    xc, yc = spatial.coord_cols(F.col("p"))
    dec = df2.select(xc.alias("x"), yc.alias("y")).toPandas()
    wx, wy = cells.coords_from_phash(want)
    np.testing.assert_array_equal(dec["x"].to_numpy(), wx)
    np.testing.assert_array_equal(dec["y"].to_numpy(), wy)


@pytest.mark.parametrize("res", [0, 1, 4, 9])
def test_cell_col_matches_numpy(spark, coords, res):
    x, y = coords
    p = cells.phash_from_xy(x, y)
    df = spark.createDataFrame(pd.DataFrame({"p": p}))
    got = df.select(spatial.cell_col(F.col("p"), res).alias("c")).toPandas()["c"]
    want = cells.cell_from_phash(p, res)
    assert (got.to_numpy() == want).all()


@pytest.mark.parametrize("res,k", [(3, 1), (3, 2), (5, 1), (2, 3)])
def test_kring_col_matches_numpy(spark, coords, res, k):
    x, y = coords
    c = cells.cell_encode(x[:50], y[:50], res)
    df = spark.createDataFrame(pd.DataFrame({"c": c}))
    got = df.select(
        F.col("c"), spatial.kring_cells_col(F.col("c"), res, k).alias("ring")
    ).toPandas()
    for cell, ring in zip(got["c"], got["ring"]):
        want = sorted(cells.kring(int(cell), k).tolist())
        assert sorted(ring) == want


def test_cell_sql_matches_numpy(coords):
    import duckdb

    x, y = coords
    p = cells.phash_from_xy(x, y)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"p": p}))
    for res in (0, 2, 7):
        got = con.sql(f"SELECT {spatial.cell_sql('p', res)} AS c FROM t").df()["c"]
        want = cells.cell_from_phash(p, res)
        assert (got.to_numpy() == want).all()
    gx = con.sql(f"SELECT {spatial.coord_sql('p', 'x')} AS x FROM t").df()["x"]
    gy = con.sql(f"SELECT {spatial.coord_sql('p', 'y')} AS y FROM t").df()["y"]
    wx, wy = cells.coords_from_phash(p)
    np.testing.assert_allclose(gx.to_numpy(), wx, rtol=0, atol=0)
    np.testing.assert_allclose(gy.to_numpy(), wy, rtol=0, atol=0)


def test_with_xy_cell_staged_matches_inline_and_codegens(spark):
    """The staged quantize→interleave (with_xy_cell) is bit-identical to
    inline cell_from_xy_col across resolutions, and its plan COMPILES
    under whole-stage codegen (fallback=false makes failure fatal) — the
    inline tree re-inlined quantize 2^5 times per axis and pushed the
    fused index-build scan past Janino's 64 KB method limit."""
    import random

    from pyspark.sql import functions as F

    from metric_search_spark.functions.spatial import (
        cell_from_xy_col,
        with_xy_cell,
    )

    rng = random.Random(11)
    pts = [(i, rng.random(), rng.random()) for i in range(300)]
    pts += [(300, 0.0, 0.0), (301, 0.9999999999, 0.9999999999)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    for res in (0, 1, 3, 8, 27):
        want = {
            r.id: r.c
            for r in df.select(
                "id", cell_from_xy_col(F.col("x"), F.col("y"), res).alias("c")
            ).collect()
        }
        spark.conf.set("spark.sql.codegen.fallback", "false")
        try:
            got = {
                r.id: r.cell
                for r in with_xy_cell(
                    df, F.col("x"), F.col("y"), res
                ).collect()
            }
        finally:
            spark.conf.set("spark.sql.codegen.fallback", old)
        assert got == want, res
