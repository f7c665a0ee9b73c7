"""Point-in-polygon join vs numpy winding oracle + image plumbing checks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from metric_search_spark.operators.pip import (
    pip_sql_condition,
    point_in_polygon_join,
)

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _polys():
    """Seeded star/convex polygons in [0,1]² (FIXTURES.md F5)."""
    rng = np.random.default_rng(5)
    out = []
    for j in range(4):
        cx, cy = rng.uniform(0.25, 0.75, 2)
        n_v = int(rng.integers(5, 12))
        angles = np.sort(rng.uniform(0, 2 * np.pi, n_v))
        radii = rng.uniform(0.05, 0.22, n_v)
        ring = [
            (float(cx + r * np.cos(a)), float(cy + r * np.sin(a)))
            for a, r in zip(angles, radii)
        ]
        out.append((f"poly{j}", ring))
    return out


def _crossing_oracle(px, py, ring):
    n = len(ring)
    c = 0
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        if (ay > py) != (by > py) and px < ax + (py - ay) * (bx - ax) / (by - ay):
            c += 1
    return c % 2 == 1


def test_pip_join_matches_oracle(spark):
    polys = _polys()
    rng = np.random.default_rng(6)
    n = 500
    pts = pd.DataFrame({"id": np.arange(n), "x": rng.random(n), "y": rng.random(n)})
    schema = StructType(
        [
            StructField("poly_id", StringType()),
            StructField(
                "ring",
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                ),
            ),
        ]
    )
    poly_df = spark.createDataFrame(
        [(pid, [{"x": x, "y": y} for x, y in ring]) for pid, ring in polys], schema
    )
    out = point_in_polygon_join(
        spark.createDataFrame(pts), poly_df, res=4
    ).toPandas()
    got = {(int(i), p) for i, p in zip(out["id"], out["poly_id"])}
    want = set()
    for i, x, y in pts.itertuples(index=False):
        for pid, ring in polys:
            if _crossing_oracle(x, y, ring):
                want.add((int(i), pid))
    assert got == want


def test_polyfill_matches_center_oracle(spark):
    """polygon_tiles = every tile whose center the crossing oracle puts
    strictly inside; tile keys must equal tile_assign's encoding."""
    from metric_search_spark.cells import cell_encode
    from metric_search_spark.operators.pip import polygon_tiles

    polys = _polys()
    res = 5
    schema = StructType(
        [
            StructField("poly_id", StringType()),
            StructField(
                "ring",
                ArrayType(
                    StructType(
                        [StructField("x", DoubleType()), StructField("y", DoubleType())]
                    )
                ),
            ),
        ]
    )
    poly_df = spark.createDataFrame(
        [(pid, [{"x": x, "y": y} for x, y in ring]) for pid, ring in polys], schema
    )
    out = polygon_tiles(poly_df, res=res).toPandas()
    got = {(p, int(t)) for p, t in zip(out["poly_id"], out["tile"])}
    want = set()
    n = 1 << res
    for pid, ring in polys:
        for cx in range(n):
            for cy in range(n):
                x, y = (cx + 0.5) / n, (cy + 0.5) / n
                if _crossing_oracle(x, y, ring):
                    want.add(
                        (pid, int(cell_encode(np.array([x]), np.array([y]), res)[0]))
                    )
    assert got == want and len(got) > 0


def test_pip_sql_condition_matches_oracle():
    import duckdb

    polys = _polys()
    rng = np.random.default_rng(7)
    pts = pd.DataFrame({"x": rng.random(300), "y": rng.random(300)})
    con = duckdb.connect()
    con.register("pts", pts)
    for pid, ring in polys:
        got = con.sql(
            f"SELECT count(*) FROM pts WHERE {pip_sql_condition('x', 'y', ring)}"
        ).fetchone()[0]
        want = sum(_crossing_oracle(x, y, ring) for x, y in pts.itertuples(index=False))
        assert got == want, pid


def test_image_stats_phash_resize_verify(spark):
    from metric_search_spark.functions.image import (
        resized,
        verify_payloads,
        with_image_stats,
        with_phash64,
    )
    from metric_search_spark.sources.synth import generate_rows

    rows = generate_rows(40, seed=42)
    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
            StructField("caption", StringType()),
            StructField("phash", LongType()),
        ]
    )
    df = spark.createDataFrame(
        [tuple(r[c] for c in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")) for r in rows],
        schema,
    ).persist()

    stats = with_image_stats(df).toPandas()
    assert {"mean_r", "std_b"} <= set(stats.columns)
    assert ((stats["mean_r"] >= 0) & (stats["mean_r"] <= 255)).all()

    ph = with_phash64(df).toPandas()
    assert ph["phash64"].nunique() > 1

    rs = resized(df, 8, 8).toPandas()
    assert (rs["w"] == 8).all() and (rs["h"] == 8).all()
    assert all(len(b) == 8 * 8 * 3 for b in rs["bytes"])

    ver = verify_payloads(df).toPandas()
    assert ver["phash_ok"].all()
    # the PSNR≥40dB bar from BASELINE.json for the lossy codec
    assert (ver[ver["fmt"] == "qnt"]["psnr_db"] >= 40.0).all()
    assert np.isinf(ver[ver["fmt"] == "raw"]["psnr_db"]).all()
