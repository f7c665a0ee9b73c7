"""operators/pip.polygon_metrics — shoelace area / centroid.

Pins: known-answer squares/triangles (both orientations), the quantized
grid's resolution envelope, degenerate drops, partitioning invariance.
"""

from __future__ import annotations

from metric_search_spark.operators.pip import polygon_metrics
from tests.sparkutil import get_spark

_SCHEMA = "poly_id string, ring array<struct<x:double, y:double>>"


def _ring(pts):
    return [{"x": x, "y": y} for x, y in pts]


def test_known_shapes_both_orientations():
    spark = get_spark()
    sq = [(0.25, 0.25), (0.75, 0.25), (0.75, 0.75), (0.25, 0.75)]  # CCW
    tri = [(0.0, 0.0), (0.0, 0.5), (0.5, 0.0)]  # CW
    df = spark.createDataFrame(
        [("sq", _ring(sq)), ("tri", _ring(tri))], _SCHEMA
    )
    got = {r["poly_id"]: r for r in polygon_metrics(df).collect()}
    # all fixture coords are dyadic: quantization at 2^30 is LOSSLESS
    assert abs(got["sq"]["area"] - 0.25) < 1e-12
    assert abs(got["sq"]["cx"] - 0.5) < 1e-9 and abs(got["sq"]["cy"] - 0.5) < 1e-9
    assert abs(got["tri"]["area"] - 0.125) < 1e-12
    assert abs(got["tri"]["cx"] - 1 / 6) < 1e-9
    assert abs(got["tri"]["cy"] - 1 / 6) < 1e-9
    assert got["sq"]["n_vertices"] == 4 and got["tri"]["n_vertices"] == 3


def test_degenerates_drop_and_partition_invariance():
    spark = get_spark()
    df = spark.createDataFrame(
        [
            ("seg", _ring([(0.1, 0.1), (0.2, 0.2)])),  # < 3 vertices
            ("flat", _ring([(0.1, 0.1), (0.2, 0.2), (0.3, 0.3)])),  # area 0
            ("ok", _ring([(0.0, 0.0), (0.5, 0.0), (0.0, 0.5)])),
        ],
        _SCHEMA,
    )
    rows = polygon_metrics(df).collect()
    assert [r["poly_id"] for r in rows] == ["ok"]
    a = sorted(map(tuple, polygon_metrics(df).collect()))
    b = sorted(map(tuple, polygon_metrics(df.repartition(4)).collect()))
    assert a == b
