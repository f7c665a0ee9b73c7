"""Polyline proper-crossing join: brute-force python twin on the crossing
fixture, strictness semantics (touching / collinear excluded), and the
parametric intersection point."""

from __future__ import annotations

from metric_search_spark.operators.pip import segment_intersections_join
from tests.sparkutil import get_spark


def _lines_df(spark, lines):
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("line_id", StringType()),
            StructField(
                "path",
                ArrayType(
                    StructType(
                        [
                            StructField("x", DoubleType()),
                            StructField("y", DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    )
    return spark.createDataFrame(
        [(lid, [{"x": x, "y": y} for x, y in path]) for lid, path in lines],
        schema,
    )


def _brute(lines):
    def cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    segs = []
    for lid, path in lines:
        for i in range(len(path) - 1):
            segs.append((lid, i, path[i], path[i + 1]))
    out = {}
    for la, sa, a, b in segs:
        for lb, sb, c, d in segs:
            if la >= lb:
                continue
            d1, d2 = cross(a, b, c), cross(a, b, d)
            d3, d4 = cross(c, d, a), cross(c, d, b)
            if d1 * d2 < 0 and d3 * d4 < 0:
                den = (b[0] - a[0]) * (d[1] - c[1]) - (b[1] - a[1]) * (
                    d[0] - c[0]
                )
                t = (
                    (c[0] - a[0]) * (d[1] - c[1])
                    - (c[1] - a[1]) * (d[0] - c[0])
                ) / den
                out[(la, sa, lb, sb)] = (
                    round(a[0] + t * (b[0] - a[0]), 12),
                    round(a[1] + t * (b[1] - a[1]), 12),
                )
    return out


def test_matches_brute_force_on_fixture():
    from metric_search_spark.entry_queries import _XING_LINES, _XING_RES

    spark = get_spark()
    got = {
        (r.line_a, r.seg_a, r.line_b, r.seg_b): (r.ix, r.iy)
        for r in segment_intersections_join(
            _lines_df(spark, _XING_LINES), res=_XING_RES
        ).collect()
    }
    exp = _brute(_XING_LINES)
    assert got == exp
    assert len(got) >= 4  # the fixture genuinely crosses


def test_plus_sign_crossing_point():
    spark = get_spark()
    lines = [
        ("h", [(0.1, 0.5), (0.9, 0.5)]),
        ("v", [(0.5, 0.1), (0.5, 0.9)]),
    ]
    rows = segment_intersections_join(_lines_df(spark, lines), res=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.line_a, r.seg_a, r.line_b, r.seg_b) == ("h", 0, "v", 0)
    assert (r.ix, r.iy) == (0.5, 0.5)


def test_touching_and_collinear_excluded():
    spark = get_spark()
    lines = [
        # T-junction: "t" ENDS exactly on "h" -> d-value 0, not proper
        ("h", [(0.1, 0.5), (0.9, 0.5)]),
        ("t", [(0.5, 0.5), (0.5, 0.9)]),
        # collinear overlap with "h"
        ("o", [(0.2, 0.5), (0.6, 0.5)]),
    ]
    rows = segment_intersections_join(_lines_df(spark, lines), res=4).collect()
    assert rows == []


def test_parallel_cell_sharing_segments_no_false_positive():
    spark = get_spark()
    lines = [
        ("p1", [(0.1, 0.50), (0.9, 0.50)]),
        ("p2", [(0.1, 0.51), (0.9, 0.51)]),  # same cells at res 4, no cross
    ]
    rows = segment_intersections_join(_lines_df(spark, lines), res=4).collect()
    assert rows == []
