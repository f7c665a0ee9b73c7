"""operators/freq.group_entropy — per-group Shannon entropy (micro-nats)."""

from __future__ import annotations

import math

from metric_search_spark.operators.freq import group_entropy
from tests.sparkutil import get_spark


def test_known_distributions_and_invariance():
    spark = get_spark()
    rows = (
        [("mono", "a")] * 8
        + [("uni4", v) for v in "abcd" * 4]
        + [("skew", "a")] * 3
        + [("skew", "b")]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        r["g"]: (r["n"], r["ndv"], r["entropy_micro"])
        for r in group_entropy(df, "g", "v").collect()
    }
    def term(p):
        return round(-(p * math.log(p)) * 1e9)

    assert got["mono"] == (8, 1, 0)
    # per-TERM micro-rounding then exact sum — 4·round(¼ln4·1e9), one off
    # from round(ln4·1e9)
    assert got["uni4"] == (16, 4, 4 * term(0.25))
    assert got["skew"] == (4, 2, term(0.75) + term(0.25))
    a = sorted(map(tuple, group_entropy(df, "g", "v").collect()))
    b = sorted(map(tuple, group_entropy(df.repartition(7), "g", "v").collect()))
    assert a == b
