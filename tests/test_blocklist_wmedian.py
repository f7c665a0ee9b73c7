"""Blocklist replace-trick counting + weighted lower median hand cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from metric_search_spark.functions.text import blocklist_cols
from metric_search_spark.operators.quantiles import weighted_median
from tests.sparkutil import get_spark


def _bl(texts, patterns):
    spark = get_spark()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    cols = blocklist_cols(F.col("text"), patterns)
    out = df.select(
        "i", cols["bl_hits"].alias("h"), cols["bl_pats"].alias("p"),
        cols["bl_flag"].alias("f"),
    ).collect()
    return {r.i: (r.h, r.p, r.f) for r in out}


def test_blocklist_counts_and_flags():
    got = _bl(
        ["the bad cat sat on bad mat", "all clean here", "bad bad bad",
         "aaaa"],
        ["bad", "cat", "aaa"],
    )
    assert got[0] == (3, 2, True)
    assert got[1] == (0, 0, False)
    assert got[2] == (3, 1, True)
    # leftmost non-overlapping: 'aaa' found once in 'aaaa'
    assert got[3] == (1, 1, True)


def test_blocklist_multiword_phrase():
    got = _bl(["big table scan on a big table"], ["big table", "scan"])
    assert got[0] == (3, 2, True)


def _wm(rows):
    spark = get_spark()
    df = spark.createDataFrame(rows, "g long, v long, w long")
    out = weighted_median(df, by="g", val_col="v", w_col="w").collect()
    return {r.g: (r.wmed, r.wtot) for r in out}


def test_weighted_median_hand_cases():
    got = _wm(
        [
            # even split 2|2: lower median = 1 (2*2 >= 4)
            (1, 1, 2), (1, 5, 2),
            # heavy tail dominates: weight 5 at v=9 vs 1+1 below
            (2, 1, 1), (2, 3, 1), (2, 9, 5),
            # duplicate values across rows absorb into one RANGE step
            (3, 4, 1), (3, 4, 1), (3, 10, 1),
            # single row
            (4, 7, 3),
        ]
    )
    assert got[1] == (1, 4)
    assert got[2] == (9, 7)
    assert got[3] == (4, 3)
    assert got[4] == (7, 3)
