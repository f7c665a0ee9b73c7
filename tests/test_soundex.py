"""Soundex: census goldens, the documented simplified-variant deviation
(no H/W bridging), adjacent-collapse/zero-skip rules, padding, and
Column-vs-DuckDB parity on a mixed word list."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from metric_search_spark.functions.text import soundex_col, soundex_sql
from tests.sparkutil import get_spark

GOLDEN = {
    "Robert": "R163",
    "Rupert": "R163",
    "Tymczak": "T522",     # CZ collapses (adjacent same code)
    "Pfister": "P236",     # F collapses into the leading P (code 1)
    "Honeyman": "H555",
    "Jackson": "J250",
    "Lee": "L000",         # all-vowel tail pads
    "X": "X000",           # single letter pads
    "Ashcraft": "A226",    # simplified variant: NO H/W bridging (census
                           # bridged form would be A261) — documented
}


def _spark_codes(words):
    spark = get_spark()
    df = spark.createDataFrame([(w,) for w in words], "w string")
    return {
        r["w"]: r["s"]
        for r in df.select("w", soundex_col(F.col("w")).alias("s")).collect()
    }


def test_goldens():
    got = _spark_codes(list(GOLDEN))
    for w, code in GOLDEN.items():
        assert got[w] == code, (w, got[w], code)


def test_case_insensitive_after_first_letter():
    got = _spark_codes(["jackson", "JACKSON", "JaCkSoN"])
    assert set(got.values()) == {"J250"}


def test_twin_parity():
    words = list(GOLDEN) + ["smith", "smyth", "gauss", "ghosh", "a", "zz"]
    got = _spark_codes(words)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"w": words}))
    exp = {
        r[0]: r[1]
        for r in con.sql(f"SELECT w, {soundex_sql('w')} FROM t").fetchall()
    }
    assert got == exp
    assert got["smith"] == got["smyth"]  # the blocking property
