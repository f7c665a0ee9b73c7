"""Gopher repetition filters: hand-computed goldens, the duplicate-5-gram
branch (zero on the synthetic corpus), threshold verdicts, twin parity on
crafted repetitive text."""

from __future__ import annotations

import duckdb
import pytest

from metric_search_spark.functions.text import (
    gopher_repetition,
    gopher_repetition_sql,
)

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _run(spark, texts: list[str]):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}


def test_hand_golden(spark):
    # "a b a b a" — 5 words, 9 chars; top word 'a'×3 (3 chars → 333333 ppm);
    # top 2-gram "a b"×2 (6 chars → 666666 ppm); no duplicate 5-gram.
    got = _run(spark, ["a b a b a"])[0]
    assert got["n_words"] == 5 and got["n_chars"] == 9
    assert got["top_word_ppm"] == 3 * 1 * 1_000_000 // 9
    assert got["top2gram_ppm"] == 2 * 3 * 1_000_000 // 9
    assert got["dup5gram_ppm"] == 0
    assert got["gopher_pass"] is False  # 2-gram mass 66% > 20%


def test_duplicate_5gram_branch(spark):
    # "x y z w v" repeated 4× → the 5-gram "x y z w v" occurs 4 times
    # (plus wrap-around grams); duplicate mass is large → fail.
    t = " ".join(["x y z w v"] * 4)
    got = _run(spark, [t])[0]
    assert got["dup5gram_ppm"] > 150_000
    assert got["gopher_pass"] is False
    # a non-repetitive doc of the same length passes
    clean = " ".join(f"w{i}" for i in range(20))
    assert _run(spark, [clean])[0]["gopher_pass"] is True


def test_tie_break_lexicographic(spark):
    # 'b a' and 'a b' both occur twice in "b a b a b"; smallest wins →
    # "a b" (3 chars, 2 occurrences), same mass either way, but the
    # convention must match the twin exactly.
    got = _run(spark, ["b a b a b"])[0]
    assert got["top2gram_ppm"] == 2 * 3 * 1_000_000 // 9


def test_twin_parity_on_repetitive_text(spark):
    texts = [
        "a b a b a",
        " ".join(["x y z w v"] * 4),
        " ".join(f"w{i}" for i in range(20)),
        "b a b a b",
        "solo",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = gopher_repetition(df).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs_tbl", df.toPandas())
    want = con.sql(
        "SELECT * FROM ("
        + gopher_repetition_sql("docs_tbl")
        + ") ORDER BY doc_id"
    ).df()
    for c in got.columns:
        assert (got[c].values == want[c].values).all(), c


def test_single_word_doc(spark):
    got = _run(spark, ["solo"])[0]
    assert got["n_words"] == 1
    assert got["top_word_ppm"] == 1_000_000
    assert got["top2gram_ppm"] == 0 and got["dup5gram_ppm"] == 0
    assert got["gopher_pass"] is True
