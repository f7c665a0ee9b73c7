"""BPE merge-table training: hand-computed goldens (classic Sennrich
low/lower corpus), overlapping-pair counting, leftmost-non-overlapping
merge application, lexicographic tie-break, single-symbol exhaustion,
and twin parity against the unrolled DuckDB CTE replay."""

from __future__ import annotations

import duckdb
import pytest

from metric_search_spark.functions.text import (
    bpe_encode,
    bpe_encode_sql,
    bpe_merges,
    bpe_merges_sql,
)

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _train(spark, texts: list[str], n: int):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [r.asDict() for r in bpe_merges(df, n_merges=n).collect()]


def test_hand_golden_sennrich_corpus(spark):
    # word freqs: low×3, lower×1, lowest×1, newer×1, newest×1, wide×1.
    # pair (l,o) occurs in low/lower/lowest weighted 3+1+1 = 5 — argmax.
    # after merge 1: (lo,w) also 5 but rank 1 chose (l,o) first because
    # 5 = 5 tie breaks to ('l','o') < ('lo','w').
    rows = _train(spark, ["low low low lower lowest newer newest wide"], 3)
    assert (rows[0]["left_sym"], rows[0]["right_sym"], rows[0]["pair_count"]) == (
        "l", "o", 5,
    )
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["pair_count"]) == (
        "lo", "w", 5,
    )
    # rank 3: after 'low' merges, (low,e), (e,r), (e,s), (s,t), (n,e),
    # (e,w), (w,e) all count 2 — tie breaks to the lexicographically
    # smallest pair ('e','r').
    assert (rows[2]["left_sym"], rows[2]["right_sym"], rows[2]["pair_count"]) == (
        "e", "r", 2,
    )


def test_overlapping_pairs_counted_every_position(spark):
    # "aaaa" has three adjacent (a,a) positions — all count.
    rows = _train(spark, ["aaaa"], 1)
    assert rows[0]["pair_count"] == 3


def test_merge_is_leftmost_non_overlapping(spark):
    # merging (a,a) in "aaaa" yields [aa, aa]; in "aaa" yields [aa, a].
    # round 2's argmax must therefore be (aa,aa) from "aaaa" (count 1)
    # vs (aa,a) from "aaa" (count 1) — tie breaks to ('aa','a').
    rows = _train(spark, ["aaaa aaa"], 2)
    assert (rows[1]["left_sym"], rows[1]["right_sym"]) == ("aa", "a")


def test_exhaustion_stops_early(spark):
    # single-character words only: zero adjacent pairs — empty merge table.
    assert _train(spark, ["a b c a"], 4) == []


def test_twin_parity(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest wide wider",
        "aaaa aaa aa low new wide",
        "x",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_merges(df, n_merges=6).toPandas()
    con = duckdb.connect()
    con.register("docs_tbl", df.toPandas())
    want = con.sql(bpe_merges_sql("docs_tbl", 6)).df()
    assert len(got) == len(want) == 6
    for c in got.columns:
        assert (got[c].values == want[c].values).all(), c


def test_encode_hand_case(spark):
    # corpus "ab ab abc": merges learn ('a','b') first (count 3); encoding
    # with just that merge gives ab->1 token, abc->2 tokens
    df = spark.createDataFrame([(0, "ab ab abc")], "doc_id long, text string")
    out = bpe_encode(df, [("a", "b")]).collect()
    assert (out[0]["n_words"], out[0]["n_tokens"]) == (3, 1 + 1 + 2)


def test_encode_rank_order_matters(spark):
    # merges [('a','b'), ('ab','c')] tokenize "abc" to ONE token; applying
    # only the first leaves two
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    one = bpe_encode(df, [("a", "b"), ("ab", "c")]).collect()[0]
    two = bpe_encode(df, [("a", "b")]).collect()[0]
    assert one["n_tokens"] == 1
    assert two["n_tokens"] == 2


def test_encode_twin_parity(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest wide wider",
        "aaaa aaa aa low new wide",
        "x",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r["left_sym"], r["right_sym"]) for r in bpe_merges(df, n_merges=6).collect()
    ]
    got = (
        bpe_encode(df, merges)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs_tbl", df.toPandas())
    want = (
        con.sql(bpe_encode_sql("docs_tbl", 6))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)  # doc 4 ("") has no words -> absent in both
    for c in ("doc_id", "n_words", "n_tokens"):
        assert (got[c].values == want[c].values).all(), c
