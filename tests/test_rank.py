"""operators/rank.bm25_topk — Okapi BM25 (Lucene idf) over a fixed term set.

Pins: (a) scores match an independent pure-Python BM25 on a tiny corpus,
(b) the integer micro-score sum is partitioning-invariant, (c) the global
top-n is a TakeOrderedAndProject, never an unpartitioned full-corpus
window.
"""

from __future__ import annotations

import math

from metric_search_spark.operators.rank import bm25_topk
from tests.sparkutil import get_spark

CORPUS = [
    (0, "spark window join spark spark"),
    (1, "vector slow slow table scan"),
    (2, "window window window filter"),
    (3, "the quick brown fox"),
    (4, "spark vector window slow"),
]
TERMS = ["spark", "vector", "window", "slow"]


def _python_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in corpus}
    n = len(corpus)
    n_toks = sum(len(v) for v in toks.values())
    avgdl = n_toks / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            sc = idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            s += round(sc * 1e6)
        if s:
            out[i] = s
    return out


def test_matches_pure_python():
    spark = get_spark()
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score_micro"]
        for r in bm25_topk(docs, TERMS, top_n=10).collect()
    }
    want = _python_bm25(CORPUS, TERMS)
    # python round() is half-even vs the engines' half-up — only reachable
    # at exact .5 boundaries, which this fixture avoids
    assert got == want


def test_rank_and_tiebreak():
    spark = get_spark()
    # two byte-identical docs ⇒ identical scores ⇒ doc_id breaks the tie
    docs = spark.createDataFrame(
        [(7, "spark slow"), (3, "spark slow"), (9, "the fox")],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, TERMS, top_n=10).collect()
    assert [r["doc_id"] for r in rows] == [3, 7]
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["score_micro"] == rows[1]["score_micro"]


def test_partitioning_invariance_and_plan():
    spark = get_spark()
    docs = spark.createDataFrame(CORPUS * 40, "doc_id long, text string")
    out1 = bm25_topk(docs, TERMS, top_n=3)
    out2 = bm25_topk(docs.repartition(13), TERMS, top_n=3)
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))
    plan = out1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unigram_surprisal_hand_corpus():
    import math

    from metric_search_spark.operators.rank import unigram_surprisal

    spark = get_spark()
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_surprisal(docs).collect()}
    # corpus: T=4, f(a)=f(b)=2 -> every token costs round(ln(2)*1e6)
    s = round(math.log(2) * 1e6)
    assert set(out) == {0, 1}  # empty doc drops
    assert (out[0].dl, out[0].surprisal_micro, out[0].avg_micro) == (3, 3 * s, s)
    assert (out[1].dl, out[1].surprisal_micro) == (1, s)
