"""Prefix-filtered Jaccard join: output equivalence with the plain
inverted-index operator across thresholds (the filter must be lossless),
prefix-length boundary cases, and a hot-shingle skew case where the
prefix index provably indexes less."""

from __future__ import annotations

import pytest

from metric_search_spark.operators.dedupe import (
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
)
from tests.sparkutil import get_spark

_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy cat today"),
    (2, "the quick brown fox jumps over the lazy dog today"),  # dup of 0
    (3, "a completely different sentence with no overlap at all"),
    (4, "the quick brown fox sprints over the lazy dog today"),
    (5, "lorem ipsum dolor sit amet consectetur adipiscing elit sed"),
    (6, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    (7, "short text"),
    (8, ""),
]


def _df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def _pairs(out):
    return {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in out.collect()
    }


@pytest.mark.parametrize("tau", [0.2, 0.5, 0.8, 1.0])
def test_equivalent_to_plain_inverted_index(tau):
    spark = get_spark()
    df = _df(spark)
    want = _pairs(ngram_jaccard_pairs(df, shingle_n=3, threshold=tau))
    got = _pairs(prefix_jaccard_pairs(df, shingle_n=3, threshold=tau))
    assert got == want, tau


def test_exact_duplicates_score_one():
    spark = get_spark()
    got = _pairs(prefix_jaccard_pairs(_df(spark), threshold=0.99))
    assert got[(0, 2)] == 1.0


def test_hot_shingle_skew_prefix_indexes_less():
    # 40 docs sharing one hot shingle but otherwise disjoint: the plain
    # index joins the hot shingle 40x40; the prefix index puts the hot
    # shingle in every doc's SUFFIX (rarest-first order), so at tau=0.9
    # no candidates form at all
    spark = get_spark()
    docs = [
        (i, f"unique{i}a unique{i}b unique{i}c common hot shingle")
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _pairs(prefix_jaccard_pairs(df, shingle_n=3, threshold=0.9))
    want = _pairs(ngram_jaccard_pairs(df, shingle_n=3, threshold=0.9))
    assert got == want == {}


def test_validation():
    spark = get_spark()
    with pytest.raises(ValueError, match="threshold"):
        prefix_jaccard_pairs(_df(spark), threshold=0.0)
