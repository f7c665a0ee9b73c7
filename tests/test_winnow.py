"""Winnowing Arrow-kernel hardening (VERDICT r3 items 2+6): unicode
codepoints, short/long document interleaving in the flattened batch, and
three-way parity (Arrow kernel ≡ relational plan ≡ DuckDB SQL twin) on
inputs the sf fixtures don't cover (the corpus is pure ASCII, max codepoint
121, and every doc is ~500 chars)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F  # noqa: F401

from metric_search_spark.functions.text import (
    winnow_fingerprints,
    winnow_fingerprints_arrow,
    winnow_sql,
)
from tests.sparkutil import get_spark

# mixed batch: unicode (codepoints far above U+00FF), emoji/astral plane,
# ASCII, exactly-one-gram (len == k == 8), shorter-than-gram (drops out),
# between k and k+w-2 (the short-doc fallback), and repeated text (hash
# ties exercise the rightmost rule)
DOCS = [
    (0, "die straße führt über die brücke längs des flußufers entlang"),
    (1, "электроэнергия вырабатывается на гидроэлектростанциях сибири"),
    (2, "数据在大规模集群上的分布式处理需要仔细的分区设计"),
    (3, "smiley 😀 emoji and astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 codepoints beyond the BMP"),
    (4, "plain ascii control document for the mixed batch"),
    (5, "abcdefgh"),          # exactly one gram -> short-doc fallback
    (6, "abcdefg"),           # len < k -> contributes nothing
    (7, "abcdefghij"),        # 3 grams < w -> short-doc fallback
    (8, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # all-equal hashes -> rightmost ties
    (9, "ααααααααββββββββααααααααββββββββ"),  # non-ascii + period-2 ties
]


def _expected_duckdb(pdf: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", pdf)
    return con.sql(winnow_sql("text")).df()


@pytest.fixture(scope="module")
def docs_df():
    spark = get_spark()
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf), pdf


def test_arrow_kernel_matches_duckdb_on_unicode(docs_df):
    df, pdf = docs_df
    cols = ["doc_id", "pos", "fp"]
    got = (
        winnow_fingerprints_arrow(df).toPandas()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    want = (
        _expected_duckdb(pdf)[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)
    # doc 6 (shorter than one gram) must be absent entirely
    assert 6 not in set(got["doc_id"])


def test_arrow_kernel_matches_relational_on_unicode(docs_df):
    df, _ = docs_df
    cols = ["doc_id", "pos", "fp"]
    a = (
        winnow_fingerprints_arrow(df).toPandas()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    b = (
        winnow_fingerprints(df).toPandas()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    pd.testing.assert_frame_equal(a, b)


def test_arrow_kernel_single_partition_interleaving(docs_df):
    """Force the whole mixed batch through ONE kernel invocation so the
    flattened short/long reduceat masking is exercised with long docs
    interleaved between short ones (the r4 rewrite's hard case)."""
    df, pdf = docs_df
    cols = ["doc_id", "pos", "fp"]
    got = (
        winnow_fingerprints_arrow(df.coalesce(1)).toPandas()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    want = (
        _expected_duckdb(pdf)[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)
