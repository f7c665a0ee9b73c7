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


def test_winnow_neardup_pairs_semantics():
    """Containment semantics + the max_df cut: a document embedded in a
    longer one scores containment 1.0 (every fingerprint of the short doc
    appears in the long doc's set); an unrelated doc pairs with nothing at
    threshold 0.5. With max_df=1 every cross-document fingerprint is cut,
    so no pairs survive at all."""
    from metric_search_spark.operators.dedupe import winnow_neardup_pairs

    spark = get_spark()
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    base,
                    base + " while the miller watches from the old stone bridge",
                    "completely unrelated content about spark shuffles and io",
                ],
            }
        )
    )
    got = winnow_neardup_pairs(docs, threshold=0.5).toPandas()
    assert set(zip(got["id_a"], got["id_b"])) == {(1, 2)}
    row = got.iloc[0]
    assert row["containment"] == 1.0  # doc 1's fp set ⊆ doc 2's
    cut = winnow_neardup_pairs(docs, threshold=0.0, max_df=1).toPandas()
    assert len(cut) == 0


def test_winnow_neardup_query_matches_duckdb_oracle():
    """Driver-twin replica at sf0.001: the DuckDB oracle recomputes hashes,
    winnowing, the inverted-index join, and containment from raw text."""
    duckdb_mod = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import QUERIES, _o_winnow_neardup_sql

    spark = get_spark()
    sf = "/root/testdata/sf0.001"
    got = QUERIES["winnow_neardup_documents"](spark, sf).toPandas()
    con = duckdb_mod.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = con.sql(_o_winnow_neardup_sql()).df()
    cols = ["id_a", "id_b", "shared", "containment"]
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) > 0


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
