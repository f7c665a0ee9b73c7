"""MSK_SKIP_ORACLE_HANDOFF gates EVERY oracle hand-off writer (VERDICT r3
item 3): with the var set, no query materializes driver-side state or writes
a /tmp parquet — it computes from its own distributed plan — and the results
are identical to the ungated run. The file-absence check is the hard proxy
for "no hand-off work executed": every writer goes through _write_handoff,
whose only observable effect is the file."""

from __future__ import annotations

import glob
import os

import pytest

from metric_search_spark.entry_queries import QUERIES
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"

# the three queries whose gated path restructures a parquet round-trip into
# a live self-join (the risky rewrites); the others only skip a write
_PARITY_QUERIES = ["minhash_lsh_documents", "simhash_documents",
                   "ann_lsh_embeddings"]


def _clear_handoffs() -> list[str]:
    paths = glob.glob("/tmp/msk_*_handoff_*.parquet")
    for p in paths:
        os.remove(p)
    return paths


@pytest.mark.parametrize("name", _PARITY_QUERIES)
def test_gated_query_matches_ungated_and_writes_nothing(name, monkeypatch):
    spark = get_spark()
    monkeypatch.delenv("MSK_SKIP_ORACLE_HANDOFF", raising=False)
    want = QUERIES[name](spark, SF_DIR).toPandas()
    monkeypatch.setenv("MSK_SKIP_ORACLE_HANDOFF", "1")
    _clear_handoffs()
    got = QUERIES[name](spark, SF_DIR).toPandas()
    assert glob.glob("/tmp/msk_*_handoff_*.parquet") == [], "gated run wrote a hand-off"
    cols = list(want.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )


def test_gate_skips_pq_and_ivfpq_handoffs(monkeypatch):
    """The pq/ivfpq hand-off dict is None when gated, so no codes/LUT
    collect happens; the ranked output is unchanged (same seeded
    pipeline)."""
    spark = get_spark()
    monkeypatch.delenv("MSK_SKIP_ORACLE_HANDOFF", raising=False)
    want = QUERIES["pq_knn_embeddings"](spark, SF_DIR).toPandas()
    monkeypatch.setenv("MSK_SKIP_ORACLE_HANDOFF", "1")
    _clear_handoffs()
    got = QUERIES["pq_knn_embeddings"](spark, SF_DIR).toPandas()
    assert glob.glob("/tmp/msk_*_handoff_*.parquet") == []
    import pandas as pd

    key = ["query_id", "rnk"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
