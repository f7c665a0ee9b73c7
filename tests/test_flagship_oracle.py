"""Flagship-oracle guarantees: the DuckDB twin (entry_queries.O_FLAGSHIP) is a
cell-banded candidate join, exact only while every probe's 10th-NN distance
stays below one band-cell width. These tests pin that margin on the
deterministic data (so a synth change that violates it fails loudly, before
the driver's correctness gate does) and verify the whole query/oracle pair
end-to-end at sf0.001 scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from metric_search_spark.entry_queries import (
    QUERIES,
    _flagship_oracle_parquet,
    _o_flagship_sql,
    images_n_for_sf,
)
from metric_search_spark.cells import coords_from_phash
from metric_search_spark.sources.synth import lite_rows_for_ids
from tests.sparkutil import get_spark

K = 10


def _coords(n: int) -> np.ndarray:
    pdf = lite_rows_for_ids(np.arange(n, dtype=np.uint64), 42)
    x, y = coords_from_phash(pdf["phash"].to_numpy())
    return np.column_stack((x, y))


def _max_kth_dist(pts: np.ndarray, k: int = K, chunk: int = 2048) -> float:
    worst = 0.0
    for s in range(0, len(pts), chunk):
        d2 = ((pts[s : s + chunk, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        kth = np.sort(d2, axis=1)[:, k - 1]  # self included, as in the query
        worst = max(worst, float(np.sqrt(kth.max())))
    return worst


def test_kth_margin_sf001():
    """sf0.01 (the driver's correctness scale): O_FLAGSHIP bands at res 4
    (cell 0.0625); the actual max 10th-NN distance must sit far below."""
    worst = _max_kth_dist(_coords(images_n_for_sf("sf0.01")))
    assert worst < 0.0625 * 0.6, worst


def test_kth_margin_sf0001():
    """sf0.001 (the smoke-entry scale): the parity test below bands at res 3
    (cell 0.125)."""
    worst = _max_kth_dist(_coords(images_n_for_sf("sf0.001")))
    assert worst < 0.125 * 0.6, worst


def test_flagship_matches_duckdb_oracle_sf0001():
    duckdb = pytest.importorskip("duckdb")
    spark = get_spark()
    n = images_n_for_sf("sf0.001")
    got = QUERIES["flagship_images_knn"](spark, "/root/testdata/sf0.001").toPandas()
    _flagship_oracle_parquet(n)
    want = duckdb.sql(_o_flagship_sql(n, band_res=3)).df()
    assert len(got) == n * K
    cols = ["query_id", "neighbor_id", "rnk", "tile"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
