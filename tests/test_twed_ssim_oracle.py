"""End-to-end parity for the metric-showcase oracles added in round 3:

- twed_events: DuckDB recomputes the ENTIRE TWED dynamic program from the
  raw events view (recursive CTE over list-valued DP rows; the engine's
  sequential inner min-scan unrolled to prefix-sum + prefix-min) — fully
  independent, no hand-off.
- ssim_images: the query writes a decoded-grayscale hand-off parquet and
  computes its own result FROM it; DuckDB recomputes the gaussian window
  (including the reference's size_t-underflow quirk, SSIM.cpp:57-72) and
  the full windowed SSIM algebra from that file.
- images_payload_verify: decoded + original pixels land in an integer
  hand-off parquet; Spark runs the real verify_payloads kernel over bytes
  while DuckDB recomputes phash-from-pixels (integer channel sums ->
  quantize -> Morton interleave) and PSNR independently.

All asserted EXACT (the driver's gate is a value hash, not a tolerance).
"""

from __future__ import annotations

import pandas as pd
import pytest

from metric_search_spark.entry_queries import (
    O_TWED_EVENTS,
    QUERIES,
    _o_ilh_sql,
    _o_ipv_sql,
    _o_ssim_sql,
)
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def test_twed_matches_duckdb_dp_oracle():
    duckdb = pytest.importorskip("duckdb")
    spark = get_spark()
    got = QUERIES["twed_events"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = con.sql(O_TWED_EVENTS).df()
    assert len(got) == len(want) == 15
    g = got.sort_values("user_id").reset_index(drop=True)
    w = want.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g[["user_id", "twed"]], w[["user_id", "twed"]], check_dtype=False)
    # anchor user distance to itself is exactly 0
    assert g["twed"].iloc[0] == 0.0


def test_ssim_matches_duckdb_window_oracle():
    duckdb = pytest.importorskip("duckdb")
    spark = get_spark()
    # the image set is fixed (n=48, seed=42) at every sf; the query writes
    # the hand-off before returning, so the oracle reads fresh data
    got = QUERIES["ssim_images"](spark, SF_DIR).toPandas()
    want = duckdb.sql(_o_ssim_sql()).df()
    assert len(got) == len(want) == 123
    cols = ["id_a", "id_b", "ssim"]
    g = got[cols].sort_values(cols[:2]).reset_index(drop=True)
    w = want[cols].sort_values(cols[:2]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # distances are symmetric-positive and bounded by sqrt(2) per window
    assert (g["ssim"] >= 0).all() and (g["ssim"] <= 2.0**0.5).all()


def test_payload_verify_matches_duckdb_phash_psnr_oracle():
    duckdb = pytest.importorskip("duckdb")
    spark = get_spark()
    got = QUERIES["images_payload_verify"](spark, SF_DIR).toPandas()
    want = duckdb.sql(_o_ipv_sql()).df()
    cols = ["fmt", "phash_ok", "cnt", "psnr_ok"]
    g = got[cols].sort_values(["fmt", "phash_ok"]).reset_index(drop=True)
    w = want[cols].sort_values(["fmt", "phash_ok"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    # the invariant itself must hold: every payload reproduces its phash
    # and clears the 40 dB bar, for both codecs
    assert set(g["fmt"]) == {"raw", "qnt"}
    assert g["phash_ok"].all() and g["psnr_ok"].all()
    assert g["cnt"].sum() == 2000


def test_index_histogram_matches_invariant_certifying_oracle():
    """The ilh oracle counts only nodes passing covering + nesting +
    parent_dist consistency; equality with the engine's plain histogram
    certifies every serialized node satisfies the invariants."""
    duckdb = pytest.importorskip("duckdb")
    spark = get_spark()
    got = QUERIES["index_level_histogram"](spark, SF_DIR).toPandas()
    want = duckdb.sql(_o_ilh_sql("sf0.001")).df()
    g = got.sort_values("level").reset_index(drop=True)
    w = want.sort_values("level").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g[["level", "cnt"]], w[["level", "cnt"]], check_dtype=False
    )
    assert g["cnt"].sum() == 2000  # one node per image, all invariant-passing
