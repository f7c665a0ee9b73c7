"""Streaming dedup: replay-distinct equality, bounded-state eviction."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from metric_search_spark.streaming.dedup import (
    stage_replay,
    stream_dedup_within_watermark,
    stream_exact_dedup,
)

from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _events_file() -> str:
    return f"{SF_DIR}/events.parquet"


def test_exact_dedup_replay_equals_distinct():
    """Two identical micro-batches (at-least-once replay): the exact mode
    emits the original rows exactly once each."""
    spark = get_spark()
    d = stage_replay(_events_file(), times=2)
    got = stream_exact_dedup(spark, d, ["event_id"]).toPandas()
    want = spark.read.parquet(_events_file()).toPandas()
    assert len(got) == len(want)
    key = ["event_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[sorted(got.columns)],
        want.sort_values(key).reset_index(drop=True)[sorted(want.columns)],
        check_dtype=False,
    )


def test_watermark_dedup_replay_equals_distinct():
    """The bounded mode gives the same answer on the replay fixture: every
    batch-2 row is either a live-state duplicate (ts >= watermark) or late
    (ts < watermark) — both dropped — while batch 1 emits everything."""
    spark = get_spark()
    d = stage_replay(_events_file(), times=2)
    got = stream_dedup_within_watermark(
        spark, d, ["event_id"], delay="30 minutes"
    )
    n = spark.read.parquet(_events_file()).count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def _write_events(path: str, rows: list[tuple[int, str, int]]) -> None:
    """rows = (event_id, ts_str, user_id)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "event_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": pd.Series([r[2] for r in rows], dtype="int64"),
            "event_type": ["a"] * len(rows),
            "value": pd.Series([1.0] * len(rows), dtype="float64"),
            "props": [""] * len(rows),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        path,
        coerce_timestamps="us",
    )


def test_bounded_state_evicts_exact_does_not():
    """The discriminating case for the two state budgets: user 7 appears in
    batch 1 at t0 while a clock row pushes the watermark 10h forward; a
    filler batch 2 lets the state store commit an eviction pass under that
    watermark (micro-batch N evicts at COMMIT with the watermark computed
    from batch N-1 — a duplicate arriving in the same batch the watermark
    advanced still finds live state); user 7 then re-appears in batch 3.
    The watermark mode has EVICTED user 7's state (t0 + 30min < watermark)
    and re-emits the key; the exact mode still holds it and dedups."""
    import time

    spark = get_spark()
    d = tempfile.mkdtemp(prefix="msk_dedup_evict_")
    _write_events(
        os.path.join(d, "f1.parquet"),
        [(1, "2024-01-01 00:00:00", 7), (2, "2024-01-01 10:00:00", 99)],
    )
    time.sleep(1.1)
    _write_events(
        os.path.join(d, "f2.parquet"), [(3, "2024-01-01 10:30:00", 98)]
    )
    time.sleep(1.1)
    _write_events(
        os.path.join(d, "f3.parquet"), [(4, "2024-01-01 10:00:00", 7)]
    )

    bounded = stream_dedup_within_watermark(
        spark, d, ["user_id"], delay="30 minutes"
    ).toPandas()
    assert sorted(bounded["event_id"]) == [1, 2, 3, 4]  # user 7 TWICE

    exact = stream_exact_dedup(spark, d, ["user_id"]).toPandas()
    assert sorted(exact["event_id"]) == [1, 2, 3]  # exact mode still dedups


def test_driver_query_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import QUERIES, oracles_for

    spark = get_spark()
    got = QUERIES["stream_dedup_events"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = con.sql(oracles_for(SF_DIR)["stream_dedup_events"]).df()
    assert len(got) == len(want) > 0
    key = ["event_id"]
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[cols],
        want.sort_values(key).reset_index(drop=True)[cols],
        check_dtype=False,
    )
