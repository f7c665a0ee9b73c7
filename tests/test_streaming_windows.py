"""Watermarked windowed streaming aggregation (§2.9 beyond foreachBatch):
emission rule, late-tail withholding, batch-twin consistency, DuckDB twin.
"""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metric_search_spark.streaming.windows import (
    EVENTS_SCHEMA,
    session_event_stats,
    windowed_event_stats,
    windowed_event_stats_batch,
)
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def test_exact_tie_emits():
    """The emission rule is window.end <= watermark: with max(ts) 01:30 and
    30-minute lateness the watermark lands EXACTLY on the [00:00, 01:00)
    window's end — that window must be emitted (and the open [01:00, 02:00)
    window withheld)."""
    spark = get_spark()
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:10:00", "2024-01-01 01:30:00"]),
            "user_id": [1, 1],
            "event_type": ["a", "a"],
            "value": [1.0, 2.0],
            "props": ["", ""],
        }
    )
    d = tempfile.mkdtemp(prefix="msk_tie_")
    spark.createDataFrame(pdf, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    out = windowed_event_stats(spark, d).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["win_start"] == pd.Timestamp("2024-01-01 00:00:00").value // 10**9
    assert row["cnt"] == 1 and row["sum_millis"] == 1000


def test_streaming_equals_batch_twin_on_closed_windows():
    """Streaming append-mode output == the batch aggregate restricted to
    windows the final watermark closed; the withheld late tail is nonempty
    (the job really did withhold something)."""
    spark = get_spark()
    events = spark.read.schema(EVENTS_SCHEMA).parquet(f"{SF_DIR}/events.parquet")
    got = windowed_event_stats(spark, f"{SF_DIR}/events.parquet").toPandas()
    batch = windowed_event_stats_batch(events).toPandas()
    wm = (
        events.agg(
            (F.max("ts").cast("long") - F.lit(30 * 60)).alias("w")
        ).first()["w"]
    )
    closed = batch[batch["win_start"] + 3600 <= wm]
    cols = ["win_start", "event_type", "cnt", "sum_millis"]
    key = ["win_start", "event_type"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        closed[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(closed) < len(batch)  # a late tail was withheld


def _write_events(spark, pdf):
    d = tempfile.mkdtemp(prefix="msk_sess_")
    spark.createDataFrame(pdf, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def test_session_merge_and_emit_ties():
    """Both session boundary ties, pinned against live behavior:
    - an event EXACTLY gap after its predecessor MERGES (one session
      [00:00, 01:00) from events at 00:00 and 00:30 with a 30-min gap);
      a strictly larger gap starts a new session;
    - a session whose end equals the final watermark EMITS (user 2's
      lone event at 01:30 → session end 02:00; max ts 02:30 → watermark
      exactly 02:00)."""
    spark = get_spark()
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 9],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:30:00",  # == gap: merges
                    "2024-01-01 01:30:01",  # > gap from 00:30: new session
                    "2024-01-01 01:30:00",  # user 2: end 02:00 == watermark
                    "2024-01-01 02:30:00",  # watermark driver (user 3)
                ]
            ),
            "user_id": [1, 1, 1, 2, 3],
            "event_type": ["a"] * 5,
            "value": [1.0] * 5,
            "props": [""] * 5,
        }
    )
    d = _write_events(spark, pdf)
    out = (
        session_event_stats(spark, d)
        .toPandas()
        .sort_values(["user_id", "sess_start"])
        .reset_index(drop=True)
    )
    base = pd.Timestamp("2024-01-01 00:00:00").value // 10**9
    rows = list(zip(out["user_id"], out["sess_start"] - base, out["sess_end"] - base, out["cnt"]))
    # user 1: merged session [0, 3600) with 2 events (exact-gap tie MERGED);
    # its second session (start 01:30:01, end 02:00:01) is PAST the 02:00
    # watermark -> withheld. user 2: end == watermark -> emitted.
    assert rows == [(1, 0, 3600, 2), (2, 5400, 7200, 1)], rows


def test_stream_session_query_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import O_STREAM_SESSION_EVENTS, QUERIES

    spark = get_spark()
    got = QUERIES["stream_session_events"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = con.sql(O_STREAM_SESSION_EVENTS).df()
    cols = ["sess_start", "sess_end", "user_id", "cnt", "sum_millis"]
    key = ["user_id", "sess_start"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) > 0
    # sessions really merge multiple events (not all singleton)
    assert (got["cnt"] > 1).any()


def test_stateful_ewma_carries_state_across_microbatches():
    """The applyInPandasWithState fold must genuinely persist per-user
    state ACROSS micro-batches: two parquet files, maxFilesPerTrigger=1
    (one batch each, mtime order), one user split across them. The second
    event's ewma must fold the first batch's state (0.25·x₂ + 0.75·x₁),
    not restart."""
    import os
    import time

    from metric_search_spark.streaming.windows import stateful_user_ewma

    spark = get_spark()
    d = tempfile.mkdtemp(prefix="msk_ewma_mb_")

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_one(fname, ts, event_id, value):
        # plain parquet FILES at the top level (a Spark writer emits a
        # directory, which the file stream source does not recurse into)
        pdf = pd.DataFrame(
            {
                "event_id": pd.Series([event_id], dtype="int64"),
                "ts": pd.to_datetime([ts]),
                "user_id": pd.Series([1], dtype="int64"),
                "event_type": ["a"],
                "value": pd.Series([value], dtype="float64"),
                "props": [""],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            os.path.join(d, fname),
            coerce_timestamps="us",  # Spark reads micros, pandas emits ns
        )

    write_one("f1.parquet", "2024-01-01 00:00:00", 1, 8.0)  # x1 = 8000
    time.sleep(1.1)  # distinct mtimes -> file order = batch order
    write_one("f2.parquet", "2024-01-01 00:10:00", 2, 4.0)  # x2 = 4000
    out = (
        stateful_user_ewma(spark, d, max_files_per_trigger=1)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["n"]) == [1, 2]
    assert out["ewma"].tolist() == [8000.0, 0.25 * 4000 + 0.75 * 8000]


def test_stream_ewma_query_matches_duckdb_oracle_bit_exact():
    """Dyadic alpha makes the recurrence exact in float64 — the recursive
    CTE twin must match with check_exact (no tolerance at all)."""
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import O_STREAM_EWMA_EVENTS, QUERIES

    spark = get_spark()
    got = QUERIES["stream_ewma_events"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = con.sql(O_STREAM_EWMA_EVENTS).df()
    cols = ["user_id", "event_id", "ewma", "n"]
    key = ["user_id", "event_id"]
    a = got[cols].sort_values(key).reset_index(drop=True)
    b = want[cols].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()), check_exact=True)
    assert len(a) > 0


def test_stream_window_query_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import O_STREAM_WINDOW_EVENTS, QUERIES

    spark = get_spark()
    got = QUERIES["stream_window_events"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = con.sql(O_STREAM_WINDOW_EVENTS).df()
    cols = ["win_start", "event_type", "cnt", "sum_millis"]
    key = ["win_start", "event_type"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) > 0
