"""streaming/joins.stream_interval_join: streaming-emitted set ≡ batch
interval join on an in-order replay, cross-micro-batch match emission in
BOTH arrival orders (maxFilesPerTrigger=1), window boundary semantics, and
the stream_join_events driver query vs its DuckDB range-join twin."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import duckdb
import pandas as pd
import pytest

from metric_search_spark.streaming.joins import (
    interval_join_batch,
    stream_interval_join,
)
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _key(df):
    return sorted(map(tuple, df[["user_id", "a_id", "b_id", "delta_s"]].values))


def test_streaming_matches_batch_single_batch(spark):
    got = stream_interval_join(spark, f"{SF_DIR}/events.parquet").toPandas()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = interval_join_batch(ev).toPandas()
    assert len(got) > 0
    assert _key(got) == _key(want)


def _write_file(d: str, name: str, rows, mtime_bump: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # microsecond timestamps — pandas' default ns INT64 won't coerce to
    # Spark's TIMESTAMP under schema-on-read
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    p = os.path.join(d, name)
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), p)
    t = os.stat(p).st_mtime
    os.utime(p, (t + mtime_bump, t + mtime_bump))
    return p


def test_cross_batch_matches_both_arrival_orders(spark):
    """A match whose sides arrive in DIFFERENT micro-batches still emits —
    right-before-left (state on the right buffer) and left-before-right
    (state on the left buffer). One file per trigger forces two batches."""
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    d = tempfile.mkdtemp(prefix="msk_sjoin_fix_")
    # batch 1: user 1's click (odd, early) + user 2's probe (even, early)
    _write_file(
        d,
        "f0.parquet",
        [
            (1, t0, 1, "click", 1.0, "{}"),
            (4, t0 - dt.timedelta(minutes=60), 2, "probe", 1.0, "{}"),
        ],
        0,
    )
    # batch 2: user 1's probe (matches the batch-1 click, 30 min later) +
    # user 2's click (30 min BEFORE its batch-1 probe — within lookback)
    _write_file(
        d,
        "f1.parquet",
        [
            (2, t0 + dt.timedelta(minutes=30), 1, "probe", 1.0, "{}"),
            (3, t0 - dt.timedelta(minutes=90), 2, "click", 1.0, "{}"),
        ],
        1,
    )
    got = stream_interval_join(spark, d, max_files_per_trigger=1).toPandas()
    assert _key(got) == [(1, 2, 1, 1800), (2, 4, 3, 1800)]


def test_window_boundaries(spark):
    """b.ts == a.ts matches (delta 0); b.ts == a.ts − lookback matches
    (inclusive); b.ts just past the lookback does not; b after a does not."""
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    d = tempfile.mkdtemp(prefix="msk_sjoin_fix_")
    _write_file(
        d,
        "f0.parquet",
        [
            (10, t0, 7, "probe", 1.0, "{}"),          # left anchor
            (1, t0, 7, "click", 1.0, "{}"),            # delta 0 -> match
            (3, t0 - dt.timedelta(hours=6), 7, "c", 1.0, "{}"),   # edge -> match
            (5, t0 - dt.timedelta(hours=6, seconds=1), 7, "c", 1.0, "{}"),  # out
            (7, t0 + dt.timedelta(seconds=1), 7, "c", 1.0, "{}"),  # future -> out
        ],
        0,
    )
    got = stream_interval_join(spark, d).toPandas()
    assert _key(got) == [(7, 10, 1, 0), (7, 10, 3, 21600)]


def test_left_outer_null_emission_needs_eviction_batch(spark):
    """left_outer semantics (pinned empirically): an unmatched left row
    emits (…, NULL, NULL) only in a batch AFTER the watermark — computed at
    the END of an earlier batch — passes its a_ts and evicts its state.
    Batch 1: unmatched left at t0 (user 5) + a matched pair (user 6).
    Batch 2: a row at t0+3h — advances the post-batch watermark to t0+2h,
    but eviction hasn't run yet. Batch 3: a dummy row — processed with the
    t0+2h watermark, evicting user 5's left row → NULL emission. Rows in
    the final batch are withheld forever (the unbounded-stream behavior)."""
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    d = tempfile.mkdtemp(prefix="msk_sjoin_fix_")
    _write_file(
        d,
        "f0.parquet",
        [
            (10, t0, 5, "probe", 1.0, "{}"),                       # no match
            (12, t0, 6, "probe", 1.0, "{}"),
            (11, t0 - dt.timedelta(minutes=10), 6, "click", 1.0, "{}"),
        ],
        0,
    )
    _write_file(
        d, "f1.parquet", [(13, t0 + dt.timedelta(hours=3), 7, "c", 1.0, "{}")], 1
    )
    _write_file(
        d,
        "f2.parquet",
        [(16, t0 + dt.timedelta(hours=3, minutes=30), 8, "p", 1.0, "{}")],
        2,
    )
    got = stream_interval_join(
        spark, d, max_files_per_trigger=1, how="left_outer"
    ).toPandas()
    rows = {
        (r.user_id, r.a_id, None if pd.isna(r.b_id) else int(r.b_id))
        for r in got.itertuples()
    }
    # user 6's match (batch 1), user 5's NULL row (batch 3 eviction);
    # a_id=16 (final batch, never evicted) is withheld
    assert rows == {(6, 12, 11), (5, 10, None)}


def test_driver_query_matches_duckdb_oracle(spark):
    from metric_search_spark.entry_queries import O_STREAM_JOIN_EVENTS, QUERIES

    got = (
        QUERIES["stream_join_events"](spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "a_id", "b_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = (
        con.sql(O_STREAM_JOIN_EVENTS)
        .df()
        .sort_values(["user_id", "a_id", "b_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )
