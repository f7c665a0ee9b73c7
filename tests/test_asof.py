"""Backward as-of join: semantics units, duplicate-ts tie-break, parity with
DuckDB's native ASOF JOIN, and the one-shuffle plan shape."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.joins import asof_join
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _df(spark, rows, schema):
    return spark.createDataFrame(pd.DataFrame(rows), schema)


def test_asof_semantics_inclusive_and_no_prior():
    """Inclusive boundary: a right row at EXACTLY the left timestamp
    matches. A left row before any right row keeps NULLs. Later left rows
    pick the latest (not first) prior right row."""
    spark = get_spark()
    left = _df(
        spark,
        {"k": [1, 1, 1], "lid": [10, 11, 12], "t": [5, 20, 30]},
        "k long, lid long, t long",
    )
    right = _df(
        spark,
        {"k": [1, 1], "rid": [100, 101], "t": [20, 25]},
        "k long, rid long, t long",
    )
    out = (
        asof_join(left, right, on="t", by="k", right_order="rid")
        .select("lid", "rid_r")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert out["lid"].tolist() == [10, 11, 12]
    got = [None if pd.isna(v) else int(v) for v in out["rid_r"]]
    assert got == [None, 100, 101]  # t=5: nothing; t=20: inclusive; t=30: latest


def test_asof_null_payload_not_backfilled():
    """A NULL field in the MATCHED right row must come through as NULL —
    a per-column ignorenulls carry would backfill it from an older right
    row, emitting a mixed row that never existed (DuckDB ASOF returns the
    matched row verbatim)."""
    spark = get_spark()
    left = _df(spark, {"k": [1], "lid": [10], "t": [3]}, "k long, lid long, t long")
    right = spark.createDataFrame(
        [(1, 1, 5, 9), (1, 2, None, 7)], "k long, t long, a long, b long"
    )
    out = asof_join(left, right, on="t", by="k", right_order="b").toPandas()
    # match is the t=2 row: a is NULL there, b is 7 — a must NOT be 5
    assert pd.isna(out["a_r"].iloc[0])
    assert int(out["b_r"].iloc[0]) == 7


def test_asof_string_right_order_tie_break():
    """right_order columns keep their OWN type: a string tie-breaker must
    order lexicographically, not be silently cast-to-long into NULLs."""
    spark = get_spark()
    left = _df(spark, {"k": [1], "lid": [10], "t": [50]}, "k long, lid long, t long")
    right = spark.createDataFrame(
        [(1, 40, "evt-b", 1), (1, 40, "evt-a", 2)],
        "k long, t long, uid string, val long",
    )
    out = asof_join(left, right, on="t", by="k", right_order="uid").toPandas()
    assert out["uid_r"].iloc[0] == "evt-b"  # lexicographically last wins
    assert int(out["val_r"].iloc[0]) == 1


def test_asof_duplicate_right_ts_tie_breaks_on_right_order():
    """Two right rows at the same timestamp: the one with the LARGEST
    right_order wins (last in the carry order) — deterministic, documented."""
    spark = get_spark()
    left = _df(spark, {"k": [1], "lid": [10], "t": [50]}, "k long, lid long, t long")
    right = _df(
        spark,
        {"k": [1, 1], "rid": [7, 9], "t": [40, 40]},
        "k long, rid long, t long",
    )
    out = asof_join(left, right, on="t", by="k", right_order="rid").toPandas()
    assert int(out["rid_r"].iloc[0]) == 9


def test_asof_matches_duckdb_native_asof_join():
    """The union-and-carry plan reproduces DuckDB's engine-native ASOF LEFT
    JOIN row-for-row on the events fixture (NULLs preserved)."""
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.streaming.windows import EVENTS_SCHEMA

    spark = get_spark()
    ev = spark.read.schema(EVENTS_SCHEMA).parquet(f"{SF_DIR}/events.parquet")
    left = ev.select("user_id", "event_id", "ts")
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid")
    )
    got = (
        asof_join(left, right, on="ts", by="user_id", right_order="pid")
        .select("event_id", "pid_r")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = con.sql(
        """
        SELECT l.event_id, r.pid AS pid_r FROM events l
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS pid FROM events
                        WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
        """
    ).df()
    key = ["event_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert got["pid_r"].notna().sum() > 0
    assert got["pid_r"].isna().sum() > 0  # some rows genuinely precede all


def test_asof_plan_is_one_shuffle():
    """The 100-TB contract: one hash exchange on the key — no
    interval-explosion join, no second shuffle for the carry window."""
    from metric_search_spark.plans.inspect import count_exchanges

    spark = get_spark()
    left = _df(
        spark, {"k": [1, 2], "lid": [1, 2], "t": [1, 2]}, "k long, lid long, t long"
    )
    right = _df(
        spark, {"k": [1, 2], "rid": [1, 2], "t": [1, 2]}, "k long, rid long, t long"
    )
    assert count_exchanges(asof_join(left, right, on="t", by="k")) == 1
