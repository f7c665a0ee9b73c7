"""q_scd2_events gaps-and-islands semantics: hand-built change-log golden
(runs collapse, open current version, per-key isolation) + driver query vs
its DuckDB twin at sf0.001."""

from __future__ import annotations

import datetime as dt

import duckdb

from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def test_hand_golden():
    from metric_search_spark.entry_queries import q_scd2_events
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = get_spark()
    t0 = dt.datetime(2024, 1, 1)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: A A B A  -> versions A[0,2) B[2,3) A[3,open)
        (1, at(0), 1, "A"), (2, at(1), 1, "A"), (3, at(2), 1, "B"),
        (4, at(3), 1, "A"),
        # user 2: single event -> one open version
        (5, at(0), 2, "Z"),
    ]
    pdf = pd.DataFrame(
        [(e, ts, u, v, 0.0, "{}") for e, ts, u, v in rows],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64()), ("props", pa.string())]
    )
    d = tempfile.mkdtemp(prefix="msk_scd2_")
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema),
                   os.path.join(d, "events.parquet"))
    out = q_scd2_events(spark, d).collect()
    got = {
        (r["user_id"], r["event_type"], r["valid_from_us"]):
            (r["valid_to_us"], r["n_events"])
        for r in out
    }
    us = lambda m: int(at(m).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)  # noqa: E731
    assert got == {
        (1, "A", us(0)): (us(2), 2),
        (1, "B", us(2)): (us(3), 1),
        (1, "A", us(3)): (None, 1),
        (2, "Z", us(0)): (None, 1),
    }


def test_driver_query_matches_duckdb_oracle():
    from metric_search_spark.entry_queries import O_SCD2_EVENTS, QUERIES

    spark = get_spark()
    got = (
        QUERIES["scd2_events"](spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "valid_from_us"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = (
        con.sql(O_SCD2_EVENTS)
        .df()
        .sort_values(["user_id", "valid_from_us"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for c in ("user_id", "event_type", "valid_from_us", "n_events"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    a = got["valid_to_us"].to_numpy(dtype=object)
    b = want["valid_to_us"].to_numpy(dtype=object)
    import pandas as pd
    assert all((pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(a, b))
