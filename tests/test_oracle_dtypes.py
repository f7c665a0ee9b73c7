"""Oracle dtype-parity gate (VERDICT r4 item 2): every DuckDB oracle must
materialize the SAME dtype kinds as the Spark query it audits — the r4
driver reds were not wrong answers but a HUGEINT sum decaying to float64
against Spark's int64 through duckdb's .df().

Two tiers:
- STATIC oracles (plain SQL over the shared parquet views) are RE-EXECUTED
  live here against sf0.001 and compared to the recorded Spark kinds, so an
  oracle edit that drops a CAST fails in seconds with no Spark session.
- HAND-OFF oracles (SQL reads a parquet the query writes at run time) are
  pinned record-vs-record from the same recording run.

The recording (tests/data/oracle_dtypes_sf0001.json) is produced by
tools/record_spark_dtypes.py; the coverage test fails with a pointer there
whenever a query is added or renamed without re-recording.
"""

from __future__ import annotations

import json
from pathlib import Path

import duckdb
import pytest

from tools.dtype_kinds import frame_kinds

REC_PATH = Path(__file__).parent / "data" / "oracle_dtypes_sf0001.json"
SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def rec() -> dict:
    assert REC_PATH.exists(), (
        "no dtype recording — run: python tools/record_spark_dtypes.py"
    )
    return json.loads(REC_PATH.read_text())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_recording_covers_every_oracle(rec):
    from metric_search_spark.entry_queries import oracles_for

    have = set(rec["oracle"])
    want = set(oracles_for(SF))
    assert have == want, (
        f"stale recording (missing={sorted(want - have)}, "
        f"extra={sorted(have - want)}) — re-run tools/record_spark_dtypes.py"
    )
    import __spark_entry__ as E

    assert set(rec["spark"]) == set(E.queries()), (
        "stale recording — re-run tools/record_spark_dtypes.py"
    )


def test_static_oracles_live_kinds_match_spark(rec, con):
    """Execute every static oracle NOW and pin its kinds to the recorded
    Spark kinds — catches future oracle-SQL dtype regressions directly."""
    from metric_search_spark.entry_queries import _STATIC_ORACLES

    bad = {}
    for name in sorted(set(_STATIC_ORACLES) & set(rec["spark"])):
        got = frame_kinds(con.sql(_STATIC_ORACLES[name]).df())
        want = rec["spark"][name]
        if got != want:
            bad[name] = {"oracle": got, "spark": want}
    assert bad == {}, f"oracle dtype drift vs Spark: {json.dumps(bad, indent=1)}"


def test_handoff_oracles_recorded_kinds_match_spark(rec):
    """Hand-off oracles can't re-execute without their run-time parquet;
    pin the record-time DuckDB kinds against the record-time Spark kinds
    (both captured in one run of tools/record_spark_dtypes.py)."""
    static = set(rec["static"])
    bad = {
        name: {"oracle": rec["oracle"][name], "spark": rec["spark"][name]}
        for name in sorted(set(rec["oracle"]) - static)
        if name in rec["spark"] and rec["oracle"][name] != rec["spark"][name]
    }
    assert bad == {}, f"hand-off oracle dtype drift: {json.dumps(bad, indent=1)}"


def test_prefix_decay_regression_detector(con):
    """The gate itself must catch the r4 bug class: a bare integer sum
    through DuckDB decays to float (HUGEINT→float64), and the collapse
    distinguishes it from the CAST-wrapped form."""
    decayed = frame_kinds(con.sql("SELECT sum(r) AS v FROM range(3) t(r)").df())
    fixed = frame_kinds(
        con.sql("SELECT CAST(sum(r) AS BIGINT) AS v FROM range(3) t(r)").df()
    )
    assert decayed == {"v": "float"} and fixed == {"v": "int"}
