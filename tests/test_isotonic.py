"""operators/regress.isotonic: PAVA vs brute L2-projection QP on small
cases, the integer cross-mult violation rule, monotonicity/projection
invariants, and the isotonic_events driver query vs the minimax DuckDB
twin (bit-exact, zero tolerance)."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pytest

from metric_search_spark.operators.regress import isotonic, pava_ints
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _fit(y):
    out = []
    for s, c in pava_ints(y):
        out += [s / c] * c
    return out


def _brute_minimax(y):
    n = len(y)
    P = [0]
    for v in y:
        P.append(P[-1] + v)
    return [
        max(
            min((P[l] - P[j - 1]) / (l - j + 1) for l in range(i, n + 1))
            for j in range(1, i + 1)
        )
        for i in range(1, n + 1)
    ]


def test_pava_matches_minimax_and_invariants():
    rng = random.Random(2)
    for _ in range(150):
        y = [rng.randrange(-1000, 1000) for _ in range(rng.randint(1, 24))]
        fit = _fit(y)
        assert fit == pytest.approx(_brute_minimax(y), abs=1e-12)
        # nondecreasing; pool means preserve the sum (L2 projection onto
        # the monotone cone preserves the mean within each pool)
        assert all(a <= b + 1e-12 for a, b in zip(fit, fit[1:]))
        assert sum(fit) == pytest.approx(sum(y), abs=1e-9)


def test_pava_goldens():
    # [3,1] pools to mean 2; the trailing 2 does NOT violate (strict >),
    # so it stays its own pool — fitted values [2,2,2] either way
    assert pava_ints([3, 1, 2]) == [(4, 2), (2, 1)]
    assert pava_ints([1, 2, 3]) == [(1, 1), (2, 1), (3, 1)]
    assert pava_ints([2, 2]) == [(2, 1), (2, 1)]  # ties do not pool
    assert pava_ints([5, 1]) == [(6, 2)]


def test_driver_query_matches_duckdb_oracle_bit_exact():
    from metric_search_spark.entry_queries import O_ISOTONIC_EVENTS, QUERIES

    spark = get_spark()
    got = (
        QUERIES["isotonic_events"](spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = (
        con.sql(O_ISOTONIC_EVENTS)
        .df()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    # zero tolerance: identical rationals divide to identical doubles
    assert (got["iso"].to_numpy() == want["iso"].to_numpy()).all()
    # per-user monotone
    for _, grp in got.groupby("user_id"):
        v = grp["iso"].to_numpy()
        assert (np.diff(v) >= 0).all()
