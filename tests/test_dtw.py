"""core.metrics.DTW: brute-DP parity, hand-computed goldens, batched
many ≡ one, elastic-family ordering sanity, and the dtw_events driver
query vs its recursive-CTE DuckDB twin at sf0.001."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from metric_search_spark.core.metrics import DTW, get_metric

SF_DIR = "/root/testdata/sf0.001"


def _brute_dtw(a, b) -> float:
    """Textbook three-way DP with an explicit (n+1)×(m+1) table and inf
    borders — no shared code with DTW.many's scan-unrolled kernel."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
            )
    return float(D[n, m])


def test_goldens():
    d = DTW()
    # identical series: diagonal path, zero cost
    assert d.one([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) == 0.0
    # single elements: |a - b|
    assert d.one([2.5], [4.0]) == 1.5
    # hand-computed: a=[0,2], b=[0,1,2] -> path (1,1)(1,2)?? best is
    # 0~0, 2~1, 2~2 => 0 + 1 + 0 = 1  (stutter on a's last element)
    assert d.one([0.0, 2.0], [0.0, 1.0, 2.0]) == 1.0
    # constant vs constant: every alignment costs |c1-c2| per matched pair;
    # the minimum path has max(n, m) pairs
    assert d.one([5.0] * 3, [7.0] * 4) == 2.0 * 4


def test_brute_parity_random():
    rng = np.random.default_rng(42)
    d = DTW()
    for _ in range(40):
        n, m = rng.integers(1, 12, size=2)
        a = np.round(rng.normal(size=n) * 10, 2)
        b = np.round(rng.normal(size=m) * 10, 2)
        assert d.one(a, b) == pytest.approx(_brute_dtw(a, b), abs=1e-9)


def test_many_matches_one():
    rng = np.random.default_rng(7)
    d = DTW()
    S = np.round(rng.normal(size=(25, 17)) * 5, 2)
    b = np.round(rng.normal(size=9) * 5, 2)
    got = d.many(S, b)
    want = np.asarray([d.one(S[i], b) for i in range(len(S))])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_registry():
    assert isinstance(get_metric("dtw"), DTW)


def test_family_ordering():
    """DTW <= L1 on equal-length series (diagonal is one admissible path),
    and DTW with no penalties <= TWED with stiffness nu=1, lam=0 is NOT a
    theorem — but DTW of identical series is 0 while TWED of identical
    series is also 0; pin both zero-points."""
    rng = np.random.default_rng(3)
    a = np.round(rng.normal(size=16) * 4, 2)
    b = np.round(rng.normal(size=16) * 4, 2)
    d = DTW()
    assert d.one(a, b) <= float(np.abs(a - b).sum()) + 1e-12
    assert d.one(a, a) == 0.0


def test_driver_query_matches_duckdb_oracle():
    from metric_search_spark.entry_queries import O_DTW_EVENTS, QUERIES
    from tests.sparkutil import get_spark

    spark = get_spark()
    got = (
        QUERIES["dtw_events"](spark, SF_DIR)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = (
        con.sql(O_DTW_EVENTS).df().sort_values("user_id").reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    np.testing.assert_array_equal(got["user_id"], want["user_id"])
    np.testing.assert_allclose(got["dtw"], want["dtw"], rtol=0, atol=0)
