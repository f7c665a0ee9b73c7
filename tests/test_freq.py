"""Frequent-items operators: exact top-k plan + Misra–Gries guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.freq import (
    explode_tokens,
    misra_gries,
    misra_gries_with_bound,
    value_topk,
)
from metric_search_spark.plans.inspect import explain_text

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _zipf_rows(n_values: int = 60, scale: int = 600) -> list[tuple[str]]:
    """Deterministic skewed multiset: value i appears scale//(i+1) times —
    a few heavy hitters over a long tail."""
    rows = []
    for i in range(n_values):
        rows += [(f"v{i:03d}",)] * max(1, scale // (i + 1))
    return rows


def _true_counts(rows) -> dict[str, int]:
    out: dict[str, int] = {}
    for (v,) in rows:
        out[v] = out.get(v, 0) + 1
    return out


def test_value_topk_exact_and_tiebreak(spark):
    rows = _zipf_rows()
    df = spark.createDataFrame(rows, "v string")
    got = value_topk(df, "v", 5).collect()
    true = _true_counts(rows)
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["v"], r["cnt"]) for r in got] == want


def test_value_topk_plan_bounded(spark):
    """The global top-k must be TakeOrderedAndProject (per-task bounded
    top-k), never a single-partition window or a global Sort+Limit."""
    df = spark.createDataFrame(_zipf_rows(), "v string")
    plan = explain_text(value_topk(df, "v", 5), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


@pytest.mark.parametrize("parts", [1, 3, 8])
@pytest.mark.parametrize("cap", [4, 16])
def test_mg_guarantees(spark, parts, cap):
    """The three MG certificates under several partitionings and
    capacities: est <= true <= est + err_ub for retained values, absent
    values have true <= err_ub, and any value with true > err_ub is
    retained."""
    rows = _zipf_rows()
    true = _true_counts(rows)
    df = spark.createDataFrame(rows, "v string").repartition(parts)
    got = misra_gries(df, "v", cap).collect()
    assert 0 < len(got) <= cap
    err = got[0]["err_ub"]
    assert all(r["err_ub"] == err for r in got)
    kept = {r["v"]: r["est"] for r in got}
    for v, est in kept.items():
        assert est <= true[v] <= est + err, (v, est, true[v], err)
    for v, t in true.items():
        if v not in kept:
            assert t <= err, (v, t, err)
        if t > err:
            assert v in kept, (v, t, err)


def test_mg_exact_at_full_capacity(spark):
    """capacity >= per-partition distinct count -> no decrement ever fires:
    est == true and err_ub == 0 under any partitioning (the driver query's
    oracle-checkable configuration)."""
    rows = _zipf_rows(n_values=30)
    true = _true_counts(rows)
    df = spark.createDataFrame(rows, "v string").repartition(5)
    got = misra_gries(df, "v", 64).collect()
    assert {r["v"]: r["est"] for r in got} == true
    assert all(r["err_ub"] == 0 for r in got)


def test_mg_all_distinct_preserves_error_mass(spark):
    """cap=1 over an all-distinct column: every decrement round empties the
    summary (all weights tie at 1), so the sentinel row is the ONLY carrier
    of the error mass — absent values must still satisfy true <= err_ub."""
    n = 40
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "v string")
    df = df.repartition(2)
    rows, err = misra_gries_with_bound(df, "v", 1)
    got = rows.collect()
    for r in got:
        assert r["est"] <= 1 <= r["est"] + r["err_ub"]
        assert r["err_ub"] == err
    # every absent distinct value has true count 1; the guarantee needs
    # err_ub >= 1 whenever anything was decremented away — and the scalar
    # return keeps it observable even when the row set is EMPTY
    kept = {r["v"] for r in got}
    if len(kept) < n:
        assert err >= 1


def test_mg_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "v string"
    )
    got = {r["v"]: r["est"] for r in misra_gries(df, "v", 8).collect()}
    assert got == {"a": 2, "b": 1}


def test_explode_tokens_drops_empty(spark):
    df = spark.createDataFrame([("a  b",), ("",), ("c",)], "text string")
    toks = sorted(r["tok"] for r in explode_tokens(df).collect())
    assert toks == ["a", "b", "c"]
