"""Deterministic split assignment: partition invariance, group coherence,
total coverage, threshold exactness vs the DuckDB SQL twin, validation."""

from __future__ import annotations

import duckdb
import pytest

from metric_search_spark.operators.sampling import split_assign, split_assign_sql
from tests.sparkutil import get_spark

_PROPS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _ids_df(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "rid").selectExpr(
        "rid as id", "rid % 37 as grp"
    )


def test_total_coverage_and_rough_proportions():
    spark = get_spark()
    out = split_assign(_ids_df(spark), _PROPS).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    assert 1500 < counts["train"] < 1750  # 0.8 ± generous slack
    assert 100 < counts["val"] < 300
    assert 100 < counts["test"] < 300


def test_partition_invariance():
    spark = get_spark()
    a = {
        r["id"]: r["split"]
        for r in split_assign(_ids_df(spark), _PROPS).collect()
    }
    b = {
        r["id"]: r["split"]
        for r in split_assign(_ids_df(spark).repartition(7), _PROPS).collect()
    }
    assert a == b


def test_group_key_coherence():
    spark = get_spark()
    rows = split_assign(_ids_df(spark), _PROPS, key_col="grp").collect()
    by_grp: dict[int, set] = {}
    for r in rows:
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_grp.values())


def test_sql_twin_parity():
    spark = get_spark()
    got = {
        r["id"]: r["split"]
        for r in split_assign(_ids_df(spark), _PROPS, seed=5).collect()
    }
    expr = split_assign_sql(_PROPS, "id", seed=5)
    want = dict(
        duckdb.sql(
            f"SELECT id, {expr} AS split FROM range(2000) t(id)"
        ).fetchall()
    )
    assert got == want


def test_validation():
    spark = get_spark()
    df = _ids_df(spark)
    with pytest.raises(ValueError, match="sum"):
        split_assign(df, {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="non-empty"):
        split_assign(df, {})
    with pytest.raises(ValueError, match="non-negative"):
        split_assign(df, {"a": 1.5, "b": -0.5})
