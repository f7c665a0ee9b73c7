"""Tile-pyramid rollup: conservation invariants, parent-child consistency,
one-data-pass plan shape, and DuckDB flat-formulation parity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F  # noqa: F401

from metric_search_spark.operators.tiling import tile_rollup
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _emb_xy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"),
        ((F.element_at("embedding", 1).cast("double") + 1.0) / 2.0).alias("x"),
        ((F.element_at("embedding", 2).cast("double") + 1.0) / 2.0).alias("y"),
        F.col("label").cast("long").alias("label"),
    )


def test_rollup_conservation_and_parent_child():
    """Every level's totals equal the input totals (nothing lost or double
    counted through the pyramid), and each parent tile's cnt/val equals the
    sum over its 4 children."""
    spark = get_spark()
    df = _emb_xy(spark)
    n = df.count()
    tot = df.agg(F.sum("label")).first()[0]
    out = tile_rollup(df, 4, value_col="label").toPandas()
    assert sorted(out["res"].unique()) == [0, 1, 2, 3, 4]
    for lvl, g in out.groupby("res"):
        assert g["cnt"].sum() == n, lvl
        assert g["val"].sum() == tot, lvl
    # parent == sum(children), checked at every level boundary
    for lvl in range(4, 0, -1):
        kids = out[out["res"] == lvl].copy()
        t = kids["tile"].to_numpy().astype("int64")
        kids["parent"] = ((lvl - 1) << 56) + ((t & ((1 << 56) - 1)) >> 2)
        rolled = kids.groupby("parent")[["cnt", "val"]].sum()
        parents = (
            out[out["res"] == lvl - 1].set_index("tile")[["cnt", "val"]]
        )
        pd.testing.assert_frame_equal(
            rolled.sort_index(), parents.sort_index(), check_names=False
        )


def test_rollup_is_one_data_pass():
    """The input is shuffled ONCE: each level is eagerly materialized
    before the union (without that, every union branch re-planned the whole
    chain below it — the full-data aggregate executed res+1 times, 15
    static exchanges at res=4). So (a) the RESULT plan has zero exchanges —
    it reads the materialized levels — and (b) one re-aggregation step over
    a materialized level is exactly one exchange over that tiny table."""
    from metric_search_spark.plans.inspect import count_exchanges

    spark = get_spark()
    df = _emb_xy(spark)
    out = tile_rollup(df, 4, value_col="label")
    assert count_exchanges(out) == 0
    # a single pyramid step: checkpointed level -> parent re-aggregation
    lvl = (
        df.groupBy((F.col("id") % 7).alias("tile"))
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    step = lvl.groupBy((F.col("tile") / 4).cast("long").alias("p")).agg(
        F.sum("cnt").alias("cnt")
    )
    assert count_exchanges(step) == 1


def test_rollup_matches_duckdb_flat_formulation():
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import QUERIES, _o_tile_rollup_sql

    spark = get_spark()
    got = QUERIES["tile_rollup_embeddings"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = con.sql(_o_tile_rollup_sql()).df()
    cols = ["res", "tile", "cnt", "val"]
    key = ["res", "tile"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
