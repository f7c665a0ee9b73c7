"""Adaptive quadtree: leaves PARTITION the data (every point under exactly
one leaf), quota semantics per leaf class, zero-recursion plan shape, and
DuckDB direct-recount parity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.tiling import adaptive_quadtree, tile_assign
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"
RES, QUOTA = 5, 32


def _emb_xy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"),
        ((F.element_at("embedding", 1).cast("double") + 1.0) / 2.0).alias("x"),
        ((F.element_at("embedding", 2).cast("double") + 1.0) / 2.0).alias("y"),
    )


def _point_tiles(spark, df, res):
    """Each point's ancestor tile id at every level 0..res (pandas)."""
    pts = tile_assign(df, res).select("id", "tile").toPandas()
    t = pts["tile"].to_numpy().astype("int64")
    prefix = t & ((1 << 56) - 1)
    out = {res: t}
    for lvl in range(res - 1, -1, -1):
        prefix = prefix >> 2
        out[lvl] = (lvl << 56) + prefix
    return pts["id"].to_numpy(), out


def test_leaves_partition_points():
    """Every point lies under EXACTLY one leaf, and leaf counts are the
    true point counts (sum(cnt) == n)."""
    spark = get_spark()
    df = _emb_xy(spark)
    leaves = adaptive_quadtree(df, RES, QUOTA).toPandas()
    n = df.count()
    assert leaves["cnt"].sum() == n
    leaf_set = set(leaves["tile"].to_numpy().astype("int64"))
    assert len(leaf_set) == len(leaves)  # no duplicate leaves
    ids, anc = _point_tiles(spark, df, RES)
    covered = sum(
        int(anc[lvl][i] in leaf_set) for i in range(len(ids)) for lvl in anc
    )
    assert covered == len(ids)  # exactly one ancestor per point is a leaf


def test_quota_semantics():
    """Leaves above the floor hold <= quota points; any leaf exceeding the
    quota sits at max_res (forced); every non-root leaf's PARENT count
    exceeds the quota (else it would not have split)."""
    spark = get_spark()
    df = _emb_xy(spark)
    leaves = adaptive_quadtree(df, RES, QUOTA).toPandas()
    over = leaves[leaves["cnt"] > QUOTA]
    assert (over["lvl"] == RES).all()
    # parent counts: recount parents directly from the points
    ids, anc = _point_tiles(spark, df, RES)
    cnt_by_tile: dict[int, int] = {}
    for lvl, tiles in anc.items():
        for t in tiles:
            cnt_by_tile[t] = cnt_by_tile.get(t, 0) + 1
    nonroot = leaves[leaves["lvl"] > 0]
    t = nonroot["tile"].to_numpy().astype("int64")
    lv = nonroot["lvl"].to_numpy()
    parents = ((lv - 1).astype("int64") << 56) + ((t & ((1 << 56) - 1)) >> 2)
    assert all(cnt_by_tile[p] > QUOTA for p in parents)


def test_quadtree_matches_duckdb_direct_recount():
    """DuckDB recounts every level straight from raw coordinates (no
    pyramid, no parent-shift) and applies the same leaf predicates."""
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import QUERIES, _o_quadtree_sql

    spark = get_spark()
    got = QUERIES["quadtree_embeddings"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = con.sql(_o_quadtree_sql()).df()
    cols = ["tile", "lvl", "cnt"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values("tile").reset_index(drop=True),
        want[cols].sort_values("tile").reset_index(drop=True),
        check_dtype=False,
    )


def test_quadtree_rejects_degenerate_res():
    spark = get_spark()
    with pytest.raises(ValueError, match="max_res"):
        adaptive_quadtree(_emb_xy(spark), 0, QUOTA)
