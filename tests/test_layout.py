"""Tile-clustered parquet layout: pushdown + real row-group pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metric_search_spark.plans.inspect import pushed_filters
from metric_search_spark.sources.layout import (
    overlap_fraction,
    rowgroup_tile_ranges,
    write_tile_clustered,
)

from tests.sparkutil import get_spark

RES = 6  # 64x64 grid


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def points(spark):
    """Deterministic scattered points: a multiplicative-hash walk over
    [0,1)² — spatially uniform, id-ordered rows are spatially RANDOM (the
    worst case for an unclustered layout's stats)."""
    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1_000_003)) / 1_000_003.0).alias("x"),
        (F.pmod(F.col("id") * 40503 + 17, F.lit(999_983)) / 999_983.0).alias("y"),
    )
    return df


@pytest.fixture(scope="module")
def paths(spark, points, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    clustered = str(base / "clustered")
    unclustered = str(base / "unclustered")
    write_tile_clustered(
        points, clustered, RES, n_files=8, row_group_bytes=64 * 1024
    )
    # same rows + same tile column, but placed in id order (no clustering)
    from metric_search_spark.functions.spatial import cell_from_xy_col

    (
        points.withColumn("tile", cell_from_xy_col(F.col("x"), F.col("y"), RES))
        .repartition(8)
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(unclustered)
    )
    return clustered, unclustered


def _tile_window(spark, path):
    """A narrow tile range holding ~1/64 of the data: the middle run of
    tiles by value."""
    tiles = sorted(
        r[0]
        for r in spark.read.parquet(path).select("tile").distinct().collect()
    )
    lo = tiles[len(tiles) // 2]
    hi = tiles[len(tiles) // 2 + len(tiles) // 64]
    return lo, hi


def test_roundtrip_rows(spark, points, paths):
    clustered, _ = paths
    got = spark.read.parquet(clustered)
    assert got.count() == points.count()
    assert got.select(F.sum("id")).collect()[0][0] == points.select(
        F.sum("id")
    ).collect()[0][0]


def test_filter_pushes_to_scan(spark, paths):
    clustered, _ = paths
    lo, hi = _tile_window(spark, clustered)
    q = spark.read.parquet(clustered).where(
        (F.col("tile") >= lo) & (F.col("tile") <= hi)
    )
    pf = " ".join(pushed_filters(q))
    assert "tile" in pf, pf


def test_rowgroup_pruning_ratio(spark, paths):
    """The point of the layout: a narrow tile window must leave MOST row
    groups skippable in the clustered layout, while the unclustered layout
    (spatially random placement) leaves nearly all of them readable."""
    clustered, unclustered = paths
    lo, hi = _tile_window(spark, clustered)
    rc = rowgroup_tile_ranges(clustered)
    ru = rowgroup_tile_ranges(unclustered)
    assert len(rc) >= 8 and len(ru) >= 8  # several groups to prune among
    fc = overlap_fraction(rc, lo, hi)
    fu = overlap_fraction(ru, lo, hi)
    assert fc <= 0.30, (fc, fu)   # clustered: >=70% of row groups skipped
    assert fu >= 0.90, (fc, fu)   # unclustered: stats are useless
    # and the filtered read returns identical rows from both layouts
    a = (
        spark.read.parquet(clustered)
        .where((F.col("tile") >= lo) & (F.col("tile") <= hi))
        .select("id")
    )
    b = (
        spark.read.parquet(unclustered)
        .where((F.col("tile") >= lo) & (F.col("tile") <= hi))
        .select("id")
    )
    assert sorted(r[0] for r in a.collect()) == sorted(r[0] for r in b.collect())


def test_files_cover_disjoint_tile_ranges(spark, paths):
    """repartitionByRange guarantee: each output file owns a contiguous,
    non-overlapping (tile, x, y) range — so FILE-level pruning composes on
    top of row-group pruning. Adjacent files may share the single boundary
    tile (range boundaries fall inside a tile); interiors must not
    interleave."""
    clustered, _ = paths
    per_file: dict[str, tuple[int, int]] = {}
    for f, _g, _n, mn, mx in rowgroup_tile_ranges(clustered):
        if f in per_file:
            lo, hi = per_file[f]
            per_file[f] = (min(lo, mn), max(hi, mx))
        else:
            per_file[f] = (mn, mx)
    spans = sorted(per_file.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (spans,)
