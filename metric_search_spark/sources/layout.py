"""Tile-clustered parquet layout: Z-order data placement for scan pruning.

At 100 TB the fastest query is the one that never reads the bytes: parquet
keeps min/max statistics per file and per row group, and Spark's scan skips
any unit whose [min, max] range misses the pushed-down predicate. Those
statistics only bite when the data is PLACED so that each unit covers a
narrow key range — which is exactly what Morton/Z-order gives a 2-D key:
``write_tile_clustered`` computes the resolution-r Morton tile
(functions/spatial.cell_from_xy_col — one JVM-side Column expression), range
partitions on it (contiguous, non-overlapping tile ranges per output file —
the H3-style spatial clustering the north rule's engine stores its index
in), and sorts within partitions so row groups inside each file are narrow
too.

A spatial query then reads ``tile BETWEEN lo AND hi`` (any k-ring / polyfill
emits such ranges after compaction): the filter pushes to the scan
(`PushedFilters`, plan-pinned) and file+row-group pruning turns a full-table
scan into a handful of row groups. ``rowgroup_tile_ranges`` /
``overlap_fraction`` read the parquet footers back (pyarrow) so tests pin
the pruning RATIO, not just the plan string — the clustered layout must
actually make most row groups skippable where the unclustered one cannot
(tests/test_layout.py).

This is a data-layout operator, not a query: it runs once at ingest/compact
time (streaming/incremental.compact_index is the natural call site) and
every later spatial scan pays less. No UDFs anywhere; the write is one
range-shuffle + local sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import cell_from_xy_col

__all__ = [
    "write_tile_clustered",
    "rowgroup_tile_ranges",
    "overlap_fraction",
]


def write_tile_clustered(
    df: DataFrame,
    path: str,
    res: int,
    *,
    x_col: str = "x",
    y_col: str = "y",
    tile_col: str = "tile",
    n_files: int | None = None,
    row_group_bytes: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by the resolution-``res`` Morton
    tile of (x_col, y_col): tiles are computed JVM-side, rows range-partition
    on (tile, x, y) — contiguous non-overlapping tile ranges per file — and
    sort within partitions, so both file-level and row-group-level min/max
    stats are narrow. The tile column is persisted so readers filter on it
    directly (a plain long — the pushdown-friendliest key type).

    ``n_files`` defaults to the session's shuffle partitioning;
    ``row_group_bytes`` (parquet.block.size) is exposed because the pruning
    unit is the row group — at scale keep the default 128 MB, in tests
    shrink it to get several groups per file."""
    out = df.withColumn(
        tile_col, cell_from_xy_col(F.col(x_col), F.col(y_col), res)
    )
    parts = [F.col(tile_col), F.col(x_col), F.col(y_col)]
    ranged = (
        out.repartitionByRange(n_files, *parts)
        if n_files is not None
        else out.repartitionByRange(*parts)
    )
    writer = ranged.sortWithinPartitions(*parts).write.mode(mode)
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(path)


def rowgroup_tile_ranges(
    path: str, tile_col: str = "tile"
) -> list[tuple[str, int, int, int, int]]:
    """(file, row_group_index, n_rows, min_tile, max_tile) for every row
    group under ``path`` — read from the parquet footers, the same
    statistics the scan's pruning consults."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(tile_col)
        for g in range(pf.metadata.num_row_groups):
            col = pf.metadata.row_group(g).column(idx)
            st = col.statistics
            out.append(
                (os.path.basename(f), g, col.num_values, st.min, st.max)
            )
    return out


def overlap_fraction(
    ranges: list[tuple[str, int, int, int, int]], lo: int, hi: int
) -> float:
    """Fraction of row groups whose [min_tile, max_tile] intersects
    [lo, hi] — the groups a stats-pruning scan must actually read."""
    if not ranges:
        return 0.0
    hit = sum(1 for (_, _, _, mn, mx) in ranges if mx >= lo and mn <= hi)
    return hit / len(ranges)
