"""Sort-Tile-Recursive (STR) R-tree bulk packing — Leutenegger/Lopez/
Edgington 1997, the classic spatial bulk-loading algorithm: sort points by
x into S = ⌈√P⌉ vertical slabs (P = ⌈n/B⌉ pages of capacity B), sort each
slab by y, and cut runs of B into pages. The resulting page MBRs are the
leaf level of an R-tree with near-optimal area/overlap — the same
"bulk construction beats incremental insert" story as the reference's
cover-tree bulk ctor (tree.cpp:304), re-expressed for rectangle pages.

Scale shape: the global x-rank uses the range-partition + local-rank +
offset-add pattern (NO single-partition window sort — the
tiling.cluster_quota plan, cited there); the per-slab y-rank is an
ordinary window PARTITIONED BY slab (each slab is ~√P·B rows, hash
partitioned); the MBR aggregate is one map-side-combining groupBy. Every
output statistic is an actual data value or an integer count, so the
DuckDB twin (plain row_number windows + the same integer slab/page
arithmetic) matches with zero tolerance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["str_pack", "str_geometry"]


def str_geometry(n: int, capacity: int) -> tuple[int, int]:
    """(S, slab_rows): S = ⌈√⌈n/B⌉⌉ vertical slabs of ⌈n/S⌉ x-consecutive
    rows each — exact integer math (math.isqrt), no float sqrt."""
    if capacity < 1:
        raise ValueError(f"capacity {capacity} < 1")
    if n <= 0:
        return 0, 0
    pages = -(-n // capacity)
    s = math.isqrt(pages)
    if s * s < pages:
        s += 1
    slab = -(-n // s)
    return s, slab


def _global_rank0(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """0-based global rank by ``order_cols`` without a single-partition
    window: range-partition on the order key (disjoint ordered ranges,
    ascending partition ids), local sort + local rank per partition, add
    the partition's prefix-sum offset (numPartitions-row driver agg) —
    identical output to row_number() OVER (ORDER BY ...) − 1, fully
    parallel sort (the cluster_quota scale path, operators/tiling.py)."""
    spark = df.sparkSession
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    parted = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = {
            r["_pid"]: r["cnt"]
            for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_df = spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()] or [(0, 0)],
            "_pid int, _off long",
        )

        def local_rank(batches):
            seen = 0  # partition rows arrive sorted
            for pdf in batches:
                pdf = pdf.copy()
                pdf["_lrn"] = range(seen, seen + len(pdf))
                seen += len(pdf)
                yield pdf

        fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in parted.schema.fields
        )
        ranked = (
            parted.mapInPandas(local_rank, schema=f"{fields}, _lrn long")
            .join(F.broadcast(off_df), "_pid")
            .select(
                *[c for c in df.columns],
                (F.col("_off") + F.col("_lrn")).alias("_rn0"),
            )
            .localCheckpoint(eager=True)  # materialize before unpersist
        )
    finally:
        parted.unpersist()
    return ranked


def str_pack(
    points: DataFrame,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    capacity: int = 64,
) -> DataFrame:
    """Pack points into STR leaf pages; returns one row per page:
    (slab, page, n, min_x, max_x, min_y, max_y). Ties in x/y break on id,
    so the packing is deterministic for any input order."""
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    n = pts.count()
    if n == 0:
        return pts.sparkSession.createDataFrame(
            [],
            "slab long, page long, n long, min_x double, max_x double, "
            "min_y double, max_y double",
        )
    s, slab_rows = str_geometry(n, capacity)
    _ = s
    # integer DIV, not double /: float division can floor one off when the
    # quotient sits an ulp below an integer
    ranked = _global_rank0(pts, ["x", "id"]).withColumn(
        "slab", F.expr(f"_rn0 DIV {slab_rows}")
    )
    w = Window.partitionBy("slab").orderBy("y", "id")
    paged = ranked.withColumn(
        "page",
        (F.row_number().over(w).cast("long") - 1).alias("_r1"),
    ).withColumn("page", F.expr(f"page DIV {capacity}"))
    return paged.groupBy("slab", "page").agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )
