"""Event-sequence transition statistics (first-order Markov counts).

The behavior-modeling primitive over an event log: for each user take the
(ts, id)-ordered event-type sequence and count consecutive transitions
a → b; row-normalize for the transition probability matrix. Counts are
exact integers under any partitioning (the successor of an event is a
pure function of the log), and the single division per output row runs on
identical integers in both engines.

Scale shape: ONE hash shuffle — the per-user ordered window (lead over
(ts, id)) — followed by a map-side-combined count aggregate on the
(from, to) key; the matrix is |types|², tiny. Same single-sort cost class
as sessionization; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["transition_counts"]


def transition_counts(
    events: DataFrame,
    *,
    by: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-(from, to) transition counts and row-normalized probabilities
    over each key's (ts, id)-ordered event-type sequence. Returns
    (src_type, dst_type, n, p) with p = n / Σ_dst n (per src_type)."""
    w = Window.partitionBy(by).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    steps = (
        events.select(
            F.col(by),
            F.col(type_col).alias("src_type"),
            F.col(ts_col),
            F.col(id_col),
        )
        .withColumn("dst_type", F.lead("src_type").over(w))
        .where(F.col("dst_type").isNotNull())
    )
    counts = steps.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("src_type")
    return counts.select(
        "src_type",
        "dst_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias("p"),
    )


__all__.append("od_matrix")


def od_matrix(
    df: DataFrame,
    res: int,
    *,
    by: str = "user_id",
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "event_id",
) -> DataFrame:
    """Origin-destination flow matrix — the movement-analytics staple
    (commute matrices, trip-chain analysis): per ``by`` entity, order the
    trajectory by ``id_col``, assign every point its Morton tile at
    ``res``, and count consecutive tile→tile hops. Self-loops (hops that
    stay inside one tile) are kept — the dwell diagonal of the matrix.

    Scale shape: the tile is a pure Column expression (no UDF), so the
    whole operator is ONE per-entity window sort (lead over ``id_col``)
    plus a map-side-combined count on the (o_tile, d_tile) key; the output
    is at most |tiles|² rows regardless of input size. Counts are exact
    integers under any partitioning — the successor of a point is a pure
    function of the log.

    Returns (o_tile, d_tile, flow)."""
    from metric_search_spark.operators.tiling import tile_assign

    tiled = tile_assign(df, res, x_col=x_col, y_col=y_col)
    w = Window.partitionBy(by).orderBy(id_col)
    return (
        tiled.select(
            F.col("tile").alias("o_tile"),
            F.lead("tile").over(w).alias("d_tile"),
        )
        .where(F.col("d_tile").isNotNull())
        .groupBy("o_tile", "d_tile")
        .agg(F.count("*").alias("flow"))
    )
