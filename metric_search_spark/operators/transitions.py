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
