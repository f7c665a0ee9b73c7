"""Rolling event-time window aggregates (per-entity trailing sums/counts).

The sliding-metric primitive (rate limiting, burst detection,
trailing-hour activity): for each event, aggregate everything from the
same entity in the trailing ``window_s`` seconds — a RANGE window frame,
evaluated by one shuffle on the entity key and one ordered scan per
partition (Spark's WindowExec keeps only the frame in memory, so state is
bounded by the densest window, not the partition).

Determinism: the frame is defined on integer epoch seconds — peers (equal
seconds) enter the frame together in every engine, so the result is
independent of intra-second tie order — and the summed value is
⌊v·2ˢ⌋-scaled to exact int64, making the aggregate order-free.

At 10¹²-row scale the entity key (user, device, doc) is fine-grained, so
the window shuffle partitions evenly; a 5-value global key would not (the
same disclosure acf carries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_agg"]


def rolling_agg(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    *,
    partition_cols: list[str],
    window_s: int = 3600,
    scale_bits: int = 16,
) -> DataFrame:
    """Adds (roll_n, roll_sum_scaled) per row: count and exact scaled sum
    of ``value_col`` over the trailing ``window_s`` seconds (inclusive of
    the current second's peers) within ``partition_cols``. ``ts_col`` must
    be a timestamp; the frame runs on its floored epoch seconds."""
    sec = F.col(ts_col).cast("timestamp").cast("long")
    iv = F.floor(F.col(value_col) * F.lit(float(1 << scale_bits))).cast("long")
    d = df.withColumn("_sec", sec).withColumn("_iv", iv)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy("_sec")
        .rangeBetween(-window_s, 0)
    )
    return (
        d.withColumn("roll_n", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("roll_sum_scaled", F.sum("_iv").over(w))
        .drop("_sec", "_iv")
    )
