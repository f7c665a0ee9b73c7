"""Batch sessionization: gap-based session ids over event streams.

The batch counterpart to streaming/windows' session windows (which emit
per-window aggregates): assign every EVENT its (entity, session_idx) key
so downstream joins/funnels can group by session — the classic
clickstream primitive.

One window shuffle on the entity key, then two ordered passes that fuse
into one WindowExec: a lag() to flag gap breaks and a running sum to
number them. All arithmetic is exact integer epoch seconds; the ordering
(ts, tiebreak id) is total, so session numbering is deterministic under
any partitioning. Session boundary semantics: a gap STRICTLY greater than
``gap_s`` starts a new session (gap == gap_s continues), matching
Spark's session_window merge rule so the two surfaces agree on the same
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    ts_col: str,
    *,
    partition_cols: list[str],
    order_tiebreak: str,
    gap_s: int = 1800,
) -> DataFrame:
    """Adds ``session_idx`` (0-based per entity, in time order): a new
    session starts when the gap to the previous event exceeds ``gap_s``
    seconds. ``order_tiebreak`` must make (ts, tiebreak) a total order
    within each entity."""
    sec = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(*partition_cols).orderBy("_sec", order_tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    brk = (
        F.when(F.col("_sec") - F.lag("_sec").over(w) > gap_s, 1)
        .otherwise(0)
    )
    return (
        df.withColumn("_sec", sec)
        .withColumn("_brk", brk)
        .withColumn("session_idx", F.sum("_brk").over(run).cast("long"))
        .drop("_sec", "_brk")
    )
