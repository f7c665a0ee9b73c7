"""Ordered-funnel analytics: per-user stage completion over an event log.

The product-analytics staple a training-data/event pipeline needs next to
windows and sessionization: given an ordered list of stage event types
(e.g. view → click → purchase), find for each user the earliest strictly
ordered completion — stage k must occur strictly after the chosen stage
k−1 event in (ts, event_id) order (a total order: event ids are unique, so
tie-handling is exact and engine-independent, the determinism rule every
driver oracle here relies on).

Greedy-earliest is the standard funnel semantics and is OPTIMAL: taking
the earliest valid event for stage k−1 never excludes a completion that a
later choice would allow, so "earliest completion" is well-defined.

Scale shape: one filtered, map-side-combined min-aggregate per stage —
each pass scans only that stage's events and shuffles |users| rows, never
|events|; the per-stage key comparisons join |users|-sized tables
(broadcast-able). No UDFs, no windows over the full log, no per-user
sequence materialization. K stages = K tiny shuffles, the relational
alternative to the sessionize-then-scan shape (which shuffles the whole
log once but holds per-user sequences in memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel"]


def funnel(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Earliest strictly-ordered funnel completion per user.

    Returns one row per distinct user: (user, stage, e1 .. eK) where
    ``stage`` is the number of consecutive stages completed (0..K) and
    ``e<k>`` is the id of the chosen stage-k event (NULL once the funnel
    broke). Ordering is strict in (ts, id) — struct comparison IS that
    lexicographic order, and it works on TIMESTAMP and TIMESTAMP_NTZ
    alike; a stage-k event at exactly the same timestamp as stage k−1
    counts only if its id is larger.
    """
    if not stages:
        raise ValueError("funnel: need at least one stage")
    e = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        F.struct(
            F.col(ts_col).alias("m"),
            F.col(id_col).cast("long").alias("i"),
        ).alias("k"),
    )
    users = e.select("user").distinct()
    out = users
    prev_key = None  # column name of the previous stage's struct key
    for idx, stage in enumerate(stages, start=1):
        cur = e.where(F.col("etype") == stage)
        if prev_key is None:
            sk = cur.groupBy("user").agg(F.min("k").alias(f"k{idx}"))
        else:
            # join the per-user previous key (|users| rows) onto this
            # stage's events, keep strictly-later ones, take the min —
            # struct comparison IS the (ts, id) lexicographic order
            sk = (
                cur.join(out.select("user", prev_key), "user")
                .where(F.col("k") > F.col(prev_key))
                .groupBy("user")
                .agg(F.min("k").alias(f"k{idx}"))
            )
        out = out.join(sk, "user", "left")
        prev_key = f"k{idx}"
    stage_expr = sum(
        (F.col(f"k{i}").isNotNull().cast("long") for i in range(1, len(stages) + 1)),
        F.lit(0).cast("long"),
    )
    return out.select(
        F.col("user"),
        stage_expr.alias("stage"),
        *[
            F.col(f"k{i}").getField("i").alias(f"e{i}")
            for i in range(1, len(stages) + 1)
        ],
    )
