"""Interval-overlap join (time-range × time-range).

The missing join type between the equi/asof/range family: pair every left
interval with every right interval it OVERLAPS (half-open semantics,
``a.start < b.end AND b.start < a.end``) — sessions × maintenance
windows, ad flights × user activity, shifts × incidents.

Scale shape: a naive formulation is a non-equi θ-join (Catalyst falls
back to BroadcastNestedLoop/Cartesian). Instead each interval EXPLODES to
the fixed-width time buckets it touches and the join runs as a bucket
equi-join, then exact-overlap refine + distinct — candidates are bounded
by co-bucket residency, the same two-stage coarse→exact shape as the
Morton-cell spatial joins. Bucket width trades replication (long
intervals touch many buckets) against selectivity; pick it near the
median interval length. All overlap arithmetic is exact integer epoch
seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str = "start_sec",
    left_end: str = "end_sec",
    right_start: str = "start_sec",
    right_end: str = "end_sec",
    bucket_s: int = 3600,
) -> DataFrame:
    """Join rows whose half-open [start, end) second intervals overlap.
    Returns every (left columns, right columns) pair plus
    ``overlap_s = min(ends) − max(starts)`` (> 0 by construction; touching
    intervals do NOT match — half-open). Start/end columns must be integer
    epoch seconds with start < end; column names must not collide across
    the two sides (alias before joining)."""

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        # [start, end) touches buckets floor(start/w) .. floor((end-1)/w)
        b0 = F.floor(F.col(s) / bucket_s).cast("long")
        b1 = F.floor((F.col(e) - 1) / bucket_s).cast("long")
        return df.withColumn("_b", F.explode(F.sequence(b0, b1)))

    lb = bucketed(left, left_start, left_end)
    rb = bucketed(right, right_start, right_end)
    cand = lb.join(rb, "_b").drop("_b")
    overlap = F.least(F.col(left_end), F.col(right_end)) - F.greatest(
        F.col(left_start), F.col(right_start)
    )
    return (
        cand.where(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
        )
        .distinct()  # an overlapping pair co-resides in >= 1 shared bucket
        .withColumn("overlap_s", overlap.cast("long"))
    )
