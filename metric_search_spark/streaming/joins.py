"""Watermarked stream-stream interval join — the remaining first-class
Structured Streaming surface after windowed/session aggregation
(streaming/windows), custom state (stateful_user_ewma), and dedup
(streaming/dedup): two unbounded streams joined on an equality key plus an
event-time range, with BOTH sides watermarked so the state store can evict
rows that can no longer match.

``stream_interval_join`` is the canonical attribution shape: each "probe"
event (left) picks up every "click" event (right) of the same user in the
trailing ``lookback`` window. Spark's stream-stream inner join emits a match
as soon as both rows have arrived (append mode), and the watermark + time
bound let it DROP right-side state older than ``watermark − lookback`` and
left-side state older than ``watermark`` — state is bounded by stream RATE ×
window, never stream length. That is the 100-TB shape: without the time
bound Spark rejects the join outright (state would grow forever).

Determinism: for a finite replay whose files arrive in event-time order
within the watermark delay, the emitted set for an INNER join is exactly the
batch interval join — every match emits once, when its later side arrives
(cross-micro-batch matches are pinned in tests/test_stream_join.py with
maxFilesPerTrigger=1). The DuckDB twin is therefore the plain SQL range
join, and the output is integer-exact (ids + a seconds delta).

Scale shape: both sides hash-partition on the equality key (user_id), so
the join is one co-partitioned stateful exchange per side; the time-range
predicate is evaluated within the key group. No per-row Python anywhere.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_search_spark.streaming.windows import EVENTS_SCHEMA

__all__ = ["stream_interval_join", "interval_join_batch"]

_sink_counter = itertools.count()


def _sides(src: DataFrame, lookback: str, delay: str, how: str = "inner"):
    """Split one event source into the two join sides (even event_id =
    probes, odd = clicks), each with its OWN watermark (a stream-stream
    join requires one per input), renamed apart so the join condition is
    unambiguous."""
    if dict(src.dtypes).get("ts") == "timestamp_ntz":
        # raw parquet may surface NTZ; session pins UTC so the cast is
        # wall-clock identity (same note as streaming/windows._agg)
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    left = (
        src.where(F.col("event_id") % 2 == 0)
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("a_id"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", delay)
    )
    right = (
        src.where(F.col("event_id") % 2 == 1)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("b_id"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", delay)
    )
    cond = (
        (left["user_id"] == right["r_user"])
        & (right["b_ts"] >= left["a_ts"] - F.expr(f"INTERVAL {lookback}"))
        & (right["b_ts"] <= left["a_ts"])
    )
    return (
        left.join(right, cond, how)
        .select(
            "user_id",
            "a_id",
            "b_id",
            (F.col("a_ts").cast("long") - F.col("b_ts").cast("long")).alias(
                "delta_s"
            ),
        )
    )


def stream_interval_join(
    spark: SparkSession,
    events_path: str,
    *,
    lookback: str = "6 hours",
    delay: str = "1 hour",
    max_files_per_trigger: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Run the watermarked stream-stream interval join as a real streaming
    job (file source ×2 → availableNow → memory sink) and return the
    emitted matches: for every even-event_id event, each odd-event_id event
    of the same user with ``a_ts − lookback <= b_ts <= a_ts``. Output is
    (user_id, a_id, b_id, delta_s) with delta_s in whole epoch seconds
    (timestamps are cast to long — microsecond fixtures floor identically
    in Spark and the DuckDB twin's epoch_us // 1e6).

    ``max_files_per_trigger`` forces multi-batch replay (tests pin that a
    match whose sides arrive in DIFFERENT micro-batches still emits — the
    join state genuinely carries across triggers).

    ``how='left_outer'``: unmatched left rows emit with NULL b_id once the
    watermark EVICTS their state (watermark > a_ts, since no future right
    row can have b_ts <= a_ts after that). Eviction runs at the START of a
    subsequent micro-batch, so a NULL row needs a LATER batch to carry it
    out — with availableNow, unmatched rows in the final batch are
    withheld forever (probed empirically: a single-batch run emits ZERO
    null rows — exactly how an unbounded stream behaves, where 'no more
    data' never happens). Multi-batch replay semantics are pinned in
    tests/test_stream_join.py; this withholding is why the driver query
    uses the inner join, whose emitted set is batch-deterministic."""
    if not os.path.isdir(events_path):  # see streaming/windows
        events_path = f"{events_path[:-1]}[{events_path[-1]}]"

    def reader():
        r = spark.readStream.schema(EVENTS_SCHEMA)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r.parquet(events_path)

    joined = _sides(reader(), lookback, delay, how)
    name = f"msk_sjoin_events_{next(_sink_counter)}"
    ckpt = tempfile.mkdtemp(prefix="msk_stream_ckpt_")
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def interval_join_batch(
    events: DataFrame,
    *,
    lookback: str = "6 hours",
    delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Batch twin: the same plan over a bounded DataFrame (watermarks are
    no-ops in batch). The streaming inner join's emitted set must equal
    this exactly for an in-order finite replay."""
    return _sides(events, lookback, delay, how)
