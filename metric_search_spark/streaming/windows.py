"""Event-time windowed streaming aggregation with watermark — the §2.9
surface beyond foreachBatch ingestion (task brief: "Structured Streaming for
streams — watermarks + windowed aggs for late data").

``windowed_event_stats`` is the canonical late-data-tolerant rollup: tumbling
event-time windows over a stream of events, state bounded by a watermark.
In APPEND mode a window's row is emitted exactly once — when the watermark
(max event time seen, minus the allowed lateness) passes the window end —
so the emitted set for a finite stream is deterministic and SQL-checkable:
every (window, key) whose ``window_end <= max(ts) - delay``. That rule IS
the oracle (entry_queries q_stream_window_events): DuckDB computes the same
buckets and the same watermark cutoff from the raw table.

Scale shape: the aggregation state is keyed by (window, event_type) — a
standard hash-partitioned streaming agg whose state size is bounded by
(#open windows × #keys), NOT by stream length, because the watermark evicts
closed windows. No per-row Python anywhere; the whole thing is Catalyst's
native streaming aggregation.

Determinism note: the value sum is ``sum(floor(value·1000))`` as BIGINT —
integer summation is associative, so micro-batch boundaries (and a DuckDB
re-aggregation) produce bit-identical results where a double sum would be
order-sensitive.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "EVENTS_SCHEMA",
    "windowed_event_stats",
    "windowed_event_stats_batch",
    "session_event_stats",
    "session_event_stats_batch",
    "stateful_user_ewma",
]

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_sink_counter = itertools.count()


def _agg(src: DataFrame, window: str, delay: str) -> DataFrame:
    # schema-on-read gives TIMESTAMP; a raw parquet read may surface
    # TIMESTAMP_NTZ (isAdjustedToUTC=false), which won't cast to long.
    # The session pins spark.sql.session.timeZone=UTC (session.py), so the
    # NTZ→LTZ cast is wall-clock identity and both paths emit the same
    # epoch integers.
    if dict(src.dtypes).get("ts") == "timestamp_ntz":
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        src.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias(
                "sum_millis"
            ),
        )
        .select(
            F.col("win.start").cast("long").alias("win_start"),
            "event_type",
            "cnt",
            "sum_millis",
        )
    )


def windowed_event_stats(
    spark: SparkSession,
    events_path: str,
    *,
    window: str = "1 hour",
    delay: str = "30 minutes",
) -> DataFrame:
    """Run the watermarked tumbling-window aggregation as a real Structured
    Streaming job (file source → availableNow → memory sink) and return the
    emitted rows. Append mode: only windows the final watermark closed are
    in the result — the late tail past ``max(ts) - delay`` is withheld,
    exactly as it would be on an unbounded stream.

    ``win_start`` is epoch SECONDS (long): the window bucket is computed on
    the timestamp's internal UTC value (epoch-aligned tumbling), so the
    integer output is session-timezone-independent and hash-comparable
    across engines.

    Emission rule (pinned by tests/test_streaming_windows.py's exact-tie
    case): a window is emitted when ``window.end <= watermark`` — the tie
    (watermark landing exactly on a window end) EMITS.

    The memory sink is the harness/verification surface (rows land on the
    driver); a production job points the same plan at a table/foreachBatch
    sink. ``events_path`` may be a directory or a single parquet file (the
    file stream source requires a directory basePath, so a file path is
    turned into a trailing-char glob of its parent)."""
    import os

    if not os.path.isdir(events_path):
        # FileStreamSource needs basePath to be a directory; a one-char
        # glob class keeps the match exact while moving basePath up one
        events_path = f"{events_path[:-1]}[{events_path[-1]}]"
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
    name = f"msk_win_events_{next(_sink_counter)}"
    ckpt = tempfile.mkdtemp(prefix="msk_stream_ckpt_")
    q = (
        _agg(src, window, delay)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def windowed_event_stats_batch(
    events: DataFrame, *, window: str = "1 hour", delay: str = "30 minutes"
) -> DataFrame:
    """Batch twin of the streaming job (same plan minus the watermark
    eviction): all windows, including the open tail. Used by tests to pin
    that streaming-emitted rows equal the batch aggregate restricted to
    closed windows."""
    return _agg(events, window, delay)


def _session_agg(src: DataFrame, gap: str, delay: str) -> DataFrame:
    if dict(src.dtypes).get("ts") == "timestamp_ntz":
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        src.withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias(
                "sum_millis"
            ),
        )
        .select(
            F.col("win.start").cast("long").alias("sess_start"),
            F.col("win.end").cast("long").alias("sess_end"),
            "user_id",
            "cnt",
            "sum_millis",
        )
    )


def session_event_stats(
    spark: SparkSession,
    events_path: str,
    *,
    gap: str = "30 minutes",
    delay: str = "30 minutes",
) -> DataFrame:
    """Per-user SESSION windows (gap-based, dynamically merging) — the
    canonical stateful streaming op tumbling windows can't express: a
    session is the maximal run of a user's events where consecutive gaps
    are ≤ ``gap``; its window is [first_ts, last_ts + gap). Native
    ``F.session_window`` (Spark-first: the built-in state store handles the
    merge — no custom applyInPandasWithState needed for semantics Spark
    already ships).

    Pinned semantics (tests/test_streaming_windows.py, both empirically
    verified boundary cases):
    - MERGE tie: an event exactly ``gap`` after its predecessor EXTENDS the
      session (new session only when the gap is strictly exceeded).
    - EMIT tie: append mode emits a session when
      ``session_end <= watermark`` (tie emits), watermark = max(ts) − delay
      at stream end.
    Both rules are what the DuckDB twin (lag/cumsum sessionization +
    cutoff) recomputes from the raw table. State is keyed by (user,
    session) and bounded by the watermark — open sessions only."""
    import os

    if not os.path.isdir(events_path):
        events_path = f"{events_path[:-1]}[{events_path[-1]}]"
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
    name = f"msk_sess_events_{next(_sink_counter)}"
    ckpt = tempfile.mkdtemp(prefix="msk_stream_ckpt_")
    q = (
        _session_agg(src, gap, delay)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def session_event_stats_batch(
    events: DataFrame, *, gap: str = "30 minutes", delay: str = "30 minutes"
) -> DataFrame:
    """Batch twin of the session job: all sessions including open ones."""
    return _session_agg(events, gap, delay)


def stateful_user_ewma(
    spark: SparkSession,
    events_path: str,
    *,
    alpha: float = 0.25,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``
    (task brief: the escape hatch for stateful semantics Spark's built-in
    operators lack): a per-user exponentially-weighted moving average of
    ``floor(value·1000)`` emitted PER EVENT — each output row carries the
    running ewma after folding that event in. The recurrence
    ``e_n = alpha·x_n + (1−alpha)·e_{n−1}`` carries across micro-batches in
    the group state (one (ewma, count) pair per user — state size is
    O(users), not O(events)).

    EXACTNESS: with the default alpha = 1/4, every e_n is a dyadic rational
    (integer inputs × binary-fraction coefficients), exact in float64 while
    magnitudes stay < 2⁵³ — so the DuckDB recursive-CTE twin replaying the
    SAME recurrence in the SAME order is bit-identical, no tolerance. The
    TWED oracle precedent, applied to streaming state.

    ORDERING CONTRACT: events fold in (ts, event_id) order. Within a
    micro-batch the kernel sorts each user's rows; ACROSS batches the fold
    follows arrival order, so end-to-end determinism requires a per-key
    time-ordered source — true for this file fixture (one batch) and for
    the per-partition ordering Kafka-style sources guarantee; a source that
    interleaves a user's late rows across batches shifts the fold order
    (exactly the caveat every running-state operator carries)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not os.path.isdir(events_path):  # see windowed_event_stats
        events_path = f"{events_path[:-1]}[{events_path[-1]}]"
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        # force multi-batch processing (tests use 1 file per batch to pin
        # that the fold genuinely carries state across micro-batches)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(events_path)

    def fold(key, pdf_iter, state: GroupState):
        import numpy as np

        ewma, n = state.get if state.exists else (0.0, 0)
        # a group larger than one Arrow batch arrives as MULTIPLE chunks in
        # pdf_iter; sorting each chunk independently would fold events out
        # of (ts, event_id) order whenever file row order isn't time order —
        # concat first, sort ONCE across the whole micro-batch's group
        chunks = list(pdf_iter)
        frames = []
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            x = np.floor(pdf["value"].to_numpy() * 1000.0)
            out = np.empty(len(x), dtype=np.float64)
            for i, xi in enumerate(x):  # sequential by definition; groups
                if n == 0:  # are small and state is the point
                    ewma = float(xi)
                else:
                    ewma = alpha * float(xi) + (1.0 - alpha) * ewma
                n += 1
                out[i] = ewma
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": pdf["user_id"].to_numpy(),
                        "event_id": pdf["event_id"].to_numpy(),
                        "ewma": out,
                        "n": np.arange(n - len(x) + 1, n + 1, dtype=np.int64),
                    }
                )
            )
        state.update((ewma, n))
        # typed empty frame — object-dtype columns trip pandas' concat
        # dtype inference inside Spark's Arrow serializer
        yield pd.concat(frames) if frames else pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "event_id": pd.Series([], dtype="int64"),
                "ewma": pd.Series([], dtype="float64"),
                "n": pd.Series([], dtype="int64"),
            }
        )

    folded = (
        src.groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType="user_id long, event_id long, ewma double, n long",
            stateStructType="ewma double, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"msk_ewma_events_{next(_sink_counter)}"
    ckpt = tempfile.mkdtemp(prefix="msk_stream_ckpt_")
    q = (
        folded.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
