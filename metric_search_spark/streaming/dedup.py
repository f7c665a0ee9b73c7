"""Streaming deduplication: exact (unbounded state) and watermark-bounded.

At-least-once delivery is the default contract of every large ingest bus —
replayed files, redelivered messages, retried batches — so a training-data
stream needs dedup-on-arrival as a first-class stateful operator (the
streaming face of operators/dedupe's batch tiers). Two modes, two state
budgets:

- ``stream_exact_dedup``: ``dropDuplicates(keys)`` on an unbounded stream —
  one state entry per distinct key FOREVER. Exact at any replay distance;
  state grows with the true key cardinality (HashAggregate-style state
  store, sharded across executors by key — fine when keys are bounded,
  ruinous on an open-vocabulary stream).
- ``stream_dedup_within_watermark``: ``dropDuplicatesWithinWatermark`` —
  state for a key is dropped once the event-time watermark passes its last
  seen timestamp + delay, so the store holds only the trailing window. The
  100-TB shape: bounded memory, with the documented and TESTED caveat that
  a duplicate arriving after its key's state evicted is re-emitted
  (tests/test_stream_dedup.py pins the discriminating case: same key
  re-sent after the watermark moved past the eviction horizon passes the
  bounded mode and is still caught by the exact mode).

Both run as real Structured Streaming jobs (file source → availableNow →
append-mode memory sink), the module's established verification surface.
``stage_replay`` copies a parquet file N times with strictly increasing
mtimes so ``maxFilesPerTrigger=1`` replays it as N micro-batches — the
deterministic at-least-once fixture: every duplicate is a byte-identical
row, so whichever copy the dedup keeps, the emitted set equals DISTINCT of
the input — which is what lets a driver query hash-match a DuckDB twin
(``stream_dedup_events``).
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_search_spark.streaming.windows import EVENTS_SCHEMA

__all__ = [
    "stage_replay",
    "stream_exact_dedup",
    "stream_dedup_within_watermark",
    "stream_bloom_dedup",
]

_sink_counter = itertools.count()


def stage_replay(src_file: str, times: int = 2, dirname: str | None = None) -> str:
    """Copy ``src_file`` into a fresh directory ``times`` times with
    strictly increasing mtimes (file-source batch order is mtime order) —
    the deterministic at-least-once replay fixture."""
    d = dirname or tempfile.mkdtemp(prefix="msk_replay_")
    base = os.path.basename(src_file)
    for i in range(times):
        dst = os.path.join(d, f"r{i}_{base}")
        shutil.copyfile(src_file, dst)
        t = os.stat(dst).st_mtime
        os.utime(dst, (t + i, t + i))
    return d


def _run(src_df: DataFrame, spark: SparkSession) -> DataFrame:
    name = f"msk_dedup_{next(_sink_counter)}"
    ckpt = tempfile.mkdtemp(prefix="msk_stream_ckpt_")
    q = (
        src_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _source(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int | None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_exact_dedup(
    spark: SparkSession,
    path: str,
    keys: list[str],
    *,
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Exact streaming dedup on ``keys``: first arrival of each key is
    emitted, every later arrival is dropped, however far apart the batches.
    State = one entry per distinct key, forever (the exact tier's price)."""
    src = _source(spark, path, schema, max_files_per_trigger)
    return _run(src.dropDuplicates(keys), spark)


def stream_dedup_within_watermark(
    spark: SparkSession,
    path: str,
    keys: list[str],
    *,
    ts_col: str = "ts",
    delay: str = "30 minutes",
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Watermark-bounded streaming dedup: duplicates of a key arriving
    while its state is live (watermark has not passed last-seen ts +
    ``delay``) are dropped; the state store stays bounded by the trailing
    window. Re-arrivals past eviction re-emit (pinned), and rows older than
    the watermark itself are dropped as late — both inherent to the bounded
    contract."""
    src = _source(spark, path, schema, max_files_per_trigger)
    deduped = src.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return _run(deduped, spark)


def stream_bloom_dedup(
    spark: SparkSession,
    path: str,
    key: str,
    *,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
    seed: int = 0,
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = 1,
    state_dir: str | None = None,
) -> DataFrame:
    """CONSTANT-state streaming dedup — the third state budget, for
    open-vocabulary key streams where even the watermark window is too
    much: a persistent Bloom filter (operators/bloom) of m bits, however
    many distinct keys ever arrive.

    Per micro-batch (foreachBatch, serial by contract): probe the batch
    against the PRE-batch filter (broadcast bit relation, zero-Exchange
    probe), drop positives, dedup the survivors exactly WITHIN the batch
    (bounded by batch size), emit them, and fold their bits into the
    filter (atomic directory swap — the same crash-safe rename discipline
    as the LSM index state, so a killed job resumes from the last
    committed filter).

    The asymmetry to state plainly: NO duplicate is ever emitted twice
    (a seen key's bits are set — no false negatives), but a false-positive
    novel key is silently DROPPED (expected rate (1−e^(−kn/m))^k). That is
    the ingest-gate trade: at 10⁹ URLs/day an exact store is ~100 GB of
    hot state per executor group, the filter is 128 KB at m=2²⁰ — and
    losing ~0.1 % of novel rows is the documented price. Every drop is
    deterministic (shared MINSTD hash), so a twin recomputing the filter
    offline reproduces the emitted set bit-for-bit — which is exactly
    what the driver oracle does.

    ``key`` must be a non-negative integer column (the hash contract).
    Returns the emitted rows (read back from the sink parquet).
    """
    from metric_search_spark.operators.bloom import bloom_build, bloom_probe

    d = state_dir or tempfile.mkdtemp(prefix="msk_bloomdedup_")
    bits_dir = os.path.join(d, "bits")
    out_dir = os.path.join(d, "emitted")
    ckpt = os.path.join(d, "ckpt")
    bloom_kw = dict(m_bits=m_bits, k_hashes=k_hashes, seed=seed)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        done = os.path.join(d, f"done_{batch_id}")
        if os.path.exists(done):  # replayed batch after crash: no-op
            return
        if os.path.exists(bits_dir):
            bits = sess.read.parquet(bits_dir)
        else:
            bits = sess.createDataFrame([], "bit_pos long")
        novel = (
            bloom_probe(batch_df, bits, [], key, **bloom_kw)
            .where(~F.col("bloom_positive"))
            .drop("bloom_positive")
            .dropDuplicates([key])
        )
        novel = novel.localCheckpoint()  # probe once; reused for emit+bits
        novel.write.mode("append").parquet(out_dir)
        # incremental fold: filter ∪ the batch's bits (never rescans the
        # emitted history — per-batch cost is O(batch + m), not O(total))
        new_bits = (
            bits.unionByName(bloom_build(novel, [], key, **bloom_kw))
            .distinct()
        )
        tmp = bits_dir + f"_tmp{batch_id}"
        new_bits.coalesce(1).write.mode("overwrite").parquet(tmp)
        if os.path.exists(bits_dir):
            shutil.rmtree(bits_dir)
        os.rename(tmp, bits_dir)
        open(done, "w").close()

    src = _source(spark, path, schema, max_files_per_trigger)
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
