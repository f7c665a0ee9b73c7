"""Incremental index maintenance: the reference's mutable insert/erase under a
global lock (details/tree.cpp:391-411, 526-582; shared_timed_mutex
tree.hpp:77) re-designed as an **LSM-style delta log over the checkpointed
per-cell tree index** (sources/index.py):

- ``append_delta``   — insert: new rows land in ``path/delta/`` (op='I')
- ``delete_ids``     — erase: tombstone rows (op='D'); like the reference,
                       deleting re-exposes nothing until refresh — probes
                       filter tombstones exactly
- ``knn_probe_live`` — probes see base trees ⊕ delta: per-cell cover-tree
                       descent on the base (sources/index.knn_probe_index)
                       merged with a brute pass over the (small) delta, minus
                       tombstoned ids — the merge is one window top-k
- ``compact_index``  — applies the delta: ONLY cells touched by delta rows
                       are rebuilt (cell-scoped refresh, no global lock
                       analog needed) and the delta is cleared

- ``stream_into_index`` — Structured Streaming entry: readStream source →
  ``writeStream.foreachBatch(append_delta)`` with checkpointLocation, so a
  killed stream resumes from its last committed micro-batch (engine-level
  exactly-once into the delta log).

At 100 TB scale this is the standard write path: high-rate appends hit an
append-only log (no index rewrite per row), reads merge log+base, and
compaction amortizes tree rebuilds per cell range.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metric_search_spark.functions.spatial import cell_from_xy_col
from metric_search_spark.operators.joins import _clamp01
from metric_search_spark.sources.index import (
    NODE_SCHEMA,
    _build_kernel,
    completed_batches,
    index_meta,
    load_nodes,
)

__all__ = [
    "append_delta",
    "delete_ids",
    "read_delta",
    "knn_probe_live",
    "compact_index",
    "stream_into_index",
]

_DELTA_SCHEMA = "id long, x double, y double, op string"


def append_delta(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> None:
    """Insert rows into the index's delta log (append-only parquet)."""
    df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.lit("I").alias("op"),
    ).write.mode("append").parquet(f"{path}/delta")


def delete_ids(df: DataFrame, path: str, *, id_col: str = "id") -> None:
    """Erase records by id: tombstones in the delta log (reference erase,
    tree.cpp:526-582, as a table-level MERGE-delete)."""
    df.select(
        F.col(id_col).cast("long").alias("id"),
        F.lit(None).cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
        F.lit("D").alias("op"),
    ).write.mode("append").parquet(f"{path}/delta")


def read_delta(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.schema(_DELTA_SCHEMA).parquet(f"{path}/delta")
    except Exception:  # noqa: BLE001 — empty delta
        return None


def _effective_delta(delta: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(live inserts, tombstoned ids): a tombstone wins over any insert of
    the same id in the log."""
    dead = delta.where(F.col("op") == "D").select("id").distinct()
    live = (
        delta.where(F.col("op") == "I")
        .join(dead, "id", "left_anti")
        .dropDuplicates(["id"])
    )
    return live, dead


def knn_probe_live(
    probes: DataFrame,
    path: str,
    k: int = 10,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """kNN over base-index ⊕ delta: exact merge of the stored-tree answer
    with a brute pass over live delta rows, excluding tombstoned ids."""
    from metric_search_spark.operators.joins import knn_join
    from metric_search_spark.sources.index import knn_probe_index

    spark = probes.sparkSession
    delta = read_delta(spark, path)
    if delta is None:
        return knn_probe_index(
            probes, path, k=k, id_col=id_col, x_col=x_col, y_col=y_col
        )
    live, dead = _effective_delta(delta)
    # tombstones are filtered AFTER the base trees' top-k, so over-fetch by
    # the tombstone count — exact, and bounded because compaction clears the
    # delta log. Only tombstones that actually hit a base row can hide a
    # neighbor, so count those (a delete burst of ids never indexed — or
    # already compacted away — no longer inflates every probe's fetch).
    n_dead = (
        load_nodes(spark, path).select("id").join(dead, "id", "left_semi").count()
    )
    base = knn_probe_index(
        probes, path, k=k + n_dead, id_col=id_col, x_col=x_col, y_col=y_col
    )
    base = base.join(dead.select(F.col("id").alias("neighbor_id")), "neighbor_id", "left_anti")
    parts = [base.select("query_id", "neighbor_id", "dist")]
    if not live.isEmpty():
        vs_delta = knn_join(
            probes.select(
                F.col(id_col).alias("id"),
                F.col(x_col).alias("x"),
                F.col(y_col).alias("y"),
            ),
            live,
            k=k,
            vec_col=None,
        )
        parts.append(vs_delta.select("query_id", "neighbor_id", "dist"))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def compact_index(spark: SparkSession, path: str) -> int:
    """Apply the delta log: rebuild ONLY the cells it touches (cell-scoped
    refresh — the partition-parallel analog of the reference's lock-guarded
    in-place mutation). Returns the number of rebuilt cells."""
    delta = read_delta(spark, path)
    if delta is None:
        return 0
    res, batches, metric_name = index_meta(spark, path)
    live, dead = _effective_delta(delta)
    nodes = load_nodes(spark, path)

    live_c = live.withColumn(
        "cell", cell_from_xy_col(_clamp01(F.col("x")), _clamp01(F.col("y")), res)
    )
    dead_cells = nodes.join(
        dead.select(F.col("id")), "id", "left_semi"
    ).select("cell")
    touched = (
        live_c.select("cell").unionByName(dead_cells).distinct().persist()
    )
    n_touched = touched.count()
    if n_touched == 0:
        _clear_delta(spark, path)
        touched.unpersist()
        return 0

    # records of touched cells = (base payload − tombstones) ∪ NEW live
    # inserts. The anti-join of inserts against ids already in the base makes
    # delta re-application idempotent: if a crash lands between the manifest
    # commit and the delta clear, the next compaction rebuilds the same cells
    # with identical content instead of duplicating the already-applied rows
    # (ADVICE r1, medium).
    base_records = (
        nodes.join(touched, "cell", "left_semi")
        .join(dead, "id", "left_anti")
        .select("id", F.col("vx").alias("_x"), F.col("vy").alias("_y"), "cell")
    )
    new_records = (
        live_c.join(touched, "cell", "left_semi")
        .join(nodes.select("id"), "id", "left_anti")
        .select("id", F.col("x").alias("_x"), F.col("y").alias("_y"), "cell")
    )
    all_records = base_records.unionByName(new_records)

    kernel = _build_kernel(metric_name)
    rebuilt = all_records.groupBy("cell").applyInPandas(kernel, schema=NODE_SCHEMA)

    # crash-ordering (ADVICE r1, medium):
    #   1. write the new generation's node rows (invisible — nothing lists it)
    #   2. append the manifest_compact row  ← THE commit point: readers now
    #      resolve touched cells to this generation (load_nodes shadows any
    #      older copy per cell, sources/index.py)
    #   3. clear the delta (re-application before this is idempotent, above)
    #   4. GC: strip touched cells from older generations — pure space
    #      reclamation; a crash mid-GC leaves shadowed rows, never data loss
    gen = int(time.time() * 1000)
    b = f"compact{gen}"
    rebuilt.write.mode("overwrite").parquet(f"{path}/nodes/batch={b}")
    n_new = spark.read.parquet(f"{path}/nodes/batch={b}").count()
    row = spark.createDataFrame(
        [(b, batches, res, metric_name, n_new, 0.0, 0.0)],
        "batch string, batches int, res int, metric string, n_nodes long, "
        "wall_s double, rows_per_sec double",
    )
    # manifest batch ids are ints for build batches; compactions use a string
    # id in a sibling manifest so completed_batches stays int-typed
    row.write.mode("append").parquet(f"{path}/manifest_compact")
    _clear_delta(spark, path)

    # GC pass: rewrite every OLDER generation without the touched cells
    from metric_search_spark.sources.index import compaction_batches

    olds = [str(x) for x in sorted(completed_batches(spark, path))]
    olds += [x for x in compaction_batches(spark, path) if x != b]
    for old in olds:
        part = spark.read.parquet(f"{path}/nodes/batch={old}")
        kept = part.join(touched, "cell", "left_anti")
        kept.write.mode("overwrite").parquet(f"{path}/nodes/batch={old}__tmp")
    for old in olds:
        _replace_dir(spark, f"{path}/nodes/batch={old}__tmp", f"{path}/nodes/batch={old}")
    # drop any cached file listings for the replaced directories
    spark.catalog.refreshByPath(f"{path}/nodes")
    for old in olds:
        spark.catalog.refreshByPath(f"{path}/nodes/batch={old}")
    touched.unpersist()
    return n_touched


def _replace_dir(spark: SparkSession, src: str, dst: str) -> None:
    import shutil

    shutil.rmtree(dst, ignore_errors=True)
    shutil.move(src, dst)


def _clear_delta(spark: SparkSession, path: str) -> None:
    import shutil

    shutil.rmtree(f"{path}/delta", ignore_errors=True)


def stream_into_index(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    trigger_available_now: bool = True,
):
    """Structured Streaming writer: micro-batches append to the delta log;
    the stream checkpoint makes ingestion resumable (killed stream restarts
    from the last committed batch)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_delta(batch_df, path, id_col=id_col, x_col=x_col, y_col=y_col)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
