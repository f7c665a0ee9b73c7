"""Checkpointed per-cell cover-tree index: build / resume / probe / verify.

The reference keeps ONE mutable in-memory cover tree (details/tree.hpp:53-236)
and serializes it as a pre-order node stream (details/tree.cpp:1014-1080).
This engine's index is **partition-parallel**: one immutable cover tree per
Morton cell, built inside ``applyInPandas`` and flattened to a node table
(the same field set the reference serializes — base/level/parent_dist/ID/data,
tree.cpp:143-147 — plus parent/child-position links replacing pointers).

Layout under ``path/``:

    nodes/batch=<i>/...parquet   per-cell node rows for one cell-range batch
    lineage/batch=<i>/...        per-cell build metrics (rows, nodes,
                                 max_level, build_ms, task lineage)
    manifest/...                 one row per COMPLETED batch (cell range,
                                 counts, wall ms)

**Resumability (north rule)**: the cell space is split into ``batches``
contiguous Morton prefix ranges; each batch commits atomically (Spark job
commit) and then appends its manifest row. A killed job resumes by
anti-joining the manifest against the batch list — only incomplete cell
ranges are rebuilt. Per-partition lineage + throughput metrics are first-class
outputs, not logs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_search_spark.core.covertree import CoverTree
from metric_search_spark.core.metrics import get_metric
from metric_search_spark.functions.spatial import with_xy_cell
from metric_search_spark.operators.joins import _clamp01

NODE_SCHEMA = (
    "cell long, node_id int, parent_id int, child_pos int, level int, "
    "parent_dist double, sub_radius double, rec_id long, id long, "
    "vx double, vy double"
)

LINEAGE_SCHEMA = (
    "cell long, n_rows long, n_nodes long, max_level int, min_level int, "
    "build_ms double, covering_ok boolean"
)


@dataclass
class IndexInfo:
    path: str
    res: int
    batches: int
    metric: str


def _batch_col(cell: F.Column, res: int, batches: int) -> F.Column:
    """Contiguous Morton-prefix range id in [0, batches): the 'cell range'
    unit of resumability.

    Pure integer arithmetic — floor(prefix·batches / 2^(2res)) via shift
    (ADVICE r1: the double form loses precision past 2^53 at res≥27 and
    could round the top prefixes to an out-of-range batch id, silently
    dropping rows from the index); clamped defensively to batches−1."""
    prefix = cell.bitwiseAND(F.lit((1 << 56) - 1))
    if batches > (1 << 62 - 2 * res):
        raise ValueError(f"batches={batches} overflows prefix math at res={res}")
    b = F.shiftright(prefix * F.lit(batches), 2 * res).cast("int")
    return F.least(b, F.lit(batches - 1))


def _build_kernel(metric_name: str):
    metric = get_metric(metric_name)

    def fn(key, pdf):
        import numpy as np
        import pandas as pd

        t0 = time.time()
        pdf = pdf.sort_values("id", kind="mergesort")  # deterministic insert order
        pts = np.column_stack(
            (pdf["_x"].to_numpy(np.float64), pdf["_y"].to_numpy(np.float64))
        )
        tree = CoverTree(metric)
        tree.insert_batch(list(pts))
        rows = tree.to_rows()
        ids = pdf["id"].to_numpy()
        out = pd.DataFrame(
            {
                "cell": np.int64(key[0]),
                "node_id": np.asarray([r["node_id"] for r in rows], dtype=np.int32),
                "parent_id": np.asarray(
                    [r["parent_id"] for r in rows], dtype=np.int32
                ),
                "child_pos": np.asarray(
                    [r["child_pos"] for r in rows], dtype=np.int32
                ),
                "level": np.asarray([r["level"] for r in rows], dtype=np.int32),
                "parent_dist": [r["parent_dist"] for r in rows],
                "sub_radius": [r["sub_radius"] for r in rows],
                "rec_id": np.asarray([r["rec_id"] for r in rows], dtype=np.int64),
                # rec_id == insertion position == position in the id-sorted pdf
                "id": ids[[r["rec_id"] for r in rows]],
                "vx": [float(r["data"][0]) for r in rows],
                "vy": [float(r["data"][1]) for r in rows],
            }
        )
        _ = t0
        return out

    return fn


def _lineage_from_nodes(nodes: DataFrame) -> DataFrame:
    return nodes.groupBy("cell").agg(
        F.count("*").alias("n_nodes"),
        F.count("*").alias("n_rows"),
        F.max("level").alias("max_level"),
        F.min("level").alias("min_level"),
    )


def build_index(
    df: DataFrame,
    path: str,
    *,
    res: int,
    batches: int = 8,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    metric: str = "euclidean",
    stop_after: int | None = None,
) -> IndexInfo:
    """Build (or RESUME building) the per-cell tree index at ``path``.

    ``stop_after`` limits how many incomplete batches this invocation builds
    (used by the kill/resume tests to simulate a job dying mid-run; a real
    kill between batch commits leaves the same state).
    """
    spark = df.sparkSession
    prepared = with_xy_cell(
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(x_col).cast("double").alias("_x"),
            F.col(y_col).cast("double").alias("_y"),
        ),
        _clamp01(F.col("_x")),
        _clamp01(F.col("_y")),
        res,
    ).withColumn("batch", _batch_col(F.col("cell"), res, batches))

    done = completed_batches(spark, path)
    todo = [b for b in range(batches) if b not in done]
    if stop_after is not None:
        todo = todo[:stop_after]

    # Stage the prepared projection ONCE, partitioned by batch. Three wins:
    # (1) one source scan for all N batch builds instead of N (at 10⁹ rows
    # the per-batch re-scan was the dominant build cost); (2) the per-batch
    # filter becomes partition PRUNING on a directory column — without the
    # stage, predicate pushdown re-inlined the full quantize+interleave cell
    # tree into the scan Filter and pushed the fused stage past Janino's
    # 64 KB method limit ('Code grows beyond 64 KB'), silently dropping the
    # whole build stage to interpreted execution; (3) resume after a kill
    # reuses the staged table (job-commit _SUCCESS marker) — no rescan.
    staged_path = f"{path}/staged"
    staged = None
    if todo:
        import os as _os

        if not _os.path.exists(f"{staged_path}/_SUCCESS"):
            prepared.write.mode("overwrite").partitionBy("batch").parquet(
                staged_path
            )
        try:
            staged = spark.read.parquet(staged_path)
        except Exception:  # noqa: BLE001 — empty input stages no files
            staged = None

    kernel = _build_kernel(metric)
    for b in todo:
        t0 = time.time()
        src_b = staged if staged is not None else prepared
        part = src_b.where(F.col("batch") == b)
        nodes = part.groupBy("cell").applyInPandas(kernel, schema=NODE_SCHEMA)
        nodes.write.mode("overwrite").parquet(f"{path}/nodes/batch={b}")
        built = spark.read.parquet(f"{path}/nodes/batch={b}")
        lineage = _lineage_from_nodes(built).withColumn(
            "build_ms", F.lit(round((time.time() - t0) * 1000.0, 1))
        )
        lineage.write.mode("overwrite").parquet(f"{path}/lineage/batch={b}")
        wall = time.time() - t0
        n_nodes = built.count()
        manifest_row = spark.createDataFrame(
            [
                (
                    int(b),
                    int(batches),
                    int(res),
                    metric,
                    int(n_nodes),
                    float(round(wall, 3)),
                    float(round(n_nodes / wall, 1)) if wall > 0 else 0.0,
                )
            ],
            "batch int, batches int, res int, metric string, n_nodes long, "
            "wall_s double, rows_per_sec double",
        )
        # the manifest append is the commit point for the batch
        manifest_row.write.mode("append").parquet(f"{path}/manifest")
    return IndexInfo(path=path, res=res, batches=batches, metric=metric)


def completed_batches(spark: SparkSession, path: str) -> set[int]:
    try:
        rows = spark.read.parquet(f"{path}/manifest").select("batch").collect()
        return {r["batch"] for r in rows}
    except Exception:  # noqa: BLE001 — no manifest yet
        return set()


def index_meta(spark: SparkSession, path: str) -> tuple[int, int, str]:
    row = spark.read.parquet(f"{path}/manifest").select(
        "res", "batches", "metric"
    ).first()
    return row["res"], row["batches"], row["metric"]


def compaction_batches(spark: SparkSession, path: str) -> list[str]:
    """Generation batches written by streaming.incremental.compact_index,
    ordered by their NUMERIC generation id — lexicographic name order would
    invert shadowing the day generation ids change digit count."""
    try:
        rows = (
            spark.read.parquet(f"{path}/manifest_compact").select("batch").collect()
        )
    except Exception:  # noqa: BLE001 — no compactions yet
        return []

    def gen_key(name: str):
        tail = name.removeprefix("compact")
        return (0, int(tail)) if tail.isdigit() else (1, name)

    return sorted({r["batch"] for r in rows}, key=gen_key)


def recover_node_dirs(path: str) -> None:
    """Crash recovery for compact_index's GC directory swaps (local paths
    only; object-store paths never reach the swap — compact_index refuses
    them). For every ``batch=X``: a leftover ``__old`` with ``X`` present
    is post-swap garbage (delete); ``__old`` with ``X`` MISSING means the
    crash hit between the two renames — restore the new copy (``__tmp``)
    if it exists, else the old one. Stray ``__tmp`` with ``X`` present is
    an unswapped rewrite (delete; the next compaction redoes it)."""
    import os
    import shutil

    nodes_dir = f"{path}/nodes"
    if "://" in path or not os.path.isdir(nodes_dir):
        return
    entries = set(os.listdir(nodes_dir))
    for e in sorted(entries):
        if e.endswith("__old"):
            final = e[: -len("__old")]
            tmp = final + "__tmp"
            if final in entries:
                shutil.rmtree(f"{nodes_dir}/{e}", ignore_errors=True)
            elif tmp in entries:
                os.rename(f"{nodes_dir}/{tmp}", f"{nodes_dir}/{final}")
                shutil.rmtree(f"{nodes_dir}/{e}", ignore_errors=True)
            else:
                os.rename(f"{nodes_dir}/{e}", f"{nodes_dir}/{final}")
        elif e.endswith("__tmp"):
            final = e[: -len("__tmp")]
            if final in entries:
                shutil.rmtree(f"{nodes_dir}/{e}", ignore_errors=True)


def load_nodes(spark: SparkSession, path: str) -> DataFrame:
    """Node rows of all COMPLETED batches (+ compaction generations).

    **Generation shadowing**: a cell present in several generations resolves
    to its NEWEST one (build batches are generation 0; compaction batches
    order by their manifest id). This is what makes compaction crash-safe:
    the manifest_compact append is the commit point, and un-GC'd older
    copies of a rebuilt cell are simply shadowed until the directory rewrite
    finishes (streaming.incremental.compact_index). The shadowing max() is
    per-cell and Catalyst keeps it a single hash aggregate + join — at scale
    the steady state has exactly one generation per cell, so the anti-join
    side is tiny."""
    recover_node_dirs(path)  # heal any crash-interrupted GC swap first
    builds = [str(b) for b in sorted(completed_batches(spark, path))]
    gens = compaction_batches(spark, path)
    if not builds and not gens:
        raise ValueError(
            f"load_nodes: no completed batches or compaction generations at "
            f"{path!r} — index empty or manifest missing"
        )
    parts = [
        spark.read.parquet(f"{path}/nodes/batch={b}").withColumn(
            "_gen", F.lit(0)
        )
        for b in builds
    ]
    for i, g in enumerate(gens):
        parts.append(
            spark.read.parquet(f"{path}/nodes/batch={g}").withColumn(
                "_gen", F.lit(i + 1)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if not gens:
        return out.drop("_gen")
    newest = out.groupBy("cell").agg(F.max("_gen").alias("_gen"))
    return out.join(newest, ["cell", "_gen"]).drop("_gen")


def load_lineage(spark: SparkSession, path: str) -> DataFrame:
    done = sorted(completed_batches(spark, path))
    parts = [spark.read.parquet(f"{path}/lineage/batch={b}") for b in done]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def verify_index(spark: SparkSession, path: str) -> DataFrame:
    """Per-cell invariant check on the checkpointed trees (reference
    check_covering, tree.cpp:842-870, plus nesting): returns one row per cell
    with boolean flags; all-true == healthy index."""
    res, _, metric_name = index_meta(spark, path)
    nodes = load_nodes(spark, path)
    metric = get_metric(metric_name)

    def fn(key, pdf):
        import pandas as pd

        tree = _tree_from_pdf(pdf, metric)
        return pd.DataFrame(
            {
                "cell": [int(key[0])],
                "covering_ok": [tree.check_covering()],
                "nesting_ok": [tree.check_nesting()],
                "n_nodes": [len(pdf)],
            }
        )

    return nodes.groupBy("cell").applyInPandas(
        fn, schema="cell long, covering_ok boolean, nesting_ok boolean, n_nodes long"
    )


def _tree_from_pdf(pdf, metric) -> CoverTree:
    import numpy as np

    rows = [
        {
            "node_id": int(r.node_id),
            "parent_id": int(r.parent_id),
            "child_pos": int(r.child_pos),
            "level": int(r.level),
            "parent_dist": float(r.parent_dist),
            "sub_radius": float(r.sub_radius),
            "rec_id": int(r.rec_id),
            "data": np.array([r.vx, r.vy]),
        }
        for r in pdf.itertuples()
    ]
    return CoverTree.from_rows(rows, metric)


def knn_probe_index(
    probes: DataFrame,
    path: str,
    k: int = 10,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """kNN against the CHECKPOINTED index: probes route to their cell's
    k-ring of stored trees (reconstructed per partition from the node table),
    each tree answers with the reference's knn_ descent
    (core/covertree.py:knn, pruning per tree.cpp:658-690), and a window
    merges the per-tree lists. Returns (query_id, neighbor_id, dist, rank).

    Exactness: same ring-guarantee logic as joins.knn_join; unresolved
    probes re-run with the ring doubled against the same stored trees.
    """
    from pyspark.sql import Window

    from metric_search_spark.functions.spatial import kring_cells_col
    from metric_search_spark.operators.joins import _guarantee_col

    spark = probes.sparkSession
    res, _, metric_name = index_meta(spark, path)
    # the ring-guarantee verdict compares the kth distance against a raw L2
    # edge distance on the 2-D coords (_guarantee_col): only metrics that
    # dominate L2 one-to-one make that sound. Reject anything else instead
    # of returning silently inexact results (ADVICE r1, low) — notably
    # cosine, which is a SIMILARITY under the preserved reference quirk.
    if metric_name not in ("euclidean",):
        raise ValueError(
            f"knn_probe_index ring guarantee requires an L2-dominating "
            f"metric on the stored coords; index at {path!r} was built with "
            f"{metric_name!r} — rebuild with 'euclidean' or probe via "
            f"operators.joins.knn_join with an explicit coord_scale"
        )
    metric = get_metric(metric_name)
    nodes = load_nodes(spark, path).persist()
    grid_n = 1 << res

    probes_c = with_xy_cell(
        probes.select(
            F.col(id_col).cast("long").alias("_id"),
            F.col(x_col).cast("double").alias("_x"),
            F.col(y_col).cast("double").alias("_y"),
        ),
        _clamp01(F.col("_x")),
        _clamp01(F.col("_y")),
        res,
        out="_cell",
    ).persist()

    def fn(key, probe_pdf, node_pdf):
        import numpy as np
        import pandas as pd

        if len(probe_pdf) == 0 or len(node_pdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "dist": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "dist": "float64"})
        tree = _tree_from_pdf(node_pdf, metric)
        ids = node_pdf["id"].to_numpy()
        qs, ns, ds = [], [], []
        P = np.column_stack(
            (probe_pdf["_x"].to_numpy(np.float64), probe_pdf["_y"].to_numpy(np.float64))
        )
        pids = probe_pdf["_id"].to_numpy()
        for i in range(len(P)):
            for node, dist in tree.knn(P[i], k=k, prune="safe"):
                qs.append(int(pids[i]))
                ns.append(int(ids[node]))
                ds.append(float(dist))
        return pd.DataFrame({"query_id": qs, "neighbor_id": ns, "dist": ds})

    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    done_parts = []
    round_caches: list[DataFrame] = []
    unresolved = probes_c
    ring = 1
    try:
        while True:
            cand = unresolved.select(
                "_id",
                "_x",
                "_y",
                F.explode(
                    kring_cells_col(F.col("_cell"), res, min(ring, grid_n))
                ).alias("cell"),
            )
            partial = (
                cand.groupBy("cell")
                .cogroup(nodes.groupBy("cell"))
                .applyInPandas(
                    fn, schema="query_id long, neighbor_id long, dist double"
                )
            )
            topk = (
                partial.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .persist()
            )
            round_caches.append(topk)
            if ring >= grid_n:
                done_parts.append(topk)
                break
            per_probe = topk.groupBy("query_id").agg(
                F.count("*").alias("cnt"), F.max("dist").alias("kth")
            )
            geo = unresolved.select(
                F.col("_id").alias("query_id"), "_x", "_y"
            ).withColumn("guar", _guarantee_col(res, ring))
            verdict = geo.join(per_probe, "query_id", "left").select(
                "query_id",
                (
                    # strict <: a kth EXACTLY on the ring's guarantee radius
                    # can tie with an unexplored outside point that wins the
                    # id tie-break (same fix as joins.knn_join)
                    (F.coalesce(F.col("cnt"), F.lit(0)) >= k)
                    & (F.col("kth") < F.col("guar"))
                ).alias("ok"),
            )
            unres_ids = verdict.where(
                ~F.coalesce(F.col("ok"), F.lit(False))
            ).select(F.col("query_id").alias("_id"))
            n_unres = unres_ids.count()
            if n_unres == 0:
                done_parts.append(topk)
                break
            done_parts.append(
                topk.join(
                    unres_ids.select(F.col("_id").alias("query_id")),
                    "query_id",
                    "left_anti",
                )
            )
            unresolved = unresolved.join(unres_ids, "_id", "left_semi")
            ring *= 2
        out = done_parts[0]
        for p in done_parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint(eager=True)
    finally:
        nodes.unpersist()
        probes_c.unpersist()
        # the eager checkpoint above materialized everything the per-round
        # caches fed — release them instead of leaking one per ring round
        for c in round_caches:
            c.unpersist()
