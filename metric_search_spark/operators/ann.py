"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force cosine top-k as the exactness baseline —
  a relational cross/broadcast join + window, all JVM-side Column math.
  The reference's Cosine "distance" returns SIMILARITY (Standards.cpp:84-96
  quirk), so ranking is DESCENDING similarity.
- ``l2_topk``: same shape for Euclidean.
- The scale path for L2 is the cell-partitioned exact kNN join
  (operators/joins.py — IVF-style coarse quantization via Morton cells with
  per-probe escalation). For cosine at scale, normalize vectors first: top-k
  by cosine == top-k by L2 on the unit sphere, so the same join applies
  (cosine = 1 − d²/2 after normalization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metric_search_spark.functions.vector import cosine_sim_col, l2_dist_col

__all__ = ["cosine_topk", "l2_topk"]


def _topk_join(
    probes: DataFrame,
    build: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    probe_id_col: str | None,
    score_fn,
    ascending: bool,
) -> DataFrame:
    pid = probe_id_col or id_col
    a = probes.select(
        F.col(pid).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_va")
    )
    b = build.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    )
    scored = a.join(F.broadcast(b)).select(
        "query_id",
        "neighbor_id",
        score_fn(F.col("_va"), F.col("_vb")).alias("score"),
    )
    order = (F.col("score").asc() if ascending else F.col("score").desc(), F.col("neighbor_id").asc())
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def cosine_topk(
    probes: DataFrame,
    build: DataFrame,
    k: int = 10,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    probe_id_col: str | None = None,
) -> DataFrame:
    """Top-k most-similar by cosine SIMILARITY (descending — reference quirk).
    Returns (query_id, neighbor_id, score, rank)."""
    return _topk_join(
        probes, build, k, id_col, vec_col, probe_id_col, cosine_sim_col, ascending=False
    )


def l2_topk(
    probes: DataFrame,
    build: DataFrame,
    k: int = 10,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    probe_id_col: str | None = None,
) -> DataFrame:
    """Brute-force L2 top-k (ascending). Baseline/oracle shape; the scale
    path is operators.joins.knn_join."""
    return _topk_join(
        probes, build, k, id_col, vec_col, probe_id_col, l2_dist_col, ascending=True
    )
