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

from metric_search_spark.functions.vector import cosine_sim_col, dot_col, l2_dist_col

__all__ = ["cosine_topk", "l2_topk", "cosine_topk_lsh"]


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


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    """Deterministic random hyperplanes (counter-hashed gaussians via
    Box-Muller over splitmix64 — no global RNG state, reproducible across
    executors)."""
    import math

    from metric_search_spark.sources.synth import _hash_u01

    import numpy as np

    planes = []
    for b in range(n_bits):
        u1 = _hash_u01(np.arange(dim), salt=2 * b, seed=seed)
        u2 = _hash_u01(np.arange(dim), salt=2 * b + 1, seed=seed)
        g = np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-12))) * np.cos(2 * math.pi * u2)
        planes.append([float(v) for v in g])
    return planes


def cosine_topk_lsh(
    probes: DataFrame,
    build: DataFrame,
    k: int = 10,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    probe_id_col: str | None = None,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k at scale: random-hyperplane LSH (sign-bit
    signatures, banded) generates candidates via an equi-join on band
    segments, then exact cosine re-ranks. Recall grows with bands (any pair
    agreeing on one full band meets); no |build|×|probes| product — the
    shuffle key is the band signature. Returns
    (query_id, neighbor_id, score, rank) like cosine_topk."""
    from pyspark.sql import Window

    planes = _hyperplanes(
        len(build.select(vec_col).first()[0]), n_bits, seed
    )
    seg = n_bits // bands
    assert seg * bands == n_bits

    def sig_cols(df: DataFrame, ident: str) -> DataFrame:
        v = F.col(vec_col).cast("array<double>")
        bits = [
            (dot_col(v, F.array(*[F.lit(c) for c in plane])) > 0).cast("int")
            for plane in planes
        ]
        out = df.select(
            F.col(probe_id_col or id_col if ident == "query_id" else id_col).alias(
                ident
            ),
            v.alias(f"_v_{ident}"),
            *[
                F.concat_ws(
                    "", *[b.cast("string") for b in bits[band * seg : (band + 1) * seg]]
                ).alias(f"_band{band}")
                for band in range(bands)
            ],
        )
        return out.select(
            ident,
            f"_v_{ident}",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.col(f"_band{band}").alias("sig"),
                        )
                        for band in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select(ident, f"_v_{ident}", "bk.band", "bk.sig")

    a = sig_cols(probes, "query_id")
    b = sig_cols(build, "neighbor_id")
    cand = a.join(b, ["band", "sig"]).select(
        "query_id", "neighbor_id", "_v_query_id", "_v_neighbor_id"
    ).distinct()
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_sim_col(F.col("_v_query_id"), F.col("_v_neighbor_id")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
