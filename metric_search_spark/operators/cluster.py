"""Density-based clustering (DBSCAN) over 2-D point tables.

The reference's clustering surface is quota clustering over the cover tree
(tree.cpp:1145-1215 — see operators/tiling.cluster_quota); DBSCAN is the
density-clustering counterpart a geospatial tiling engine needs (cluster GPS
points / image centroids into arbitrary-shape regions with noise rejection).

Spark-first decomposition — every stage is an existing cell-partitioned
primitive, nothing is all-pairs:

1. eps-neighborhoods: operators/joins.range_join (Morton-cell halo join —
   candidates only from the ⌈eps/cell⌉-ring, skew-salted) with inclusive
   d ≤ eps, self-pair included (DBSCAN counts the point itself).
2. degree: one groupBy(query_id).count() — map-side combining aggregate.
3. core points: degree ≥ min_pts.
4. cluster cores: connected components over core-core neighbor edges
   (operators/graph.connected_components — large-star/small-star, O(log n)
   rounds); cluster id = min core id in the component.
5. border points: non-core with ≥1 core neighbor join the MINIMUM cluster
   id among their core neighbors. (Classic DBSCAN assigns border points to
   the first-discovered cluster — scan-order dependent; the min rule is the
   deterministic refinement, so results are reproducible under any
   partitioning. Core/noise status is identical to classic DBSCAN.)
6. noise: everything else, cluster = -1.

100 TB shape: the only super-linear risk is a density blob making one cell's
neighbor lists quadratic — inherent to the semantics (those points ARE all
neighbors); range_join's salting spreads the compute. All joins downstream
of (1) are id-equi-joins on (id, long) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metric_search_spark.operators.graph import connected_components
from metric_search_spark.operators.joins import range_join

__all__ = ["dbscan", "kmeans_2d", "nearest_centroid"]


def dbscan(
    pts: DataFrame,
    eps: float,
    min_pts: int,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    res: int | None = None,
    coord_scale: float = 1.0,
    cc_max_rounds: int = 50,
) -> DataFrame:
    """DBSCAN over (id, x, y) points in [0,1)²/coord_scale. Returns
    (id, cluster, role) — cluster is the min core-point id of the cluster
    (-1 for noise), role ∈ {'core','border','noise'}. eps membership is
    INCLUSIVE (d ≤ eps) and the neighborhood count includes the point
    itself, the textbook DBSCAN convention."""
    p = pts.select(
        F.col(id_col).alias("id"), F.col(x_col).alias("x"), F.col(y_col).alias("y")
    )
    nbrs = range_join(
        p,
        p,
        radius=eps,
        vec_col=None,
        x_col="x",
        y_col="y",
        inclusive=True,
        res=res,
        coord_scale=coord_scale,
    )
    # the halo join's probe cache is re-read by the degree agg, the edge
    # build, and the border join below — materialize once, release at end
    nbrs = nbrs.persist()
    try:
        deg = nbrs.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_nbr"))
        core = (
            deg.where(F.col("n_nbr") >= min_pts)
            .select(F.col("query_id").alias("id"))
            .persist()
        )
        core_q = core.select(F.col("id").alias("query_id"))
        core_n = core.select(F.col("id").alias("neighbor_id"))
        core_edges = (
            nbrs.join(core_q, "query_id")
            .join(core_n, "neighbor_id")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst"))
        )
        comp = connected_components(
            core_edges,
            nodes=core.select(F.col("id").alias("node")),
            max_rounds=cc_max_rounds,
        )
        core_lab = comp.select(
            F.col("node").alias("id"),
            F.col("component").alias("cluster"),
            F.lit("core").alias("role"),
        )
        border_lab = (
            nbrs.join(core_n, "neighbor_id")  # keep pairs whose NEIGHBOR is core
            .join(
                comp.select(
                    F.col("node").alias("neighbor_id"),
                    F.col("component").alias("cluster"),
                ),
                "neighbor_id",
            )
            .join(core_q, "query_id", "left_anti")  # drop core probes
            .groupBy("query_id")
            .agg(F.min("cluster").alias("cluster"))
            .select(
                F.col("query_id").alias("id"), "cluster", F.lit("border").alias("role")
            )
        )
        assigned = core_lab.unionByName(border_lab)
        noise_lab = (
            p.select("id")
            .join(assigned.select("id"), "id", "left_anti")
            .select(
                "id",
                F.lit(-1).cast(dict(assigned.dtypes)["cluster"]).alias("cluster"),
                F.lit("noise").alias("role"),
            )
        )
        out = assigned.unionByName(noise_lab)
        # the union re-reads nbrs through three branches — materialize the
        # (small: one row per point) result before releasing the caches
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        getattr(nbrs, "_msk_backing", nbrs).unpersist()
        nbrs.unpersist()
        try:
            core.unpersist()
        except NameError:
            pass


def kmeans_2d(
    points: DataFrame,
    k: int = 8,
    iters: int = 5,
    *,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    seed: int = 0,
    scale: int = 1 << 30,
) -> DataFrame:
    """Deterministic distributed Lloyd k-means on 2-D points. Returns
    (id, cluster) after ``iters`` assignment/update rounds.

    Every source of k-means nondeterminism is pinned:
    - init: the k points with smallest (MINSTD hash(id), id) — the shared
      cross-engine hash, so both engines seed identically (cluster ids =
      that rank order, 1..k);
    - coordinates integer-scale to ⌊x·2³⁰⌋ — cluster SUMS are exact longs
      (order-independent under any partitioning; headroom: 10⁹ rows ×
      2³⁰ < 2⁶³), and the centroid division sum/count runs on identical
      integers in both engines;
    - assignment: argmin of the IEEE-identical dist², ties to the LOWEST
      cluster id (min over (dist², cid) structs);
    - an emptied cluster keeps its previous centroid (the pq_train
      convention).

    Scale shape per iteration: broadcast the k centroids onto the points
    (map-side join, no shuffle), ONE map-side-combined (cluster → sums)
    aggregate of k rows, and a k-row driver collect — the classic Lloyd
    loop; the points table is scanned, never shuffled. The driver query's
    DuckDB twin UNROLLS the iterations as generated CTE pairs
    (assign_i, centroids_i) — the whole algorithm replayed relationally.
    """
    from metric_search_spark.operators.sampling import hash_col

    if k < 1 or iters < 0:
        raise ValueError(f"kmeans_2d: k={k} must be >=1 and iters={iters} >=0")
    spark = points.sparkSession
    pts = points.select(
        F.col(id_col).alias("id"),
        F.floor(F.col(x_col) * F.lit(float(scale))).cast("long").alias("ix"),
        F.floor(F.col(y_col) * F.lit(float(scale))).cast("long").alias("iy"),
    ).persist()
    init = (
        pts.withColumn("_h", hash_col(F.col("id"), seed))
        .orderBy("_h", "id")
        .limit(k)
        .collect()
    )
    if not init:
        pts.unpersist()
        return spark.createDataFrame([], "id long, cluster long")
    cents = [
        (i + 1, float(r["ix"]), float(r["iy"])) for i, r in enumerate(init)
    ]
    try:
        for _ in range(iters):
            cdf = spark.createDataFrame(
                cents, "cid long, cx double, cy double"
            )
            d2 = (
                (F.col("ix") - F.col("cx")) * (F.col("ix") - F.col("cx"))
                + (F.col("iy") - F.col("cy")) * (F.col("iy") - F.col("cy"))
            )
            assigned = (
                pts.crossJoin(F.broadcast(cdf))
                .groupBy("id")
                .agg(
                    F.min(F.struct(d2.alias("d2"), F.col("cid"))).alias("m"),
                    F.first("ix").alias("ix"),
                    F.first("iy").alias("iy"),
                )
                .select("id", F.col("m.cid").alias("cid"), "ix", "iy")
            )
            upd = {
                r["cid"]: (
                    r["sx"] / r["n"],
                    r["sy"] / r["n"],
                )
                for r in assigned.groupBy("cid")
                .agg(
                    F.sum("ix").alias("sx"),
                    F.sum("iy").alias("sy"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            }
            cents = [
                (cid, *upd[cid]) if cid in upd else (cid, cx, cy)
                for (cid, cx, cy) in cents
            ]
        cdf = spark.createDataFrame(cents, "cid long, cx double, cy double")
        d2 = (
            (F.col("ix") - F.col("cx")) * (F.col("ix") - F.col("cx"))
            + (F.col("iy") - F.col("cy")) * (F.col("iy") - F.col("cy"))
        )
        return (
            pts.crossJoin(F.broadcast(cdf))
            .groupBy("id")
            .agg(F.min(F.struct(d2.alias("d2"), F.col("cid"))).alias("m"))
            .select("id", F.col("m.cid").alias("cluster"))
        )
    finally:
        pts.unpersist()


def nearest_centroid(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    scale_bits: int = 16,
) -> DataFrame:
    """Nearest-centroid classification (Rocchio) over an embedding column:
    fit per-label mean centroids, then assign EVERY vector to its nearest
    centroid by L2 — the labeling/QA primitive (find mislabeled examples:
    rows where pred ≠ label) of an embedding-curated training corpus.

    Exactness design: components integer-scale to ⌊v·2ˢ⌋, centroid state
    is the exact (Σ components, n) pair per label, and the squared
    distance to centroid c is computed as the EXACT integer
    Σ_d (n_c·ix_d − s_{c,d})² in decimal(38,0) (DuckDB: HUGEINT) — the
    per-dim reduce is an order-free integer sum, so no float summation
    exists anywhere; the single division by n_c² happens once on identical
    exact values in both engines. Argmin ties break by label.

    Scale shape: ONE posexplode pass builds centroids (map-side combined,
    L·D rows out), the assignment join broadcasts the tiny L·D centroid
    table against the exploded components, and the per-(vector, label)
    reduce is map-side combined on the id key — no all-pairs anything.
    Returns (id, label, pred, dist) per vector.
    """
    s = float(1 << scale_bits)
    comps = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        F.posexplode(
            F.transform(
                F.col(vec_col).cast("array<double>"),
                lambda v: F.floor(v * F.lit(s)).cast("long"),
            )
        ).alias("d", "ix"),
    )
    cent = comps.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.sum("ix").alias("sc"), F.count(F.lit(1)).alias("nc")
    )
    dec = "decimal(38,0)"
    diff = F.col("nc") * F.col("ix") - F.col("sc")
    dist2 = (
        comps.join(F.broadcast(cent), "d")
        .groupBy("id", "label", "clabel", "nc")
        .agg(F.sum((diff * diff).cast(dec)).alias("ss"))
        .select(
            "id",
            "label",
            "clabel",
            # un-scale back to input units: ÷2²ˢ is a power-of-two EXPONENT
            # shift on the identical quotient double, so it stays
            # bit-deterministic AND leaves dist well-conditioned for any
            # downstream decimal rounding (in scaled units dist sits at
            # ~1e10 where 1e-6 is below double resolution)
            (
                F.col("ss").cast("double")
                / (F.col("nc") * F.col("nc")).cast("double")
                / F.lit(float(1 << (2 * scale_bits)))
            ).alias("dist"),
        )
    )
    w = Window.partitionBy("id").orderBy("dist", "clabel")
    return (
        dist2.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(
            F.col("id").alias(id_col),
            F.col("label").alias(label_col),
            F.col("clabel").alias("pred"),
            "dist",
        )
    )
