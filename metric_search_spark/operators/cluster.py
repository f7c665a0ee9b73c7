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
    method: str = "arrow",
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
    L·D rows out); assignment then runs one of two parity-pinned paths
    (tests/test_nearest_centroid.py):

    - ``method="arrow"`` (default): the tiny (L, D) sums/counts broadcast
      into ONE mapInPandas kernel that evaluates all L distances per
      Arrow batch in numpy int64 — no exploded rows×dims×labels
      intermediate, no shuffle after the centroid fit. Exactness needs
      every |n_c·ix| and |s_c| < 2²⁷ (so no term of the expanded
      int64 algebra can wrap); the kernel CHECKS the bound from the actual centroid state
      and raises with the fix (lower scale_bits or method="relational").
    - ``method="relational"``: the exploded broadcast-join + decimal(38,0)
      reduce — ~2³⁰ wider envelope, same exact integers, the DuckDB-twin
      shape.

    Returns (id, label, pred, dist) per vector; argmin ties break by
    label.
    """
    if method not in ("arrow", "relational"):
        raise ValueError(f"nearest_centroid: unknown method {method!r}")
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
    if method == "arrow":
        out = _nearest_centroid_arrow(
            df, cent, id_col=id_col, label_col=label_col, vec_col=vec_col,
            scale_bits=scale_bits,
        )
        if out is not None:
            return out
        # envelope tripped (big per-label counts × scale): fall through to
        # the decimal path, which carries ~2³⁰ more headroom
    dec = "decimal(38,0)"
    diff = F.col("nc") * F.col("ix") - F.col("sc")
    # square in DECIMAL, not long — diff itself must fit int64 (n_c·ix),
    # but diff² may not; the exact decimal product keeps the wide envelope
    # this path exists for
    dsq = diff.cast(dec) * diff.cast(dec)
    dist2 = (
        comps.join(F.broadcast(cent), "d")
        .groupBy("id", "label", "clabel", "nc")
        .agg(F.sum(dsq).alias("ss"))
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


def _nearest_centroid_arrow(
    df: DataFrame,
    cent: DataFrame,
    *,
    id_col: str,
    label_col: str,
    vec_col: str,
    scale_bits: int,
) -> DataFrame:
    """Arrow assignment path: collect the tiny (L, D) centroid state,
    broadcast it, and evaluate every label's EXACT integer distance per
    batch — identical integers (and therefore identical doubles) to the
    relational/decimal path. The int64 wrap bound (|n·ix|, |s| < 2²⁷,
    D ≤ 64) is decided DRIVER-SIDE from the actual centroid state plus one
    max-|component| aggregate; returns None when it trips so the caller
    degrades to the decimal path instead of failing mid-job. The kernel
    keeps a belt-and-braces re-check."""
    import numpy as np
    import pandas as pd

    rows = cent.collect()
    if not rows:
        return None  # empty input: the relational path returns empty cleanly
    labels = sorted({r["clabel"] for r in rows})
    lidx = {l: i for i, l in enumerate(labels)}
    dim = max(r["d"] for r in rows) + 1
    S = np.zeros((len(labels), dim), dtype=np.int64)
    N = np.zeros(len(labels), dtype=np.int64)
    for r in rows:
        S[lidx[r["clabel"]], r["d"]] = r["sc"]
        N[lidx[r["clabel"]]] = r["nc"]
    s = float(1 << scale_bits)
    spark = df.sparkSession
    # driver-side envelope decision: worst |n_c·ix − s_c| from the true
    # max component magnitude (one in-array fold, cheap single pass)
    max_ix = (
        df.agg(
            F.max(
                F.aggregate(
                    F.transform(
                        F.col(vec_col).cast("array<double>"),
                        lambda v: F.abs(F.floor(v * F.lit(s)).cast("long")),
                    ),
                    F.lit(0).cast("long"),
                    lambda a, x: F.greatest(a, x),
                )
            )
        ).collect()[0][0]
        or 0
    )
    worst = int(N.max()) * int(max_ix) + int(np.abs(S).max())
    if worst >= (1 << 27) or dim > 64:
        return None
    bS, bN, bL = (
        spark.sparkContext.broadcast(S),
        spark.sparkContext.broadcast(N),
        spark.sparkContext.broadcast(np.asarray(labels)),
    )
    qt = df.schema[id_col].dataType.simpleString()
    lt = df.schema[label_col].dataType.simpleString()
    out_schema = f"{id_col} {qt}, {label_col} {lt}, pred {lt}, dist double"

    def assign(batches):
        Sv, Nv, Lv = bS.value, bN.value, bL.value
        inv = 1.0 / float(1 << (2 * scale_bits))
        # expanded form: ss[b,c] = N_c²·Σix² − 2N_c·(ix·s_c) + Σs_c² — one
        # (b, L) int64 matmul instead of the (L, b, D) diff tensor (which
        # is D× the memory and killed 4096-label runs); every term is
        # < 2^61 under the driver-checked |n·ix|,|s| < 2^27 bound, D ≤ 64,
        # so the int64 algebra is exact
        r_c = np.einsum("ld,ld->l", Sv, Sv)  # (L,)
        n2 = Nv * Nv
        # TRUE division by n² (a reciprocal-multiply differs in the last
        # ulp for non-power-of-2 n and broke bit-parity with the decimal
        # path); the 2^-2s un-scale IS exact as a multiply
        n2f = n2.astype(np.float64)
        CH = 2048  # rows per block: (CH, L) int64 stays tens of MB
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            ix = np.floor(X * s).astype(np.int64)  # (b, D)
            lim = max(
                int(Nv.max()) * int(np.abs(ix).max(initial=0))
                + int(np.abs(Sv).max(initial=0)),
                1,
            )
            if lim >= (1 << 27) or ix.shape[1] > 64:
                raise ValueError(
                    "nearest_centroid arrow path would overflow int64 "
                    f"(worst |n·ix|+|s| {lim} >= 2^27 or dim "
                    f"{ix.shape[1]} > 64): lower scale_bits or use "
                    "method='relational'"
                )
            preds = np.empty(len(pdf), dtype=Lv.dtype)
            dists = np.empty(len(pdf), dtype=np.float64)
            for lo in range(0, len(pdf), CH):
                blk = ix[lo : lo + CH]  # (c, D)
                q = np.einsum("bd,bd->b", blk, blk)  # (c,)
                P = blk @ Sv.T  # (c, L) int64 exact
                ss = n2[None, :] * q[:, None] - 2 * Nv[None, :] * P + r_c[None, :]
                dist = ss.astype(np.float64) / n2f[None, :] * inv
                best = np.argmin(dist, axis=1)  # lowest label wins ties
                preds[lo : lo + CH] = Lv[best]
                dists[lo : lo + CH] = dist[np.arange(len(blk)), best]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    label_col: pdf[label_col],
                    "pred": preds,
                    "dist": dists,
                }
            )

    return df.select(id_col, label_col, vec_col).mapInPandas(
        assign, schema=out_schema
    )
