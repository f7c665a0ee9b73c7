"""KMV (k-minimum-values) distinct-count sketch.

The task brief's "novel sketch" slot: approx_count_distinct (HLL) is built
in, but its register layout is engine-private — useless when the estimate
must be auditable, mergeable across systems, or oracle-checkable. KMV
(Bar-Yossef et al. 2002) is the transparent alternative: per group keep the
k SMALLEST hash values of the distinct inputs; the k-th smallest, as a
fraction of hash space, estimates density → n̂ = (k−1)·M / h₍ₖ₎ (the
standard unbiased estimator, relative stderr ≈ 1/√(k−2)). Every part is
deterministic integer arithmetic on the shared MINSTD hash
(operators/sampling.hash_col), so a DuckDB twin reproduces the sketch AND
the estimate bit-for-bit — which no HLL can offer.

Scale shape: hash → distinct (group, hv) → per-group window rank ≤ k. The
distinct is one shuffle on (group, hv); the rank ≤ k filter triggers
WindowGroupLimit (map-side top-k), so a 10⁹-distinct group moves O(k·tasks)
rows to its reducer. Sketches MERGE by union + re-rank (k smallest of the
union) — the lattice property that lets per-partition / per-day sketches
roll up without touching raw data (pinned exact in tests/test_sketch.py).

Collisions: distinct-by-hash (two values colliding count once) — the
textbook KMV convention, identical in the twin, error absorbed in the
estimator's variance at M = 2³¹−1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metric_search_spark.operators.sampling import _M, hash_col, sample_hash_sql

__all__ = ["kmv_sketch", "kmv_merge", "kmv_estimate", "kmv_estimate_sql"]


def _topk(hv: DataFrame, groups: list[str], k: int) -> DataFrame:
    w = Window.partitionBy(*groups).orderBy(F.col("hv").asc())
    return (
        hv.withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") <= k)
        .drop("_rnk")
    )


def kmv_sketch(
    df: DataFrame,
    groups: list[str],
    value_col: str,
    k: int = 64,
    *,
    seed: int = 0,
) -> DataFrame:
    """Sketch rows (groups..., hv): the ≤k smallest MINSTD hashes of the
    distinct ``value_col`` values per group. ``value_col`` must be a
    non-negative integer column (the cross-engine hash contract)."""
    if k < 2:
        raise ValueError(f"k {k} must be >= 2 (the estimator divides by k-1)")
    hv = df.select(
        *groups, hash_col(F.col(value_col), seed).alias("hv")
    ).distinct()
    return _topk(hv, groups, k)


def kmv_merge(a: DataFrame, b: DataFrame, groups: list[str], k: int) -> DataFrame:
    """Union two sketches and re-take the k smallest per group — the
    lattice merge: kmv_merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    exactly (not approximately), because the k smallest of a union are a
    subset of each side's k smallest."""
    return _topk(a.unionByName(b).distinct(), groups, k)


def kmv_estimate(sk: DataFrame, groups: list[str], k: int) -> DataFrame:
    """(groups..., n_kept, kth_hash, est_distinct) from sketch rows. A group
    holding fewer than k hashes saw ALL its distinct values — the sketch IS
    the exact answer; otherwise n̂ = (k−1)·M / h₍ₖ₎. One exact-int aggregate
    + one double division, so the twin matches bit-for-bit."""
    return sk.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("hv").alias("kth_hash"),
    ).select(
        *groups,
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(float(_M)) / F.col("kth_hash"))
        .alias("est_distinct"),
    )


def kmv_estimate_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    k: int,
    seed: int = 0,
    group_name: str = "g",
) -> str:
    """The full DuckDB twin: hash → distinct → per-group top-k → estimate,
    with the same integers and the same single double division."""
    h = sample_hash_sql(value_expr, seed)
    return f"""
WITH hv AS (
  SELECT DISTINCT {group_expr} AS g, {h} AS hv FROM {table}
), r AS (
  SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv) AS rnk FROM hv
), kept AS (
  SELECT g, hv FROM r WHERE rnk <= {k}
)
SELECT g AS {group_name}, CAST(count(*) AS BIGINT) AS n_kept,
       max(hv) AS kth_hash,
       CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
            ELSE {float(k - 1)} * {float(_M)} / max(hv) END AS est_distinct
FROM kept GROUP BY g
"""
