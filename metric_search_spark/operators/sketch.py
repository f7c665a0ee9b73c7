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


# ---------------------------------------------------------------- HyperLogLog

__all__ += ["hll_sketch", "hll_merge", "hll_estimate", "hll_estimate_sql"]

# Flajolet et al. 2007 bias constants; only the m we expose. αm for m ≥ 128
# is 0.7213/(1 + 1.079/m).
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_rho(hv: Column, b: int) -> Column:
    """ρ = position of the leftmost 1-bit (1-based) of the (31−b)-bit
    suffix w = hv >> b, i.e. (31−b) − bitlength(w) + 1; w = 0 → the
    all-zeros maximum (32−b). bitlength via length(bin(w)) — Spark and
    DuckDB share the minimal-length binary-string convention, so the twin
    is the same expression verbatim."""
    w = F.shiftrightunsigned(hv.cast("long"), b)
    top = 32 - b
    return (
        F.when(w == 0, F.lit(top))
        .otherwise(F.lit(top) - F.length(F.bin(w)))
        .cast("int")
    )


def hll_sketch(
    df: DataFrame,
    groups: list[str],
    value_col: str,
    *,
    b: int = 6,
    seed: int = 0,
) -> DataFrame:
    """HyperLogLog register rows (groups..., bucket, mj) over the shared
    MINSTD hash — the REGISTER sibling of kmv_sketch, made auditable by
    the same cross-engine hash contract (stock HLL register layouts are
    engine-private; approx_count_distinct can never be oracle-checked).

    Scale shape vs KMV: NO distinct pre-shuffle at all — max() is
    idempotent over repeated values, so the sketch is one partial
    aggregate (map-side combine emits ≤ 2^b register rows per task per
    group) regardless of duplication. A 10⁹-row group costs one pass and
    ships 2^b·tasks rows. ``value_col`` must be a non-negative integer
    column (the hash contract, as kmv_sketch)."""
    m = 1 << b
    if m not in _HLL_ALPHA:
        raise ValueError(f"b={b} not supported; pick m=2^b in {sorted(_HLL_ALPHA)}")
    hv = hash_col(F.col(value_col), seed)
    return (
        df.select(
            *groups,
            (hv % m).cast("int").alias("bucket"),
            _hll_rho(hv, b).alias("mj"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("mj").alias("mj"))
    )


def hll_merge(a: DataFrame, b_: DataFrame, groups: list[str]) -> DataFrame:
    """Register-wise max — the HLL lattice merge: hll_merge(sketch(A),
    sketch(B)) == sketch(A ∪ B) exactly (max is associative/idempotent),
    the roll-up property for per-partition / per-day sketches."""
    return (
        a.unionByName(b_)
        .groupBy(*groups, "bucket")
        .agg(F.max("mj").alias("mj"))
    )


def hll_estimate(sk: DataFrame, groups: list[str], *, b: int = 6) -> DataFrame:
    """(groups..., v_zeros, sum_scaled, est_distinct) from register rows.

    Exactness discipline: Σ 2^(−mj) is carried as the INTEGER
    sum_scaled = Σ 2^(top−mj) (+ v·2^top for absent registers), because
    every term is a dyadic rational — the scaled sum is exact int64 and
    order-free, so both engines divide the same two numbers. Small-range
    (linear-counting) correction m·ln(m/v) applies when raw ≤ 2.5m and
    zeros exist; its ln input set is FINITE (m/v, v = 1..m), and Spark ↔
    DuckDB ln parity over the whole set is pinned in tests/test_sketch.py
    — the round(9) is belt-and-braces on top."""
    m = 1 << b
    top = 32 - b
    alpha = _HLL_ALPHA[m]
    agg = sk.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("_present"),
        # shiftleft's python wrapper wants a literal shift — spell the
        # column-shift in SQL (2^(top−mj) is exact int64 for mj ≤ top)
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {top} - mj)")).alias("_s2"),
    )
    v = (F.lit(m) - F.col("_present")).cast("long")
    s2 = F.col("_s2") + v * F.lit(1 << top).cast("long")
    raw = (
        F.lit(alpha * m * m * float(1 << top)) / s2.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *groups,
        v.alias("v_zeros"),
        s2.alias("sum_scaled"),
        F.round(est, 9).alias("est_distinct"),
    )


def hll_estimate_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    *,
    b: int = 6,
    seed: int = 0,
    group_name: str = "g",
) -> str:
    """The full DuckDB twin: hash → register max → scaled-integer sum →
    the same two-branch estimator (verbatim expressions)."""
    m = 1 << b
    top = 32 - b
    alpha = _HLL_ALPHA[m]
    h = sample_hash_sql(value_expr, seed)
    return f"""
WITH hv AS (
  SELECT {group_expr} AS g, ({h}) AS hv FROM {table}
), reg AS (
  SELECT g, hv % {m} AS bucket,
         max(CASE WHEN hv >> {b} = 0 THEN {top}
                  ELSE {top} - length(bin(hv >> {b})) END) AS mj
  FROM hv GROUP BY g, bucket
), agg AS (
  SELECT g, CAST({m} - count(*) AS BIGINT) AS v_zeros,
         CAST(sum(1::BIGINT << ({top} - mj)) AS BIGINT)
         + CAST({m} - count(*) AS BIGINT) * {1 << top} AS sum_scaled
  FROM reg GROUP BY g
)
SELECT g AS {group_name}, v_zeros, sum_scaled,
       round(CASE WHEN ({alpha * m * m * float(1 << top)!r} / sum_scaled) <= {2.5 * m!r}
                   AND v_zeros > 0
             THEN {float(m)!r} * ln({float(m)!r} / v_zeros)
             ELSE {alpha * m * m * float(1 << top)!r} / sum_scaled END, 9)
       AS est_distinct
FROM agg
"""
