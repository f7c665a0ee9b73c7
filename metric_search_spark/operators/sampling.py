"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on raw: pipelines carve reproducible
subsets — per-stratum quotas (balance languages/sources), fixed-rate holdouts
(eval splits), decimation for ablations. ``df.sample()`` is seed-stable only
per partitioning; these operators instead key every decision on a PURE
FUNCTION of the row id, so the same row is kept under any partitioning, any
cluster size, any engine — the property that makes a sample auditable.

Hash: two MINSTD rounds (Lehmer multiplicative congruential generator,
x → 48271·x mod 2³¹−1 — public-domain constants from Park & Miller 1988)
with an xor-shift between rounds for nonlinearity. Everything stays below
2⁴⁷, so the arithmetic is exact in BIGINT on both Spark (ANSI-safe, no
overflow) and DuckDB — the SQL twin (``sample_hash_sql``) reproduces the
exact integers, which is what lets a driver oracle hash-match a sample.

Scale notes:
- ``sample_stratified`` is a per-stratum window rank — the rank ≤ n filter
  triggers Spark's WindowGroupLimit partial top-n (each map task keeps only
  its local top-n before the shuffle), so a 10⁹-row stratum moves
  ~n·tasks rows, not 10⁹ (plan-pinned in tests/test_sampling.py).
- ``sample_hash`` (Bernoulli) is a pure Column filter — no shuffle at all;
  it composes with any downstream plan and pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_col",
    "sample_hash_sql",
    "sample_hash",
    "sample_stratified",
    "sample_weighted",
    "split_assign",
    "split_assign_sql",
]

_M = 2147483647  # 2^31 - 1 (prime)
_A = 48271


def hash_col(id_col: Column, seed: int = 0) -> Column:
    """Deterministic per-id hash in [0, 2³¹−1): two MINSTD rounds + an
    xor-shift. Exact-integer reproducible in ANSI SQL (sample_hash_sql).
    ``id_col`` must be a non-negative integer column (every table id here
    is; pmod guards the seed fold anyway)."""
    x = F.pmod(id_col.cast("long") + F.lit(131071 * seed), F.lit(_M)) + F.lit(1)
    h1 = F.pmod(x * _A, F.lit(_M))
    h1x = h1.bitwiseXOR(F.shiftrightunsigned(h1, 13))
    return F.pmod(F.pmod(h1x, F.lit(_M)) * _A, F.lit(_M))


def sample_hash_sql(id_expr: str, seed: int = 0) -> str:
    """The exact SQL twin of hash_col (DuckDB/ANSI): same integers."""
    x = f"((({id_expr}) + {131071 * seed}) % {_M} + {_M}) % {_M} + 1"
    h1 = f"(({x}) * {_A}) % {_M}"
    h1x = f"xor({h1}, ({h1}) >> 13)"
    return f"((({h1x}) % {_M}) * {_A}) % {_M}"


def sample_hash(
    df: DataFrame, fraction: float, *, id_col: str = "id", seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with hash < fraction·M.
    Same rows kept under any partitioning/engine; a pure filter (no
    shuffle). The realized rate converges to ``fraction`` at corpus size
    (the hash is equidistributed); exact per-group counts need
    sample_stratified."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} not in [0, 1]")
    return df.where(hash_col(F.col(id_col), seed) < int(fraction * _M))


def sample_stratified(
    df: DataFrame,
    strata: list[str],
    n: int,
    *,
    id_col: str = "id",
    seed: int = 0,
    rank_col: str = "rk",
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum, chosen by hash rank —
    a deterministic per-group reservoir. Returns the input columns plus
    ``rank_col`` (1..n within the stratum, by (hash, id) — the tie-break
    makes the output total-ordered and therefore hashable cross-engine).

    Skew: a hot stratum's candidates concentrate on one reducer, but
    WindowGroupLimit caps what reaches it at top-n per map task — the
    reducer sees O(n·tasks) rows however hot the stratum is."""
    if n < 1:
        raise ValueError(f"n {n} must be >= 1")
    from pyspark.sql import Window

    h = hash_col(F.col(id_col), seed)
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .where(F.col(rank_col) <= n)
    )


def sample_weighted(
    df: DataFrame,
    n: int,
    *,
    weight_col: str,
    strata: list[str] | None = None,
    id_col: str = "id",
    seed: int = 0,
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-ES one-pass scheme: each row draws
    u = (hash(id)+1)/M ∈ (0, 1] and is ranked by the exponential key
    −ln(u)/w ascending (≡ largest u^(1/w)); the top ``n`` rows are an
    exact weighted sample without replacement, and because u is a pure
    function of the row id the SAME rows win under any partitioning, any
    cluster size, any engine — sample_hash_sql reproduces the integers and
    ln/division are correctly-rounded IEEE in both engines. Rows with
    weight ≤ 0 are excluded by definition (never sampled; keeps the
    zero-division semantics engine-neutral). Ties (measure-zero in the
    keys) break by id, making the output total-ordered and hashable.

    ``strata``: when given, an independent top-n per stratum (weighted
    quota sampling). Returns the input columns plus ``rank_col``.

    Scale: same WindowGroupLimit shape as sample_stratified — the rank ≤ n
    filter caps each map task at its local top-n before the shuffle, so even
    the global (unpartitioned) variant moves O(n·tasks) rows to the single
    reducer, not |corpus|."""
    if n < 1:
        raise ValueError(f"n {n} must be >= 1")
    from pyspark.sql import Window

    h = hash_col(F.col(id_col), seed)
    u = (h + F.lit(1)).cast("double") / F.lit(float(_M))
    key = -F.log(u) / F.col(weight_col).cast("double")
    w = (
        Window.partitionBy(*strata) if strata else Window.partitionBy()
    ).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn(rank_col, F.row_number().over(w).cast("long"))
        .where(F.col(rank_col) <= n)
    )


def split_assign(
    df: DataFrame,
    proportions: dict[str, float],
    *,
    key_col: str = "id",
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: every row gets a split label
    from a PURE FUNCTION of ``key_col`` — the same row lands in the same
    split under any partitioning, cluster size, engine, or re-run, and
    the assignment is auditable (the property `randomSplit` lacks: its
    splits shift with partitioning).

    ``proportions``: ordered {name: fraction}, summing to 1 (±1e-9);
    buckets are half-open hash ranges with exact integer thresholds
    ⌊cum·(2³¹−1)⌋, the last pinned to 2³¹−1 so coverage is total.

    LEAKAGE CONTROL is the point of ``key_col``: hash the row id for an
    i.i.d. split, or hash a GROUP key (near-dup cluster id, url domain,
    document family) so correlated rows land in the SAME split and the
    eval set can't leak train content. Pure Column filter math — no
    shuffle, pushes into the scan. SQL twin: ``split_assign_sql``."""
    if not proportions:
        raise ValueError("proportions must be non-empty")
    total = sum(proportions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"proportions sum to {total}, expected 1")
    if any(v < 0 for v in proportions.values()):
        raise ValueError("proportions must be non-negative")
    h = hash_col(F.col(key_col), seed)
    expr = None
    cum = 0.0
    names = list(proportions)
    for i, name in enumerate(names):
        cum += proportions[name]
        thr = _M if i == len(names) - 1 else int(cum * _M)
        cond = h < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def split_assign_sql(
    proportions: dict[str, float], key_expr: str, seed: int = 0
) -> str:
    """Exact SQL twin of split_assign's label expression."""
    h = sample_hash_sql(key_expr, seed)
    parts = []
    cum = 0.0
    names = list(proportions)
    for i, name in enumerate(names):
        cum += proportions[name]
        thr = _M if i == len(names) - 1 else int(cum * _M)
        parts.append(f"WHEN ({h}) < {thr} THEN '{name}'")
    return "CASE " + " ".join(parts) + " END"
