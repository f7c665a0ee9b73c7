"""Distributed PCA: exact-integer scatter-matrix aggregation + a pinned
power iteration for the dominant principal component.

The embedding-health / drift-detection primitive of a training-data
pipeline (which direction does the corpus vary most, and how strongly),
done Spark-first at the only place 10⁹ rows actually appear — the
second-moment aggregate:

- µ-scale each coordinate to ``floor(x·10⁶)`` int64, then ONE
  mapInPandas pass emits per-Arrow-batch partials of the Gram matrix
  ``G = XᵀX`` (one int64 matmul per batch — d² numbers per batch, never
  per-row) and the coordinate sums S. A single (j, k) groupBy sums
  partials as DECIMAL(38,0) — exact far past int64 at 10⁹·10¹² products
  (DuckDB's HUGEINT plays the same role in the twin).
- The d×d centered scatter ``M = n·G − S·Sᵀ`` (exact integers, cast to
  float64 once, identically in both engines) is driver-side tiny;
  the power iteration (van Mises) runs T rounds of ``v ← Mv`` with a
  left-to-right per-row fold and max-|v| normalization — every float op
  replayed in the same order by the DuckDB recursive-CTE twin, so the
  loadings match BIT-FOR-BIT, the TWED-oracle technique applied to an
  iterative numerical algorithm.

Scale shape: shuffle traffic is |partitions|·d² partial rows (KB-scale),
the driver holds d² numbers, and nothing else leaves the executors.
Sign convention: the iterate starts at the all-ones vector and is
normalized by max|v| (sign kept), so the returned direction is
deterministic — flip-free across partitionings by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_power"]

_SCALE = 1_000_000


def pca_power(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int | None = None,
    iters: int = 12,
    components: int = 1,
) -> DataFrame:
    """Top principal component(s) of ``vec_col``. Returns one row per
    (component, dimension): (comp, j, loading double, lam double) — each
    component's T-step power iterate normalized to max|v| = 1 and its
    final scaling factor. ``components`` ∈ {1, 2}: the second component
    runs the same iteration against the IMPLICITLY deflated operator
    ``x ↦ Mx − r₁·v₁·(v₁ᵀx)/(v₁ᵀv₁)`` (Hotelling deflation with the
    Rayleigh eigenvalue r₁ of the converged first iterate) — M is never
    modified, so the distributed pass stays single.

    Determinism contract (what the SQL twin replays): µ-scaling with
    floor, exact-integer M, float64 cast once, per-row LEFT-TO-RIGHT
    dot-product folds, max-|v| normalization each round, v₀ = 1⃗, and
    the fixed evaluation order ``x'_j = (Mx)_j − t₁·v₁_j`` with scalar
    ``t₁ = r₁·((v₁ᵀx)/(v₁ᵀv₁))``."""
    spark = df.sparkSession
    if dim is None:
        probe = df.select(F.size(vec_col).alias("d")).first()
        if probe is None:
            raise ValueError("pca_power: empty input, nothing to decompose")
        dim = int(probe["d"])
    d = int(dim)

    def partials(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            xi = np.floor(X * _SCALE).astype(np.int64)
            G = xi.T @ xi  # (d, d) exact int64 per batch
            S = xi.sum(axis=0)
            n = np.int64(len(xi))
            jj, kk = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "j": np.concatenate([jj.ravel(), np.arange(d), [-1]]),
                    "k": np.concatenate([kk.ravel(), np.full(d, -1), [-2]]),
                    "val": np.concatenate([G.ravel(), S, [n]]),
                }
            )

    agg = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(partials, schema="j int, k int, val long")
        .groupBy("j", "k")
        .agg(F.sum(F.col("val").cast("decimal(38,0)")).alias("v"))
        .collect()
    )
    G = np.zeros((d, d), dtype=object)
    S = np.zeros(d, dtype=object)
    n = 0
    for r in agg:
        j, k, v = int(r["j"]), int(r["k"]), int(r["v"])
        if j == -1:
            n = v
        elif k == -1:
            S[j] = v
        else:
            G[j, k] = v
    # exact integer scatter, ONE cast to float64 (both engines identical)
    M = [[float(n * G[j][k] - S[j] * S[k]) for k in range(d)] for j in range(d)]

    if components not in (1, 2):
        raise ValueError("pca_power: components must be 1 or 2")

    def matvec(x: list[float]) -> list[float]:
        out = []
        for j in range(d):
            acc = 0.0
            for k in range(d):  # left-to-right fold — the pinned order
                acc += M[j][k] * x[k]
            out.append(acc)
        return out

    def iterate(deflate: tuple[list[float], float, float] | None):
        v = [1.0] * d
        lam = 1.0
        for _ in range(int(iters)):
            nv = matvec(v)
            if deflate is not None:
                v1, r1, den = deflate
                dvx = 0.0
                for j in range(d):
                    dvx += v1[j] * v[j]
                t1 = r1 * (dvx / den)
                nv = [nv[j] - t1 * v1[j] for j in range(d)]
            m = 0.0
            for u in nv:
                a = abs(u)
                if a > m:
                    m = a
            if m == 0.0:
                return nv, 0.0
            v = [u / m for u in nv]
            lam = m
        return v, lam

    v1, lam1 = iterate(None)
    rows = [(1, j, v1[j], lam1) for j in range(d)]
    if components == 2:
        w1 = matvec(v1)
        num = 0.0
        den = 0.0
        for j in range(d):
            num += v1[j] * w1[j]
        for j in range(d):
            den += v1[j] * v1[j]
        r1 = num / den
        v2, lam2 = iterate((v1, r1, den))
        rows += [(2, j, v2[j], lam2) for j in range(d)]
    return spark.createDataFrame(
        rows, "comp long, j long, loading double, lam double"
    )
