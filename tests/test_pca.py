"""pca_power: eigenvector quality vs numpy, partition invariance of the
exact-integer scatter, normalization contract, known-direction fixture."""

from __future__ import annotations

import numpy as np

from metric_search_spark.operators.pca import pca_power
from tests.sparkutil import get_spark


def _df(spark, X, parts=1):
    rows = [(list(map(float, r)),) for r in X]
    return spark.createDataFrame(rows, "embedding array<double>").repartition(
        parts
    )


def test_known_direction_and_normalization():
    spark = get_spark()
    rng = np.random.default_rng(5)
    t = rng.normal(0, 1, 400)
    d = np.array([3.0, 1.0, 0.0, 0.0])
    X = np.outer(t, d) * 0.1 + rng.normal(0, 0.001, (400, 4))
    out = pca_power(_df(spark, X), dim=4, iters=12).collect()
    v = np.array([r.loading for r in sorted(out, key=lambda r: r.j)])
    assert np.abs(v).max() == 1.0  # max-|v| normalization, exact
    cos = abs(v @ d) / (np.linalg.norm(v) * np.linalg.norm(d))
    assert cos > 0.999
    assert out[0].lam > 0


def test_matches_numpy_eigensolver():
    spark = get_spark()
    rng = np.random.default_rng(11)
    X = rng.normal(0, 0.3, (300, 6))
    # random gaussian data has a small eigengap: power iteration needs
    # more rounds there (rate (λ2/λ1)^T) — cheap, the iterate is d-dim
    out = pca_power(_df(spark, X, parts=4), dim=6, iters=200).collect()
    v = np.array([r.loading for r in sorted(out, key=lambda r: r.j)])
    xi = np.floor(X * 1_000_000).astype(np.int64)
    n = len(xi)
    M = (n * (xi.T @ xi) - np.outer(xi.sum(0), xi.sum(0))).astype(np.float64)
    w, V = np.linalg.eigh(M)
    top = V[:, np.argmax(w)]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.9999


def test_partition_invariance_bitwise():
    spark = get_spark()
    rng = np.random.default_rng(3)
    X = rng.normal(0, 0.5, (200, 5))
    a = pca_power(_df(spark, X, parts=1), dim=5).collect()
    b = pca_power(_df(spark, X, parts=13), dim=5).collect()
    ka = {r.j: (r.loading, r.lam) for r in a}
    kb = {r.j: (r.loading, r.lam) for r in b}
    assert ka == kb  # exact-integer scatter -> bitwise identical floats


def test_second_component_deflation():
    spark = get_spark()
    rng = np.random.default_rng(21)
    d1 = np.array([1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
    d2 = np.array([0.0, 0.0, 1.0, -1.0]) / np.sqrt(2)
    X = (
        np.outer(rng.normal(0, 1.0, 500), d1) * 0.2
        + np.outer(rng.normal(0, 0.4, 500), d2) * 0.2
        + rng.normal(0, 0.002, (500, 4))
    )
    out = pca_power(_df(spark, X, parts=3), dim=4, iters=60, components=2).collect()
    v1 = np.array(
        [r.loading for r in sorted(out, key=lambda r: (r.comp, r.j)) if r.comp == 1]
    )
    v2 = np.array(
        [r.loading for r in sorted(out, key=lambda r: (r.comp, r.j)) if r.comp == 2]
    )
    n1, n2 = v1 / np.linalg.norm(v1), v2 / np.linalg.norm(v2)
    assert abs(n1 @ d1) > 0.999
    assert abs(n2 @ d2) > 0.999
    assert abs(n1 @ n2) < 1e-3  # deflation keeps components orthogonal
    lam1 = {r.lam for r in out if r.comp == 1}.pop()
    lam2 = {r.lam for r in out if r.comp == 2}.pop()
    assert lam1 > lam2 > 0
