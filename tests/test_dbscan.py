"""DBSCAN vs a brute-force python twin (same deterministic min-label rules)."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.operators.cluster import dbscan

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _fixture_points():
    """Two dense blobs + a thin bridge + uniform background noise."""
    rng = np.random.default_rng(17)
    blob_a = rng.normal((0.25, 0.30), 0.015, (60, 2))
    blob_b = rng.normal((0.70, 0.65), 0.020, (80, 2))
    bridge = np.c_[np.linspace(0.40, 0.55, 6), np.linspace(0.45, 0.55, 6)]
    noise = rng.uniform(0.02, 0.98, (40, 2))
    pts = np.clip(np.vstack([blob_a, blob_b, bridge, noise]), 0.001, 0.999)
    return pts


def _brute_dbscan(pts: np.ndarray, eps: float, min_pts: int):
    """Reference DBSCAN with the engine's deterministic refinements:
    cluster = min core id in component; border joins min core-neighbor
    cluster; neighborhood is inclusive and counts self."""
    n = len(pts)
    D = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(2))
    nbr = D <= eps
    core = nbr.sum(1) >= min_pts
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ci = np.where(core)[0]
    for i in ci:
        for j in ci:
            if j > i and nbr[i, j]:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id (union-by-min keeps roots minimal,
    # but path order can leave a non-min root — recompute explicitly)
    comp = {}
    for i in ci:
        r = find(i)
        comp.setdefault(r, []).append(i)
    label = {}
    for members in comp.values():
        m = min(members)
        for i in members:
            label[i] = m
    out = {}
    for i in range(n):
        if core[i]:
            out[i] = (label[i], "core")
        else:
            cn = [label[j] for j in ci if nbr[i, j]]
            out[i] = (min(cn), "border") if cn else (-1, "noise")
    return out


def test_dbscan_matches_bruteforce(spark):
    pts = _fixture_points()
    eps, min_pts = 0.03, 5
    want = _brute_dbscan(pts, eps, min_pts)
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y double",
    )
    got = {r["id"]: (r["cluster"], r["role"]) for r in dbscan(df, eps, min_pts).collect()}
    assert got == want
    roles = [v[1] for v in want.values()]
    # the fixture must exercise every role and >1 cluster
    assert roles.count("core") > 50
    assert roles.count("border") >= 1
    assert roles.count("noise") >= 10
    assert len({c for c, r in want.values() if c != -1}) >= 2


def test_dbscan_partition_invariant(spark):
    """Same output under adversarial repartitioning (the determinism the
    min-label rules exist for)."""
    pts = _fixture_points()
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x double, y double",
    )
    a = {tuple(r) for r in dbscan(df, 0.03, 5).collect()}
    b = {tuple(r) for r in dbscan(df.repartition(17), 0.03, 5).collect()}
    assert a == b


def test_dbscan_all_noise_and_all_core(spark):
    # far-apart points, min_pts>1 → everything noise
    df = spark.createDataFrame(
        [(i, 0.1 + 0.2 * i, 0.1) for i in range(5)], "id long, x double, y double"
    )
    out = dbscan(df, eps=0.01, min_pts=2).collect()
    assert all(r["role"] == "noise" and r["cluster"] == -1 for r in out)
    # one tight clump → one cluster, everything core, label = min id
    df2 = spark.createDataFrame(
        [(i + 3, 0.5 + 0.001 * i, 0.5) for i in range(6)],
        "id long, x double, y double",
    )
    out2 = dbscan(df2, eps=0.1, min_pts=3).collect()
    assert all(r["role"] == "core" and r["cluster"] == 3 for r in out2)


def test_kmeans_separated_blobs_and_invariance(spark):
    """Three well-separated blobs are recovered exactly (same partition of
    the ids regardless of label numbering), the result is identical under
    repartitioning, and iters=0 assigns to the raw seeds."""
    from metric_search_spark.operators.cluster import kmeans_2d

    pts = []
    for b, (cx, cy) in enumerate([(0.1, 0.1), (0.5, 0.9), (0.9, 0.2)]):
        for j in range(20):
            pts.append((b * 100 + j, cx + (j % 5) * 1e-3, cy + (j // 5) * 1e-3))
    df = spark.createDataFrame(pts, "id long, x double, y double")

    got = {r.id: r.cluster for r in kmeans_2d(df, k=3, iters=6).collect()}
    assert len(got) == 60
    blobs = [{got[b * 100 + j] for j in range(20)} for b in range(3)]
    assert all(len(s) == 1 for s in blobs)          # each blob one cluster
    assert len(set().union(*blobs)) == 3             # three distinct ones

    again = {
        r.id: r.cluster
        for r in kmeans_2d(df.repartition(7), k=3, iters=6).collect()
    }
    assert again == got

    init_only = kmeans_2d(df, k=3, iters=0).collect()
    assert len(init_only) == 60


def test_kmeans_k_exceeds_points_and_validation(spark):
    """k > |points|: init takes all points as seeds; every point lands in
    some cluster. Bad args raise."""
    import pytest as _pytest

    from metric_search_spark.operators.cluster import kmeans_2d

    df = spark.createDataFrame(
        [(1, 0.1, 0.1), (2, 0.9, 0.9)], "id long, x double, y double"
    )
    got = kmeans_2d(df, k=5, iters=3).collect()
    assert len(got) == 2 and {r.cluster for r in got} == {1, 2}
    with _pytest.raises(ValueError, match="kmeans_2d"):
        kmeans_2d(df, k=0)
