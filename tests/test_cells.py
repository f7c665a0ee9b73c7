"""Cell index (Morton quadkey) unit tests."""

import numpy as np

from metric_search_spark import cells


def test_phash_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, 1000)
    y = rng.uniform(0, 1, 1000)
    ph = cells.phash_from_xy(x, y)
    assert np.all(ph >= 0)
    dx, dy = cells.coords_from_phash(ph)
    assert np.max(np.abs(dx - x)) < 2.0**-30
    assert np.max(np.abs(dy - y)) < 2.0**-30


def test_cell_prefix_consistency():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, 500)
    y = rng.uniform(0, 1, 500)
    for res in (0, 1, 4, 9, 15):
        c1 = cells.cell_encode(x, y, res)
        c2 = cells.cell_from_phash(cells.phash_from_xy(x, y), res)
        assert np.array_equal(c1, c2)
        r, cx, cy = cells.cell_to_xy(c1)
        assert np.all(r == res)
        assert np.array_equal(cx, np.floor(x * 2**res).astype(np.int64))
        assert np.array_equal(cy, np.floor(y * 2**res).astype(np.int64))


def test_parent_children():
    c = cells.cell_encode(np.array([0.3]), np.array([0.7]), 5)[0]
    par = cells.cell_parent(np.array([c]))[0]
    assert par == cells.cell_encode(np.array([0.3]), np.array([0.7]), 4)[0]
    kids = cells.cell_children(par)
    assert c in kids and len(kids) == 4


def test_kring_interior_and_border():
    c = cells.cell_encode(np.array([0.5]), np.array([0.5]), 4)[0]
    ring = cells.kring(int(c), 1)
    assert len(ring) == 9 and c in ring
    corner = cells.cell_encode(np.array([0.01]), np.array([0.01]), 4)[0]
    ring = cells.kring(int(corner), 1)
    assert len(ring) == 4  # clipped at two borders


def test_kring_many_matches_scalar():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, 50)
    y = rng.uniform(0, 1, 50)
    cs = cells.cell_encode(x, y, 5)
    ks = rng.integers(0, 3, 50)
    rows, neigh = cells.kring_many(cs, ks)
    for i in range(50):
        mine = sorted(neigh[rows == i].tolist())
        ref = sorted(cells.kring(int(cs[i]), int(ks[i])).tolist())
        assert mine == ref


def test_ring_guarantee_radius():
    # point at center of its res-3 cell, ring 1: margin = 1 cell + half a cell
    res = 3
    s = cells.cell_size(res)
    x = np.array([4.5 * s])
    y = np.array([4.5 * s])
    g = cells.ring_guarantee_radius(x, y, res, np.array([1]))
    assert np.isclose(g[0], 1.5 * s)
    # near-left-border point: covered edge counts as infinite margin
    g2 = cells.ring_guarantee_radius(np.array([0.01]), y, res, np.array([1]))
    assert g2[0] >= 1.0 * s  # left margin is inf; min comes from other edges


def test_cell_sql_matches_numpy():
    import duckdb

    rng = np.random.default_rng(4)
    ph = cells.phash_from_xy(rng.uniform(0, 1, 200), rng.uniform(0, 1, 200))
    for res in (2, 7, 12):
        expect = cells.cell_from_phash(ph, res)
        got = duckdb.sql(
            f"select {cells.cell_sql('phash', res)} as c from (select unnest(?) as phash)",
            params=[ph.tolist()],
        ).fetchnumpy()["c"]
        assert np.array_equal(np.sort(got), np.sort(expect))
