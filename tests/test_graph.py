"""Graph generators vs exact python twins of the reference's constructors
(/root/reference/details/graph.cpp), plus the O(log n)-round connected
components on a high-diameter graph (VERDICT r1 item 8)."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.operators.graph import (
    bfs_neighborhood,
    connected_components,
    grid4_edges,
    grid6_edges,
    grid8_edges,
    is_prime,
    lps_edges,
    margulis_edges,
    paley_edges,
    random_uniform_edges,
)

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _edge_set(df) -> set[tuple[int, int]]:
    return {(int(r["src"]), int(r["dst"])) for r in df.collect()}


def _grid6_twin(width: int, height: int) -> set[tuple[int, int]]:
    """Line-for-line port of the reference loop (graph.cpp:403-461)."""
    pairs = set()
    for i in range(height):
        for j in range(width):
            odd = i % 2 != 0
            up, down = i > 0, i < height - 1
            left, right = j > 0, j < width - 1
            n = i * width + j
            if up:
                pairs.add((n, (i - 1) * width + j))
            if down:
                pairs.add((n, (i + 1) * width + j))
            if left:
                pairs.add((n, i * width + (j - 1)))
            if right:
                pairs.add((n, i * width + (j + 1)))
            if not odd and left:
                if up:
                    pairs.add((n, (i - 1) * width + (j - 1)))
                if down:
                    pairs.add((n, (i + 1) * width + (j - 1)))
            if odd and right:
                if up:
                    pairs.add((n, (i - 1) * width + (j + 1)))
                if down:
                    pairs.add((n, (i + 1) * width + (j + 1)))
    return pairs


def test_grid6_matches_reference_twin(spark):
    for w, h in ((5, 4), (4, 4), (3, 6)):
        got = _edge_set(grid6_edges(spark, w, h))
        assert got == _grid6_twin(w, h), (w, h)
    # interior nodes of a big-enough grid have degree 6 (hex lattice)
    deg = {}
    for s, d in _edge_set(grid6_edges(spark, 6, 6)):
        deg[s] = deg.get(s, 0) + 1
    interior = [r * 6 + c for r in range(1, 5) for c in range(1, 5)]
    assert all(deg[n] == 6 for n in interior)


def test_grid4_grid8_degrees(spark):
    g4 = _edge_set(grid4_edges(spark, 5))
    deg4 = {}
    for s, d in g4:
        deg4[s] = deg4.get(s, 0) + 1
    assert deg4[12] == 4 and deg4[0] == 2  # interior / corner
    g8 = _edge_set(grid8_edges(spark, 5))
    deg8 = {}
    for s, d in g8:
        deg8[s] = deg8.get(s, 0) + 1
    assert deg8[12] == 8 and deg8[0] == 3


def test_paley_structure(spark):
    q = 13
    got = _edge_set(paley_edges(spark, q))
    residues = {(i * i) % q for i in range(1, q)}
    want = {
        (i, j)
        for i in range(q)
        for j in range(q)
        if i != j and (i - j) % q in residues
    }
    assert got == want
    deg = {}
    for s, d in got:
        deg[s] = deg.get(s, 0) + 1
    assert all(v == (q - 1) // 2 for v in deg.values())  # Paley is regular


def test_lps_matches_reference_twin(spark):
    p = 17
    got = _edge_set(lps_edges(spark, p))
    want = set()
    want.add((0, p - 1))
    want.add((0, 1))
    for i in range(1, p):
        want.add((i, i - 1))
        want.add((i, (i + 1) % p))
        inv = pow(i, p - 2, p)
        if inv != i:
            want.add((i, inv))
    assert got == want
    with pytest.raises(ValueError):
        lps_edges(spark, 15)
    assert is_prime(2) and is_prime(97) and not is_prime(91)


def test_margulis_matches_reference_twin(spark):
    n, s = 25, 5
    got = _edge_set(margulis_edges(spark, n))
    want = set()
    for i in range(s):
        for j in range(s):
            u = i * s + j
            for v in (
                ((i + 2 * j) % s) * s + j,
                i * s + (2 * i + j) % s,
                i * s + (2 * i + j + 1) % s,
                ((i + 2 * j + 1) % s) * s + j,
            ):
                if u != v:
                    want.add((u, v))
    assert got == want
    with pytest.raises(ValueError):
        margulis_edges(spark, 24)


def test_random_uniform_contract(spark):
    n, k = 200, 5
    df = random_uniform_edges(spark, n, lower=2.0, upper=3.0, n_connections=k)
    pdf = df.toPandas()
    # exact degree per column, distinct sources, weights in range,
    # deterministic across invocations
    per_dst = pdf.groupby("dst").agg(cnt=("src", "count"), uniq=("src", "nunique"))
    assert (per_dst["cnt"] == k).all() and (per_dst["uniq"] == k).all()
    assert len(per_dst) == n
    assert (pdf["weight"] >= 2.0).all() and (pdf["weight"] < 3.0).all()
    pdf2 = random_uniform_edges(
        spark, n, lower=2.0, upper=3.0, n_connections=k
    ).toPandas()
    a = pdf.sort_values(["dst", "src"]).reset_index(drop=True)
    b = pdf2.sort_values(["dst", "src"]).reset_index(drop=True)
    assert a.equals(b)


def test_connected_components_high_diameter_path(spark):
    """A 1,000-node path has diameter 999: label propagation would need ~999
    rounds; the large-star/small-star loop must finish in O(log n)."""
    import pandas as pd

    n = 1000
    edges = spark.createDataFrame(
        pd.DataFrame({"src": np.arange(n - 1), "dst": np.arange(1, n)})
    )
    out = connected_components(edges, max_rounds=25).toPandas()
    assert len(out) == n
    assert (out["component"] == 0).all()


def test_cc_star_matches_label_on_random_graph(spark):
    import pandas as pd

    rng = np.random.default_rng(21)
    src = rng.integers(0, 300, 400)
    dst = rng.integers(0, 300, 400)
    edges = spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst}))
    nodes = spark.range(300).selectExpr("id as node")
    star = (
        connected_components(edges, nodes=nodes, algorithm="star")
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    label = (
        connected_components(edges, nodes=nodes, algorithm="label")
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert star.equals(label)


def test_bfs_grid6(spark):
    edges = grid6_edges(spark, 6, 6)
    out = bfs_neighborhood(edges, start=0, max_deep=3).toPandas()
    # python BFS twin on the same edge set
    adj = {}
    for s, d in _grid6_twin(6, 6):
        adj.setdefault(s, set()).add(d)
    want, frontier = {0: 0}, [0]
    for hop in (1, 2, 3):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in want:
                    want[v] = hop
                    nxt.append(v)
        frontier = nxt
    got = dict(zip(out["node"], out["hop"]))
    assert got == want


def test_bfs_cache_hygiene_deep(spark):
    """VERDICT r3 item 7, two claims. (1) A depth-10 BFS RUNS: the hop
    frontier is localCheckpointed each round, truncating the doubled-per-hop
    lineage that previously overflowed plan analysis past ~6 hops. (2) It
    does not leak block-manager state proportional to depth: the operator
    releases every superseded leg's checkpoint blocks DETERMINISTICALLY
    once the result checkpoint is materialized (_release_checkpoint), so
    immediately after the call the persistent-RDD count is within one (the
    result's own blocks) of the pre-call count, NOT before + O(depth) —
    with no GC/ContextCleaner timing dependence."""
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    edges = grid6_edges(spark, 16, 16)
    out = bfs_neighborhood(edges, start=0, max_deep=10)
    n = out.count()
    assert n > 80  # the walk really went deep (corner wedge = 91 nodes)
    hops = out.toPandas()["hop"]
    assert hops.max() == 10
    # leg checkpoints are released DETERMINISTICALLY inside the operator
    # (no GC/ContextCleaner wait): only the result's own checkpoint blocks
    # may remain.
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)


def test_paley_rejects_invalid_q(spark):
    """q must be a prime ≡ 1 (mod 4): q ≡ 3 silently built a directed
    tournament and composite q a meaningless graph before the guard."""
    import pytest as _pytest

    from metric_search_spark.operators.graph import paley_edges

    for bad in (7, 9, 12):
        with _pytest.raises(ValueError, match="prime"):
            paley_edges(spark, bad)


def test_pagerank_golden_3node(spark):
    """Hand-checkable non-dyadic case: 0→1, 1→2, 2 dangling; d=0.85, 2
    iterations, numpy-recomputed golden with uniform dangling
    redistribution."""
    from metric_search_spark.operators.graph import pagerank

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.node: r.pr for r in pagerank(e, iters=2, damping=0.85).collect()}
    r = np.full(3, 1 / 3)
    for _ in range(2):
        c = np.zeros(3)
        c[1] += r[0]
        c[2] += r[1]
        r = 0.15 / 3 + 0.85 * (c + r[2] / 3)
    assert got.keys() == {0, 1, 2}
    for i in range(3):
        assert abs(got[i] - r[i]) < 1e-15, (i, got[i], r[i])


def test_pagerank_mass_conserved_and_multiedge(spark):
    """Total mass stays exactly 1 on the dyadic functional graph (every
    value a multiple of 2^-40 — sums exact), and a parallel edge counts
    with multiplicity (doubling an edge changes nothing when it is the
    node's only out-edge, but shifts mass when it competes)."""
    from metric_search_spark.operators.graph import pagerank

    n = 256
    edges = [(i, (2 * i + 1) % n) for i in range(n)] + [
        (i, i // 2) for i in range(n)
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    pr = pagerank(e, iters=16, damping=0.5).toPandas()
    assert len(pr) == n
    assert pr["pr"].sum() == 1.0  # exact dyadic arithmetic, no tolerance

    # multi-edge semantics: node 0 sends 2/3 of its mass to 1, 1/3 to 2
    e2 = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)], "src long, dst long"
    )
    got = {r.node: r.pr for r in pagerank(e2, iters=8, damping=0.85).collect()}
    assert got[1] > got[2]  # the doubled edge carries double weight


def test_pagerank_isolated_nodes_via_nodes_arg(spark):
    """An isolated node (present in nodes, absent from edges) is dangling:
    it holds teleport+redistribution mass and total mass stays 1."""
    from metric_search_spark.operators.graph import pagerank

    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    pr = pagerank(e, nodes=nodes, iters=4, damping=0.85).toPandas()
    assert len(pr) == 3
    assert abs(pr["pr"].sum() - 1.0) < 1e-12
    assert pr.set_index("node")["pr"][2] > 0


def test_triangle_counts_grid8_vs_bruteforce(spark):
    """Per-node counts on a 5×4 Grid8 lattice match a python brute force
    over the canonicalized edge set."""
    from metric_search_spark.operators.graph import grid8_edges, triangle_counts

    edges = grid8_edges(spark, 5, 4)
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    es = set()
    for row in edges.collect():
        a, b = row.src, row.dst
        if a != b:
            es.add((min(a, b), max(a, b)))
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {v: 0 for v in adj}
    for a in sorted(adj):
        for b in sorted(x for x in adj[a] if x > a):
            for c in sorted(x for x in (adj[a] & adj[b]) if x > b):
                want[a] += 1
                want[b] += 1
                want[c] += 1
    assert got == want
    assert len(set(got.values())) > 1  # corners/edges/interior really differ


def test_triangle_counts_paley_regular_and_zero(spark):
    """Paley(13) is edge- and vertex-transitive: every node sits in the
    same number of triangles (= deg·λ/2 = 6·2/2 = 6, λ=(q-5)/4=2); a
    triangle-free graph (4-cycle) reports all zeros, and directed
    duplicates/self-loops are canonicalized away."""
    from metric_search_spark.operators.graph import paley_edges, triangle_counts

    got = {r.node: r.triangles for r in triangle_counts(paley_edges(spark, 13)).collect()}
    assert set(got.values()) == {6} and len(got) == 13

    c4 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 0), (1, 0)], "src long, dst long"
    )
    got2 = {r.node: r.triangles for r in triangle_counts(c4).collect()}
    assert set(got2.values()) == {0} and len(got2) == 4


def _py_kcore(n, edges, k):
    nodes = set(range(n))
    E = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = {x: 0 for x in nodes}
        for a, b in E:
            if a in nodes and b in nodes:
                deg[a] += 1
                deg[b] += 1
        drop = {x for x in nodes if deg[x] < k}
        if not drop:
            return {x: deg[x] for x in nodes}
        nodes -= drop


def test_kcore_matches_python_twin_and_is_order_independent():
    """kcore vs an independent python peeler on a random graph, at several
    k; shuffling the edge list (peeling order bait) changes nothing —
    the k-core is unique."""
    import random

    from metric_search_spark.operators.graph import kcore
    from tests.sparkutil import get_spark

    spark = get_spark()
    rng = random.Random(5)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    for k in (2, 3, 4):
        want = _py_kcore(n, edges, k)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["deg"] for r in kcore(df, k).collect()}
        assert got == want, k
    shuf = edges[:]
    rng.shuffle(shuf)
    df2 = spark.createDataFrame(shuf, "src long, dst long")
    got2 = {r["node"]: r["deg"] for r in kcore(df2, 3).collect()}
    assert got2 == _py_kcore(n, edges, 3)


def test_kcore_empty_and_validation():
    from metric_search_spark.operators.graph import kcore
    from tests.sparkutil import get_spark

    spark = get_spark()
    # a path graph has no 2-core
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    assert kcore(path, 2).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k=0"):
        kcore(path, 0)


def test_kcore_driver_query_matches_duckdb_oracle():
    import duckdb

    from metric_search_spark.entry_queries import O_KCORE_FUNCTIONAL, QUERIES
    from tests.sparkutil import get_spark

    spark = get_spark()
    got = (
        QUERIES["kcore_functional"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(O_KCORE_FUNCTIONAL).df().sort_values("node").reset_index(drop=True)
    )
    assert len(got) == len(want) == 16
    assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
    assert (got["deg"].to_numpy() == want["deg"].to_numpy()).all()


def _py_kruskal(n, weighted):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = []
    for w, a, b in sorted(weighted):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            mst.append((a, b, w))
    return set(mst)


def test_boruvka_matches_kruskal_on_random_graph():
    import random

    from metric_search_spark.operators.graph import boruvka_mst
    from tests.sparkutil import get_spark

    spark = get_spark()
    rng = random.Random(8)
    n = 40
    pairs = {(min(a, b), max(a, b)) for a, b in
             ((rng.randrange(n), rng.randrange(n)) for _ in range(150))
             if a != b}
    # distinct weights via a random permutation
    ws = rng.sample(range(10_000), len(pairs))
    weighted = [(w, a, b) for (a, b), w in zip(sorted(pairs), ws)]
    df = spark.createDataFrame(
        [(a, b, w) for w, a, b in weighted], "src long, dst long, w long"
    )
    got = {(r["a"], r["b"], r["w"]) for r in boruvka_mst(df).collect()}
    assert got == _py_kruskal(n, weighted)


def test_boruvka_rejects_duplicate_weights_and_handles_forest():
    import pytest as _pytest

    from metric_search_spark.operators.graph import boruvka_mst
    from tests.sparkutil import get_spark

    spark = get_spark()
    dup = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 5)], "src long, dst long, w long"
    )
    with _pytest.raises(ValueError, match="duplicate edge weights"):
        boruvka_mst(dup)
    # two disconnected components -> spanning FOREST with 2 edges
    forest = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 2), (5, 6, 3)], "src long, dst long, w long"
    )
    got = {(r["a"], r["b"], r["w"]) for r in boruvka_mst(forest).collect()}
    assert got == {(0, 1, 1), (5, 6, 3)}  # multi-edge keeps the lightest


def test_mst_driver_query_matches_duckdb_oracle():
    import duckdb

    from metric_search_spark.entry_queries import O_MST_FUNCTIONAL, QUERIES
    from tests.sparkutil import get_spark

    spark = get_spark()
    got = (
        QUERIES["mst_functional"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .reset_index(drop=True)
    )
    want = duckdb.sql(O_MST_FUNCTIONAL).df().reset_index(drop=True)
    assert len(got) == len(want) == 255
    assert (got["a"].to_numpy() == want["a"].to_numpy()).all()
    assert (got["b"].to_numpy() == want["b"].to_numpy()).all()
    assert (got["w"].to_numpy() == want["w"].to_numpy()).all()
