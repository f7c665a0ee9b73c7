"""SSSP: multi-hop-beats-direct-edge semantics, reachability, and parity
with a python Dijkstra twin on a deterministic weighted lattice."""

from __future__ import annotations

import heapq

from pyspark.sql import functions as F

from metric_search_spark.operators.graph import grid8_edges, sssp
from tests.sparkutil import get_spark


def test_cheaper_long_path_wins():
    spark = get_spark()
    # direct 0->1 costs 10; the 2-hop detour 0->2->1 costs 2
    edges = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 1), (2, 1, 1), (1, 3, 1)],
        "src long, dst long, w long",
    )
    out = {r["node"]: r["dist"] for r in sssp(edges, 0).collect()}
    assert out == {0: 0, 2: 1, 1: 2, 3: 3}


def test_unreachable_nodes_absent():
    spark = get_spark()
    edges = spark.createDataFrame(
        [(0, 1, 5), (2, 3, 1)], "src long, dst long, w long"
    )
    out = {r["node"]: r["dist"] for r in sssp(edges, 0).collect()}
    assert out == {0: 0, 1: 5}


def _dijkstra(adj, source):
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_matches_dijkstra_on_weighted_grid8():
    spark = get_spark()
    e = grid8_edges(spark, 6, 6).withColumn(
        "w",
        (
            F.lit(1)
            + (F.col("src") * F.col("dst") + F.col("src") + F.col("dst")) % 5
        ).cast("long"),
    )
    rows = e.collect()
    adj = {}
    for r in rows:
        adj.setdefault(r["src"], []).append((r["dst"], r["w"]))
    expect = _dijkstra(adj, 7)
    got = {r["node"]: r["dist"] for r in sssp(e, 7).collect()}
    assert got == expect


def test_catchments_tie_breaks_to_smaller_seed():
    spark = get_spark()
    # node 1 is distance 1 from both seeds 0 and 2 -> claimed by seed 0
    edges = spark.createDataFrame(
        [(0, 1, 1), (2, 1, 1), (1, 0, 1), (1, 2, 1), (2, 3, 4)],
        "src long, dst long, w long",
    )
    from metric_search_spark.operators.graph import catchments

    got = {r.node: (r.dist, r.seed) for r in catchments(edges, [0, 2]).collect()}
    assert got == {0: (0, 0), 2: (0, 2), 1: (1, 0), 3: (4, 2)}


def test_catchments_matches_per_seed_dijkstra_argmin():
    spark = get_spark()
    from metric_search_spark.operators.graph import catchments

    e = grid8_edges(spark, 6, 6).withColumn(
        "w",
        (
            F.lit(1)
            + (F.col("src") * F.col("dst") + F.col("src") + F.col("dst")) % 5
        ).cast("long"),
    )
    rows = e.collect()
    adj = {}
    for r in rows:
        adj.setdefault(r["src"], []).append((r["dst"], r["w"]))
    seeds = [3, 20, 35]
    per = {s: _dijkstra(adj, s) for s in seeds}
    expect = {}
    for n in range(36):
        best = min((per[s].get(n, 1 << 60), s) for s in seeds)
        expect[n] = best
    got = {r.node: (r.dist, r.seed) for r in catchments(e, seeds).collect()}
    assert got == expect


def test_geofence_transitions_semantics():
    from metric_search_spark.operators.trajectory import geofence_transitions

    spark = get_spark()
    # track: out, in, in, out, in  -> enter@2, exit@4, enter@5; a track
    # STARTING inside (user 1) emits nothing until it leaves
    rows = [
        (0, 1, 0.0, 0.0), (0, 2, 5.0, 5.0), (0, 3, 6.0, 6.0),
        (0, 4, 20.0, 5.0), (0, 5, 4.0, 9.0),
        (1, 1, 5.0, 5.0), (1, 2, 5.0, 5.0), (1, 3, 0.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, x double, y double")
    out = geofence_transitions(df, 4.0, 4.0, 9.0, 9.0)
    got = [(r.user_id, r.event_id, r.kind, r.seq) for r in
           out.orderBy("user_id", "event_id").collect()]
    assert got == [
        (0, 2, "enter", 1), (0, 4, "exit", 2), (0, 5, "enter", 3),
        (1, 3, "exit", 1),
    ]
    # boundary is closed: landing exactly on the corner is inside
    df2 = spark.createDataFrame(
        [(0, 1, 0.0, 0.0), (0, 2, 4.0, 9.0)],
        "user_id long, event_id long, x double, y double",
    )
    r = geofence_transitions(df2, 4.0, 4.0, 9.0, 9.0).collect()
    assert len(r) == 1 and r[0].kind == "enter"
