"""Graph operators over edge-list DataFrames.

The reference's graph library stores adjacency matrices (Blaze dense/sparse —
/root/reference/details/graph.hpp:26-80); adjacency matrices do not scale, so
the engine's graph representation is an edge DataFrame (src, dst) and both
operators are iterative joins (SURVEY.md §2.3):

- ``bfs_neighborhood`` — the reference's frontier-expansion BFS
  (getNeighbours, details/graph.cpp:175-242): each hop is one equi-join +
  anti-join against the visited set.
- ``connected_components`` — the reference implements Lulli et al.'s
  "Cracker" min-label pruning algorithm (details/graph/
  connected_components.hpp:49-242), itself designed as a distributed
  min-selection loop; here it is the canonical Spark formulation: iterate
  ``component = min(component of self ∪ neighbors)`` to fixpoint. Each round
  is one join + one groupBy-min; rounds needed = graph diameter (use
  low-diameter inputs or accept the rounds; a small-star/large-star variant
  is the upgrade path for high-diameter graphs at scale).

Also: deterministic graph generators from the reference
(details/graph.cpp:317-774) as edge-list constructors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bfs_neighborhood",
    "connected_components",
    "grid4_edges",
    "grid8_edges",
    "paley_edges",
]


def _undirected(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def bfs_neighborhood(edges: DataFrame, start: int, max_deep: int) -> DataFrame:
    """Nodes grouped by hop distance ≤ max_deep from ``start`` (reference
    getNeighbours semantics: includes the start node at hop 0; each node
    reported once at its minimum hop). Returns (node, hop)."""
    spark = edges.sparkSession
    und = _undirected(edges).persist()
    visited = spark.createDataFrame([(start, 0)], "node long, hop long").persist()
    frontier = visited
    try:
        for hop in range(1, max_deep + 1):
            nxt = (
                frontier.join(und, frontier["node"] == und["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .withColumn("hop", F.lit(hop).cast("long"))
                .persist()
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt).persist()
            frontier = nxt
        return visited.localCheckpoint(eager=True)
    finally:
        und.unpersist()


def connected_components(
    edges: DataFrame, nodes: DataFrame | None = None, max_rounds: int = 50
) -> DataFrame:
    """Min-label propagation to fixpoint. Returns (node, component) where
    component = min node id in the component. ``nodes`` supplies isolated
    vertices (defaults to vertices present in edges)."""
    und = _undirected(edges)
    if nodes is None:
        nodes = und.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node").withColumn("component", F.col("node")).persist()
    labels.count()
    try:
        for _ in range(max_rounds):
            msgs = labels.join(und, labels["node"] == und["src"]).select(
                F.col("dst").alias("node"), "component"
            )
            new_labels = (
                labels.select("node", "component")
                .unionByName(msgs)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .persist()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.localCheckpoint(eager=True)
    finally:
        labels.unpersist()


# ------------------------------------------------------------- generators


def grid4_edges(spark, width: int, height: int | None = None) -> DataFrame:
    """Grid4 lattice (reference details/graph.cpp:317-373): node r*width+c,
    4-neighborhood, undirected (both directions emitted)."""
    height = height or width
    nodes = spark.range(width * height).select(F.col("id").alias("src"))
    r = (F.col("src") / width).cast("long")
    c = F.col("src") % width
    right = nodes.where(c < width - 1).select("src", (F.col("src") + 1).alias("dst"))
    down = nodes.where(r < height - 1).select("src", (F.col("src") + width).alias("dst"))
    return _undirected(right.unionByName(down))


def grid8_edges(spark, width: int, height: int | None = None) -> DataFrame:
    """Grid8 lattice (details/graph.cpp:473-528): 8-neighborhood."""
    height = height or width
    nodes = spark.range(width * height).select(F.col("id").alias("src"))
    r = (F.col("src") / width).cast("long")
    c = F.col("src") % width
    parts = [
        nodes.where(c < width - 1).select("src", (F.col("src") + 1).alias("dst")),
        nodes.where(r < height - 1).select("src", (F.col("src") + width).alias("dst")),
        nodes.where((c < width - 1) & (r < height - 1)).select(
            "src", (F.col("src") + width + 1).alias("dst")
        ),
        nodes.where((c > 0) & (r < height - 1)).select(
            "src", (F.col("src") + width - 1).alias("dst")
        ),
    ]
    fwd = parts[0]
    for p in parts[1:]:
        fwd = fwd.unionByName(p)
    return _undirected(fwd)


def paley_edges(spark, q: int) -> DataFrame:
    """Paley graph (details/graph.cpp:536-562): vertices Z_q (q prime ≡ 1 mod
    4); i ~ j iff (i − j) is a nonzero quadratic residue mod q. Pure
    spark.range + modular arithmetic — no driver-side enumeration."""
    residues = (
        spark.range(1, q)
        .select(((F.col("id") * F.col("id")) % q).alias("r"))
        .distinct()
    )
    pairs = spark.range(q).select(F.col("id").alias("src")).crossJoin(
        spark.range(q).select(F.col("id").alias("dst"))
    ).where(F.col("src") != F.col("dst"))
    diff = F.pmod(F.col("src") - F.col("dst"), F.lit(q))
    return pairs.join(F.broadcast(residues), diff == F.col("r")).select("src", "dst")
