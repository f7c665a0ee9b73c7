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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bfs_neighborhood",
    "connected_components",
    "pagerank",
    "hits",
    "sssp",
    "catchments",
    "triangle_counts",
    "grid4_edges",
    "grid6_edges",
    "grid8_edges",
    "paley_edges",
    "lps_edges",
    "margulis_edges",
    "random_uniform_edges",
    "is_prime",
]


def _undirected(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def bfs_neighborhood(edges: DataFrame, start: int, max_deep: int) -> DataFrame:
    """Nodes grouped by hop distance ≤ max_deep from ``start`` (reference
    getNeighbours semantics: includes the start node at hop 0; each node
    reported once at its minimum hop). Returns (node, hop).

    Lineage + cache hygiene (VERDICT r3 item 7): each hop's frontier is an
    EAGER ``localCheckpoint`` — same pattern as the CC rounds below — which
    (a) truncates the logical plan every hop ("visited" feeds both the
    anti-join and the union, so un-truncated lineage DOUBLES per hop and a
    depth-10 walk overflows plan analysis long before the data hurts), and
    (b) leaves ``visited`` a flat union of materialized legs, so no
    ``persist`` is ever taken on it. The per-hop driver round-trip is the
    frontier count over already-checkpointed blocks (needed anyway to decide
    termination). Once the RESULT's own checkpoint is materialized the leg
    blocks are released DETERMINISTICALLY (``_release_checkpoint`` — a
    ``DataFrame.unpersist`` is a no-op for checkpoint blocks since they hold
    no cache-manager entry, and waiting on the ContextCleaner is
    GC-timing-dependent); only the returned DataFrame's blocks remain —
    pinned by tests/test_graph.py::test_bfs_cache_hygiene_deep."""
    spark = edges.sparkSession
    und = _undirected(edges).persist()
    visited = spark.createDataFrame([(start, 0)], "node long, hop long")
    frontier = visited
    legs: list[DataFrame] = []
    try:
        for hop in range(1, max_deep + 1):
            nxt = (
                frontier.join(und, frontier["node"] == und["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .withColumn("hop", F.lit(hop).cast("long"))
                .localCheckpoint(eager=True)
            )
            legs.append(nxt)
            if nxt.count() == 0:
                break
            visited = visited.unionByName(nxt)
            frontier = nxt
        out = visited.localCheckpoint(eager=True)  # materialized HERE, so
        for leg in legs:  # the legs below are no longer needed by anything
            _release_checkpoint(leg)
        return out
    finally:
        und.unpersist()


def _release_checkpoint(df: DataFrame) -> None:
    """Drop a localCheckpoint'ed DataFrame's blocks NOW. ``df.unpersist()``
    can't do it (checkpoint blocks aren't cache-manager entries) and the
    ContextCleaner only reclaims them after driver GC, which is
    timing-dependent; the blocks are owned by the LogicalRDD the checkpoint
    left as the plan, reachable as ``analyzed().rdd()``. The DataFrame is
    unusable afterwards — callers release only superseded generations."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — best-effort: plan shape not LogicalRDD
        pass


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_rounds: int = 50,
    algorithm: str = "star",
) -> DataFrame:
    """Connected components. Returns (node, component) where component = min
    node id in the component. ``nodes`` supplies isolated vertices (defaults
    to vertices present in edges).

    ``algorithm="star"`` (default): alternating large-star / small-star
    contraction — the O(log n)-round distributed formulation (same family as
    the reference's Cracker min-selection + pruning, connected_components.hpp:
    49-242, which also contracts toward per-neighborhood minima); converges on
    high-diameter graphs (a 10³-node path) in ~log rounds where plain label
    propagation needs diameter rounds. ``algorithm="label"``: the simple
    min-label propagation loop (kept as the oracle-shaped baseline)."""
    if algorithm == "star":
        return _cc_star(edges, nodes, max_rounds)
    # persist the normalized edges: every round's msgs join re-reads them,
    # so an expensive upstream plan would otherwise recompute per round
    und = _undirected(edges).persist()
    try:
        if nodes is None:
            nodes = und.select(F.col("src").alias("node")).distinct()
        # localCheckpoint per round: each round's plan references the
        # previous labels twice (union + change check), so lineage doubles
        # per round — eager checkpoints keep the plan constant-size
        labels = (
            nodes.select("node")
            .withColumn("component", F.col("node"))
            .localCheckpoint(eager=True)
        )
        for _ in range(max_rounds):
            msgs = labels.join(und, labels["node"] == und["src"]).select(
                F.col("dst").alias("node"), "component"
            )
            new_labels = (
                labels.select("node", "component")
                .unionByName(msgs)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .count()
            )
            # the change check above was the last reader of the old
            # generation — release its checkpoint blocks now instead of
            # waiting on GC (the BFS-leg lesson)
            _release_checkpoint(labels)
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        und.unpersist()


def _min_neighbor(und: DataFrame) -> DataFrame:
    """(node, m) where m = min over the closed neighborhood Γ(u) ∪ {u}."""
    return (
        und.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("_mn"))
        .select("node", F.least(F.col("node"), F.col("_mn")).alias("m"))
    )


def _cc_star(
    edges: DataFrame, nodes: DataFrame | None, max_rounds: int
) -> DataFrame:
    """Alternating large-star / small-star contraction (the O(log n) two-phase
    algorithm; same contraction-toward-minimum idea as the reference's Cracker
    rounds). Each round:

    - large-star: for every edge (u, v) with v > u, rewire v to
      m(u) = min(Γ⁺(u)) — strictly-larger neighbors hook onto u's minimum.
    - small-star: for every edge (u, v) with v ≤ u, rewire v to m(u).

    Both emit (min(a,b), max(a,b)) normalized pairs; self-loops drop. The
    edge set converges to a star forest: every edge (root, x) with root the
    component minimum. Each phase is one groupBy-min + one join — all
    key-partitioned shuffles, no diameter dependence."""
    und0 = _undirected(edges)
    if nodes is None:
        nodes = und0.select(F.col("src").alias("node")).distinct()
    cur = (
        und0.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    # convergence detector (VERDICT r2 item 5): both edge sets are distinct,
    # normalized sets, so set-digest equality — (count, bit_xor(xxhash64),
    # decimal-sum(xxhash64)) — detects set equality with collision odds
    # ~2⁻¹²⁸. ONE aggregate over the new round's edges (the previous round's
    # digest is remembered), replacing the two full exceptAll shuffles per
    # round the r2 review flagged. bit_xor + a decimal(38,0) sum, NOT a long
    # sum: ANSI mode makes long-sum overflow a hard error, and xor alone
    # would let symmetric differences that cancel bitwise collide.
    def _digest(df: DataFrame) -> tuple[int, int, int]:
        h = F.xxhash64("src", "dst")
        row = df.agg(
            F.count("*").alias("c"),
            F.coalesce(F.bit_xor(h), F.lit(0)).alias("x"),
            F.coalesce(F.sum(h.cast("decimal(38,0)")), F.lit(0)).alias("s"),
        ).first()
        return int(row["c"]), int(row["x"]), int(row["s"])

    prev_digest = _digest(cur)
    for _ in range(max_rounds):
        und = _undirected(cur)
        mn = _min_neighbor(und)
        # large-star: v > u rewires to m(u)
        large = (
            und.where(F.col("dst") > F.col("src"))
            .join(mn, und["src"] == mn["node"])
            .select(
                F.least("dst", "m").alias("src"), F.greatest("dst", "m").alias("dst")
            )
        )
        # small-star: v <= u rewires to m(u); include (u, m(u)) itself so the
        # star center stays attached
        small = (
            und.where(F.col("dst") <= F.col("src"))
            .join(mn, und["src"] == mn["node"])
            .select(
                F.least("dst", "m").alias("src"), F.greatest("dst", "m").alias("dst")
            )
        )
        # localCheckpoint (not persist): truncates the logical plan each
        # round — 20+ rounds of stacked join/distinct lineage otherwise blow
        # up analysis/driver memory long before the data does.
        nxt = (
            large.unionByName(small)
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # converged when every node's neighbors already sit on the component
        # minimum: edge set unchanged (digest equality, see _digest above)
        digest = _digest(nxt)
        # the digest action was the last reader of the superseded round's
        # edges — release its checkpoint blocks deterministically rather
        # than waiting for the driver to GC the DataFrame (the BFS-leg
        # lesson; up to max_rounds generations of the full edge set
        # otherwise stay pinned in executor storage)
        _release_checkpoint(cur)
        cur = nxt
        if digest == prev_digest:
            break
        prev_digest = digest
    # star forest → labels; vertices absent from the final edge set (isolated
    # or self-loop-only in the input) label themselves
    labels = (
        cur.select(F.col("dst").alias("node"), F.col("src").alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    roots = (
        cur.select(F.col("src").alias("node"))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    out = labels.unionByName(roots)
    isolated = (
        nodes.select("node")
        .join(out.select("node"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    # round checkpoints are freed by ContextCleaner on driver GC (no
    # cache-manager entry to unpersist — ADVICE r2)
    return out.unionByName(isolated).localCheckpoint(eager=True)


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


def grid6_edges(spark, width: int, height: int | None = None) -> DataFrame:
    """Grid6 hexagonal lattice (reference details/graph.cpp:382-465): node
    i*width+j has its 4-neighborhood plus two diagonal neighbors — toward
    column j−1 on EVEN rows, toward column j+1 on ODD rows (the reference's
    ``odd = (i % 2 != 0)`` brick-wall offset), giving interior nodes degree 6.
    Emits the same directed pair set the reference's adjacency matrix holds
    (each undirected edge appears in both directions — the conditions are
    mutually symmetric). Pure range + modular arithmetic, no driver loop."""
    height = height or width
    nodes = spark.range(width * height).select(F.col("id").alias("src"))
    r = (F.col("src") / width).cast("long")
    c = F.col("src") % width
    odd = r % 2 == 1
    up, down = r > 0, r < height - 1
    left, right = c > 0, c < width - 1
    s = F.col("src")
    parts = [
        nodes.where(up).select("src", (s - width).alias("dst")),
        nodes.where(down).select("src", (s + width).alias("dst")),
        nodes.where(left).select("src", (s - 1).alias("dst")),
        nodes.where(right).select("src", (s + 1).alias("dst")),
        # even rows: diagonals toward j-1 (graph.cpp:443-450)
        nodes.where(~odd & left & up).select("src", (s - width - 1).alias("dst")),
        nodes.where(~odd & left & down).select("src", (s + width - 1).alias("dst")),
        # odd rows: diagonals toward j+1 (graph.cpp:452-458)
        nodes.where(odd & right & up).select("src", (s - width + 1).alias("dst")),
        nodes.where(odd & right & down).select("src", (s + width + 1).alias("dst")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for 64-bit n (the reference gates LPS on a
    randomized 20-round MR, details/graph.cpp:590-636; this witness set is
    provably exact below 3.3e24 — strictly stronger, no RNG)."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _modpow_col(base: Column, exp: int, mod: int) -> Column:
    """base^exp mod ``mod`` as a pure Column expression via square-and-multiply
    over exp's bits (log2(exp) squarings, unrolled — stays in codegen).
    Requires mod < 2^31 so intermediate products fit a BIGINT."""
    if mod >= 1 << 31:
        raise ValueError("modulus too large for 63-bit intermediate products")
    result = F.lit(1).cast("long")
    cur = base % mod
    e = exp
    while e > 0:
        if e & 1:
            result = (result * cur) % mod
        cur = (cur * cur) % mod
        e >>= 1
    return result


def lps_edges(spark, p: int) -> DataFrame:
    """LPS-flavored expander (reference details/graph.cpp:567-588): vertices
    Z_p (p prime, checked as the reference does — raises otherwise); node 0
    links to {p−1, 1}; node i>0 links to {i−1, i+1 mod p, i^(p−2) mod p — its
    modular inverse}. Emits exactly the reference's directed pair list; the
    adjacency it builds is symmetric because inverse is an involution."""
    if not is_prime(p):
        raise ValueError(f"LPS graph requires a prime node count, got {p}")
    nodes = spark.range(p).select(F.col("id").alias("src"))
    i = F.col("src")
    zero = nodes.where(i == 0)
    pos = nodes.where(i > 0)
    parts = [
        zero.select("src", F.lit(p - 1).cast("long").alias("dst")),
        zero.select("src", F.lit(1).cast("long").alias("dst")),
        pos.select("src", (i - 1).alias("dst")),
        pos.select("src", ((i + 1) % p).alias("dst")),
        pos.select("src", _modpow_col(i, p - 2, p).alias("dst")),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    # the reference's buildEdges drops self loops (graph.cpp:150); only
    # i ∈ {1, p−1} are self-inverse
    return out.where(F.col("src") != F.col("dst"))


def margulis_edges(spark, n: int) -> DataFrame:
    """Margulis expander (reference details/graph.cpp:645-665): nodes form an
    s×s torus (s = √n, raises if n is not a perfect square); node (i, j) links
    to (i+2j, j), (i, 2i+j), (i, 2i+j+1), (i+2j+1, j) — all mod s."""
    s = int(n**0.5)
    if s * s != n:
        raise ValueError(f"Margulis graph requires a square node count, got {n}")
    nodes = spark.range(n).select(F.col("id").alias("src"))
    i = (F.col("src") / s).cast("long")
    j = F.col("src") % s
    parts = [
        nodes.select("src", (((i + 2 * j) % s) * s + j).alias("dst")),
        nodes.select("src", (i * s + (2 * i + j) % s).alias("dst")),
        nodes.select("src", (i * s + (2 * i + j + 1) % s).alias("dst")),
        nodes.select("src", (((i + 2 * j + 1) % s) * s + j).alias("dst")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("src") != F.col("dst"))


def random_uniform_edges(
    spark,
    n_nodes: int,
    lower: float = 0.0,
    upper: float = 1.0,
    n_connections: int = 8,
    seed: int = 42,
    oversample: int = 3,
) -> DataFrame:
    """Weighted random graph (reference RandomUniform, details/graph.cpp:
    671-774): each column gets ``n_connections`` distinct random source rows
    with weights uniform in [lower, upper); n_connections <= 0 fills the
    complete matrix. The reference draws from an unseeded C++
    default_random_engine with retry-on-collision; this port keeps the
    distributional contract but derives draws from counter-based splitmix64
    hashes so output is deterministic per seed and identical on any executor
    layout (no RNG state to ship). Collision retries become oversampling +
    rank: ``oversample``×k + 8 candidate draws per column, dedupe, keep the
    first k by draw order — at n_connections ≪ n_nodes the shortfall
    probability is negligible (tests assert exact degree).
    Returns (src, dst, weight)."""
    from pyspark.sql import Window

    if n_connections <= 0:
        a = spark.range(n_nodes).select(F.col("id").alias("src"))
        b = spark.range(n_nodes).select(F.col("id").alias("dst"))
        full = a.crossJoin(b)
        u = (
            F.shiftrightunsigned(
                F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed)), 11
            ).cast("double")
            / F.lit(float(1 << 53))
        )
        return full.select(
            "src", "dst", (F.lit(lower) + u * (upper - lower)).alias("weight")
        )
    draws = n_connections * oversample + 8
    cand = (
        spark.range(n_nodes)
        .select(F.col("id").alias("dst"))
        .select(
            "dst",
            F.explode(F.sequence(F.lit(0), F.lit(draws - 1))).alias("_k"),
        )
        .select(
            "dst",
            "_k",
            F.pmod(F.xxhash64(F.col("dst"), F.col("_k"), F.lit(seed)), n_nodes).alias(
                "src"
            ),
        )
    )
    # dedupe per (dst, src) keeping the earliest draw, then take the first
    # n_connections draws per column — the per-dst window is tiny (≤ draws)
    w_dup = Window.partitionBy("dst", "src").orderBy("_k")
    w_rank = Window.partitionBy("dst").orderBy("_k", "src")
    picked = (
        cand.withColumn("_dup", F.row_number().over(w_dup))
        .where(F.col("_dup") == 1)
        .withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") <= n_connections)
    )
    u = (
        F.shiftrightunsigned(
            F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed + 1)), 11
        ).cast("double")
        / F.lit(float(1 << 53))
    )
    return picked.select(
        "src", "dst", (F.lit(lower) + u * (upper - lower)).alias("weight")
    )


def paley_edges(spark, q: int) -> DataFrame:
    """Paley graph (details/graph.cpp:536-562): vertices Z_q (q prime ≡ 1 mod
    4); i ~ j iff (i − j) is a nonzero quadratic residue mod q. Pure
    spark.range + modular arithmetic — no driver-side enumeration."""
    # q prime ≡ 1 (mod 4) is what makes −1 a residue and the graph
    # UNDIRECTED; q ≡ 3 (mod 4) silently yields a directed tournament and a
    # composite q a meaningless residue set — reject like lps_edges does
    if not is_prime(q) or q % 4 != 1:
        raise ValueError(f"paley_edges: q={q} must be a prime ≡ 1 (mod 4)")
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


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    *,
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Distributed PageRank over a DIRECTED (multi)graph, fixed-iteration
    power method. Returns (node, pr).

    pr_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} pr_t(u)/outdeg(u) + dangling_t/N)
    where dangling_t is the summed rank of nodes with no out-edges — the
    standard uniform-redistribution treatment. Multi-edges count with
    multiplicity (outdeg = count of out-edges, each parallel edge carries
    its own contribution) and self-loops contribute to their own node —
    the conventions the fixed-iteration DuckDB twin reproduces exactly.

    Scale shape (the Pregel loop, shuffle-minimal):
    - edges pre-join their outdegree ONCE, are repartitioned by src and
      persisted — the per-iteration rank join shuffles only the |V|-row
      rank table to the edge partitioning (cached-exchange reuse), and the
      contribution aggregate is map-side-combined on dst. Per iteration:
      two |V|-bounded shuffles, never |E| after the setup pass.
    - each iteration's ranks are an eager ``localCheckpoint`` (the
      BFS/CC lineage rule — the plan references ranks once per join, so
      un-truncated lineage grows linearly and analysis quadratically);
      the superseded generation's blocks are released deterministically.
    - the dangling-mass scalar is one tiny agg job per iteration, SKIPPED
      entirely when the graph has no dangling nodes (checked once).

    Exactness note (why the driver oracle can hash-match doubles): when
    every outdegree is a power of two, damping is dyadic (e.g. 0.5), and
    N is a power of two, every intermediate is an exact dyadic rational
    with denominator ≤ 2^(log2 N + iters·(1+log2 maxdeg)); while that
    stays under 2^53 the float64 arithmetic is EXACT and summation-order
    independent, so Spark and a sequential SQL twin agree bit-for-bit.
    tests/test_graph.py pins mass conservation and a hand-computed
    3-node golden for the general (non-dyadic) case."""
    spark = edges.sparkSession
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = nodes.select(F.col("node").cast("long")).persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    eo = (
        e.join(outdeg, "src")
        .repartition(shuffle_p, "src")
        .persist()
    )
    eo.count()  # materialize the partitioned edge cache before the loop
    dangling = nodes.join(
        outdeg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist()
    has_dangling = dangling.count() > 0
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("pr", F.lit(1.0 / n)).localCheckpoint(eager=True)
    try:
        for _ in range(iters):
            dm = 0.0
            if has_dangling:
                row = (
                    dangling.join(ranks, "node").agg(F.sum("pr")).collect()
                )
                dm = row[0][0] or 0.0
            contribs = (
                eo.join(ranks, eo["src"] == ranks["node"])
                .select(
                    F.col("dst").alias("node"),
                    (F.col("pr") / F.col("outdeg")).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("c"))
            )
            new_ranks = (
                nodes.join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(teleport)
                        + F.lit(damping)
                        * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dm / n))
                    ).alias("pr"),
                )
                .localCheckpoint(eager=True)
            )
            _release_checkpoint(ranks)
            ranks = new_ranks
        return ranks
    finally:
        eo.unpersist()
        dangling.unpersist()
        nodes.unpersist()


def hits(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    *,
    iters: int = 8,
) -> DataFrame:
    """HITS hub/authority scores (Kleinberg 1999) over a DIRECTED
    (multi)graph, fixed-iteration UNNORMALIZED power method in EXACT
    int64: h₀ = 1, then per iteration a_t(v) = Σ_{u→v} h_{t−1}(u) and
    h_t(u) = Σ_{u→v} a_t(v) (multi-edges count with multiplicity,
    self-loops feed themselves). Returns (node, hub, auth) = (h_T, a_T).

    Dropping the textbook per-step normalization (which only rescales —
    the RANKING is identical) keeps every intermediate an exact integer,
    so a sequential SQL twin matches bit-for-bit with no float-summation
    caveats at all. Envelope: ‖h_t‖∞ ≤ (maxout·maxin)^t — ANSI mode
    raises loudly on int64 overflow rather than wrapping; pick iters
    accordingly (callers needing many iterations on high-degree graphs
    should rescale between calls).

    Scale shape (the pagerank loop, shuffle-minimal): the edge table is
    partitioned ONCE by src and once by dst and persisted; each
    half-step joins the |V|-row score table against the matching edge
    cache (only scores shuffle) and runs one map-side-combined |E|→|V|
    aggregate. Scores are eager localCheckpoints; superseded generations
    release deterministically (the BFS/CC lineage rule)."""
    spark = edges.sparkSession
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = nodes.select(F.col("node").cast("long")).persist()
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    es = e.repartition(shuffle_p, "src").persist()
    ed = e.repartition(shuffle_p, "dst").persist()
    es.count()
    ed.count()
    h = nodes.withColumn("hub", F.lit(1).cast("long")).localCheckpoint(
        eager=True
    )
    a = nodes.withColumn("auth", F.lit(0).cast("long")).localCheckpoint(
        eager=True
    )
    try:
        for _ in range(iters):
            a_new = (
                nodes.join(
                    es.join(h, es["src"] == h["node"])
                    .select(F.col("dst").alias("node"), F.col("hub").alias("c"))
                    .groupBy("node")
                    .agg(F.sum("c").alias("c")),
                    "node",
                    "left",
                )
                .select(
                    "node",
                    F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("auth"),
                )
                .localCheckpoint(eager=True)
            )
            h_new = (
                nodes.join(
                    ed.join(a_new, ed["dst"] == a_new["node"])
                    .select(
                        F.col("src").alias("node"), F.col("auth").alias("c")
                    )
                    .groupBy("node")
                    .agg(F.sum("c").alias("c")),
                    "node",
                    "left",
                )
                .select(
                    "node",
                    F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("hub"),
                )
                .localCheckpoint(eager=True)
            )
            _release_checkpoint(h)
            _release_checkpoint(a)
            h, a = h_new, a_new
        return h.join(a, "node").select("node", "hub", "auth")
    finally:
        es.unpersist()
        ed.unpersist()
        nodes.unpersist()


def triangle_counts(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """Per-node triangle participation counts over the UNDIRECTED simple
    graph induced by ``edges`` (directions dropped, parallel edges merged,
    self-loops discarded). Returns (node, triangles) for every node in
    ``nodes`` (default: every endpoint), zeros included.

    Scale shape — the degree-ordered orientation join (the standard
    skew-proof formulation): orient each undirected edge from its lower
    (degree, id) endpoint to the higher, so every triangle is generated
    exactly once as a wedge at its LOWEST-ordered corner closed by one
    oriented edge. A hub of degree D generates wedges only from its
    ORIENTED out-edges (≤ its number of higher-degree neighbors), so the
    wedge count is Σ outdeg², bounded by O(|E|^1.5) overall instead of the
    Σ deg² a naive src-join suffers on skewed graphs; both joins are plain
    equi-joins (shuffle on node key / packed edge key), no broadcast of
    anything |V|-sized."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        _undirected(e)
        .where(F.col("src") != F.col("dst"))
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )
    deg = (
        _undirected(und)
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # total order key (deg, node) packed into one long: node ids fit 32
    # bits in every generator here; the pack keeps the orientation
    # comparison a single long compare in the joins below
    key = lambda d, i: F.shiftleft(F.col(d), 32) + F.col(i)  # noqa: E731
    ed = (
        und.join(deg.withColumnRenamed("node", "src"), "src")
        .withColumnRenamed("deg", "dsrc")
        .join(
            deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddst")),
            "dst",
        )
        .select(
            "src",
            "dst",
            key("dsrc", "src").alias("ksrc"),
            key("ddst", "dst").alias("kdst"),
        )
    )
    oriented = ed.select(
        F.when(F.col("ksrc") < F.col("kdst"), F.col("src"))
        .otherwise(F.col("dst"))
        .alias("a"),
        F.when(F.col("ksrc") < F.col("kdst"), F.col("dst"))
        .otherwise(F.col("src"))
        .alias("b"),
        F.least("ksrc", "kdst").alias("ka"),
        F.greatest("ksrc", "kdst").alias("kb"),
    )
    w1 = oriented.select("a", F.col("b").alias("b1"), F.col("kb").alias("k1"))
    w2 = oriented.select("a", F.col("b").alias("b2"), F.col("kb").alias("k2"))
    wedges = w1.join(w2, "a").where(F.col("k1") < F.col("k2"))
    closing = oriented.select(
        F.col("a").alias("b1"), F.col("b").alias("b2")
    )
    tri = wedges.join(closing, ["b1", "b2"]).select(
        "a", F.col("b1").alias("b"), F.col("b2").alias("c")
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    counts = corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles")
    )
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    return nodes.select(F.col("node").cast("long")).join(
        counts, "node", "left"
    ).select(
        "node", F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles")
    )


def sssp(
    edges: DataFrame,
    source: int,
    *,
    weight_col: str = "w",
    max_rounds: int = 64,
) -> DataFrame:
    """Single-source shortest paths: distributed Bellman-Ford with
    FRONTIER (delta) relaxation — each round relaxes only out-edges of
    nodes whose distance improved last round, so settled regions stop
    costing shuffle immediately (on a lattice the frontier is the wave
    boundary, O(√n) of the graph). Edges are taken as DIRECTED with
    non-negative integral weights; pass a symmetrized edge list (e.g. the
    grid generators' output) for undirected graphs. Integer weights make
    every tentative distance exact under any partitioning/merge order.

    Rounds needed = the weighted-shortest-path hop diameter (≤ n−1 by
    Bellman-Ford's invariant: after r rounds every node with a shortest
    path of ≤ r hops is final). Per round: one equi-join of the frontier
    against the persisted edges, one min-combine, and the improvement
    count (the termination check, computed over already-checkpointed
    blocks); superseded generations are released deterministically —
    the BFS/CC lineage-hygiene pattern.

    Returns (node, dist) for every node reachable from ``source``."""
    spark = edges.sparkSession
    e = edges.select(
        "src", "dst", F.col(weight_col).cast("long").alias("w")
    ).persist()
    try:
        dist = spark.createDataFrame(
            [(source, 0)], "node long, dist long"
        ).localCheckpoint(eager=True)
        frontier = dist
        for _ in range(max_rounds):
            cand = (
                frontier.join(e, frontier["node"] == e["src"])
                .select(
                    F.col("dst").alias("node"),
                    (frontier["dist"] + e["w"]).alias("dist"),
                )
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
            merged = (
                dist.unionByName(cand)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
            improved = (
                merged.join(
                    dist.select("node", F.col("dist").alias("_old")),
                    "node",
                    "left",
                )
                .where(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
                .select("node", "dist")
                .localCheckpoint(eager=True)
            )
            n_improved = improved.count()
            # merged/improved are materialized — the old generations have
            # no readers left
            _release_checkpoint(dist)
            if frontier is not dist:
                _release_checkpoint(frontier)
            dist, frontier = merged, improved
            if n_improved == 0:
                _release_checkpoint(frontier)
                break
        return dist
    finally:
        e.unpersist()


def catchments(
    edges: DataFrame,
    seeds: list[int],
    *,
    weight_col: str = "w",
    max_rounds: int = 64,
) -> DataFrame:
    """Graph Voronoi / catchment assignment — multi-source SSSP where every
    node is claimed by its nearest seed: the sssp frontier-relaxation loop
    with state (dist, seed) ordered LEXICOGRAPHICALLY, so ties in distance
    break to the smaller seed id deterministically in any partitioning /
    merge order (the min-struct aggregate and the improvement predicate use
    the same total order, which keeps the assignment globally consistent —
    a node that flips seed at equal distance re-propagates to its
    neighbors). One relaxation wave costs the same as sssp's: a frontier ×
    edges equi-join, a min-struct combine, one improvement count; all
    seeds' waves share the rounds, so k catchments cost ONE Bellman-Ford,
    not k. Returns (node, dist, seed) for nodes reachable from any seed."""
    spark = edges.sparkSession
    e = edges.select(
        "src", "dst", F.col(weight_col).cast("long").alias("w")
    ).persist()
    try:
        dist = spark.createDataFrame(
            [(int(s), 0, int(s)) for s in seeds],
            "node long, dist long, seed long",
        ).localCheckpoint(eager=True)
        frontier = dist
        for _ in range(max_rounds):
            cand = frontier.join(e, frontier["node"] == e["src"]).select(
                F.col("dst").alias("node"),
                (frontier["dist"] + e["w"]).alias("dist"),
                frontier["seed"],
            )
            merged = (
                dist.unionByName(cand)
                .groupBy("node")
                .agg(F.min(F.struct("dist", "seed")).alias("m"))
                .select("node", "m.dist", "m.seed")
                .localCheckpoint(eager=True)
            )
            improved = (
                merged.join(
                    dist.select(
                        "node",
                        F.col("dist").alias("_od"),
                        F.col("seed").alias("_os"),
                    ),
                    "node",
                    "left",
                )
                .where(
                    F.col("_od").isNull()
                    | (F.col("dist") < F.col("_od"))
                    | (
                        (F.col("dist") == F.col("_od"))
                        & (F.col("seed") < F.col("_os"))
                    )
                )
                .select("node", "dist", "seed")
                .localCheckpoint(eager=True)
            )
            n_improved = improved.count()
            _release_checkpoint(dist)
            if frontier is not dist:
                _release_checkpoint(frontier)
            dist, frontier = merged, improved
            if n_improved == 0:
                _release_checkpoint(frontier)
                break
        return dist
    finally:
        e.unpersist()


def kcore(edges: DataFrame, k: int, *, max_iters: int = 256) -> DataFrame:
    """k-core decomposition for a fixed ``k`` (Seidman 1983): the maximal
    induced subgraph in which every node has degree ≥ k, computed by
    iterative peeling — drop all nodes of induced degree < k, re-derive
    degrees, repeat to the fixpoint. The k-core is UNIQUE and
    order-independent (peeling in any order reaches the same maximal
    subgraph), which is what makes it exactly reproducible across engines
    with no tie-break contract at all.

    Input: undirected edge list (src, dst) — symmetrized, deduped, and
    self-loop-stripped here, so callers may pass directed/multi edges.

    Scale shape: each round is one map-side-combined degree aggregate over
    the SURVIVING edges plus two broadcast-or-hash semi-joins shrinking the
    edge set; rounds ≤ the peeling depth (typically ≪ |V|). Convergence is
    a driver count() per round — the survivor count is strictly monotone
    decreasing, so an unchanged count IS the fixpoint (no digest needed).
    Per-round results are eager localCheckpoints (the CC/BFS lineage
    pattern) with superseded generations released deterministically.

    Returns (node, deg) — the members of the k-core with their in-core
    degree (deg ≥ k by construction).
    """
    if k < 1:
        raise ValueError(f"kcore: k={k} must be >= 1")
    sym = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    # directed-both-ways view: degree = count of rows per src
    e = sym.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        sym.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ).localCheckpoint(eager=True)
    n_prev = None
    for _ in range(max_iters):
        deg = e.groupBy("u").agg(F.count("*").alias("deg"))
        surv = deg.where(F.col("deg") >= k).localCheckpoint(eager=True)
        n = surv.count()
        if n == 0:
            _release_checkpoint(e)
            schema = "node long, deg long"
            return e.sparkSession.createDataFrame([], schema)
        if n_prev is not None and n == n_prev:
            out = surv.select(F.col("u").alias("node"), "deg")
            _release_checkpoint(e)
            return out
        n_prev = n
        keep = surv.select("u")
        e2 = (
            e.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        _release_checkpoint(e)
        e = e2
    raise RuntimeError(f"kcore did not converge in {max_iters} rounds")


def boruvka_mst(edges: DataFrame, *, max_rounds: int = 64) -> DataFrame:
    """Minimum spanning forest by Borůvka's algorithm (1926) — the
    parallel-native MST: every round, each component selects its
    minimum-weight outgoing edge (one map-side-combined min-struct
    aggregate), all selections join the forest at once, and components
    contract (the existing large-star/small-star connected_components over
    the forest edges). Component count at least halves per round, so
    rounds ≤ ⌈log₂ |V|⌉ — the textbook reason Borůvka is the MST of choice
    on data-parallel engines, vs Kruskal's inherently sequential global
    sort-scan (which is exactly what the DuckDB twin runs, making the two
    formulations fully independent).

    REQUIRES pairwise-distinct weights: then the MST/forest is UNIQUE and
    both engines must produce the identical edge set with no tie-break
    contract (duplicate weights raise). Input (src, dst, w) is
    symmetrized/canonicalized here; self-loops dropped; multi-edges keep
    the lightest.

    Returns the forest edges (a, b, w), a < b.
    """
    sym = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("w").cast("long").alias("w"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    ndup = sym.groupBy("w").count().where(F.col("count") > 1).count()
    if ndup:
        raise ValueError(
            f"boruvka_mst: {ndup} duplicate edge weights — the MST is only "
            "unique (and cross-engine reproducible) under distinct weights; "
            "disambiguate the weight column first"
        )
    spark = edges.sparkSession
    nodes = (
        sym.select(F.col("a").alias("node"))
        .unionByName(sym.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = nodes.select("node", F.col("node").alias("component"))
    mst = spark.createDataFrame([], "a long, b long, w long")
    for _ in range(max_rounds):
        ca = comp.select(F.col("node").alias("a"), F.col("component").alias("_ca"))
        cb = comp.select(F.col("node").alias("b"), F.col("component").alias("_cb"))
        live = (
            sym.join(ca, "a").join(cb, "b").where(F.col("_ca") != F.col("_cb"))
        )
        # min outgoing edge per component: struct order = (w, a, b), w distinct
        pick = (
            live.select(F.col("_ca").alias("c"), F.struct("w", "a", "b").alias("e"))
            .unionByName(
                live.select(F.col("_cb").alias("c"), F.struct("w", "a", "b").alias("e"))
            )
            .groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("e.a", "e.b", "e.w")
            .distinct()
        )
        new_mst = mst.unionByName(pick).distinct().localCheckpoint(eager=True)
        if new_mst.count() == mst.count():
            break  # no component found an outgoing edge: forest complete
        _release_checkpoint(mst)  # best-effort no-op on the empty seed
        mst = new_mst
        comp = connected_components(
            mst.select(F.col("a").alias("src"), F.col("b").alias("dst")),
            nodes=nodes,
        )
    return mst


def label_propagation(
    edges: DataFrame,
    *,
    rounds: int = 4,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Synchronous label propagation community detection (Raghavan et al.
    2007, the LPA variant Spark's GraphX ships): every node starts
    labeled with its own id; each round ALL nodes simultaneously adopt
    the most frequent label among their neighbors, ties to the SMALLEST
    label, isolated nodes keep theirs. A FIXED round count (no
    convergence test) keeps the run — and its SQL replay — total and
    deterministic; callers wanting early stop can wrap it with the CC
    digest pattern. ``nodes``, when given, is the label UNIVERSE:
    edge endpoints outside it carry no label and drop from the output.

    Plan shape per round: one (node, label) shuffle against the
    once-materialized undirected edge list, a map-side-combinable
    (node, label) count, and a max-struct argmax — no window over the
    full node set; rounds are eager localCheckpoints with superseded
    generations released (the CC/BFS lineage hygiene). Returns
    (node, label) after ``rounds`` rounds."""
    und = _undirected(edges).distinct().localCheckpoint(eager=True)
    if nodes is None:
        nodes = und.select(F.col("src").alias("node")).distinct()
    labels = nodes.select(
        "node", F.col("node").cast("long").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(int(rounds)):
        nl = und.join(
            labels.select(F.col("node").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("node"), "label")
        upd = (
            nl.groupBy("node", "label")
            .agg(F.count("*").alias("cnt"))
            .groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
                ).alias("m")
            )
            .select("node", (-F.col("m.neg")).alias("nlabel"))
        )
        nxt = (
            labels.join(upd, "node", "left")
            .select(
                "node", F.coalesce("nlabel", "label").cast("long").alias("label")
            )
            .localCheckpoint(eager=True)
        )
        _release_checkpoint(labels)
        labels = nxt
    _release_checkpoint(und)
    return labels


__all__ += ["label_propagation"]
