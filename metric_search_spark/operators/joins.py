"""Exact metric joins: set-oriented kNN join and range (rnn) join.

The reference answers nn/knn/rnn one probe at a time against a single global
cover tree (/root/reference/details/tree.cpp:591-735). This module lifts those
searches to **set-oriented two-stage joins** (SURVEY.md §2.3/§3.2):

stage 1 (coarse prune, relational): both sides are encoded to Morton quadkey
    cells over their normalized 2-D coordinates (pure Column expressions —
    whole-stage codegen); **build rows replicate to the k-ring halo of their
    cell** while probes stay uniquely in their own cell group, so the two
    sides meet in one cell-keyed cogroup shuffle and every probe's full
    candidate set is in a single group. Hot probe cells are **explicitly
    salted** (north rule): their probes split across ⌈n/threshold⌉ salt
    buckets and the halo fans out to each bucket; AQE is the safety net.

stage 2 (fine refinement, Arrow kernel): per (cell, salt) group an
    ``applyInPandas`` kernel computes each probe's exact top-k — either a
    vectorized all-pairs numpy kernel ("flat") or a per-cell cover tree with
    the reference's triangle-inequality pruning ("covertree",
    core/covertree.py). Because a probe lives in exactly one group, the
    kernel's ranked output IS the final answer — no global window shuffle on
    this path (the reference's bounded sorted kNN list, tree.cpp:664-677,
    lives inside the kernel).

Exactness across cell boundaries (the correctness crux the single-tree
reference never faced): a probe's result is provably exact when its kth
distance is ≤ the distance from the probe to the edge of the explored ring
square (``ring_guarantee_radius``). Probes that fail the guarantee escalate:
for those (typically <1%) the join flips to a probe-expansion scheme — the
unresolved probes explode to a doubled ring of candidate cells, meet the
build side (salted by build-cell counts), and merge through a window top-k —
doubling the ring until it covers the grid. Work in escalation rounds is
proportional to the unresolved probes, not the build table. For
full-dimensional metrics indexed by a contractive 2-D projection (e.g. 64-d
L2 indexed by two coordinates), the same guarantee holds scaled by
``coord_scale`` = the minimum axis scale, since d_full ≥ coord_scale · d_2d.

Scale notes (100 TB framing): the fast path is COLUMNAR end-to-end — both
cogroup sides are packed to one array-row per cell before the shuffle, so
the cogroup's sort handles |cells|·ring² + |cells| rows (thousands), not
|build|·ring² + |probes| records (tens of millions); byte volume is
unchanged but row-handling, sort comparisons, and Arrow per-row overhead
shrink by the ~rows-per-cell factor (~256×). The kernel returns per-probe
ranked arrays; the ring-guarantee verdict reads them narrowly and the
row-per-rank form is a JVM-side posexplode. Shuffle bytes are
|build|·ring² + |probes| + k·|probes| — never |build|×|probes|; per-group
memory is bounded by the resolution's rows-per-cell target (and probe
salting); no driver-side collect of data rows. The flagship plan at ring 1
resolves ~all probes when resolution targets ~256 rows/cell.

res=0 tier (high-dim metrics the projection can't prune, or tiny builds):
exact brute force as a bounded P×B block grid (``_grid_knn``) — per-task
memory capped at ``grid_chunk_rows`` rows per side, hash-uniform
parallelism, partial top-k + one window merge. Distance work is inherently
quadratic there; the approximate tier for that regime is
operators.ann.cosine_topk_lsh (or normalize-then-L2 back onto the cell
path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metric_search_spark.cells import cell_size
from metric_search_spark.core.covertree import CoverTree
from metric_search_spark.core.metrics import Metric, get_metric
from metric_search_spark.functions.spatial import cell_from_xy_col, kring_cells_col

__all__ = ["knn_join", "range_join", "asof_join", "KnnJoinStats"]


@dataclass
class KnnJoinStats:
    """Per-call execution metrics (the engine's observability surface)."""

    n_build: int = 0
    resolution: int = 0
    rounds: list[dict] = field(default_factory=list)


def _require_distance(metric: Metric) -> None:
    """The reference's Cosine returns SIMILARITY (Standards.cpp:84-96 quirk);
    ranking it ascending would return the k LEAST similar rows and the L2
    ring guarantee would be meaningless — reject instead of silently lying.
    Cosine callers: operators.ann.cosine_topk / cosine_topk_lsh, or
    normalize-then-L2 through this join (ann.py module docstring)."""
    if getattr(metric, "name", "") == "cosine":
        raise ValueError(
            "cosine is a similarity, not a distance; use operators.ann."
            "cosine_topk / cosine_topk_lsh, or normalize vectors and join "
            "with the euclidean metric (top-k by cosine == top-k by L2 on "
            "the unit sphere)"
        )


def _pick_resolution(n_build: int, target_per_cell: int) -> int:
    """Resolution so that E[rows/cell] ≈ target under uniform spread."""
    if n_build <= target_per_cell:
        return 0
    return max(0, min(20, round(math.log(n_build / target_per_cell, 4.0))))


def _as_matrix_col(series) -> np.ndarray:
    vals = series.to_numpy()
    if len(vals) and isinstance(vals[0], np.ndarray):
        return np.vstack(vals).astype(np.float64, copy=False)
    return np.asarray(
        [np.asarray(v, dtype=np.float64) for v in vals], dtype=np.float64
    )


def _group_matrix(pdf) -> np.ndarray:
    """Record matrix for one cogroup side: _vec if shipped, else (x, y)."""
    if "_vec" in pdf.columns:
        return _as_matrix_col(pdf["_vec"])
    return np.column_stack(
        (pdf["_x"].to_numpy(np.float64), pdf["_y"].to_numpy(np.float64))
    )


def _flat_topk(
    metric: Metric, P: np.ndarray, B: np.ndarray, k: int, chunk: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-group top-k: returns (idx (n,k'), dist (n,k')) with
    k' = min(k, |B|), ties broken by build position (callers pre-sort build
    rows by id so position order == id order).

    The probe chunk is sized so the distance block (chunk × |B| doubles)
    stays ~2 MB — cache-resident — because the kernel is memory-bound on the
    D matrix, and cache-resident blocks are what lets many concurrent
    workers scale instead of fighting for DRAM bandwidth."""
    kk = min(k, B.shape[0])
    if chunk is None:
        chunk = max(16, min(4096, (1 << 15) // max(1, B.shape[0] // 8)))
    all_idx = np.empty((P.shape[0], kk), dtype=np.int64)
    all_d = np.empty((P.shape[0], kk), dtype=np.float64)
    for s in range(0, P.shape[0], chunk):
        D = metric.cross(P[s : s + chunk], B)
        if kk < B.shape[0]:
            part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            # argpartition breaks VALUE ties arbitrarily: when the kth
            # boundary falls inside a tie group, re-select those rows with
            # the (dist, position) order the join contract promises
            kth = np.take_along_axis(D, part, axis=1).max(axis=1)
            bad = np.nonzero((D <= kth[:, None]).sum(axis=1) > kk)[0]
            for r in bad:
                cand = np.nonzero(D[r] <= kth[r])[0]  # position-ascending
                o = np.lexsort((cand, D[r, cand]))[:kk]
                part[r] = cand[o]
        else:
            part = np.broadcast_to(np.arange(kk), (D.shape[0], kk))
        pd_ = np.take_along_axis(D, part, axis=1)
        order = np.lexsort((part, pd_), axis=1)
        all_idx[s : s + chunk] = np.take_along_axis(part, order, axis=1)
        all_d[s : s + chunk] = np.take_along_axis(pd_, order, axis=1)
    return all_idx, all_d


def _covertree_topk(
    metric: Metric, P: np.ndarray, B: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-group top-k via a local cover tree with the reference's pruning
    (exact 'safe' bound — core/covertree.py)."""
    tree = CoverTree(metric)
    tree.insert_batch(list(B))
    kk = min(k, B.shape[0])
    idx = np.empty((P.shape[0], kk), dtype=np.int64)
    d = np.empty((P.shape[0], kk), dtype=np.float64)
    for i in range(P.shape[0]):
        res = tree.knn(P[i], k=kk, prune="safe")
        # node handle == insertion position == build row position
        idx[i] = [n for n, _ in res]
        d[i] = [dd for _, dd in res]
    return idx, d


def _clamp01(c: Column) -> Column:
    """Clamp into [0, 1): cell assignment quantize-clips the same way, and the
    ring guarantee treats grid borders as fully covered — both must use the
    same clamped coordinate."""
    return F.least(F.greatest(c.cast("double"), F.lit(0.0)), F.lit(1.0 - 2.0**-31))


def _prepare(
    df: DataFrame, id_col: str, vec_col: str | None, x_col: str, y_col: str, res: int
) -> DataFrame:
    """Normalized projection. ``vec_col=None`` is the 2-D fast path: the
    metric runs on (x, y) directly, so no Arrow list column is shuffled —
    two plain double columns are ~3× lighter on the wire."""
    cols = [F.col(id_col).alias("_id")]
    if vec_col is not None:
        cols.append(F.col(vec_col).cast("array<double>").alias("_vec"))
    cols += [
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
        cell_from_xy_col(_clamp01(F.col(x_col)), _clamp01(F.col(y_col))
                         , res).alias("_cell"),
    ]
    return df.select(*cols)


def _salts_for(side_c: DataFrame, salt_threshold: int) -> DataFrame:
    """Hot-cell table (cell, n_salt) from one side's per-cell counts."""
    return (
        side_c.groupBy("_cell")
        .count()
        .where(F.col("count") > salt_threshold)
        .select(
            "_cell",
            F.ceil(F.col("count") / salt_threshold).cast("int").alias("n_salt"),
        )
    )


def _payload_cols(side_c: DataFrame) -> list[str]:
    return [c for c in ("_id", "_vec", "_x", "_y") if c in side_c.columns]


def _with_salt(side_c: DataFrame, salts: DataFrame) -> DataFrame:
    """Deterministically scatter a hot cell's rows across its salt buckets."""
    return side_c.join(F.broadcast(salts), "_cell", "left").select(
        *_payload_cols(side_c),
        "_cell",
        F.when(
            F.col("n_salt").isNotNull(),
            F.pmod(F.xxhash64(F.col("_id").cast("string")), F.col("n_salt")).cast(
                "int"
            ),
        )
        .otherwise(F.lit(0))
        .alias("_salt"),
    )


def _pack_cells(side_c: DataFrame) -> DataFrame:
    """Collapse a prepared side to ONE row per cell with columnar arrays of
    its records (ids, coords, optional vectors) — all JVM-side expression
    work (collect_list + transform).

    Why: the halo replicates the build side to its ring (×9 at ring 1, more
    for range joins). Replicating *packed cells* instead of raw rows cuts the
    cogroup's shuffled/sorted row count from |build|·ring² to |cells|·ring²
    (~500× at the default 256 rows/cell) — the cogroup sort of tens of
    millions of tiny rows, not the numpy kernel, was the dominant cost of the
    fast path (r2 event-log profile). Byte volume is unchanged; row-handling
    and sort comparisons shrink by the pack factor."""
    has_vec = "_vec" in side_c.columns
    rec = F.struct(
        *(["_id", "_vec", "_x", "_y"] if has_vec else ["_id", "_x", "_y"])
    )
    packed = side_c.groupBy("_cell").agg(F.collect_list(rec).alias("_recs"))
    cols = [
        "_cell",
        F.transform("_recs", lambda r: r["_id"]).alias("_ids"),
        F.transform("_recs", lambda r: r["_x"]).alias("_xs"),
        F.transform("_recs", lambda r: r["_y"]).alias("_ys"),
    ]
    if has_vec:
        # FLATTENED (list<double>), not list<list<double>>: pyarrow 16
        # segfaults converting nested list-of-list cogroup batches to pandas
        # (worker crash in arrow_to_pandas); the kernel reshapes by |ids|
        cols.append(
            F.flatten(F.transform("_recs", lambda r: r["_vec"])).alias("_vecs")
        )
    return packed.select(*cols)


def _halo_build_packed(
    build_c: DataFrame, salts: DataFrame, res: int, ring_k: int
) -> DataFrame:
    """Packed-cell halo: pack first, then replicate each cell row to its
    k-ring and fan out across the target cell's probe salt buckets."""
    packed = _pack_cells(build_c)
    payload = [c for c in ("_ids", "_xs", "_ys", "_vecs") if c in packed.columns]
    exploded = packed.select(
        *payload,
        F.explode(kring_cells_col(F.col("_cell"), res, ring_k)).alias("_cell"),
    )
    return exploded.join(F.broadcast(salts), "_cell", "left").select(
        *payload,
        "_cell",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1)
        ).alias("_salt"),
    )


def _pack_probes(probes_s: DataFrame) -> DataFrame:
    """Collapse the salted probe side to one row per (cell, salt) group with
    columnar record arrays — same rationale as _pack_cells: the cogroup then
    sorts thousands of packed rows, not millions of probe rows."""
    has_vec = "_vec" in probes_s.columns
    rec = F.struct(
        *(["_id", "_vec", "_x", "_y"] if has_vec else ["_id", "_x", "_y"])
    )
    packed = probes_s.groupBy("_cell", "_salt").agg(F.collect_list(rec).alias("_recs"))
    cols = [
        "_cell",
        "_salt",
        F.transform("_recs", lambda r: r["_id"]).alias("_pids"),
        F.transform("_recs", lambda r: r["_x"]).alias("_pxs"),
        F.transform("_recs", lambda r: r["_y"]).alias("_pys"),
    ]
    if has_vec:
        # flattened for the same pyarrow nested-list reason as _pack_cells
        cols.append(
            F.flatten(F.transform("_recs", lambda r: r["_vec"])).alias("_pvecs")
        )
    return packed.select(*cols)


def _unpack_probes(probe_pdf) -> tuple[np.ndarray, np.ndarray]:
    """(ids, record matrix) for a kernel group's probe side — packed
    (_pids/_pxs/_pys[/_pvecs]) or plain rows."""
    if "_pids" in probe_pdf.columns:
        ids = np.concatenate([np.asarray(a) for a in probe_pdf["_pids"]])
        if "_pvecs" in probe_pdf.columns:
            P = np.vstack(
                [
                    np.asarray(flat, np.float64).reshape(len(cell_ids), -1)
                    for cell_ids, flat in zip(probe_pdf["_pids"], probe_pdf["_pvecs"])
                ]
            )
        else:
            xs = np.concatenate([np.asarray(a, np.float64) for a in probe_pdf["_pxs"]])
            ys = np.concatenate([np.asarray(a, np.float64) for a in probe_pdf["_pys"]])
            P = np.column_stack((xs, ys))
        return ids, P
    return probe_pdf["_id"].to_numpy(), _group_matrix(probe_pdf)


def _ranked_group_topk_arrays(
    probes_packed: DataFrame,
    build_halo: DataFrame,
    metric: Metric,
    k: int,
    kernel: str,
    qid_type: str,
    bid_type: str,
) -> DataFrame:
    """Fast-path kernel, fully columnar: packed probes × packed halo cells
    cogrouped by (cell, salt); output is ONE ROW PER PROBE carrying its
    ranked neighbor/distance ARRAYS. Downstream the ring-guarantee verdict
    reads size/last-element narrowly (no 20M-row aggregate shuffle) and the
    row-per-rank form is a JVM-side posexplode — Arrow moves |probes| rows,
    not k·|probes|."""
    import pandas as pd

    out_schema = (
        f"query_id {qid_type}, _nids array<{bid_type}>, _dists array<double>"
    )
    # object dtype: an empty float64 ndarray routes pyarrow into the
    # NumPyConverter, which cannot target list<> types
    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=object),
            "_nids": pd.Series([], dtype=object),
            "_dists": pd.Series([], dtype=object),
        }
    )

    def fn(key, probe_pdf, build_pdf):
        if len(probe_pdf) == 0 or len(build_pdf) == 0:
            return empty
        raw_ids, raw_B = _unpack_build(build_pdf)
        order = raw_ids.argsort(kind="stable")
        bids = raw_ids[order]
        B = raw_B[order]
        pids, P = _unpack_probes(probe_pdf)
        if kernel == "covertree":
            idx, d = _covertree_topk(metric, P, B, k)
        else:
            idx, d = _flat_topk(metric, P, B, k)
        nid_rows = bids[idx]
        # .tolist(): plain python scalars — Arrow's NumPyConverter refuses
        # numpy string scalars inside list values
        return pd.DataFrame(
            {
                "query_id": pids,
                "_nids": [r.tolist() for r in nid_rows],
                "_dists": [r.tolist() for r in d],
            }
        )

    return (
        probes_packed.groupBy("_cell", "_salt")
        .cogroup(build_halo.groupBy("_cell", "_salt"))
        .applyInPandas(fn, schema=out_schema)
    )


def _explode_ranked(packed: DataFrame) -> DataFrame:
    """Packed per-probe arrays → (query_id, neighbor_id, dist, rank) rows —
    a narrow JVM-side posexplode, no shuffle."""
    z = F.arrays_zip("_nids", "_dists")
    return packed.select("query_id", F.posexplode(z).alias("_pos", "_z")).select(
        "query_id",
        F.col("_z._nids").alias("neighbor_id"),
        F.col("_z._dists").alias("dist"),
        (F.col("_pos") + 1).cast("int").alias("rank"),
    )


def _unpack_build(build_pdf) -> tuple[np.ndarray, np.ndarray]:
    """(ids, record matrix) for a kernel group's build side — packed
    (_ids/_xs/_ys[/_vecs] array rows, one per halo cell) or plain rows."""
    if "_ids" in build_pdf.columns:
        # ids keep their native dtype (long or string) — tie-break argsort
        # and the output column both preserve it
        ids = np.concatenate([np.asarray(a) for a in build_pdf["_ids"]])
        if "_vecs" in build_pdf.columns:
            B = np.vstack(
                [
                    np.asarray(flat, np.float64).reshape(len(cell_ids), -1)
                    for cell_ids, flat in zip(build_pdf["_ids"], build_pdf["_vecs"])
                ]
            )
        else:
            xs = np.concatenate([np.asarray(a, np.float64) for a in build_pdf["_xs"]])
            ys = np.concatenate([np.asarray(a, np.float64) for a in build_pdf["_ys"]])
            B = np.column_stack((xs, ys))
        return ids, B
    return build_pdf["_id"].to_numpy(), _group_matrix(build_pdf)


def _guarantee_col(res: int, ring_k: Column | int) -> Column:
    """Column twin of cells.ring_guarantee_radius: distance from the probe to
    the nearest edge of its explored ring square (grid borders = covered)."""
    s = F.lit(cell_size(res))
    k = ring_k if isinstance(ring_k, Column) else F.lit(float(ring_k))
    x = _clamp01(F.col("_x"))
    y = _clamp01(F.col("_y"))
    cx = F.floor(x / s)
    cy = F.floor(y / s)
    lo_x = (cx - k) * s
    hi_x = (cx + k + 1.0) * s
    lo_y = (cy - k) * s
    hi_y = (cy + k + 1.0) * s
    inf = F.lit(float("inf"))
    mx_lo = F.when(lo_x <= 0.0, inf).otherwise(x - lo_x)
    mx_hi = F.when(hi_x >= 1.0, inf).otherwise(hi_x - x)
    my_lo = F.when(lo_y <= 0.0, inf).otherwise(y - lo_y)
    my_hi = F.when(hi_y >= 1.0, inf).otherwise(hi_y - y)
    return F.least(mx_lo, mx_hi, my_lo, my_hi)


def _ranked_group_topk(
    probes_s: DataFrame,
    build_halo: DataFrame,
    metric: Metric,
    k: int,
    kernel: str,
    qid_type: str,
    bid_type: str,
) -> DataFrame:
    """Fast-path kernel: cogroup by (cell, salt); each probe's candidates are
    complete within its group, so the kernel emits final ranked rows."""
    import pandas as pd

    out_schema = f"query_id {qid_type}, neighbor_id {bid_type}, dist double, rank int"
    empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "dist": [], "rank": []})

    def fn(key, probe_pdf, build_pdf):
        if len(probe_pdf) == 0 or len(build_pdf) == 0:
            return empty
        raw_ids, raw_B = _unpack_build(build_pdf)
        order = raw_ids.argsort(kind="stable")
        bids = raw_ids[order]
        B = raw_B[order]
        P = _group_matrix(probe_pdf)
        if kernel == "covertree":
            idx, d = _covertree_topk(metric, P, B, k)
        else:
            idx, d = _flat_topk(metric, P, B, k)
        kk = idx.shape[1]
        return pd.DataFrame(
            {
                "query_id": probe_pdf["_id"].to_numpy().repeat(kk),
                "neighbor_id": bids[idx.ravel()],
                "dist": d.ravel(),
                "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), len(P)),
            }
        )

    return (
        probes_s.groupBy("_cell", "_salt")
        .cogroup(build_halo.groupBy("_cell", "_salt"))
        .applyInPandas(fn, schema=out_schema)
    )


def _expand_probes(
    probes_c: DataFrame,
    salts: DataFrame,
    res: int,
    ring_k: int,
    build_cells: DataFrame | None = None,
) -> DataFrame:
    """Escalation-path probe side: explode unresolved probes to their k-ring
    of candidate cells (and the build side's salt buckets). When the ring
    covers the whole grid, cross-join against the build side's distinct
    occupied cells instead of enumerating the (2k+1)² offset square."""
    # payload = whatever _prepare shipped (_vec for full-dim metrics, _x/_y
    # for the 2-D fast path) — the kernel's _group_matrix falls back to
    # (_x, _y) when _vec is absent, so the escalation path must keep them
    payload = _payload_cols(probes_c)
    if build_cells is not None and ring_k >= (1 << res):
        cand = probes_c.select(*payload).crossJoin(F.broadcast(build_cells))
    else:
        cand = probes_c.select(
            *payload,
            F.explode(kring_cells_col(F.col("_cell"), res, ring_k)).alias("_cell"),
        )
    cand = cand.join(F.broadcast(salts), "_cell", "left")
    return cand.select(
        *payload,
        "_cell",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1)
        ).alias("_salt"),
    )


def _partial_topk(
    probe_cand: DataFrame,
    build_salted: DataFrame,
    metric: Metric,
    k: int,
    kernel: str,
    qid_type: str,
    bid_type: str,
) -> DataFrame:
    """Escalation-path kernel: per-(cell, salt) partial top-k rows
    (≤ k per probe per group); merged by the caller's window."""
    import pandas as pd

    out_schema = f"query_id {qid_type}, neighbor_id {bid_type}, dist double"
    empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "dist": []})

    def fn(key, probe_pdf, build_pdf):
        if len(probe_pdf) == 0 or len(build_pdf) == 0:
            return empty
        raw_ids, raw_B = _unpack_build(build_pdf)
        order = raw_ids.argsort(kind="stable")
        bids = raw_ids[order]
        B = raw_B[order]
        P = _group_matrix(probe_pdf)
        if kernel == "covertree":
            idx, d = _covertree_topk(metric, P, B, k)
        else:
            idx, d = _flat_topk(metric, P, B, k)
        kk = idx.shape[1]
        return pd.DataFrame(
            {
                "query_id": probe_pdf["_id"].to_numpy().repeat(kk),
                "neighbor_id": bids[idx.ravel()],
                "dist": d.ravel(),
            }
        )

    return (
        probe_cand.groupBy("_cell", "_salt")
        .cogroup(build_salted.groupBy("_cell", "_salt"))
        .applyInPandas(fn, schema=out_schema)
    )


def _grid_knn(
    probes_c: DataFrame,
    build_c: DataFrame,
    n_build: int,
    metric: Metric,
    k: int,
    kernel: str,
    qid_type: str,
    bid_type: str,
    chunk_rows: int,
    stats: KnnJoinStats,
) -> DataFrame:
    """Exact brute-force kNN as a bounded-memory block grid (the res=0 tier:
    high-dim metrics the 2-D projection cannot prune, or tiny builds).

    Probes hash into P row-chunks, build into B; each side replicates to the
    other's chunk axis so every (probe-chunk, build-chunk) pair meets in one
    cogroup of ≤ chunk_rows rows per side — per-task memory is bounded and
    parallelism is P×B regardless of data skew (hash chunking is uniform by
    construction, no salting needed). Partial per-chunk top-k rows then merge
    through one window. Shuffle volume is |probes|·B + |build|·P ≈
    2·|probes|·|build|/chunk_rows: exact kNN is inherently quadratic in
    distance evaluations — this bounds memory and spreads the work evenly; at
    real scale route to the cell-partitioned path (res>0 with a contractive
    projection) or operators.ann.cosine_topk_lsh for the approximate tier.
    Never |build| rows in one task, unlike a replicated single-cell plan."""
    n_probes = probes_c.count()
    bparts = max(1, math.ceil(n_build / chunk_rows))
    pparts = max(1, math.ceil(n_probes / chunk_rows))
    # independent cogroup key space (int, not Morton cells): reuse the
    # (_cell, _salt) kernel plumbing with _cell := build-chunk, _salt :=
    # probe-chunk
    build_g = build_c.select(
        *_payload_cols(build_c),
        F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(bparts))
        .cast("int")
        .alias("_cell"),
        F.explode(F.sequence(F.lit(0), F.lit(pparts - 1))).alias("_salt"),
    )
    probes_g = probes_c.select(
        *_payload_cols(probes_c),
        F.explode(F.sequence(F.lit(0), F.lit(bparts - 1))).alias("_cell"),
        F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(pparts))
        .cast("int")
        .alias("_salt"),
    )
    stats.rounds.append(
        {"plan": "grid", "bparts": bparts, "pparts": pparts, "exhaustive": True}
    )
    if bparts == 1:
        # every probe sees the whole build side in its single group — the
        # kernel's ranked output is final, no window
        return _ranked_group_topk(
            probes_g, build_g, metric, k, kernel, qid_type, bid_type
        )
    partial = _partial_topk(
        probes_g, build_g, metric, k, kernel, qid_type, bid_type
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return partial.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def knn_join(
    probes: DataFrame,
    build: DataFrame,
    k: int = 10,
    *,
    id_col: str = "id",
    vec_col: str | None = "vec",
    x_col: str = "x",
    y_col: str = "y",
    probe_id_col: str | None = None,
    metric: str | Metric = "euclidean",
    res: int | None = None,
    target_per_cell: int = 256,
    salt_threshold: int | None = None,
    kernel: str = "flat",
    coord_scale: float = 1.0,
    max_rounds: int = 12,
    grid_chunk_rows: int = 8192,
    stats: KnnJoinStats | None = None,
) -> DataFrame:
    """Exact k-nearest-neighbor join (reference knn, tree.cpp:635-690, lifted
    to a set-oriented join per SURVEY.md §2.3).

    Returns (query_id, neighbor_id, dist, rank) with rank 1..k ascending by
    (dist, neighbor_id). Both inputs need ``id_col``, ``vec_col``
    (array<numeric>, the metric's input) and normalized ``x_col``/``y_col``
    in [0,1)² (the 2-D index projection). Exact for any metric satisfying
    d(a,b) ≥ coord_scale · L2((ax,ay),(bx,by)).

    This call is eager: it runs the escalation loop (one Spark job per round)
    and returns the materialized union of per-round results. On the common
    fast path the returned DataFrame is a narrow view over a persisted
    packed result whose cache handle rides along as ``._msk_backing`` —
    callers that need run-to-run isolation (benchmarks) should
    ``getattr(out, "_msk_backing", out).unpersist()`` when done; otherwise
    Spark's ContextCleaner frees it on GC.
    """
    if isinstance(metric, str):
        metric = get_metric(metric)
    _require_distance(metric)
    n_build = build.count()
    if res is None:
        res = _pick_resolution(n_build, target_per_cell)
    if salt_threshold is None:
        salt_threshold = max(4 * target_per_cell, 64)
    if stats is None:
        stats = KnnJoinStats()
    stats.n_build = n_build
    stats.resolution = res

    qid_type = probes.schema[probe_id_col or id_col].dataType.simpleString()
    bid_type = build.schema[id_col].dataType.simpleString()

    build_c = _prepare(build, id_col, vec_col, x_col, y_col, res).persist()
    probes_c = _prepare(
        probes, probe_id_col or id_col, vec_col, x_col, y_col, res
    ).persist()
    to_unpersist: list[DataFrame] = [build_c, probes_c]
    done_parts: list[DataFrame] = []
    grid_n = 1 << res
    try:
        if grid_n == 1:
            # res 0: the 2-D index cannot prune — bounded block-grid brute
            # force (see _grid_knn), one shot, provably exhaustive
            out = _grid_knn(
                probes_c,
                build_c,
                n_build,
                metric,
                k,
                kernel,
                qid_type,
                bid_type,
                grid_chunk_rows,
                stats,
            )
            return out.localCheckpoint(eager=True)

        # ---- round 1: halo fast path over the full probe set -------------
        # fully columnar: both cogroup sides are packed per cell (thousands
        # of array rows through the shuffle sort, not millions of records),
        # the kernel returns per-probe ranked ARRAYS, the verdict reads them
        # narrowly, and rows-per-rank appear only via a JVM-side posexplode
        salts_p = _salts_for(probes_c, salt_threshold)
        probes_s = _with_salt(probes_c, salts_p)
        probes_p = _pack_probes(probes_s)
        halo = _halo_build_packed(build_c, salts_p, res, 1)
        packed = _ranked_group_topk_arrays(
            probes_p, halo, metric, k, kernel, qid_type, bid_type
        ).persist()
        to_unpersist.append(packed)
        ranked = _explode_ranked(packed)

        per_probe = packed.select(
            "query_id",
            F.size("_nids").cast("long").alias("cnt"),
            F.element_at("_dists", F.size("_dists")).alias("kth"),
        )
        probe_geo = probes_c.select(
            F.col("_id").alias("query_id"), "_x", "_y"
        ).withColumn("guar", _guarantee_col(res, 1) * F.lit(coord_scale))
        verdict = probe_geo.join(per_probe, "query_id", "left").select(
            "query_id",
            (
                (
                    F.coalesce(F.col("cnt"), F.lit(0))
                    >= F.lit(min(k, max(n_build, 1)))
                )
                & (F.col("kth") < F.col("guar"))
            ).alias("ok"),
        )
        unresolved_ids = (
            verdict.where(~F.coalesce(F.col("ok"), F.lit(False)))
            .select(F.col("query_id").alias("_id"))
            .persist()
        )
        to_unpersist.append(unresolved_ids)
        n_unres = unresolved_ids.count()
        stats.rounds.append({"ring_k": 1, "unresolved": n_unres})
        if n_unres == 0:
            done_parts.append(ranked)
            unresolved = None
        else:
            done_parts.append(
                ranked.join(
                    unresolved_ids.select(F.col("_id").alias("query_id")),
                    "query_id",
                    "left_anti",
                )
            )
            unresolved = probes_c.join(unresolved_ids, "_id", "left_semi")


        # ---- escalation rounds: probe-expansion scheme, work ∝ unresolved
        if unresolved is not None:
            salts_b = _salts_for(build_c, salt_threshold)
            build_salted = _with_salt(build_c, salts_b).persist()
            to_unpersist.append(build_salted)
            build_cells = build_salted.select(
                F.col("_cell").alias("_cell")
            ).distinct()
            w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
            ring_k = 2
            for rnd in range(max_rounds):
                exhaustive = ring_k >= grid_n or rnd == max_rounds - 1
                cand = _expand_probes(
                    unresolved,
                    salts_b,
                    res,
                    grid_n if exhaustive else ring_k,
                    build_cells,
                )
                partial = _partial_topk(
                    cand, build_salted, metric, k, kernel, qid_type, bid_type
                )
                topk = (
                    partial.withColumn("rank", F.row_number().over(w))
                    .where(F.col("rank") <= k)
                    .persist()
                )
                to_unpersist.append(topk)
                if exhaustive:
                    done_parts.append(topk)
                    stats.rounds.append({"ring_k": ring_k, "exhaustive": True})
                    break
                per_probe = topk.groupBy("query_id").agg(
                    F.count("*").alias("cnt"), F.max("dist").alias("kth")
                )
                probe_geo = unresolved.select(
                    F.col("_id").alias("query_id"), "_x", "_y"
                ).withColumn("guar", _guarantee_col(res, ring_k) * F.lit(coord_scale))
                verdict = probe_geo.join(per_probe, "query_id", "left").select(
                    "query_id",
                    (
                        (
                            F.coalesce(F.col("cnt"), F.lit(0))
                            >= F.lit(min(k, max(n_build, 1)))
                        )
                        & (F.col("kth") < F.col("guar"))
                    ).alias("ok"),
                )
                unresolved_ids = (
                    verdict.where(~F.coalesce(F.col("ok"), F.lit(False)))
                    .select(F.col("query_id").alias("_id"))
                    .persist()
                )
                to_unpersist.append(unresolved_ids)
                n_unres = unresolved_ids.count()
                stats.rounds.append({"ring_k": ring_k, "unresolved": n_unres})
                if n_unres == 0:
                    done_parts.append(topk)
                    break
                done_parts.append(
                    topk.join(
                        unresolved_ids.select(F.col("_id").alias("query_id")),
                        "query_id",
                        "left_anti",
                    )
                )
                unresolved = unresolved.join(unresolved_ids, "_id", "left_semi")
                ring_k *= 2

        if len(done_parts) == 1 and unresolved is None:
            # common case (every probe resolved in the fast round): return
            # the narrow explode view over the persisted PACKED result —
            # zero extra materialization (checkpointing k·|probes| exploded
            # rows costs a full pass + heap it then pays for in GC). The
            # backing cache rides along on the returned DataFrame so callers
            # that need run-to-run isolation (bench.py) can release it —
            # Spark's CacheManager would otherwise hand the cached plan to
            # the next identical call.
            to_unpersist.remove(packed)
            ranked._msk_backing = packed  # type: ignore[attr-defined]
            return ranked
        out = done_parts[0]
        for p in done_parts[1:]:
            out = out.unionByName(p)
        # escalation happened: materialize the union via localCheckpoint
        # (reads the persisted per-round results once), then release every
        # internal cache
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        for df in to_unpersist:
            df.unpersist()


def range_join(
    probes: DataFrame,
    build: DataFrame,
    radius: float,
    *,
    id_col: str = "id",
    vec_col: str | None = "vec",
    x_col: str = "x",
    y_col: str = "y",
    probe_id_col: str | None = None,
    metric: str | Metric = "euclidean",
    res: int | None = None,
    target_per_cell: int = 256,
    salt_threshold: int | None = None,
    coord_scale: float = 1.0,
    inclusive: bool = False,
) -> DataFrame:
    """Range (radius) join — the reference's rnn (tree.cpp:698-735) as a
    distance join. Membership is STRICT d < radius by default (the
    reference's quirk, tree.cpp:718); pass inclusive=True for d ≤ radius.

    Single round of the halo scheme: the build-side ring radius that provably
    covers every probe ball is ⌈(radius / coord_scale) / cell_size⌉. Probes
    stay in their own cell group (salted when hot); no window needed.
    Returns (query_id, neighbor_id, dist).
    """
    if isinstance(metric, str):
        metric = get_metric(metric)
    _require_distance(metric)
    n_build = build.count()
    if res is None:
        res = _pick_resolution(n_build, target_per_cell)
    if salt_threshold is None:
        salt_threshold = max(4 * target_per_cell, 64)
    norm_r = radius / coord_scale
    ring_k = min(1 << res, int(math.ceil(norm_r / cell_size(res))))

    qid_type = probes.schema[probe_id_col or id_col].dataType.simpleString()
    bid_type = build.schema[id_col].dataType.simpleString()

    build_c = _prepare(build, id_col, vec_col, x_col, y_col, res)
    probes_c = _prepare(
        probes, probe_id_col or id_col, vec_col, x_col, y_col, res
    ).persist()
    salts_p = _salts_for(probes_c, salt_threshold)
    probes_s = _with_salt(probes_c, salts_p)
    # packed halo matters even more here: the ring is ⌈r/cell⌉ wide, so raw
    # replication would shuffle |build|·(2k+1)² rows
    halo = _halo_build_packed(build_c, salts_p, res, ring_k)

    import pandas as pd

    out_schema = f"query_id {qid_type}, neighbor_id {bid_type}, dist double"
    empty = pd.DataFrame({"query_id": [], "neighbor_id": [], "dist": []})

    def fn(key, probe_pdf, build_pdf):
        if len(probe_pdf) == 0 or len(build_pdf) == 0:
            return empty
        bids, B = _unpack_build(build_pdf)
        P = _group_matrix(probe_pdf)
        D = metric.cross(P, B)
        mask = (D <= radius) if inclusive else (D < radius)
        pi, bi = np.nonzero(mask)
        return pd.DataFrame(
            {
                "query_id": probe_pdf["_id"].to_numpy()[pi],
                "neighbor_id": bids[bi],
                "dist": D[pi, bi],
            }
        )

    out = (
        probes_s.groupBy("_cell", "_salt")
        .cogroup(halo.groupBy("_cell", "_salt"))
        .applyInPandas(fn, schema=out_schema)
    )
    # release handle for the internal probes cache (the knn_join convention:
    # getattr(out, "_msk_backing", out).unpersist() when done)
    out._msk_backing = probes_c  # type: ignore[attr-defined]
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_order: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward AS-OF join (task brief's named custom operator): every left
    row picks the single LATEST right row with ``right.on <= left.on``
    (inclusive), per ``by`` key — left rows with no prior right row keep
    NULLs. Matches DuckDB's native ``ASOF LEFT JOIN ... ON l.on >= r.on``
    semantics (pinned in tests/test_asof.py).

    Spark-first plan — the union-and-carry trick, NOT a range join: tag the
    two inputs, union, and per key carry the last non-null right payload
    through one ordered window (right rows sort BEFORE left rows at equal
    ``on``, making the match inclusive; ``right_order`` breaks duplicate
    right timestamps deterministically — last in (on, right_order) wins).
    ONE hash-partitioned sort per key column set, no point-interval
    explosion, no UDF, whole-stage codegen throughout: at 10⁹×10⁹ rows this
    is a single shuffle of |left| + |right| rows, versus the |left|·window
    blowup of the naive theta-join formulation.

    Skew caveat (disclosed, not mitigated here): ordered per-key semantics
    put each key's full timeline in one window partition, so a single hot
    key with 10⁸ rows is one task's sort — inherent to any as-of contract.
    The standard mitigations (pre-bucket the key's timeline by coarse time
    range and carry boundary state between buckets) compose on top of this
    operator; the fixture keys are uniform so none is wired in.

    Returns every left column plus each right payload column renamed
    ``<col><suffix>``."""
    keys = [by] if isinstance(by, str) else list(by or [])
    payload = [c for c in right.columns if c not in keys and c != on]
    if right_order is not None:
        # order by the column's OWN type: a cast to long would silently
        # null out string/timestamp tie-breakers and reintroduce the
        # nondeterminism the parameter exists to remove
        rord_type = right.schema[right_order].dataType
        ro: Column = F.col(right_order)
    else:
        from pyspark.sql.types import LongType

        rord_type = LongType()
        ro = F.lit(0).cast("long")

    lcols = [F.col(c) for c in left.columns]
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(rord_type).alias("_rord"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in payload],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys and c != on],
        *[F.col(k) for k in keys],
        F.col(on),
        F.lit(0).alias("_side"),
        ro.alias("_rord"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    ).select(*[f"{c}" for c in l_tag.columns])  # align column order
    merged = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the matched right row as ONE struct, null on left rows: per-
    # column last(ignorenulls) would backfill a NULL payload field from an
    # OLDER right row, emitting a row that never existed (DuckDB ASOF
    # returns the matched row's fields verbatim, NULLs included); all
    # carries still share one window -> one sort
    rrow = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"{c}{suffix}").alias(c) for c in payload]),
    ).otherwise(F.lit(None))
    carried = merged.select(
        *[c for c in merged.columns if c not in ("_side", "_rord")],
        F.col("_side"),
        F.last(rrow, ignorenulls=True).over(w).alias("_c"),
    )
    out = carried.where(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_c.{c}").alias(f"{c}{suffix}") for c in payload],
    )
    return out
