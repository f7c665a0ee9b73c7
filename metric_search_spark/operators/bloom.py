"""Bloom-filter membership and Count-Min frequency sketches — the two
classic bounded-memory ingest structures a 100-TB training-data pipeline
leans on (seen-URL / seen-doc membership at ingest; approximate per-key
frequency without a full groupBy), built on the shared MINSTD hash
contract (operators/sampling.hash_col) so a DuckDB twin reproduces every
bit position, every counter, and every estimate exactly — unlike the
engine-private layouts of builtin sketches.

Representation is RELATIONAL, which is what makes them Spark-native:

- A Bloom filter is the set of its SET BITS — a DataFrame of
  (groups..., bit_pos) with ≤ m rows per group, produced by one bounded
  distinct. Filters merge by union (bit-OR == set union).
- A Count-Min sketch is its counter table — (groups..., row_idx,
  col_idx, cnt) with ≤ d·w rows per group, produced by one bounded
  groupBy (map-side partial aggregation collapses each task's output to
  ≤ d·w rows before the shuffle). Sketches merge by summing counters.

Probing is ZERO-SHUFFLE by construction: the k (resp. d) hash positions
are computed as k SEPARATE COLUMNS (k is a small literal), and each is
resolved with its own broadcast hash join against the ≤ m-row (resp.
≤ d·w-row) sketch relation — k map-side joins, no Exchange anywhere on
the probe side. At 10⁹ probes the plan is scan → k broadcast joins →
project; the groupBy-free shape is pinned in tests/test_bloom_cms.py.

Guarantees (both pinned in tests):
- Bloom: NO false negatives ever (every member's k bits were set); the
  false-positive rate follows (1−e^(−kn/m))^k.
- Count-Min: est ≥ true count always (hash collisions only ADD); the
  overcount is bounded by εN with probability 1−δ for w=⌈e/ε⌉, d=⌈ln1/δ⌉
  (Cormode & Muthukrishnan 2005).

Reference parity note: the reference has no sketch module — these fill
the task brief's "novel sketch"/pipeline-operator slot alongside
operators/sketch (KMV, HLL), citing only the public algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metric_search_spark.operators.sampling import hash_col, sample_hash_sql

__all__ = [
    "bloom_build",
    "bloom_probe",
    "bloom_probe_sql",
    "cms_build",
    "cms_estimate",
    "cms_estimate_sql",
]


def _check_kd(n: int, what: str, lo: int = 1, hi: int = 16) -> None:
    if not (lo <= n <= hi):
        raise ValueError(
            f"{what} {n} out of range [{lo}, {hi}] — each hash becomes a "
            "broadcast join; more than a handful defeats the plan shape"
        )


def bloom_build(
    df: DataFrame,
    groups: list[str],
    value_col: str,
    *,
    m_bits: int,
    k_hashes: int = 5,
    seed: int = 0,
) -> DataFrame:
    """The filter as a relation: distinct (groups..., bit_pos) over the
    k_hashes positions of every member. ≤ m_bits rows per group however
    large the input; one distinct is the only shuffle. ``value_col`` must
    be a non-negative integer column (the cross-engine hash contract).
    Filters over the same (m, k, seed) merge by plain union+distinct."""
    _check_kd(k_hashes, "k_hashes")
    if m_bits < 2:
        raise ValueError(f"m_bits {m_bits} must be >= 2")
    parts = [
        df.select(
            *groups,
            F.pmod(hash_col(F.col(value_col), seed + i), F.lit(m_bits)).alias(
                "bit_pos"
            ),
        )
        for i in range(k_hashes)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    groups: list[str],
    value_col: str,
    *,
    m_bits: int,
    k_hashes: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Probe rows get ``bloom_positive``: true iff ALL k bit positions are
    set in the group's filter. k broadcast left joins against the ≤ m-row
    bit relation — zero Exchange on the probe side (plan pinned)."""
    _check_kd(k_hashes, "k_hashes")
    out = probes
    positive = F.lit(True)
    for i in range(k_hashes):
        pos = F.pmod(hash_col(F.col(value_col), seed + i), F.lit(m_bits))
        out = out.withColumn(f"_bp{i}", pos)
        marker = bits.select(
            *[F.col(g).alias(f"_g{i}_{g}") for g in groups],
            F.col("bit_pos").alias(f"_bp{i}_set"),
        )
        cond = F.col(f"_bp{i}") == F.col(f"_bp{i}_set")
        for g in groups:
            cond = cond & (F.col(g) == F.col(f"_g{i}_{g}"))
        out = out.join(F.broadcast(marker), cond, "left")
        positive = positive & F.col(f"_bp{i}_set").isNotNull()
    out = out.withColumn("bloom_positive", positive)
    drop = [f"_bp{i}" for i in range(k_hashes)]
    drop += [f"_bp{i}_set" for i in range(k_hashes)]
    drop += [f"_g{i}_{g}" for i in range(k_hashes) for g in groups]
    return out.drop(*drop)


def bloom_probe_sql(
    members_rel: str,
    probes_rel: str,
    value_expr: str,
    probe_value_expr: str,
    *,
    m_bits: int,
    k_hashes: int = 5,
    seed: int = 0,
) -> str:
    """DuckDB twin: recompute the bit set from ``members_rel`` and each
    probe's k positions from scratch (no hand-off), join per position.
    Ungrouped form (single filter); returns columns
    (probe_val, bloom_positive)."""
    member_pos = "\nUNION\n".join(
        f"SELECT ({sample_hash_sql(value_expr, seed + i)}) % {m_bits} AS bit_pos "
        f"FROM {members_rel}"
        for i in range(k_hashes)
    )
    probe_cols = ", ".join(
        f"({sample_hash_sql(probe_value_expr, seed + i)}) % {m_bits} AS bp{i}"
        for i in range(k_hashes)
    )
    joins = "\n".join(
        f"LEFT JOIN bits b{i} ON p.bp{i} = b{i}.bit_pos" for i in range(k_hashes)
    )
    allset = " AND ".join(f"b{i}.bit_pos IS NOT NULL" for i in range(k_hashes))
    return f"""
WITH bits AS (
  {member_pos}
), probe_pos AS (
  SELECT {probe_value_expr} AS probe_val, {probe_cols} FROM {probes_rel}
)
SELECT p.probe_val, ({allset}) AS bloom_positive
FROM probe_pos p
{joins}
"""


def cms_build(
    df: DataFrame,
    groups: list[str],
    key_col: str,
    *,
    width: int,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Counter relation (groups..., row_idx, col_idx, cnt): each input row
    increments one counter per sketch row. One d×-expansion then a bounded
    groupBy — map-side partials cap every task's shuffle write at d·w rows
    per group. Sketches over the same (w, d, seed) merge by summing cnt."""
    _check_kd(depth, "depth")
    if width < 2:
        raise ValueError(f"width {width} must be >= 2")
    rows = df.select(
        *groups,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        F.pmod(
                            hash_col(F.col(key_col), seed + i), F.lit(width)
                        ).alias("col_idx"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(*groups, "rc.row_idx", "rc.col_idx")
    return rows.groupBy(*groups, "row_idx", "col_idx").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    groups: list[str],
    key_col: str,
    *,
    width: int,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Each key row gets ``est_count`` = min over the d counters it hashes
    to. d broadcast joins against the ≤ d·w-row counter relation — zero
    Exchange on the key side. A counter never touched by any input is
    absent from the relation ⇒ its count is 0 (coalesce)."""
    _check_kd(depth, "depth")
    out = keys
    mins: list = []
    for i in range(depth):
        out = out.withColumn(
            f"_cc{i}", F.pmod(hash_col(F.col(key_col), seed + i), F.lit(width))
        )
        ctr = sketch.where(F.col("row_idx") == i).select(
            *[F.col(g).alias(f"_g{i}_{g}") for g in groups],
            F.col("col_idx").alias(f"_cc{i}_at"),
            F.col("cnt").alias(f"_cnt{i}"),
        )
        cond = F.col(f"_cc{i}") == F.col(f"_cc{i}_at")
        for g in groups:
            cond = cond & (F.col(g) == F.col(f"_g{i}_{g}"))
        out = out.join(F.broadcast(ctr), cond, "left")
        mins.append(F.coalesce(F.col(f"_cnt{i}"), F.lit(0)))
    out = out.withColumn("est_count", F.least(*mins).cast("long"))
    drop = [f"_cc{i}" for i in range(depth)]
    drop += [f"_cc{i}_at" for i in range(depth)]
    drop += [f"_cnt{i}" for i in range(depth)]
    drop += [f"_g{i}_{g}" for i in range(depth) for g in groups]
    return out.drop(*drop)


def cms_estimate_sql(
    rel: str,
    key_expr: str,
    keys_rel: str,
    probe_key_expr: str,
    *,
    width: int,
    depth: int = 4,
    seed: int = 0,
) -> str:
    """DuckDB twin: rebuild every counter from ``rel`` and take the min
    over d for each key in ``keys_rel``. Ungrouped form; returns
    (probe_key, est_count)."""
    counter_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS row_idx, ({sample_hash_sql(key_expr, seed + i)}) % {width} "
        f"AS col_idx FROM {rel}"
        for i in range(depth)
    )
    key_cols = ", ".join(
        f"({sample_hash_sql(probe_key_expr, seed + i)}) % {width} AS cc{i}"
        for i in range(depth)
    )
    joins = "\n".join(
        f"LEFT JOIN counters c{i} ON c{i}.row_idx = {i} AND c{i}.col_idx = k.cc{i}"
        for i in range(depth)
    )
    least = ", ".join(f"COALESCE(c{i}.cnt, 0)" for i in range(depth))
    return f"""
WITH counter_rows AS (
  {counter_rows}
), counters AS (
  SELECT row_idx, col_idx, count(*) AS cnt FROM counter_rows
  GROUP BY row_idx, col_idx
), key_pos AS (
  SELECT {probe_key_expr} AS probe_key, {key_cols} FROM {keys_rel}
)
SELECT k.probe_key, CAST(LEAST({least}) AS BIGINT) AS est_count
FROM key_pos k
{joins}
"""
