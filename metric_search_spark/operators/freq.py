"""Frequent-items operators: exact distributed top-k and a mergeable
Misra–Gries heavy-hitters sketch.

Token counting is the reference's §2.4-style aggregate surface applied to
the task brief's training-data pipeline: "which tokens/shingles dominate the
corpus" drives stop-lists, BPE seeding, and dedup salt choices. Two tiers:

- ``value_topk``: EXACT top-k by count. One hash aggregate (map-side
  partial combine is automatic) then ``TakeOrderedAndProject`` — Spark's
  per-task bounded top-k merge, the same "kNN bounded sorted list" shape
  the cover tree uses (reference tree.cpp:664) — so a 10⁹-token corpus
  shuffles |vocab-per-task| partial counts and then moves only k rows per
  task to the final merge, never a global sort.
- ``misra_gries``: when the value domain itself explodes (open-vocab
  n-grams, URLs) and even the distinct-key aggregate is too big, the
  classic deterministic heavy-hitters summary (Misra & Gries 1982) with the
  mergeable-summaries combine (Agarwal et al., PODS 2012): capacity-c
  summaries per partition, pointwise-sum merge, subtract the (c+1)-th
  largest merged weight. Estimates are UNDER-counts with an exact, computed
  error certificate: ``est ≤ true ≤ est + err_ub``, absent values have
  ``true ≤ err_ub``, so every value with ``true > err_ub`` is retained —
  all three pinned in tests/test_freq.py. With capacity ≥ per-partition
  distinct count the sketch degenerates to exact counts under ANY
  partitioning (no decrement ever fires) — that is the oracle-checkable
  driver configuration (``heavy_hitters_documents``), the same pattern as
  IVF's exact-at-full-probe gate; at small capacity the retained SET is
  partitioning-dependent (inherent to MG) and the tests pin the guarantee
  instead of the values.

The per-partition pass is batched weighted MG: each Arrow batch
pre-aggregates with ``value_counts`` (vectorized), merges into the running
Series with one indexed add, and on overflow subtracts the (c+1)-th largest
weight from every entry in one vectorized pass (a weighted decrement round
removing ≥ (c+1)·m total mass — the textbook bound is preserved because at
most c entries can exceed the (c+1)-th largest). No per-row Python anywhere.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "explode_tokens",
    "value_topk",
    "misra_gries",
    "misra_gries_with_bound",
    "group_entropy",
]


def explode_tokens(
    df: DataFrame, text_col: str = "text", out_col: str = "tok"
) -> DataFrame:
    """One row per whitespace token (the engine's shared tokenization
    convention — matches token_stats / the DuckDB twins' string_split)."""
    return df.select(
        F.explode(F.split(F.col(text_col), " ")).alias(out_col)
    ).where(F.col(out_col) != "")


def value_topk(
    df: DataFrame, value_col: str, k: int, *, count_col: str = "cnt"
) -> DataFrame:
    """Exact global top-k most frequent values: (value, cnt) with the total
    order (cnt DESC, value ASC) — deterministic at ties, so the result is
    hashable cross-engine. The plan is partial-agg → final-agg →
    TakeOrderedAndProject: no global sort, no single-partition window
    (pinned in tests/test_freq.py)."""
    if k < 1:
        raise ValueError(f"k {k} must be >= 1")
    return (
        df.groupBy(F.col(value_col).alias(value_col))
        .agg(F.count(F.lit(1)).alias(count_col))
        .orderBy(F.col(count_col).desc(), F.col(value_col).asc())
        .limit(k)
    )


def _mg_overflow(acc: pd.Series, cap: int) -> tuple[pd.Series, int]:
    """One weighted decrement round: subtract the (cap+1)-th largest weight
    m from every entry and keep the strictly-positive survivors (≤ cap of
    them). Returns (new_acc, m)."""
    w = acc.to_numpy()
    m = int(np.partition(w, len(w) - cap - 1)[len(w) - cap - 1])
    acc = acc[w > m] - m
    return acc, m


def misra_gries(
    df: DataFrame,
    value_col: str,
    capacity: int,
    *,
    est_col: str = "est",
    err_col: str = "err_ub",
) -> DataFrame:
    """Row-only convenience wrapper over ``misra_gries_with_bound`` — the
    bound rides on every row as ``err_col``. NOTE: when nothing survives the
    decrements the result is EMPTY and the bound is unobservable here; use
    the tuple-returning variant when you need it unconditionally."""
    rows, _err = misra_gries_with_bound(
        df, value_col, capacity, est_col=est_col, err_col=err_col
    )
    return rows


def misra_gries_with_bound(
    df: DataFrame,
    value_col: str,
    capacity: int,
    *,
    est_col: str = "est",
    err_col: str = "err_ub",
) -> tuple[DataFrame, int]:
    """Distributed Misra–Gries heavy hitters: (rows, err_ub) where rows are
    ≤ ``capacity`` (value, est, err_ub) records with
    ``est ≤ true_count ≤ est + err_ub`` for every retained value and
    ``true_count ≤ err_ub`` for every absent one, and ``err_ub`` is EXACT
    bookkeeping (summed per-partition decrement mass plus the merge
    offset), not the loose N/(c+1) worst case. The scalar return keeps the
    certificate observable even when the row set is empty (every value
    decremented away — possible under heavy all-ties tails).

    Plan: one mapInPandas pass emits each partition's capacity-c summary
    plus a sentinel row carrying its decrement mass (≤ c+1 rows per
    partition); the merge is a tiny groupBy-sum over ≤ (c+1)·P rows, then
    one final offset subtraction — the same summary-lattice shape as
    kmv_merge. Raw rows never cross a shuffle.
    """
    if capacity < 1:
        raise ValueError(f"capacity {capacity} must be >= 1")
    cap = capacity
    vt = df.schema[value_col].dataType.simpleString()

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype=np.int64)
        dec = 0
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            vc = pdf[value_col].value_counts(sort=False).astype(np.int64)
            acc = vc if acc.empty else acc.add(vc, fill_value=0).astype(np.int64)
            if len(acc) > cap:
                acc, m = _mg_overflow(acc, cap)
                dec += m
        if not seen:
            return
        # the sentinel row (null value, weight 0) carries the partition's
        # decrement mass even when the summary itself emptied (all-ties
        # decrement rounds can drop every entry) — losing it would
        # under-state err_ub and break the guarantee
        yield pd.DataFrame(
            {
                "_v": list(acc.index) + [None],
                "_w": np.concatenate(
                    [acc.to_numpy(dtype=np.int64), np.zeros(1, dtype=np.int64)]
                ),
                "_dec": np.int64(dec),
            }
        )

    # null inputs are ignored (value_counts drops them anyway; filtering
    # makes that explicit and frees null for the sentinel row)
    summaries = (
        df.select(value_col)
        .where(F.col(value_col).isNotNull())
        .mapInPandas(summarize, schema=f"_v {vt}, _w long, _dec long")
    )
    summaries = summaries.localCheckpoint(eager=True)  # two consumers below
    merged = summaries.where(F.col("_v").isNotNull()).groupBy("_v").agg(
        F.sum("_w").alias("_w")
    )
    # exact global decrement mass: every row of a partition's summary
    # carries the same _dec, so take one per map partition and sum
    dec_total = (
        summaries.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.first("_dec").alias("_d"))
        .agg(F.coalesce(F.sum("_d"), F.lit(0)).alias("_t"))
        .collect()[0][0]
    )
    if merged.count() > cap:
        # merge overflow: subtract the (cap+1)-th largest merged weight
        off = (
            merged.orderBy(F.col("_w").desc(), F.col("_v").asc())
            .limit(cap + 1)
            .agg(F.min("_w").alias("_m"))
            .collect()[0][0]
        )
    else:
        off = 0
    err = int(dec_total) + int(off)
    rows = merged.where(F.col("_w") > off).select(
        F.col("_v").alias(value_col),
        (F.col("_w") - F.lit(off)).cast("long").alias(est_col),
        F.lit(err).cast("long").alias(err_col),
    )
    return rows, err


def group_entropy(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    micro: float = 1e9,
) -> DataFrame:
    """Shannon entropy (nats) of the ``value_col`` distribution within each
    group — the behavioral-diversity / label-balance probe (a user who only
    ever 'click's scores 0; uniform over k values scores ln k).

    Two map-side-combined aggregates: (group, value) counts, then a
    per-group reduce of −(c/n)·ln(c/n) terms. Each term's float chain runs
    on identical exact integers in every engine; the CROSS-TERM sum — the
    one order-sensitive float reduction — is quenched to an order-free
    exact int64 sum by rounding each term to ``micro`` units first (a
    ~10⁻¹⁶ relative ulp vs the ½·10⁻⁹ boundary: flip probability ~10⁻⁷/term
    — the BM25 design, one decimal tighter). Returns
    (group, n, ndv, entropy_micro:int64)."""
    cnt = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("g")
    n = F.sum("c").over(w)
    p = F.col("c").cast("double") / n.cast("double")
    term = F.round(-(p * F.log(p)) * F.lit(micro), 0).cast("long")
    return (
        cnt.select("g", n.alias("n"), term.alias("t"))
        .groupBy("g", "n")
        .agg(
            F.count(F.lit(1)).alias("ndv"),
            F.sum("t").alias("entropy_micro"),
        )
        .select(F.col("g").alias(group_col), "n", "ndv", "entropy_micro")
    )
