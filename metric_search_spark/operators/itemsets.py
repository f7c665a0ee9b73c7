"""Frequent-itemset mining — level-wise Apriori (Agrawal & Srikant 1994),
the market-basket staple: find every itemset contained in at least
``num/den`` of the baskets.

Scale shape (the relational Apriori): frequent (k−1)-itemsets extend by one
frequent item (prefix extension keeps arrays sorted and candidates unique);
the candidate set — tiny by the Apriori property — BROADCASTS against the
basket table, and support counting is one map-side-combined aggregate per
level (baskets stream once per level; items never shuffle). The classic
subset-prune is an optimization only — support counting already discards
infrequent candidates — and is intentionally omitted: at any support
threshold worth mining, |candidates| ≪ |baskets| and the broadcast count
dominates either way.

Determinism: support thresholds compare as INTEGER cross-multiplications
(support·den ≥ n_baskets·num) — no float fraction ever enters, so the
DuckDB twin (a fully independent bitmask enumeration over the global item
vocabulary, no level-wise join at all) matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apriori"]


def apriori(
    items: DataFrame,
    *,
    basket_cols: list[str],
    item_col: str = "item",
    min_support_num: int = 1,
    min_support_den: int = 20,
    max_size: int = 3,
) -> DataFrame:
    """``items``: one row per (basket, item) — duplicates allowed (they are
    collapsed; support is basket-level containment). Returns
    (itemset, k, support) for every itemset of size ≤ ``max_size`` with
    support·den ≥ n_baskets·num, itemset rendered as the comma-joined
    sorted items."""
    if min_support_num < 1 or min_support_den < 1:
        raise ValueError("min support fraction must be positive")
    distinct = items.select(*basket_cols, F.col(item_col).alias("_item")).distinct()
    baskets = distinct.groupBy(*basket_cols).agg(
        F.sort_array(F.collect_set("_item")).alias("_items")
    ).select("_items")
    n = baskets.count()
    if n == 0:
        return items.sparkSession.createDataFrame(
            [], "itemset string, k int, support long"
        )
    baskets = baskets.localCheckpoint(eager=True)  # one materialization,
    # re-scanned once per level
    thresh_ok = lambda c: c * min_support_den >= n * min_support_num  # noqa: E731

    sp = items.sparkSession
    out_frames = []
    # L1
    l1_rows = (
        distinct.groupBy("_item")
        .agg(F.count("*").alias("support"))
        .collect()
    )
    frequent = sorted(
        (r["_item"], int(r["support"])) for r in l1_rows if thresh_ok(r["support"])
    )
    level = [((it,), sup) for it, sup in frequent]
    freq_items = [it for it, _ in frequent]
    out_frames.extend(
        (",".join(s), len(s), sup) for s, sup in level
    )
    k = 2
    while level and k <= max_size:
        # prefix extension: extend each frequent (k-1)-set by a frequent
        # item greater than its last element — sorted, unique candidates
        cands = [
            s + (it,)
            for s, _ in level
            for it in freq_items
            if it > s[-1]
        ]
        if not cands:
            break
        cand_df = F.broadcast(
            sp.createDataFrame(
                [(list(c),) for c in cands], "cand array<string>"
            )
        )
        counted = (
            baskets.join(
                cand_df, F.size(F.array_except(F.col("cand"), F.col("_items"))) == 0
            )
            .groupBy("cand")
            .agg(F.count("*").alias("support"))
            .collect()
        )
        level = sorted(
            (tuple(r["cand"]), int(r["support"]))
            for r in counted
            if thresh_ok(r["support"])
        )
        out_frames.extend((",".join(s), len(s), sup) for s, sup in level)
        k += 1
    return sp.createDataFrame(
        out_frames or [], "itemset string, k int, support long"
    )
