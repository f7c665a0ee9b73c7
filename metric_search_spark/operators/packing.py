"""Sequence packing: greedy bin-fill of documents into fixed token budgets.

LLM pretraining doesn't feed documents one-per-context — it PACKS them:
concatenate documents in a deterministic order until the next one would
overflow the context budget, then start a new bin (GPT-style "sequence
packing"; the first-fit-in-order heuristic). Packing is inherently
sequential, so the distributed shape is SHARDED sequentialism: a
deterministic hash shard per document, greedy order within the shard, one
zero-join array fold per shard — parallelism = number of shards, and the
assignment is a pure function of (doc_id, len) so any engine reproduces
it bit-for-bit.

Scale note: each shard's documents are collected into one array, so
``n_shards`` must be sized to the corpus (10⁹ docs / 10⁵ shards = 10⁴
docs/shard ≈ a few MB of (id, len) pairs — the fold state is two ints).
The operator packs METADATA ONLY (ids + lengths); the byte-level
concatenation is a later shuffle-by-bin join that never passes through
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]

_ACC_T = "array<struct<doc_id:bigint,bin:bigint,fill:bigint>>"


def pack_sequences(
    docs: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    len_col: str = "n_chars",
    n_shards: int = 64,
) -> DataFrame:
    """Greedy first-fit-in-order packing: within each of ``n_shards`` hash
    shards (shard = id % n_shards), documents are visited in ascending id
    and appended to the current bin while ``fill + len ≤ budget``;
    otherwise a new bin opens with the document (an oversize document —
    len > budget — therefore sits alone in its bin, the truncate-later
    convention). Bin ids are 1-based per shard; ``fill_after`` is the
    bin's exact running total after the document lands.

    Plan: ONE shuffle (groupBy shard → sorted collect_list of (id, len))
    + a Column-lambda left fold + posexplode — no Python, no window over
    the corpus, shards run embarrassingly parallel. Returns
    (doc_id, shard, bin_local, fill_after)."""
    if budget < 1:
        raise ValueError(f"budget {budget} must be >= 1")
    did = F.col(id_col).cast("long")
    base = docs.select(
        did.alias("_id"),
        (did % n_shards).alias("shard"),
        F.col(len_col).cast("long").alias("_len"),
    )
    srt = F.array_sort(F.collect_list(F.struct("_id", "_len")))
    g = base.groupBy("shard").agg(srt.alias("ds"))

    def step(acc, d):
        last_bin = F.element_at(acc, F.size(acc))["bin"]
        last_fill = F.element_at(acc, F.size(acc))["fill"]
        fits = last_fill + d["_len"] <= F.lit(budget)
        nxt = F.when(
            F.size(acc) == 0,
            F.struct(
                d["_id"].alias("doc_id"),
                F.lit(1).cast("bigint").alias("bin"),
                d["_len"].alias("fill"),
            ),
        ).otherwise(
            F.when(
                fits,
                F.struct(
                    d["_id"].alias("doc_id"),
                    last_bin.alias("bin"),
                    (last_fill + d["_len"]).alias("fill"),
                ),
            ).otherwise(
                F.struct(
                    d["_id"].alias("doc_id"),
                    (last_bin + 1).alias("bin"),
                    d["_len"].alias("fill"),
                )
            )
        )
        return F.concat(acc, F.array(nxt))

    packed = F.aggregate(F.col("ds"), F.array().cast(_ACC_T), step)
    out = g.select("shard", F.explode(packed).alias("p"))
    return out.select(
        F.col("p.doc_id").alias(id_col),
        F.col("shard").cast("long").alias("shard"),
        F.col("p.bin").alias("bin_local"),
        F.col("p.fill").alias("fill_after"),
    )
