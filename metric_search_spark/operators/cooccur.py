"""Token co-occurrence statistics: document-level PMI.

The collocation/association primitive of corpus analysis (phrase mining,
vocab pruning, topic seeds): for unordered token pairs {a, b}, pointwise
mutual information over document co-occurrence,

    pmi(a, b) = ln( N·c_ab / (c_a·c_b) )

with c_x = #docs containing x, c_ab = #docs containing both, N = #docs.

Scale shape: per-document DISTINCT token sets (one groupBy), pair
generation by a doc_id self-join with tok_a < tok_b — the per-doc pair
fan-out is |doc vocab|², bounded by document length, never corpus vocab;
the pair aggregate is map-side combined on the (tok_a, tok_b) key. A
``min_count`` support cut bounds the output the way every collocation
pipeline does. Counts are exact integers; the single ln() is the only
float — computed from identical integers in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pmi_pairs"]


def pmi_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Document-level PMI for all unordered token pairs with co-document
    support ≥ ``min_count``. Returns (tok_a, tok_b, c_ab, pmi),
    tok_a < tok_b."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    n = docs.count()
    cx = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    a = toks.select("doc", F.col("tok").alias("tok_a"))
    b = toks.select("doc", F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    ca = cx.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca"))
    cb = cx.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(ca), "tok_a")
        .join(F.broadcast(cb), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            F.log(
                F.lit(float(n))
                * F.col("c_ab").cast("double")
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("pmi"),
        )
    )
