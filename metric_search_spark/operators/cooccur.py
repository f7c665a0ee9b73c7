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


def chi2_tokens(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    min_df: int = 5,
    k: int = 15,
) -> DataFrame:
    """Per-label discriminative vocabulary by χ² association — the
    feature-selection / corpus-drift tool (which tokens distinguish one
    source from the rest): for every (label, token), the 2×2 presence
    table a/b/c/d (docs in label with/without token, docs outside
    with/without) and the χ² score ``N·(ad−bc)² / ((a+b)(c+d)(a+c)(c+d))``,
    top-``k`` per label by (χ² desc, token asc).

    Exactness: a, b, c, d are exact distinct-presence counts; the χ²
    numerator N·(ad−bc)² and denominator are computed as int64 and meet
    in ONE correctly-rounded float64 division, so the double is
    bit-identical across engines (both operands ≤ 2⁵³ at corpus sizes
    up to ~10⁵ docs; beyond that promote to decimal — the aggregation
    plan is unchanged). min_df prunes the hapax tail BEFORE the
    per-label expansion.

    Plan: distinct (doc, token) explode → one (token, label) count +
    one token total + one label total (broadcast) — no doc×token×label
    product; top-k is a per-label window over the pruned vocabulary.
    Returns (label, token, a, b, c, d, chi2, rnk)."""
    from pyspark.sql import Window

    pres = (
        docs.select(
            F.col(id_col).alias("_d"),
            F.col(label_col).alias("label"),
            F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias(
                "token"
            ),
        )
        .where(F.length("token") > 0)
        .distinct()
    )
    n_total = docs.select(F.countDistinct(id_col).alias("n")).first()["n"]
    lab_sizes = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.countDistinct(id_col).alias("ns")
    )
    tok_tot = (
        pres.groupBy("token")
        .agg(F.countDistinct("_d").alias("tc"))
        # tc = N makes the table degenerate (b = d = 0 ⇒ 0/0): a token
        # present in EVERY doc carries no signal — excluded by contract
        .where((F.col("tc") >= min_df) & (F.col("tc") < n_total))
    )
    tl = pres.groupBy("label", "token").agg(F.countDistinct("_d").alias("a"))
    # tok_tot is VOCAB-sized — a hash join (AQE may still broadcast it at
    # small scale); only the |labels|-row table gets the broadcast hint
    j = tl.join(tok_tot, "token").join(F.broadcast(lab_sizes), "label")
    a = F.col("a")
    b = F.col("ns") - a
    c = F.col("tc") - a
    d = F.lit(n_total) - F.col("ns") - c
    det = a * d - b * c
    num = (F.lit(n_total) * det * det).cast("double")
    den = (
        F.col("ns") * (F.lit(n_total) - F.col("ns"))
        * F.col("tc") * (F.lit(n_total) - F.col("tc"))
    ).cast("double")
    scored = j.select(
        "label",
        "token",
        a.cast("long").alias("a"),
        b.cast("long").alias("b"),
        c.cast("long").alias("c"),
        d.cast("long").alias("d"),
        (num / den).alias("chi2"),
    )
    w = Window.partitionBy("label").orderBy(F.col("chi2").desc(), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


__all__.append("chi2_tokens")
