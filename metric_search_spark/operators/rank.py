"""BM25 document ranking for a fixed query-term set.

The retrieval primitive of every corpus pipeline (quality-weighted
sampling, query-based corpus slicing, eval-set mining): Okapi BM25 with
the Lucene idf variant,

    idf(t)  = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))          (> 0 always)
    s(d, t) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    bm25(d) = Σ_{t ∈ q} s(d, t)

Scale shape: tokenize → ONE map-side-combined (doc, tok) count restricted
to the query terms (the hot path never materialises the full postings
table), per-term document frequencies are a |q|-row broadcast, document
lengths are one groupBy, and the final per-doc reduce is an exact int64
sum — no joins beyond one broadcast and one doc-keyed merge. The corpus
text is tokenized three times (the n_toks scalar, dl, tf) — each a linear
distributed scan; callers whose corpus scan dominates should materialize
the exploded token table once and manage its lifecycle themselves.

Determinism contract (the module family's recurring theme): every float
input to a term score (idf, avgdl, dl ratio) is computed by identical
correctly-rounded IEEE ops on identical exact integers in both engines;
the single cross-engine hazard — ln()'s last ulp — is quenched by
rounding each TERM score to integer micro-units (½·10⁻⁶ boundary vs a
~10⁻¹⁶ relative ulp: flip probability ~10⁻¹⁰/row), after which the
per-document reduction is an ORDER-FREE exact integer sum. Ranking ties
break by doc id on the integer score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 100,
) -> DataFrame:
    """Top-``top_n`` documents by BM25 over ``terms`` (whitespace
    tokenizer — the house convention shared with pmi_pairs/tfidf).
    Returns (doc_id, score_micro:int64 = Σ round(s(d,t)·10⁶), rank),
    rank by (score_micro desc, doc_id asc)."""
    if not terms:
        raise ValueError("bm25_topk: empty query-term set")
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    n_docs = docs.count()
    n_toks = toks.count()
    # avgdl over ALL docs (token-less docs contribute dl=0): exact ints →
    # one identical IEEE quotient in both engines
    avgdl = n_toks / n_docs

    tf = (
        toks.where(F.col("tok").isin(list(terms)))
        .groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    dl = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    sc = idf * F.col("tf").cast("double") * F.lit(k1 + 1.0) / norm
    per_term = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc")
        .select("doc", F.round(sc * F.lit(1e6), 0).cast("long").alias("smicro"))
    )
    agg = per_term.groupBy("doc").agg(F.sum("smicro").alias("score_micro"))
    # global top-n via sort+limit → Catalyst's TakeOrderedAndProject
    # (per-partition top-n, driver merge) — NEVER an unpartitioned window
    # over the full corpus; the window below ranks only the ≤top_n
    # survivors
    top = agg.orderBy(F.col("score_micro").desc(), F.col("doc")).limit(top_n)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("doc").alias(id_col), "score_micro", "rank"
    )


__all__.append("unigram_surprisal")


def unigram_surprisal(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM surprisal per document — the perplexity-style quality
    filter of CCNet-family pipelines (docs whose tokens are improbable
    under the corpus unigram distribution are boilerplate/garble; docs of
    all-stopwords are trivially probable): with corpus token count T and
    per-token frequency f(t), each token costs −ln(f(t)/T) nats, a
    document scores the tf-weighted sum, and the filter reads the
    per-token average.

    Determinism: the bm25 contract — f(t) and T are exact integers, so
    −ln(f/T) is one correctly-rounded IEEE op on identical inputs in any
    engine; each token's cost rounds to integer MICRO-NATS before the
    per-document reduction, which is then an order-free exact int64 sum;
    the average is exact floor division. No float ever crosses an
    aggregation boundary.

    Scale shape: ONE tokenize scan → (doc, tok) counts; the corpus LM is a
    re-aggregation of those counts (vocab-sized, tok-keyed); one tok-keyed
    equi-join back (broadcastable when the vocab fits) and one doc-keyed
    sum. Returns (doc_id, dl, surprisal_micro, avg_micro), docs with no
    tokens drop."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc", "tok").agg(F.count(F.lit(1)).alias("tf"))
    freq = tf.groupBy("tok").agg(F.sum("tf").alias("f"))
    n_toks = toks.count()
    smicro = F.round(
        -F.log(F.col("f").cast("double") / F.lit(float(n_toks))) * 1e6
    ).cast("long")
    per_tok = tf.join(freq, "tok").select(
        "doc", "tf", smicro.alias("smicro")
    )
    agg = per_tok.groupBy("doc").agg(
        F.sum("tf").alias("dl"),
        F.sum(F.col("tf") * F.col("smicro")).alias("surprisal_micro"),
    )
    return agg.select(
        F.col("doc").alias(id_col),
        F.col("dl").cast("long").alias("dl"),
        F.col("surprisal_micro").cast("long").alias("surprisal_micro"),
        F.floor(F.col("surprisal_micro") / F.col("dl"))
        .cast("long")
        .alias("avg_micro"),
    )
