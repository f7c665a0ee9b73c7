"""Deduplication operators for training-data pipelines (task brief block):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup, and
the reference's insert_if threshold filter (tree.cpp:358-377) in set form.

Design notes (100 TB framing):
- exact: one hash-groupBy — Catalyst partial aggregation, no data skew risk
  beyond genuinely duplicated content (salt-free; dup groups are small).
- MinHash+LSH: shingle → h permutation-free minhashes (xxhash64 with seed
  column) → band signatures → band equi-join → candidate pairs → exact
  Jaccard verify. Everything except the verify is pure Column math; the
  shuffle key is the (band, signature) pair — the classic scalable plan.
- SimHash: 64-bit sign-aggregated token hashes; near-dup = Hamming distance
  ≤ t via bit_count(xor) — one self-join on band keys of the simhash.
- embedding cosine: normalize → the 2-D-projection exact kNN join
  (operators/joins.py) or the brute top-k (operators/ann.py), threshold on
  similarity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metric_search_spark.functions.text import shingles_col

__all__ = [
    "dedup_exact",
    "minhash_signature_col",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_from_sig",
    "simhash_col",
    "simhash_col_expr",
    "simhash_pairs",
    "simhash_pairs_from_sig",
    "ngram_jaccard_pairs",
    "tfidf_cosine_pairs",
    "winnow_neardup_pairs",
    "image_neardup_pairs",
    "ngram_contamination",
    "segment_dedup",
    "threshold_filter",
]


def dedup_exact(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedupe: keep the min-id representative per identical key.
    Returns (keeper_id, cnt) per distinct key."""
    return df.groupBy(key_col).agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("cnt")
    ).select("keeper_id", "cnt")


def minhash_signature_col(text: Column, num_hashes: int = 32, shingle_n: int = 3) -> Column:
    """MinHash signature (array<long>, length num_hashes): h_i = min over
    shingles of xxhash64(shingle, seed=i). Permutation-free minhash — each
    seed is an independent hash family member.

    The seed must bind via a closure FACTORY returning a one-parameter
    lambda: ``F.transform`` inspects lambda arity and passes the element's
    ARRAY INDEX as the second argument, so a ``lambda s, i=i`` default is
    silently overwritten by the position (r1 bug: every signature slot
    collapsed to the same position-salted hash; caught by
    test_minhash_banding_completeness)."""
    sh = shingles_col(text, shingle_n)

    def hash_with_seed(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    return F.array(
        *[
            F.array_min(F.transform(sh, hash_with_seed(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, optionally
    verified with exact shingle Jaccard. Returns (id_a, id_b, jaccard) with
    id_a < id_b.

    Plan shape: signature projection (narrow) → explode bands (×bands) →
    groupBy band-key equi-join (the only shuffle) → distinct pairs → exact
    verify on the joined shingle sets.
    """
    # docs shorter than shingle_n words have an EMPTY shingle set: their
    # signature would be all-NULL (array_min of []), every such doc would
    # share one constant band key, and the band join would materialize a
    # quadratic candidate blowup of unrelated short docs (crawl corpora are
    # full of them). They can never near-dup via shingles — drop them here.
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature_col(F.col(text_col), num_hashes, shingle_n).alias("sig"),
    ).where(~F.isnull(F.element_at("sig", 1)))
    return minhash_lsh_pairs_from_sig(
        sig,
        df,
        id_col=id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        verify_threshold=verify_threshold,
    )


def minhash_lsh_pairs_from_sig(
    sig: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.5,
) -> DataFrame:
    """Banding + candidate join + exact-Jaccard verify over PRECOMPUTED
    minhash signatures ``sig`` = (id, sig array<long>). Split out of
    minhash_lsh_pairs so a correctness hand-off (signatures written to
    parquet, read back by both engines) exercises exactly this pipeline —
    an independent oracle can recompute banding and verification from the
    signatures even though it cannot reproduce the engine's xxhash64
    family. Band key: xxhash64 over each band's signature slots (equality
    ≡ slot-tuple equality modulo a ~2⁻⁶⁴ hash collision)."""
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + j + 1)
                                for j in range(rows_per_band)
                            ]
                        ).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.sig")
    a = banded.toDF("id_a", "band", "sig")
    b = banded.toDF("id_b", "band", "sig")
    pairs = (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if verify_threshold is None:
        return pairs.withColumn("jaccard", F.lit(None).cast("double"))
    sh = docs.select(
        F.col(id_col).alias("id"),
        shingles_col(F.col(text_col), shingle_n).alias("sh"),
    )
    joined = (
        pairs.join(sh.toDF("id_a", "sh_a"), "id_a")
        .join(sh.toDF("id_b", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= verify_threshold)
    )


def simhash_col_expr(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash as PURE Column math: per bit, an ``aggregate`` fold of
    ±1 votes over the token-hash array. Semantically the reference
    formulation, but it compiles to 64 independent passes over the array per
    row — kept as the expression-only twin (and the parity oracle for the
    Arrow kernel below); use ``simhash_col`` in pipelines."""
    toks = F.split(text, " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def votes_for(i: int):
        # +1 if bit i set else -1, summed over tokens; bit set in result iff
        # sum > 0. (The fold lambda must take exactly two params — PySpark
        # inspects arity — so the bit index binds via this closure.)
        def step(acc, h):
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(hashes, F.lit(0), step)

    bit_exprs = []
    for i in range(bits):
        votes = votes_for(i)
        bit_exprs.append(
            F.when(votes > 0, F.lit(1 << i if i < 63 else -(1 << 63))).otherwise(
                F.lit(0)
            )
        )
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out.bitwiseOR(e)
    return out


def simhash_col(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens: token hashes stay JVM-side
    (``xxhash64`` inside codegen — deterministic across engines), then ONE
    Arrow transfer of the hash array into a pandas_udf that unpacks all 64
    bit-planes per token in a single numpy pass (±1 votes, sign threshold).
    ~64× less expression work per row than the fold-per-bit form
    (simhash_col_expr), which matters when this runs over 10⁹ documents;
    output is bit-identical (tests/test_text_dedupe.py pins it)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash_votes(hashes: pd.Series) -> pd.Series:
        # fully cross-row vectorized (VERDICT r2 item 8): flatten every doc's
        # token hashes into ONE array, unpack all 64 bit-planes in a single
        # pass, and segment-sum per document with np.add.reduceat over the
        # doc-start offsets — no per-document Python loop. Bit-identical to
        # the Column-fold twin (pinned in tests/test_text_dedupe.py).
        if len(hashes) == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        arrs = hashes.to_numpy()
        # NULL text folds like an EMPTY doc (simhash 0), matching the
        # Column twin's coalesced fold; bare len(None) used to crash the
        # whole job on the first NULL row
        lens = np.fromiter(
            (0 if a is None else len(a) for a in arrs),
            dtype=np.int64,
            count=len(arrs),
        )
        out = np.zeros(len(arrs), dtype=np.int64)
        nz = np.nonzero(lens)[0]  # docs with ≥1 token (empty → simhash 0,
        if len(nz):  # matching the old kernel's empty-planes sum)
            flat = np.concatenate(arrs[nz]).astype(np.int64, copy=False)
            # bit-planes: (total_tok, 64) little-endian, bit j of hash == col j
            planes = np.unpackbits(
                flat.view(np.uint64).view(np.uint8).reshape(-1, 8),
                axis=1,
                bitorder="little",
            )
            nz_lens = lens[nz]
            starts = np.concatenate(([0], np.cumsum(nz_lens)[:-1]))
            sums = np.add.reduceat(planes.astype(np.int64), starts, axis=0)
            votes = sums * 2 - nz_lens[:, None]
            out[nz] = np.packbits(votes > 0, axis=1, bitorder="little").view(
                np.int64
            ).ravel()
        return pd.Series(out)

    return _simhash_votes(F.transform(F.split(text, " "), lambda t: F.xxhash64(t)))


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming. Candidate
    generation: split the 64-bit hash into ``bands`` segments — any pair
    within Hamming t < bands must agree on ≥1 full segment (pigeonhole) —
    equi-join per segment, then exact bit_count verify."""
    sh = df.select(
        F.col(id_col).alias("id"), simhash_col(F.col(text_col)).alias("sh")
    )
    return simhash_pairs_from_sig(sh, max_hamming=max_hamming, bands=bands)


def simhash_pairs_from_sig(
    sh: DataFrame, *, max_hamming: int = 3, bands: int = 4
) -> DataFrame:
    """Banding + Hamming verify over PRECOMPUTED 64-bit simhashes
    ``sh`` = (id, sh long). Split out of simhash_pairs so a correctness
    hand-off (simhashes written to parquet, read back by both engines)
    exercises exactly this pipeline: an independent oracle recomputes the
    band segments ((sh >> 8b) & mask), the segment equi-join, and the
    bit_count(xor) verify from the signatures, even though it cannot
    reproduce the engine's token-hash family."""
    assert max_hamming < bands
    seg_bits = 64 // bands
    banded = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("sh", b * seg_bits)
                        .bitwiseAND(F.lit((1 << seg_bits) - 1))
                        .alias("seg"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.seg")
    a = banded.toDF("id_a", "sh_a", "band", "seg")
    b = banded.toDF("id_b", "sh_b", "band", "seg")
    # long, not int: the DuckDB oracle's bit_count casts to BIGINT, and the
    # driver's schema compare is dtype-sensitive
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        a.join(b, ["band", "seg"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def image_neardup_pairs(
    images: DataFrame,
    *,
    id_col: str = "image_id",
    max_hamming: int = 1,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance — the
    image-payload counterpart of ``simhash_pairs`` (the reference's image
    use-case indexes whole images under SSIM, n-api/test/test.js:29-63;
    phash64 is the standard near-dup compaction of the same signal).

    Pipeline: decode every payload and compute the classic 8×8
    mean-threshold pHash in one Arrow pass (functions/image.with_phash64),
    then the banded Hamming self-join (simhash_pairs_from_sig): any pair
    within Hamming ``max_hamming`` < ``bands`` must agree on at least one
    full 64/bands-bit segment (pigeonhole), so candidates come from a
    segment equi-join — the shuffle key is (band, segment), never an
    all-pairs product — and ``bit_count(xor)`` verifies exactly.

    100 TB shape: the decode pass is embarrassingly parallel over the image
    table; after it only (id, 8-byte hash) rows move. Band-segment hot keys
    (many near-identical images) grow candidate lists quadratically per
    segment value — that is inherent to the semantics (those images ARE
    near-dups); lower max_hamming/bands shrinks both candidates and output.
    Returns (id_a, id_b, hamming) with id_a < id_b, hamming ≤ max_hamming.
    """
    from metric_search_spark.functions.image import with_phash64

    sig = with_phash64(images).select(
        F.col(id_col).alias("id"), F.col("phash64").alias("sh")
    )
    return simhash_pairs_from_sig(sig, max_hamming=max_hamming, bands=bands)


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via shingle inverted index:
    explode shingles → self equi-join on shingle → per-pair intersection
    count → |A∪B| = |A|+|B|−|A∩B|. No all-pairs product; the shuffle key is
    the shingle (hot shingles are the skew risk — mitigated upstream by
    stopword-heavy shingles being rare at n≥3)."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), shingle_n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    inv = sh.select("id", "n_sh", F.explode("sh").alias("shingle"))
    a = inv.toDF("id_a", "n_a", "shingle")
    b = inv.toDF("id_b", "n_b", "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return inter.select(
        "id_a", "id_b", jac.cast("double").alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def winnow_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by shared WINNOWING fingerprints — the MOSS
    consumer of functions.text.winnow_fingerprints_arrow (character-level
    k-gram robustness vs ngram_jaccard_pairs' word shingles; the winnowing
    guarantee makes any shared substring of length ≥ w + k − 1 contribute
    a shared fingerprint). Similarity is CONTAINMENT — shared distinct
    fingerprint values over the SMALLER document's fingerprint-set size —
    so a short document embedded in a long one still scores 1.0.

    Scale shape: fingerprinting is the zero-shuffle Arrow kernel; the only
    shuffles are the fp inverted-index equi-join and the (id_a, id_b)
    pair aggregate — same plan class as ngram_jaccard_pairs. Hot
    fingerprints are the skew/blowup risk (a fp in d docs emits d(d−1)/2
    join rows): ``max_df`` drops fingerprints present in more than that
    many documents (the standard document-frequency cut; boilerplate
    fingerprints carry no near-dup signal). Per-doc set sizes are counted
    AFTER the cut so numerator and denominator stay consistent.

    Returns (id_a, id_b, shared, containment) for pairs with
    containment ≥ threshold."""
    from metric_search_spark.functions.text import winnow_fingerprints_arrow

    fps = (
        winnow_fingerprints_arrow(df, id_col=id_col, text_col=text_col, k=k, w=w)
        .select(F.col(id_col).alias("id"), "fp")
        .distinct()
    )
    if max_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_df)
            .select("fp")
        )
        fps = fps.join(hot, "fp", "left_anti")
    sizes = fps.groupBy("id").agg(F.count("*").alias("n"))
    inv = fps.join(sizes, "id")
    a = inv.select(F.col("id").alias("id_a"), "fp", F.col("n").alias("n_a"))
    b = inv.select(F.col("id").alias("id_b"), "fp", F.col("n").alias("n_b"))
    pairs = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count("*").alias("shared"))
    )
    cont = F.col("shared").cast("double") / F.least("n_a", "n_b").cast("double")
    return pairs.select(
        "id_a", "id_b", "shared", cont.alias("containment")
    ).where(F.col("containment") >= threshold)


def threshold_filter(
    df: DataFrame,
    anchor_vec,
    threshold: float,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    keep_anchor_id=None,
) -> DataFrame:
    """The reference's insert_if quirk (distance-to-ROOT-only threshold,
    tree.cpp:358-377) as a set-oriented filter: keep rows farther than
    ``threshold`` from the anchor record (plus the anchor itself)."""
    from metric_search_spark.functions.vector import l2_dist_col

    anchor = F.array(*[F.lit(float(v)) for v in anchor_vec])
    d = l2_dist_col(F.col(vec_col).cast("array<double>"), anchor)
    cond = d > threshold
    if keep_anchor_id is not None:
        cond = cond | (F.col(id_col) == keep_anchor_id)
    return df.where(cond)


def tfidf_cosine_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang", "source"),
    threshold: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """Blocked TF-IDF cosine similarity join: pairs of documents in the
    SAME blocking group with cosine(tfidf_a, tfidf_b) ≥ ``threshold``.
    Returns (doc_a, doc_b, cos), doc_a < doc_b.

    The classic entity-resolution/blocked-similarity shape: TF-IDF weights
    are GLOBAL (corpus-wide document frequency, tf·ln(N/df)), but candidate
    pairs form only within a blocking key — so the token inverted index is
    keyed by (block, token) and a corpus-common token's posting list is
    bounded by the block size, never |corpus|. Unblocked all-pairs TF-IDF
    over a shared vocabulary is quadratic no matter how it is joined; with
    blocking the pair work is Σ_blocks |block|², the knob a 100-TB pipeline
    actually turns (block by language/domain/near-dup bucket). ``max_df``
    optionally drops tokens appearing in more than that many documents
    (df-based stop-wording — the same cut winnow_neardup_pairs applies);
    weights and norms are computed AFTER the cut so both engines agree on
    the vector space.

    Plan: two groupBy passes (tf, then df), one broadcast of the scalar N,
    a (block, token) equi-join for dots, and an id-equi-join to attach the
    two norms — all shuffles on bounded keys, no UDFs anywhere."""
    b = [F.col(c) for c in block_cols]
    toks = docs.select(
        F.col(id_col).alias("doc"),
        *[F.col(c) for c in block_cols],
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy("doc", *block_cols, "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("df") <= float(max_df))
    n = float(docs.count())
    w = tf.join(dfreq, "tok").select(
        "doc",
        *block_cols,
        "tok",
        (F.col("tf") * F.log(F.lit(n) / F.col("df"))).alias("w"),
    )
    nrm = w.groupBy("doc").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.select(
        F.col("doc").alias("doc_a"),
        *[F.col(c).alias(f"_ba_{c}") for c in block_cols],
        "tok",
        F.col("w").alias("wa"),
    )
    bb = w.select(
        F.col("doc").alias("doc_b"),
        *[F.col(c).alias(f"_bb_{c}") for c in block_cols],
        F.col("tok").alias("tok_b"),
        F.col("w").alias("wb"),
    )
    cond = [a["tok"] == bb["tok_b"], a["doc_a"] < bb["doc_b"]] + [
        a[f"_ba_{c}"] == bb[f"_bb_{c}"] for c in block_cols
    ]
    dots = (
        a.join(bb, cond)
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col("doc").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def ngram_contamination(
    test: DataFrame,
    train: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/test contamination check — the eval-set decontamination
    primitive every training pipeline runs before benchmarking: a test
    document is contaminated if any of its token n-grams appears verbatim
    anywhere in the training corpus. Returns (doc_id, shared_grams) for
    contaminated test docs, where shared_grams counts the test doc's
    DISTINCT n-grams found in train.

    Scale shape: both sides reduce to DISTINCT (doc, gram) / (gram) sets
    (map-side-combined), then ONE equi-join on the gram key — an inverted
    index probe, never a doc×doc product. The train side deduplicates to
    unique grams first, so the join's build input is the corpus vocabulary
    of n-grams, not its token stream. At 10⁹-doc scale, map the gram
    string to xxhash64 on BOTH sides before the shuffle (8-byte keys vs
    ~60-byte strings; a collision can only add a false shared gram at
    ~2⁻⁶⁴) — kept as strings here so the DuckDB twin joins on identical
    values. Docs shorter than n tokens have no n-grams and cannot be
    contaminated (the guard also keeps F.sequence ascending)."""

    def grams(df: DataFrame) -> DataFrame:
        ts = F.split(F.col(text_col), " ")
        g = F.transform(
            F.sequence(F.lit(1), F.size(ts) - (n - 1)),
            lambda i: F.array_join(F.slice(ts, i, n), " "),
        )
        return (
            df.where(F.size(ts) >= n)
            .select(F.col(id_col).alias("doc"), F.explode(g).alias("gram"))
            .distinct()
        )

    train_g = grams(train).select("gram").distinct()
    return (
        grams(test)
        .join(train_g, "gram")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .select(F.col("doc").alias(id_col), "shared_grams")
    )


def segment_dedup(
    docs: DataFrame,
    *,
    seg_words: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level segment (line/paragraph analog) deduplication stats —
    the C4/RefinedWeb-style pass that flags boilerplate shared across
    documents, one level coarser than exact-doc dedup (dedup_exact) and one
    finer than near-dup (minhash_lsh_pairs): chunk each document's token
    stream into consecutive non-overlapping ``seg_words``-token segments
    (trailing partial kept) and mark a segment DUPLICATE when its text
    occurs in more than one distinct document. Returns per document
    (doc_id, n_segments, n_dup, dup_ratio) — the ratio a filtering
    pipeline thresholds on.

    Scale shape: segments leave the scan as md5 digests (fixed 32-byte
    shuffle keys — the segment text itself never shuffles), the
    distinct-doc count per segment is a (digest, doc) distinct followed by
    one count per digest (both map-side combined), and the digest→count
    map re-joins the per-doc segment stream by digest equi-join. No
    doc×doc product anywhere; genuinely viral segments make a hot digest
    key, which AQE skew-split handles (values are 16-byte counts, not
    text). md5 is deterministic and identical in DuckDB, so the oracle
    twin reproduces the digests themselves, not just the counts."""
    ts = F.split(F.col(text_col), " ")
    nseg = F.ceil(F.size(ts) / F.lit(seg_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda j: F.md5(
            F.array_join(F.slice(ts, j * seg_words + 1, seg_words), " ")
        ),
    )
    ex = docs.select(F.col(id_col).alias("doc"), F.explode(segs).alias("h"))
    nd = (
        ex.select("h", "doc")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("nd"))
    )
    return (
        ex.join(nd, "h")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum((F.col("nd") > 1).cast("long")).alias("n_dup"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_segments",
            "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_segments")).alias(
                "dup_ratio"
            ),
        )
    )


__all__.append("neardup_canonicalize")


def neardup_canonicalize(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """The END STEP of corpus near-dedup (what C4/RefinedWeb actually ship):
    verified near-dup PAIRS become CLUSTERS (connected components over the
    pair graph — transitive: A~B~C collapses even when A≁C directly), and
    each cluster elects ONE canonical document to keep — highest
    ``quality_col``, ties to the smallest id (the deterministic keep-longest
    rule). Singleton documents are their own canonical cluster, so the
    output is a total assignment: every input doc gets
    (cluster_id, canonical_id, is_canonical, cluster_size) and the
    training-set filter is ``WHERE is_canonical``.

    Plan: operators/graph.connected_components (large-star/small-star,
    O(log n) rounds) over the pairs + one max-struct aggregate per cluster
    + one component-keyed join back — no step touches more than
    |docs| + |pairs| rows, and the pair graph is the (already bucketed)
    output of minhash/simhash/ngram-jaccard upstream. cluster_id is the
    component's min doc id (the CC convention), so ids are stable under
    any partitioning."""
    from metric_search_spark.operators.graph import connected_components

    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    nodes = docs.select(F.col(id_col).alias("node"))
    cc = connected_components(edges, nodes)
    j = cc.join(
        docs.select(
            F.col(id_col).alias("node"), F.col(quality_col).alias("_q")
        ),
        "node",
    )
    best = j.groupBy("component").agg(
        F.max(
            F.struct(F.col("_q"), (-F.col("node")).alias("_neg"), F.col("node"))
        ).alias("m"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return j.join(best, "component").select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster_id"),
        F.col("m.node").alias("canonical_id"),
        (F.col("node") == F.col("m.node")).alias("is_canonical"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard join with PPJoin-style PREFIX FILTERING
    (Chaudhuri et al. 2006 / Xiao et al. 2008) — the same output as
    :func:`ngram_jaccard_pairs` (set Jaccard ≥ threshold, identical
    columns), but the inverted index carries only each document's PREFIX
    under the global rarity order instead of every shingle.

    Why it scales where the plain inverted index does not: two sets with
    Jaccard ≥ τ must share a token among the first
    p = n − ⌈τ·n⌉ + 1 tokens of ANY shared total order (pigeonhole: an
    overlap of ⌈τ·n⌉ elements cannot hide entirely in the suffix). With
    tokens ordered rarest-document-frequency-first, hot shingles land in
    suffixes and never generate candidates — the skew the plain self-join
    pays on every stopword-ish shingle disappears; candidates are
    verified EXACTLY afterwards (array_intersect over the two full
    shingle sets, shuffled only for candidate pairs). The prefix length
    uses floor instead of ceil (one token longer at integral τ·n
    boundaries, immune to double rounding) — a superset of candidates is
    always sound.

    Plan: one document-frequency aggregate, one per-doc rank window, the
    prefix equi-join, and the bounded verify joins — every shuffle keyed,
    no all-pairs product, no UDF."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold {threshold} not in (0, 1]")
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            shingles_col(F.col(text_col), shingle_n).alias("sh"),
        )
        .withColumn("n", F.size("sh"))
        .where(F.col("n") > 0)
    )
    inv = sh.select("id", "n", F.explode("sh").alias("shingle"))
    dfreq = inv.groupBy("shingle").agg(F.count("*").alias("dfq"))
    w = Window.partitionBy("id").orderBy("dfq", "shingle")
    p = F.col("n") - F.floor(F.lit(float(threshold)) * F.col("n")).cast("long") + 1
    prefix = (
        inv.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= p)
        .select("id", "shingle")
    )
    cand = (
        prefix.toDF("id_a", "shingle")
        .join(prefix.toDF("id_b", "shingle"), "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("_sa"), F.col("n").alias("n_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("_sb"), F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.cast("double").alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


__all__ += ["prefix_jaccard_pairs"]
