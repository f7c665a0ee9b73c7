"""Text analysis + dedup family vs python/DuckDB oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from metric_search_spark.functions.text import (
    bpeish_count_col,
    fingerprint_col,
    langid_col,
    n_tokens_col,
    quality_cols,
    shingles_col,
)
from metric_search_spark.operators.dedupe import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

from tests.sparkutil import get_spark

DOCS = [
    (0, "the cat sat on the mat and the dog sat too"),
    (1, "the cat sat on the mat and the dog sat too"),  # exact dup of 0
    (2, "the cat sat on the mat and the dog stood too"),  # near dup
    (3, "der hund ist nicht die katze und der vogel"),
    (4, "le chat et le chien et les oiseaux des bois"),
    (5, "completely different words entirely unrelated content here"),
    (6, "el gato y los perros que viven en la casa"),
    (7, "the cat sat on the mat and the dog sat too !"),  # near dup of 0
]


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"])
    ).persist()


def test_token_and_quality(spark, docs):
    out = docs.select(
        "doc_id",
        n_tokens_col(F.col("text")).alias("nt"),
        bpeish_count_col(F.col("text")).alias("bp"),
        *[v.alias(k) for k, v in quality_cols(F.col("text")).items()],
    ).toPandas().set_index("doc_id")
    for i, text in DOCS:
        assert out.loc[i, "nt"] == len(text.split(" "))
        assert out.loc[i, "n_chars"] == len(text)
    assert out.loc[7, "punct_ratio"] > 0
    assert out.loc[0, "distinct_ratio"] < 1.0


def test_langid(spark, docs):
    out = docs.select("doc_id", langid_col(F.col("text")).alias("lang")).toPandas()
    langs = dict(zip(out["doc_id"], out["lang"]))
    assert langs[0] == "en" and langs[3] == "de" and langs[4] == "fr"
    assert langs[6] == "es"


def test_shingles(spark, docs):
    out = docs.select("doc_id", shingles_col(F.col("text"), 3).alias("sh")).toPandas()
    sh0 = set(out[out["doc_id"] == 0]["sh"].iloc[0])
    toks = DOCS[0][1].split(" ")
    want = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert sh0 == want


def test_dedup_exact(spark, docs):
    out = dedup_exact(docs).toPandas()
    assert len(out) == len(DOCS) - 1  # docs 0 and 1 collapse
    row = out[out["cnt"] == 2]
    assert list(row["keeper_id"]) == [0]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = minhash_lsh_pairs(
        docs, num_hashes=32, bands=16, verify_threshold=0.3
    ).toPandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got  # exact dup always survives
    assert (0, 2) in got or (0, 7) in got  # near dups surface
    assert (3, 5) not in got and (4, 5) not in got


def test_ngram_jaccard_exact_values(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.2).toPandas()
    def jac(i, j):
        ti, tj = DOCS[i][1].split(" "), DOCS[j][1].split(" ")
        si = {" ".join(ti[k:k+3]) for k in range(len(ti)-2)}
        sj = {" ".join(tj[k:k+3]) for k in range(len(tj)-2)}
        return len(si & sj) / len(si | sj)
    for _, r in pairs.iterrows():
        np.testing.assert_allclose(
            r["jaccard"], jac(int(r["id_a"]), int(r["id_b"])), atol=1e-12
        )
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got


def test_simhash_pairs(spark, docs):
    pairs = simhash_pairs(docs, max_hamming=3, bands=4).toPandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got
    assert all(h <= 3 for h in pairs["hamming"])


def test_simhash_kernel_matches_expression(spark, docs):
    """The Arrow-kernel simhash (one numpy bit-plane pass) must be
    bit-identical to the 64-fold pure-Column formulation it replaced."""
    from metric_search_spark.operators.dedupe import simhash_col, simhash_col_expr

    out = docs.select(
        "doc_id",
        simhash_col(F.col("text")).alias("k"),
        simhash_col_expr(F.col("text")).alias("e"),
    ).toPandas()
    assert (out["k"] == out["e"]).all(), out


def test_minhash_banding_completeness(spark):
    """LSH banding guarantee (VERDICT r1 item 7): with bands == num_hashes
    (one row per band) a candidate pair is generated whenever ANY single
    minhash agrees — in particular every pair with a shared shingle has
    P(miss per hash) = 1 − J, so identical docs (J = 1) MUST meet, and the
    verify stage must then recover exactly the brute-force Jaccard set above
    the threshold."""
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        base = rng.choice(vocab, size=12)
        rows.append((i, " ".join(base)))
        if i % 4 == 0:  # planted near-dup: one token swapped
            mut = base.copy()
            mut[rng.integers(len(mut))] = str(rng.choice(vocab))
            rows.append((100 + i, " ".join(mut)))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    thr = 0.5
    got = minhash_lsh_pairs(
        docs, num_hashes=32, bands=32, shingle_n=3, verify_threshold=thr
    ).toPandas()
    got_pairs = {(a, b) for a, b in zip(got["id_a"], got["id_b"])}

    def sh(t):
        tok = t.split(" ")
        return {" ".join(tok[k : k + 3]) for k in range(len(tok) - 2)}

    want = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            sa, sb = sh(ta), sh(tb)
            if len(sa & sb) / len(sa | sb) >= thr:
                want.add((min(ia, ib), max(ia, ib)))
    # banding with 1-row bands catches any pair sharing ≥1 minhash; every
    # pair at J ≥ 0.5 has P(all 32 hashes disagree) ≤ 2^-32 — require exact
    # recovery of the brute-force set
    assert got_pairs == want, (got_pairs ^ want)


def test_winnow_matches_duckdb_and_guarantee(spark):
    """Winnowing parity vs the fully-independent DuckDB twin at sf0.001,
    plus the robust-winnowing guarantee: two docs sharing a substring of
    length >= w + k - 1 share at least one fingerprint value."""
    import duckdb

    from metric_search_spark.entry_queries import QUERIES
    from metric_search_spark.functions.text import winnow_sql

    sf = "/root/testdata/sf0.001"
    got = QUERIES["winnow_documents"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(winnow_sql("text")).df()
    cols = ["doc_id", "pos", "fp"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True).astype("int64"),
        want[cols].sort_values(cols).reset_index(drop=True).astype("int64"),
    )

    from metric_search_spark.functions.text import kgram_hashes_col, winnow_col

    shared = "zqxjkvwpyg"  # length 10 < 11: no guarantee; pad to 12
    shared = shared + "mf"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["aaa " + shared + " bbbbb", "cc " + shared + " dddd ee"],
            }
        )
    )
    out = df.select(
        "doc_id", F.explode(winnow_col(kgram_hashes_col(F.col("text")))).alias("s")
    ).select("doc_id", F.col("s.fp").alias("fp")).toPandas()
    fps = out.groupby("doc_id")["fp"].apply(set)
    assert len(fps[1] & fps[2]) >= 1


def test_winnow_arrow_matches_relational(spark):
    """The zero-shuffle Arrow kernel and the relational groupBy variant are
    bit-identical on the full sf0.001 corpus (both also match the DuckDB
    twin above, so this pins the engine's two plans to each other)."""
    from metric_search_spark.functions.text import (
        winnow_fingerprints,
        winnow_fingerprints_arrow,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["doc_id", "pos", "fp"]
    a = (
        winnow_fingerprints_arrow(docs).toPandas()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    b = (
        winnow_fingerprints(docs).toPandas()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    pd.testing.assert_frame_equal(a, b)


def test_fingerprint_dup_detection(spark, docs):
    out = docs.select("doc_id", fingerprint_col(F.col("text")).alias("fp")).toPandas()
    fp = dict(zip(out["doc_id"], out["fp"]))
    assert fp[0] == fp[1]
    assert fp[0] != fp[5]


def test_simhash_null_text_matches_column_twin(spark):
    """NULL text folds like an EMPTY doc (simhash 0) in BOTH the Arrow
    kernel and the Column twin — the kernel used to crash the whole job on
    len(None) at the first NULL row."""
    from metric_search_spark.operators.dedupe import (
        simhash_col,
        simhash_col_expr,
        simhash_pairs,
    )

    df = spark.createDataFrame(
        [(1, "aa bb cc"), (2, None), (3, "aa bb cc")],
        "doc_id long, text string",
    )
    k = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", simhash_col(F.col("text")).alias("sh")).collect()}
    e = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", simhash_col_expr(F.col("text")).alias("sh")).collect()}
    assert k == e and k[2] == 0
    pairs = simhash_pairs(df.where(F.col("text").isNotNull())).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 3)}


def test_minhash_short_docs_never_band(spark):
    """Docs shorter than shingle_n words have empty shingle sets: they must
    NOT all collide on one constant all-NULL band key (quadratic candidate
    blowup on crawl-style corpora) — they drop before banding."""
    from metric_search_spark.operators.dedupe import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "zz qq"), (3, "xx"), (4, "")],
        "doc_id long, text string",
    )
    assert minhash_lsh_pairs(df, verify_threshold=None).count() == 0


def test_tfidf_cosine_pairs_golden(spark):
    """Hand-computable corpus: weights tf·ln(N/df), pairs only within the
    blocking key, cosine checked against a numpy recomputation."""
    import math

    from metric_search_spark.operators.dedupe import tfidf_cosine_pairs

    rows = [
        (0, "cat dog cat", "a", "x"),
        (1, "cat dog", "a", "x"),
        (2, "cat dog cat", "b", "x"),   # identical tf to doc 0, other block
        (3, "bird", "a", "x"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {
        (r.doc_a, r.doc_b): r.cos
        for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
    }
    # blocking: (0,2) and (1,2) never pair despite identical text shape
    assert set(got) == {(0, 1)}
    n = 4.0
    w_cat, w_dog = math.log(n / 3.0), math.log(n / 3.0)
    a = np.array([2 * w_cat, 1 * w_dog])
    b = np.array([1 * w_cat, 1 * w_dog])
    want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(got[(0, 1)] - want) < 1e-12

    # max_df drops corpus-wide tokens from the vector space entirely:
    # with max_df=1 only 'bird' survives and no pair shares a token
    got2 = tfidf_cosine_pairs(docs, threshold=0.0, max_df=1).collect()
    assert got2 == []


def test_tfidf_threshold_and_symmetry(spark):
    """Pairs are emitted once (doc_a < doc_b) and the threshold filters on
    the UNROUNDED cosine."""
    from metric_search_spark.operators.dedupe import tfidf_cosine_pairs

    rows = [
        (10, "alpha beta gamma", "a", "x"),
        (11, "alpha beta delta", "a", "x"),
        (12, "epsilon zeta", "a", "x"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = tfidf_cosine_pairs(docs, threshold=0.0).toPandas()
    assert (out.doc_a < out.doc_b).all()
    hi = tfidf_cosine_pairs(docs, threshold=0.99).toPandas()
    assert len(hi) < len(out)


def test_pmi_pairs_golden(spark):
    """4 docs; {x,y} co-occur in 2, x in 3, y in 2 → pmi = ln(4·2/(3·2));
    repeated tokens inside a doc count once; min_count cuts."""
    import math

    from metric_search_spark.operators.cooccur import pmi_pairs

    docs = spark.createDataFrame(
        [
            (0, "x y y"),
            (1, "x y"),
            (2, "x z"),
            (3, "w"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.tok_a, r.tok_b): (r.c_ab, r.pmi)
        for r in pmi_pairs(docs, min_count=2).collect()
    }
    assert set(got) == {("x", "y")}
    c_ab, pmi = got[("x", "y")]
    assert c_ab == 2
    assert abs(pmi - math.log(4 * 2 / (3 * 2))) < 1e-12
    all_pairs = {
        (r.tok_a, r.tok_b) for r in pmi_pairs(docs, min_count=1).collect()
    }
    assert ("x", "z") in all_pairs and ("w", "x") not in all_pairs


def test_segment_dedup_golden(spark):
    """seg_words=2 over 4 docs: doc0/doc1 share segment "a b"; doc2's
    segments are unique; doc3 repeats "a b" twice intra-doc (multiplicity
    counts in n_segments AND both copies flag duplicate since the segment
    appears in other docs); trailing partial segments kept."""
    from metric_search_spark.operators.dedupe import segment_dedup

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),       # segs: "a b", "c d", "e"
            (1, "a b x y"),         # segs: "a b", "x y"
            (2, "p q r"),           # segs: "p q", "r"
            (3, "a b a b"),         # segs: "a b", "a b"
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_segments, r.n_dup, r.dup_ratio)
        for r in segment_dedup(docs, seg_words=2).collect()
    }
    assert got[0] == (3, 1, 1 / 3)
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (2, 2, 1.0)


def test_segment_dedup_intra_doc_only_repeat_not_duplicate(spark):
    """A segment repeated within ONE doc but absent elsewhere is not a
    duplicate — the statistic is cross-document boilerplate, not intra-doc
    repetition (quality_cols covers that)."""
    from metric_search_spark.operators.dedupe import segment_dedup

    docs = spark.createDataFrame(
        [(0, "u v u v"), (1, "m n")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_segments, r.n_dup)
        for r in segment_dedup(docs, seg_words=2).collect()
    }
    assert got[0] == (2, 0)
    assert got[1] == (1, 0)


def test_neardup_canonicalize_semantics(spark):
    from metric_search_spark.operators.dedupe import neardup_canonicalize

    docs = spark.createDataFrame(
        [(i, q) for i, q in [(0, 10), (1, 30), (2, 30), (3, 5), (4, 99)]],
        "doc_id long, n_chars long",
    )
    # chain 0-1, 1-2 (transitive cluster {0,1,2}); 3 pairs with nobody;
    # 4 isolated — total assignment must cover all five docs
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "id_a long, id_b long"
    )
    out = {r.doc_id: r for r in neardup_canonicalize(docs, pairs).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    # cluster id is the component min; canonical is max quality then min id
    # (1 and 2 tie at 30 -> 1 wins)
    for d in (0, 1, 2):
        assert out[d].cluster_id == 0 and out[d].canonical_id == 1
        assert out[d].cluster_size == 3
    assert out[1].is_canonical and not out[0].is_canonical
    for d in (3, 4):
        assert out[d].cluster_id == d and out[d].canonical_id == d
        assert out[d].is_canonical and out[d].cluster_size == 1
