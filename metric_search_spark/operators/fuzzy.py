"""Entity-resolution fuzzy matching: blocked Jaro–Winkler similarity join.

The record-linkage staple (Winkler 1990, U.S. Census) next to the exact and
token-set joins the engine already has (edit_join's Levenshtein length-band,
n-gram Jaccard, MinHash/SimHash): candidate pairs come from a BLOCKING key
equi-join — the production ER shape; all-pairs JW over a corpus is
quadratic and has no metric bound to prune with — and only the blocked
candidates are scored.

Scale shape: one hash shuffle on the block key; per-candidate scoring runs
in mapInPandas over the pair batches. The per-pair scorer is Python (JW's
matching window + transposition count is inherently per-pair branchy), which
is honest here because the candidate set is blocking-bounded — the same
envelope argument as the edit join's length-band (entry_queries
q_edit_join_documents). Candidates carry only (ids, the two short name
strings).

Oracle story: DuckDB ships a NATIVE ``jaro_winkler_similarity`` — a fully
independent C++ implementation of the same public definition — so the twin
recomputes names, blocks, the join, and the similarity from raw text with
zero shared code. Verified boundary semantics (tests/test_fuzzy.py, probed
empirically): no prefix boost unless jaro > 0.7; empty strings score 0.0
(both sides, even '' vs ''); prefix length caps at 4; p = 0.1.

Unit caveat (probed r5): the native DuckDB functions score UTF-8 BYTES;
these kernels score CODEPOINTS — the semantically right unit for text.
The two coincide exactly on ASCII (every driver corpus), and the multibyte
divergence is pinned as precisely that unit mismatch in
tests/test_text_unicode.py::test_fuzzy_unit_mismatch_pinned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "jaro_similarity",
    "jaro_winkler",
    "damerau_levenshtein",
    "jw_score_pairs",
    "dl_score_pairs",
    "fuzzy_join",
]


def damerau_levenshtein(a: str, b: str) -> int:
    """FULL Damerau–Levenshtein (Lowrance–Wagner 1975, with the
    last-occurrence alphabet bookkeeping) — transpositions may later be
    edited across, unlike the restricted OSA variant: DL('CA','ABC') = 2
    where OSA gives 3. DuckDB's native ``damerau_levenshtein`` is this
    full variant (calibrated empirically in tests/test_fuzzy.py), which is
    what makes it an independent oracle for the engine's kernel. Integer
    output — the driver query's hash compare is exact with no fp story."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[maxdist] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            last = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                d[k][last] + (i - k - 1) + 1 + (j - last - 1),  # transpose
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def jaro_similarity(a: str, b: str) -> float:
    """Textbook Jaro: match window ⌊max/2⌋−1, transpositions = half the
    out-of-order matched chars. Empty either side → 0.0 (the DuckDB
    convention, including '' vs '')."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    m = 0
    for i in range(la):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1 if i + window + 1 < lb else lb
        ca = a[i]
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    bi = [j for j in range(lb) if match_b[j]]
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            if a[i] != b[bi[k]]:
                t += 1
            k += 1
    # INTEGER halving — the original strcmp95 (and DuckDB/RapidFuzz)
    # behavior: an odd raw mismatch count floors, it does not contribute
    # a half transposition (calibrated empirically in tests/test_fuzzy.py;
    # t/2.0 diverged from the native twin on odd-count jumbles)
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Winkler's prefix boost: jw = j + l·p·(1−j) with l = common prefix
    (≤4), applied only when j > boost_threshold — the variant DuckDB's
    native function implements (pinned empirically in tests/test_fuzzy.py)."""
    j = jaro_similarity(a, b)
    if j > boost_threshold:
        l = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            l += 1
        j = j + l * p * (1.0 - j)
    return j


def jw_score_pairs(
    cand: DataFrame,
    *,
    a_col: str = "name_a",
    b_col: str = "name_b",
    out_col: str = "jw",
) -> DataFrame:
    """Score candidate pairs with Jaro–Winkler in mapInPandas (per-batch
    loop over the blocking-bounded candidate set). Appends ``out_col``
    (double, unrounded) to the candidate schema."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    )
    schema = f"{fields}, {out_col} double"

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            av = pdf[a_col].to_numpy()
            bv = pdf[b_col].to_numpy()
            pdf[out_col] = np.asarray(
                [jaro_winkler(av[i], bv[i]) for i in range(len(pdf))]
            )
            yield pdf

    return cand.mapInPandas(score, schema=schema)


def dl_score_pairs(
    cand: DataFrame,
    *,
    a_col: str = "name_a",
    b_col: str = "name_b",
    out_col: str = "dl",
) -> DataFrame:
    """Score candidate pairs with full Damerau–Levenshtein in mapInPandas
    (blocking-bounded candidate set, same envelope as jw_score_pairs).
    Appends ``out_col`` (long)."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    )
    schema = f"{fields}, {out_col} long"

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            av = pdf[a_col].to_numpy()
            bv = pdf[b_col].to_numpy()
            pdf[out_col] = np.asarray(
                [damerau_levenshtein(av[i], bv[i]) for i in range(len(pdf))],
                dtype=np.int64,
            )
            yield pdf

    return cand.mapInPandas(score, schema=schema)


def fuzzy_join(
    names: DataFrame,
    *,
    id_col: str = "id",
    name_col: str = "name",
    block_col: str = "blk",
    threshold: float | None = None,
    scorer: str = "jw",
) -> DataFrame:
    """Blocked Jaro–Winkler self-join: every (id_a < id_b) pair sharing the
    blocking key, scored. ``threshold`` filters jw >= threshold when set —
    pick one that is not a value the data attains (thresholding a double at
    an attained value is engine-dependent at the ulp level); the driver
    query emits all blocked candidates unfiltered for exactly that reason.
    Returns (id_a, id_b, name_a, name_b, jw)."""
    a = names.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        F.col(block_col).alias("_blk"),
    )
    b = names.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.col(block_col).alias("_blk"),
    )
    cand = a.join(b, "_blk").where(F.col("id_a") < F.col("id_b")).drop("_blk")
    if scorer == "jw":
        scored = jw_score_pairs(cand)
        metric_col = "jw"
    elif scorer == "dl":
        scored = dl_score_pairs(cand)
        metric_col = "dl"
    else:
        raise ValueError(f"unknown scorer {scorer!r}; use 'jw' or 'dl'")
    if threshold is not None:
        op = F.col(metric_col) >= threshold if scorer == "jw" else (
            F.col(metric_col) <= threshold  # DL is a distance: keep close pairs
        )
        scored = scored.where(op)
    return scored
