"""Text analysis for training-data pipelines — all pure Column expressions
(JVM-side, codegen) unless noted; each op has a DuckDB SQL twin where the
engines' semantics provably agree.

Ops (task brief "text analysis" block):
- token counting: whitespace tokens + a BPE-ish regex token count
- quality scoring: length / punctuation ratio / stopword ratio / repetition
- language ID: marker-word scoring over small per-language stopword sets
  (n-gram-free heuristic that is exactly expressible in SQL for the oracle)
- document fingerprinting: 64-bit content fingerprint via xxhash64, and a
  shingle set for MinHash (operators/dedupe.py)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens_col",
    "n_tokens_col",
    "bpeish_count_col",
    "quality_cols",
    "langid_col",
    "fingerprint_col",
    "shingles_col",
    "LANG_MARKERS",
]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus convention)."""
    return F.split(text, " ")


def n_tokens_col(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("long")


# a BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs — the
# GPT-2-style pre-split pattern reduced to RE2-compatible syntax
_BPEISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpeish_count_col(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letters runs / digit runs / punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPEISH), 0)).cast("long")


def quality_cols(text: Column) -> dict[str, Column]:
    """Quality-signal columns for filter pipelines:
    n_chars, n_tokens, mean token length, punctuation ratio, distinct-token
    ratio (repetition detector)."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "mean_token_len": (
            (n_chars - n_tok + 1).cast("double") / n_tok.cast("double")
        ),
        "punct_ratio": punct.cast("double") / n_chars.cast("double"),
        "distinct_ratio": (
            F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double")
        ),
    }


# tiny marker-word sets; scoring = count of marker hits per language,
# argmax with deterministic tie-break on language name
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "y", "en"),
    "it": ("il", "che", "di", "per", "non"),
}


def _marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def langid_col(text: Column) -> Column:
    """Predicted language = argmax marker-hit count (ties → first language in
    sorted name order; zero hits everywhere → 'und')."""
    toks = tokens_col(F.lower(text))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):  # later comparisons use strict >
        score = _marker_score(toks, LANG_MARKERS[lang])
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def langid_sql(text_expr: str) -> str:
    """DuckDB twin of langid_col (same argmax + tie-break)."""
    pieces = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        pieces.append(
            f"len(list_filter(string_split(lower({text_expr}), ' '), "
            f"t -> list_contains([{markers}], t))) AS s_{lang}"
        )
    score_cols = ", ".join(pieces)
    langs = sorted(LANG_MARKERS)
    # fold the same strict-> argmax
    expr_lang, expr_score = "'und'", "0"
    for lang in langs:
        expr_lang = f"CASE WHEN s_{lang} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN s_{lang} > {expr_score} THEN s_{lang} ELSE {expr_score} END"
    return f"SELECT doc_id, ({expr_lang}) AS lang_pred FROM (SELECT doc_id, {score_cols} FROM documents)"


__all__.append("langid_sql")


def fingerprint_col(text: Column) -> Column:
    """64-bit content fingerprint (xxhash64 of the normalized text)."""
    return F.xxhash64(F.regexp_replace(F.lower(text), r"\s+", " "))


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>) for MinHash/Jaccard.
    transform over token positions; tiny per-element expressions only
    (higher-order lambdas are interpreted)."""
    toks = tokens_col(text)
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), n_sh - 1)
    return F.array_distinct(
        F.when(n_sh <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        )
    )
