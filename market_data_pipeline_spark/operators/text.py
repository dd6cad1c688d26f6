"""Text analysis operators (SURVEY §7 Phase 6): quality scoring, token
counting, language-ID heuristic, fingerprinting.

All built-in expressions (split/filter/transform/regexp_count) — no UDFs;
everything stays in whole-stage codegen and scales as a map-only pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Per-language stopword marker lists for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein"],
    "zh": ["的", "是", "了", "在", "和", "有", "我"],
}

TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text_col: Column) -> Column:
    """Whitespace tokens of trimmed, lowercased text."""
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (int)."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs, and
    individual punctuation marks. A cheap stand-in for a real tokenizer's
    token count, adequate for budget/quality filtering."""
    return F.regexp_count(text_col, F.lit(TOKEN_PATTERN))


def stopword_count(text_col: Column, stopwords: list[str]) -> Column:
    return F.size(F.filter(tokens(text_col), lambda t: t.isin(*stopwords)))


def quality_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document quality features: char/token counts, mean token length,
    stopword ratio, punctuation ratio, all-caps flag.

    The quality-scoring idiom generalizes the reference's validation
    chain (reference: scripts/sync_delisted_stocks.py:50-101) from
    hard filters to soft scores.
    Returns one row per doc with feature columns.
    """
    # stage the token array and scalar counts into materialized columns so
    # the split/filter subtrees are computed once per row, not once per
    # referencing expression (Catalyst inlines projections)
    staged = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("char_count"),
        tokens(F.col(text_col)).alias("_toks"),
        F.length(F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", "")).alias("punct_count"),
    ).select(
        F.col(id_col),
        "char_count",
        F.size(F.col("_toks")).alias("token_count"),
        F.size(F.filter(F.col("_toks"), lambda x: x.isin(*STOPWORDS["en"]))).alias("stop_count"),
        "punct_count",
    )
    return staged.select(
        F.col(id_col),
        "char_count",
        "token_count",
        (F.col("char_count").cast("double") / F.col("token_count")).alias("chars_per_token"),
        "stop_count",
        (F.col("stop_count").cast("double") / F.col("token_count")).alias("stop_ratio"),
        "punct_count",
        (F.col("punct_count").cast("double") / F.col("char_count")).alias("punct_ratio"),
    )


def detect_language(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-frequency language ID: score each language by its marker
    hits; argmax with a fixed language order for deterministic ties.

    Returns (id_col, predicted_lang, <lang>_score...).
    """
    langs = list(STOPWORDS)
    # stage tokens, then scores, so the split runs once and each score
    # once (the argmax references every score several times)
    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")).select(
        F.col(id_col),
        *[
            F.size(F.filter(F.col("_toks"), lambda x: x.isin(*STOPWORDS[lang]))).alias(
                f"{lang}_score"
            )
            for lang in langs
        ],
    )
    scores = {lang: F.col(f"{lang}_score") for lang in langs}
    # deterministic argmax: first language (in declared order) holding the
    # max positive score wins ties
    max_score = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):
        pred = F.when((scores[lang] == max_score) & (max_score > 0), F.lit(lang)).otherwise(pred)
    return staged.select(
        F.col(id_col),
        pred.alias("predicted_lang"),
        *[scores[lang].alias(f"{lang}_score") for lang in langs],
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic 64-bit content fingerprint (xxhash64 of normalized
    text: lowercased, whitespace-collapsed). The normalization makes the
    fingerprint robust to formatting-only edits — the practical use of the
    reference's exact dedup generalized to content identity.
    Returns (id_col, fingerprint)."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(F.col(id_col), F.xxhash64(normalized).alias("fingerprint"))


def rolling_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", window: int = 8
) -> DataFrame:
    """Winnowing-style rolling fingerprint: min token-window hash.

    Hashes every ``window``-token sliding span and keeps the minimum — a
    cheap document sketch whose collision across docs implies a shared
    span (plagiarism/near-dup signal). Built-ins only.
    Returns (id_col, min_span_hash, n_spans)."""
    # stage the token array first: inlining the split into every span's
    # element accesses recomputes it window-times per span (measured 40x
    # slower at sf0.1)
    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(0)))
    span_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i, window), " "))
    )
    return staged.select(
        F.col(id_col),
        F.array_min(span_hashes).alias("min_span_hash"),
        F.size(span_hashes).alias("n_spans"),
    )
