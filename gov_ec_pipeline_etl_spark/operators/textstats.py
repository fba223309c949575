"""Text-analysis operators for LLM-data pipelines: tokenization, token
counts, quality scoring, language ID, document fingerprinting.

Everything here is built-in expression composition (codegen, no UDF, no
shuffle until the caller aggregates) — the properties that let these run
per-row over 100 TB of documents as a pure map stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Whitespace tokenizer (reference-style normalize-then-split) and a
# BPE-ish word/punctuation splitter used for token *counting*.
WORD_SPLIT_RE = r"\s+"
BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and public-knowledge.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed text; empty text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, WORD_SPLIT_RE)
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish count: alpha runs + digit runs + single punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    n_punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    return F.when(n > 0, n_punct / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str]) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def avg_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Heuristic [0,1] quality score: rewards mid-length documents, word
    lengths in natural range, low punctuation, some stopword presence.
    Deliberately simple, fully expression-based, documented formula:

        0.25*len_ok + 0.25*wordlen_ok + 0.25*(1-punct) + 0.25*min(1, 5*stop)
    """
    c = F.col(col) if isinstance(col, str) else col
    sw = stopwords if stopwords is not None else LANG_STOPWORDS["en"]
    n = F.length(c)
    len_ok = F.when((n >= 50) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    awl = avg_token_len(c)
    wordlen_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    punct_term = 1.0 - F.least(punct_ratio(c), F.lit(1.0))
    stop_term = F.least(F.lit(1.0), stopword_ratio(c, sw) * 5.0)
    return (
        0.25 * len_ok + 0.25 * wordlen_ok + 0.25 * punct_term + 0.25 * stop_term
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(col: Column | str, min_hits: int = 1) -> Column:
    """Argmax language by stopword hits; ties broken by language code
    order; below ``min_hits`` → 'und' (undetermined)."""
    scores = lang_scores(col)
    # struct(score, neg-ordered lang) max trick: greatest on (hits, lang)
    # would tie-break by HIGHEST lang; we want lowest, so invert via
    # ordered iteration with strictly-greater comparison.
    best_lang = F.lit("und")
    best_score = F.lit(-1)
    for lang in sorted(scores):  # later langs must beat strictly
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return F.when(best_score >= min_hits, best_lang).otherwise(F.lit("und"))


def content_fingerprint(col: Column | str) -> Column:
    """Deterministic whole-document fingerprint: md5 of the
    whitespace-normalized lowercase text (reference-style normalize →
    stable content identity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def winnowing_sketch(col: Column | str, k: int = 5, sketch_size: int = 8) -> Column:
    """k-word-shingle sketch: the ``sketch_size`` smallest shingle md5s,
    sorted — a compact near-dup fingerprint (winnowing-style bottom-k)."""
    from gov_ec_pipeline_etl_spark.operators.dedup_fuzzy import word_shingles

    sh = word_shingles(col, k)
    hashed = F.transform(sh, F.md5)
    return F.slice(F.array_sort(hashed), 1, sketch_size)
