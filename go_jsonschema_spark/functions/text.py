"""Text-analysis functions for large-scale training-data pipelines.

All hot-path expressions are native ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python in the per-row path.  Each returns a Column
so callers compose them into single-pass selects.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "words",
    "token_count",
    "word_shingles",
    "char_ngrams",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "fingerprint",
]

# Minimal per-language stopword marker sets (public common words); used by
# the n-gram/stopword language heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "de", "et", "est", "des", "un", "une", "dans"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "人"],
}


def words(text: Column) -> Column:
    """Whitespace tokenization, lowercased — ``array<string>``."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (the cheap BPE-proxy)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(words(text))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles, deduplicated — the MinHash input set."""
    w = words(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        )
    )


def char_ngrams(text: Column, n: int = 4) -> Column:
    """Character n-grams of the lowercased text, deduplicated."""
    t = F.lower(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
            lambda i: F.substring(t, i, n),
        )
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    cleaned = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(cleaned) / F.length(text)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of words that are stopwords of ``lang``."""
    w = words(text)
    sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(hits / F.size(w))


def quality_score(text: Column) -> Column:
    """Deterministic document-quality heuristic in [0, 1]:
    length factor · (1 - punct excess) · word-length sanity.

    Expressed fully natively so it runs inside codegen at 100 TB scale."""
    n_chars = F.length(text)
    n_words = token_count(text)
    mean_word_len = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_chars / n_words
    )
    length_factor = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    punct_factor = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.lit(2.0) * punct_ratio(text)
    )
    word_factor = F.when(
        (mean_word_len >= 3.0) & (mean_word_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(length_factor * punct_factor * word_factor, 4)


def lang_id(text: Column, langs: list[str] | None = None) -> Column:
    """Language-ID heuristic: argmax over per-language stopword hit counts.

    Native expression (array_intersect over the word set per language, a
    when-chain argmax) — a deliberately simple, deterministic stand-in for a
    real LID model, with the Spark plumbing (one pass, no UDF) being the
    point.  Returns 'und' when no language scores."""
    langs = langs or list(LANG_STOPWORDS)
    w = F.array_distinct(words(text))
    scores = {
        lg: F.size(
            F.array_intersect(
                w, F.array(*[F.lit(s) for s in LANG_STOPWORDS[lg]])
            )
        )
        for lg in langs
    }
    best = F.greatest(*scores.values()) if len(scores) > 1 else list(scores.values())[0]
    out = F.lit("und")
    for lg in reversed(langs):
        out = F.when((scores[lg] > 0) & (scores[lg] == best), F.lit(lg)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key (stable across engines, so DuckDB can verify)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))
