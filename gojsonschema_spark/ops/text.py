"""Text-analysis operators for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen) — no
Python in the hot path. Each operator returns per-document columns and is
SQL-expressible so the DuckDB oracle can cross-check it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["tokenize", "token_count", "quality_score", "language_id",
           "fingerprint", "normalize_text", "repetition_metrics"]

# tiny per-language stopword markers for the n-gram/stopword language
# heuristic — deterministic and cheap, not a real LID model
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
    "zh": ["的", "了", "是"],
}

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")


def tokenize(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> Column:
    return F.size(tokenize(F.col(text_col))).alias("n_tokens")


def normalize_text(text: Column) -> Column:
    """Lowercase + collapse whitespace; used by fingerprint/dedup."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(text))


def quality_score(df: DataFrame, text_col: str = "text",
                  round_to: int = 6) -> DataFrame:
    """Length/punctuation/stopword-ratio quality features per document.

    * ``punct_ratio``  — punctuation chars / total chars
    * ``stop_ratio``   — stopword tokens / tokens
    * ``mean_tok_len`` — avg token length
    """
    text = F.col(text_col)
    toks = tokenize(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*_STOPWORDS)))
    mean_len = (F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
                / F.greatest(n_tok, F.lit(1)))
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), round_to).alias("punct_ratio"),
        F.round(stop / F.greatest(n_tok, F.lit(1)), round_to).alias("stop_ratio"),
        F.round(mean_len, round_to).alias("mean_tok_len"),
    )


def language_id(text: Column) -> Column:
    """Marker-count language heuristic: the language whose stopword markers
    occur most often in the text ('und' = unknown on ties at zero)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        score = None
        for m in markers:
            # occurrence count via length difference
            cnt = ((F.length(padded) -
                    F.length(F.regexp_replace(padded, _rx(m), ""))) /
                   max(len(m), 1)).cast("int")
            score = cnt if score is None else score + cnt
        scores.append((lang, score))
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:
        cond = score > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def _rx(s: str) -> str:
    import re as _re
    return _re.escape(s)


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition fractions (the Gopher-style repetition
    filters, Rae et al. 2021 §A1.1): duplicate-line fraction (by line
    count and by character mass) and the character fraction covered by
    the most frequent word 2-gram.

    Everything is computed per row with array higher-order functions —
    at 100 TB this is a pure map-side pass: zero shuffle, no Python, and
    the only cost is O(lines + distinct_grams x grams) inside codegen.
    An explode->groupBy formulation would shuffle (doc_id, gram) pairs
    for a metric that never crosses document boundaries.
    """
    text = F.col(text_col)
    lines = F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
    toks = tokenize(F.lower(text))
    # word 2-grams as "a b" strings
    grams = F.when(F.size(toks) >= 2, F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
    )).otherwise(F.array().cast("array<string>"))

    def _dup_count(arr):
        # elements beyond each value's first occurrence
        return F.size(arr) - F.size(F.array_distinct(arr))

    def _dup_char_mass(arr):
        # characters of occurrences past the first, per distinct value
        return F.aggregate(
            F.array_distinct(arr), F.lit(0),
            lambda acc, v: acc + F.length(v) *
            (F.size(F.filter(arr, lambda x: x == v)) - 1))

    top_gram_chars = F.aggregate(
        F.array_distinct(grams), F.lit(0),
        lambda acc, g: F.greatest(
            acc, F.length(g) * F.size(F.filter(grams, lambda x: x == g))))

    nz = lambda c, denom: F.when(denom > 0, c / denom).otherwise(F.lit(0.0))
    total_line_chars = F.aggregate(lines, F.lit(0),
                                   lambda acc, l: acc + F.length(l))
    total_gram_chars = F.aggregate(grams, F.lit(0),
                                   lambda acc, g: acc + F.length(g))
    return df.select(
        "*",
        nz(_dup_count(lines), F.size(lines)).alias("dup_line_frac"),
        nz(_dup_char_mass(lines), total_line_chars).alias("dup_line_char_frac"),
        nz(top_gram_chars, total_gram_chars).alias("top_bigram_char_frac"),
    )
