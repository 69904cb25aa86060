"""Text-analysis operators for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen) — no
Python in the hot path. Each operator returns per-document columns and is
SQL-expressible so the DuckDB oracle can cross-check it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["tokenize", "token_count", "quality_score", "language_id",
           "fingerprint", "normalize_text"]

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
