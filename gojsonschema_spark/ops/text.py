"""Text-analysis operators for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen) — no
Python in the hot path. Each operator returns per-document columns and is
SQL-expressible so the DuckDB oracle can cross-check it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["tokenize", "token_count", "quality_score", "language_id",
           "fingerprint", "normalize_text", "repetition_metrics",
           "token_count_bpe", "temperature_fractions", "temperature_resample",
           "pack_sequences", "redact_pii", "gopher_quality_filter"]

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
    toks = F.array_remove(F.split(text, r"\s+"), "")  # native tokenize
    n_tok = F.size(toks)
    n_chars = F.length(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*_STOPWORDS)))
    # sum of token lengths natively (lambda aggregates are interpreted)
    mean_len = (F.length(F.array_join(toks, "")) / F.greatest(n_tok, F.lit(1)))
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

    Everything is computed per row — at 100 TB this is a pure map-side
    pass: zero shuffle, no Python. Higher-order lambda expressions are
    CodegenFallback (interpreted per element), so the hot arrays use
    NATIVE expressions only — array_remove/array_join/arrays_zip/
    array_sort/array_distinct — char masses come from join-then-length
    (duplicate mass = total minus distinct mass), and the single lambda
    pass left is the run-length aggregate over the SORTED bigram array
    for the top-gram mass. The first formulation (count-per-distinct
    inside a lambda, O(distinct x n) interpreted) measured 40s on 200k
    real pages; this one ~3s. An explode->groupBy formulation would
    shuffle (doc_id, gram) pairs for a metric that never crosses
    documents.
    """
    text = F.col(text_col)
    # lines: tiny arrays (a handful per page) — lambdas are fine here
    lines = F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
    # tokens: native only (array_remove drops the empty-string artifacts)
    toks = F.array_remove(F.split(F.lower(text), r"\s+"), "")
    n = F.size(toks)
    # bigrams as native structs (string building would need a lambda);
    # struct equality/ordering gives the same run grouping
    pairs = F.arrays_zip(F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                         F.slice(toks, 2, F.greatest(n - 1, F.lit(0))))

    def _chars(arr):
        return F.length(F.array_join(arr, ""))

    def _dup_count(arr):
        # elements beyond each value's first occurrence
        return F.size(arr) - F.size(F.array_distinct(arr))

    def _dup_char_mass(arr):
        # characters of occurrences past the first == total - distinct mass
        return _chars(arr) - _chars(F.array_distinct(arr))

    # max over g of len(g)*count(g) ("a b" rendering: len = len(a)+len(b)+1)
    # via ONE pass over the sorted pair array: state (prev, run, best)
    def _plen(p):
        return F.length(p["0"]) + F.length(p["1"]) + 1

    def _run_step(st, g):
        # compare struct fields directly (no per-element string building)
        same = st["p0"].eqNullSafe(g["0"]) & st["p1"].eqNullSafe(g["1"])
        run = F.when(same, st["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            g["0"].alias("p0"), g["1"].alias("p1"), run.alias("run"),
            F.greatest(st["best"], _plen(g) * run).alias("best"))

    top_gram_chars = F.aggregate(
        F.array_sort(pairs),
        F.struct(F.lit(None).cast("string").alias("p0"),
                 F.lit(None).cast("string").alias("p1"),
                 F.lit(0).alias("run"), F.lit(0).alias("best")),
        _run_step,
        lambda st: st["best"])

    nz = lambda c, denom: F.when(denom > 0, c / denom).otherwise(F.lit(0.0))
    total_line_chars = _chars(lines)
    # sum of len("ti ti+1") = 2*total_tok_chars - len(first) - len(last)
    # + (n-1) spaces — all native arithmetic
    total_gram_chars = F.when(n >= 2,
                              2 * _chars(toks)
                              - F.length(F.element_at(toks, 1))
                              - F.length(F.element_at(toks, -1))
                              + (n - 1)).otherwise(F.lit(0))
    return df.select(
        "*",
        nz(_dup_count(lines), F.size(lines)).alias("dup_line_frac"),
        nz(_dup_char_mass(lines), total_line_chars).alias("dup_line_char_frac"),
        nz(top_gram_chars, total_gram_chars).alias("top_bigram_char_frac"),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(df: DataFrame, text_col: str = "text",
                          min_words: int = 50, max_words: int = 100_000,
                          min_mean_word_len: float = 3.0,
                          max_mean_word_len: float = 10.0,
                          max_symbol_word_ratio: float = 0.1,
                          min_stop_hits: int = 2,
                          max_dup_line_frac: float = 0.30,
                          max_top_bigram_char_frac: float = 0.20,
                          stopwords: tuple = _GOPHER_STOPWORDS) -> DataFrame:
    """Composite Gopher-rule quality gate (Rae et al. 2021 §A1.1, the
    public document-filter list): word count, mean word length, symbol-
    to-word ratio (# and ellipses), required-stopword hits (>=2 of
    the/be/to/of/and/that/have/with — override ``stopwords`` for
    non-English corpora), and the repetition fractions. Adds one ``ok_*``
    bit per rule plus the conjunction ``keep``.

    Scale shape: pure map-side composition of :func:`quality_score` and
    :func:`repetition_metrics` plus native expressions — zero shuffle, no
    Python, one row in = one row out, so it pipelines with the scan. All
    rule inputs are integer-ratio doubles, so an external SQL oracle
    reproduces the bits bit-for-bit (IEEE division of the same ints)."""
    from functools import reduce

    out = repetition_metrics(quality_score(df, text_col), text_col)
    text = F.col(text_col)
    toks_lower = F.array_remove(F.split(F.lower(text), r"\s+"), "")
    stop_hits = F.size(F.array_intersect(
        toks_lower, F.array(*[F.lit(w) for w in stopwords])))
    symbols = F.regexp_count(text, F.lit(r"#|\.\.\."))
    n_tok = F.col("n_tokens")
    rules = {
        "ok_word_count": (n_tok >= min_words) & (n_tok <= max_words),
        "ok_mean_word_len": ((F.col("mean_tok_len") >= min_mean_word_len)
                             & (F.col("mean_tok_len") <= max_mean_word_len)),
        "ok_symbol_ratio": (symbols / F.greatest(n_tok, F.lit(1))
                            <= max_symbol_word_ratio),
        "ok_stopwords": stop_hits >= min_stop_hits,
        "ok_dup_lines": F.col("dup_line_frac") <= max_dup_line_frac,
        "ok_top_bigram": (F.col("top_bigram_char_frac")
                          <= max_top_bigram_char_frac),
    }
    out = out.select("*", *[c.alias(name) for name, c in rules.items()])
    keep = reduce(lambda a, b: a & b, [F.col(name) for name in rules])
    return out.withColumn("keep", keep)


# GPT-2-style pre-tokenizer shape: contraction suffixes, space-prefixed
# letter runs, space-prefixed digit runs, space-prefixed punctuation runs,
# residual whitespace (public pattern family, Radford et al. 2019)
_BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_count_bpe(df: DataFrame, text_col: str = "text") -> Column:
    """BPE-ish token count: one native regexp_count pass (JVM, no Python),
    the standard quick estimate of LLM token mass per document."""
    return F.regexp_count(F.col(text_col), F.lit(_BPE_ISH)).alias("n_bpe_tokens")


def temperature_fractions(df: DataFrame, group_col: str,
                          temperature: float) -> dict:
    """Per-group sampling fractions for temperature-based corpus mixing
    (the standard LLM data-mix reweighting: target share ~ p^(1/T);
    T=1 keeps the natural mix, T->inf approaches uniform).

    Returns {group: fraction-to-KEEP} scaled so the largest fraction is
    1.0 (pure downsampling — without-replacement sampleBy cannot
    upsample; feed the fractions to :func:`temperature_resample`).
    Driver-side state is one row per group."""
    rows = df.groupBy(group_col).count().collect()
    total = sum(r["count"] for r in rows) or 1
    inv_t = 1.0 / float(temperature)
    weights = {r[group_col]: (r["count"] / total) ** inv_t for r in rows}
    z = sum(weights.values()) or 1.0
    # keep-fraction implementing the target share, then rescale so the
    # most-kept group passes through untouched
    frac = {g: (weights[g] / z) / (rows_count / total)
            for g, rows_count in ((r[group_col], r["count"]) for r in rows)}
    peak = max(frac.values()) if frac else 1.0
    return {g: min(f / peak, 1.0) for g, f in frac.items()}


def temperature_resample(df: DataFrame, group_col: str, temperature: float,
                         seed: int = 7) -> DataFrame:
    """Deterministic stratified resample of ``df`` to the temperature-T
    mix: one count pass (driver holds |groups| fractions), then a single
    map-side ``sampleBy`` — no shuffle of data rows."""
    fractions = temperature_fractions(df, group_col, temperature)
    return df.sampleBy(group_col, fractions, seed=seed)


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   pack_col: str = "pack_id") -> DataFrame:
    """Greedy next-fit packing of documents into fixed token-budget
    training sequences: adds ``pack_col`` such that the token sum within
    each pack is <= ``budget`` (a document longer than the budget gets a
    pack of its own).

    Packing is PARTITION-LOCAL by design: bins never cross partitions, so
    the pass is mapInPandas with O(1) state and zero shuffle — global
    packing would serialize the corpus for a ~budget/2 tail improvement
    per partition. Pack ids are (partition_id << 33) | local_id,
    deterministic for a deterministic partitioning (the resumable-run
    scenario)."""
    from pyspark.sql.types import LongType, StructField, StructType

    # NB: StructType.add MUTATES (and df.schema is cached on the
    # DataFrame) — build a fresh StructType instead
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(pack_col, LongType())])
    with_pid = df.withColumn("__pid", F.spark_partition_id())

    def pack(batches):
        import pandas as pd  # noqa: F401  (worker-side)

        local = 0
        used = None  # tokens used in the open pack; None = no pack yet
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            ids = []
            for t in pdf[token_col]:
                t = int(t) if t == t else 0  # NaN-safe
                if used is None or used + t > budget:
                    local += 0 if used is None else 1
                    used = 0
                used += t
                ids.append((pid << 33) | local)
            res = pdf.drop(columns=["__pid"])
            res[pack_col] = ids
            yield res

    return with_pid.mapInPandas(pack, schema=out_schema)


# conservative, high-precision PII patterns (the standard pre-training
# scrub: emails, phone-like number runs, IPv4s); precision over recall —
# a corpus scrub must not mangle ordinary prose
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\.){3}"
            r"(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\b",
    "phone": r"(?<![0-9])(?:\+?[0-9]{1,3}[-. ])?(?:\([0-9]{3}\)[-. ]?"
             r"|[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}(?![0-9])",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Redact emails / IPv4s / phone-number shapes to typed placeholders
    (``<EMAIL>``, ``<IP>``, ``<PHONE>``) and count replacements per kind —
    one map-side pass of chained native regexp_replace (counts via
    regexp_count BEFORE replacement, so overlapping kinds are attributed
    to the first pattern applied, in _PII_PATTERNS order)."""
    text = F.col(text_col)
    counts = []
    redacted = text
    for kind, pat in _PII_PATTERNS.items():
        counts.append(F.regexp_count(redacted, F.lit(pat))
                      .alias(f"n_{kind}"))
        redacted = F.regexp_replace(redacted, pat,
                                    f"<{kind.upper().replace('IPV4', 'IP')}>")
    return df.select("*", *counts, redacted.alias(out_col))
