"""Span-level exact substring dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr variant, re-expressed for Spark).

The published algorithm builds a suffix array over the concatenated
corpus — inherently single-machine. The distributed re-expression:
every length-``n`` token window ("gram") is fingerprinted map-side,
grams are counted corpus-wide with one shuffle on the fingerprint, and
each document learns which of its positions start a duplicated gram via
one join back on the fingerprint. Duplicated-token coverage (the union
of the [pos, pos+n) intervals) is integer set algebra per row, and
:func:`strip_repeated_spans` rebuilds the text with covered tokens
dropped. No driver-side state, no Python UDFs, both shuffles keyed on
high-entropy 8-byte fingerprints (xxhash64 over the token window —
internal only, never emitted, so oracle engines re-derive the SPAN
statistics rather than the fingerprint; collision odds are ~1e-10 at
oracle scale, see :func:`_gram_rows`).

Scale: gram rows are |tokens| x 1 per document (the gram itself is
hashed immediately — the n-times token amplification never ships), and
the only wide row is the per-doc sorted position list, bounded by the
document's own length. Corpus-wide counts run as a count-only window
over the fingerprint by default (single gram pass — see
:func:`repeated_ngram_spans` for the measured rationale and the
``skew_safe`` alternative for pathologically hot grams).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["repeated_ngram_spans", "strip_repeated_spans"]


def _tokens(text_col: str) -> Column:
    """Whitespace tokens; empty text -> empty array (split('') yields
    [''], which would mint a phantom token)."""
    t = F.col(text_col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+"))


def _gram_rows(df: DataFrame, n: int, text_col: str, key_col: str):
    """(key, pos, gram_fp) — one row per length-n window.

    The windows are built with NATIVE expressions only —
    ``arrays_zip`` of ``n`` shifted slices (the repetition_metrics
    lesson: any per-window interpreted lambda, even a bare slice, was
    measured 2.5-10x slower than one native zip) — and the fingerprint
    is ``xxhash64`` over the zipped token STRUCT computed AFTER the
    posexplode as a plain scalar expression under whole-stage codegen:
    no per-window string build, no per-window crypto hash. The struct
    hash chains per-field hashes (order-sensitive, field-boundary-
    exact), so gram identity is preserved exactly up to 64-bit hash
    collisions — ~1e-10 odds of ONE colliding pair at the 10^5-gram
    oracle scale, and a collision can only mark one extra position
    duplicated. (The previous md5-of-joined-string was chosen for
    oracle-engine reproducibility, but the fingerprint never leaves
    the query — only the span statistics do.) vs the md5-in-lambda
    formulation this measured 7.7s -> 2.1s noop on 200k pages.

    Only the 8-byte fingerprint leaves the scan stage; ``n_tokens`` is
    re-derived by the caller from the base table, never shipped per
    gram row."""
    toks = df.select(F.col(key_col).alias("key"),
                     _tokens(text_col).alias("toks"))
    # every slice has exactly cnt = max(size - n + 1, 0) elements, so
    # arrays_zip never NULL-pads; docs shorter than n yield cnt = 0 and
    # the posexplode drops them (the old explicit size >= n guard)
    cnt = F.greatest(F.size("toks") - (n - 1), F.lit(0))
    grams = F.arrays_zip(*[F.slice("toks", i + 1, cnt) for i in range(n)])
    return (toks
            .select("key", F.posexplode(grams).alias("pos0", "g"))
            .select("key", "pos0", F.xxhash64("g").alias("gram_fp")))


def repeated_ngram_spans(df: DataFrame, n: int = 20, min_count: int = 2,
                         text_col: str = "text", key_col: str = "doc_id",
                         skew_safe: bool = False) -> DataFrame:
    """Per-document duplicated-span statistics.

    A gram is "duplicated" when its corpus-wide occurrence count
    (within-document repeats included) reaches ``min_count``. Returns
    one row per input document:

    * ``n_tokens`` — whitespace token count
    * ``dup_starts`` — sorted 0-based positions starting a duplicated gram
    * ``n_dup_grams`` — len(dup_starts)
    * ``dup_token_mass`` — tokens covered by the union of the
      [pos, pos+n) intervals
    * ``dup_frac`` — dup_token_mass / n_tokens (0.0 for empty docs)

    Documents shorter than ``n`` tokens have no grams and report zeros.

    Default strategy: ONE gram-generation pass, corpus-wide counts via a
    count-only window over ``gram_fp`` (WindowExec streams + spills a
    hot gram's partition; nothing is collected per key). The gram pass
    (slice-only window lambda + post-explode codegen hash) still
    dominates cost (measured ~2x end-to-end vs deriving grams twice),
    so single-pass wins. If one
    gram's occurrence count alone rivals a whole partition's row budget
    (pathological boilerplate at 10^12 docs), set ``skew_safe=True``:
    counts become a partial-aggregate groupBy + a semi-join back whose
    skew AQE splits, at the price of a second gram-generation pass.
    """
    grams = _gram_rows(df, n, text_col, key_col)
    if skew_safe:
        counts = (grams.groupBy("gram_fp")
                  .agg(F.count("*").alias("c"))
                  .filter(F.col("c") >= min_count)
                  .select("gram_fp"))
        dup_rows = grams.join(counts, "gram_fp")
    else:
        from pyspark.sql import Window
        w = Window.partitionBy("gram_fp")
        dup_rows = (grams.withColumn("c", F.count("*").over(w))
                    .filter(F.col("c") >= min_count))
    hits = (dup_rows
            .groupBy("key")
            .agg(F.sort_array(F.collect_list("pos0")).alias("dup_starts")))
    base = df.select(F.col(key_col).alias("key"),
                     F.size(_tokens(text_col)).alias("n_tokens"))
    out = (base.join(hits, "key", "left")
           .withColumn("dup_starts",
                       F.coalesce("dup_starts",
                                  F.array().cast("array<int>"))))
    covered = F.array_distinct(F.flatten(F.transform(
        "dup_starts", lambda p: F.sequence(p, p + (n - 1)))))
    return (out
            .withColumn("n_dup_grams", F.size("dup_starts"))
            .withColumn("dup_token_mass", F.size(covered))
            .withColumn("dup_frac",
                        F.when(F.col("n_tokens") == 0, F.lit(0.0))
                        .otherwise(F.col("dup_token_mass") /
                                   F.col("n_tokens")))
            .select(F.col("key").alias(key_col), "n_tokens", "dup_starts",
                    "n_dup_grams", "dup_token_mass", "dup_frac"))


def strip_repeated_spans(df: DataFrame, n: int = 20, min_count: int = 2,
                         text_col: str = "text",
                         key_col: str = "doc_id") -> DataFrame:
    """Rebuild ``text`` with every token covered by a duplicated gram
    removed (the ExactSubstr cut, at token granularity). Returns the
    input columns plus ``clean_text``.

    The per-row filter tests each token index against the covered-index
    array — O(|tokens| * |covered|) interpreted-HOF work per row,
    bounded by the document's own length. Fine as the post-filter for
    flagged documents; for corpus-wide rewriting prefer gating on
    :func:`repeated_ngram_spans`'s ``dup_frac`` first so untouched rows
    skip the rebuild."""
    spans = repeated_ngram_spans(df, n, min_count, text_col, key_col) \
        .select(key_col, "dup_starts")
    joined = df.join(spans, key_col)
    covered = F.array_distinct(F.flatten(F.transform(
        "dup_starts", lambda p: F.sequence(p, p + (n - 1)))))
    kept = F.filter(_tokens(text_col),
                    lambda t, i: ~F.array_contains(F.col("covered"), i))
    return (joined
            .withColumn("covered", covered)
            .withColumn("clean_text", F.concat_ws(" ", kept))
            .drop("covered", "dup_starts"))
