"""Full-text search: BM25 over a distributed postings index.

A training-data pipeline needs corpus search (inspect dedup clusters,
find contamination sources, debug quality-filter verdicts) without
collecting 100 TB to a driver. This module builds the classic
Robertson/Sparck-Jones BM25 ranking (k1/b form, the Lucene-style
``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf) as pure DataFrame algebra:

* :func:`build_postings` — one scan + one shuffle to (term, key, tf, dl);
  ``dl`` is folded in map-side (``size(tokens)`` before the explode) so
  no second shuffle over |docs| is needed.
* :func:`bm25_topk` — score an ad-hoc query against a corpus DataFrame:
  postings filtered to the query's terms FIRST (so the per-term df
  aggregate and the scoring join touch |query-term postings| rows, not
  the whole index), per-doc sum, TakeOrderedAndProject top-k.
* :func:`bm25_build_index` / :func:`bm25_probe_topk` — the 100 TB path:
  postings written partitioned by ``crc32(term) % n_buckets`` with df
  and dl DENORMALIZED onto each row, so a probe reads only the buckets
  containing the query's terms (partition pruning, plan-gated in
  tests), needs no join at all, and the only driver-side data is the
  one-row (N, avgdl) stats table.

Everything is native Catalyst expressions — no Python UDFs. Term
dfs for a query are a ≤|terms|-row broadcast; the global postings
build is a plain groupBy whose stopword skew AQE's skew-join/agg
splitting handles (documented tradeoff vs a window-over-term, which
would pin each stopword's postings onto a single task).

Tokenization is deliberately locale-proof: tokens are maximal
``[A-Za-z0-9]+`` runs lowered per token, so only ASCII letters are
case-folded and JVM vs ICU vs C-library Unicode tables cannot diverge
between the engine and any SQL oracle.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = ["tokenize", "tokenize_py", "build_postings", "bm25_topk",
           "bm25_build_index", "bm25_probe_topk"]

TOKEN_RE = "[A-Za-z0-9]+"


def tokenize(col) -> Column:
    """ASCII-alphanumeric tokens, lowercased per token (ASCII-only fold —
    see module docstring)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.transform(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0)),
                       F.lower)


def tokenize_py(text: str) -> list[str]:
    """Driver-side twin of :func:`tokenize` for query strings."""
    return [t.lower() for t in re.findall(TOKEN_RE, text)]


def _term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of the index's partition function. crc32 (not
    xxhash64) precisely because it has a bit-identical stdlib
    implementation — probes can rank buckets without launching a job."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _term_bucket(term: Column, n_buckets: int) -> Column:
    return F.pmod(F.crc32(term.cast("binary")), F.lit(n_buckets))


def build_postings(df: DataFrame, text_col: str = "text",
                   key_col: str = "doc_id") -> DataFrame:
    """(term, key, tf, dl) postings: one scan, one shuffle.

    ``dl`` (document token length) is computed map-side from the token
    array BEFORE the explode and rides the groupBy key, so deriving it
    never costs a second |docs|-sized shuffle. The per-token lowercase
    runs AFTER the explode as a plain scalar expression — whole-stage
    codegen — instead of inside a ``transform`` lambda (higher-order
    lambdas are CodegenFallback: interpreted per element)."""
    c = F.col(text_col)
    # the raw token array is materialized as an ATTRIBUTE first: size()
    # and explode() both consume it, and inlining the regexp_extract_all
    # into each (one select) runs the regex twice per document
    raw = df.select(F.col(key_col).alias("key"),
                    F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0))
                    .alias("toks"))
    return (raw.select("key", F.size("toks").alias("dl"),
                       F.explode("toks").alias("t0"))
            .select("key", "dl", F.lower(F.col("t0")).alias("term"))
            .groupBy("term", "key", "dl")
            .agg(F.count("*").alias("tf")))


def _corpus_stats(df: DataFrame, text_col: str) -> DataFrame:
    """One-row (n_docs, avgdl) aggregate — map-side partial, no shuffle of
    note. Zero-token documents count toward both (dl = 0).

    ``regexp_count`` == ``size(regexp_extract_all(...))`` without
    materializing (or lambda-lowercasing) the token array."""
    c = F.col(text_col)
    return df.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.regexp_count(c, F.lit(TOKEN_RE))).alias("avgdl"))


def _bm25_score(tf: Column, df_: Column, dl: Column, n_docs: Column,
                avgdl: Column, k1: float, b: float) -> Column:
    # Expression shape is mirrored token-for-token by the DuckDB oracle —
    # keep the parenthesization if editing (FP addition isn't associative).
    idf = F.log((n_docs.cast("double") - df_ + F.lit(0.5)) /
                (df_ + F.lit(0.5)) + F.lit(1.0))
    norm = (tf * F.lit(k1 + 1.0)) / \
        (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl / avgdl)))
    return idf * norm


def bm25_topk(df: DataFrame, query: str, k: int = 10,
              text_col: str = "text", key_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75,
              round_to: int = 6) -> DataFrame:
    """Exact BM25 top-k of ``query`` against a corpus DataFrame.

    Duplicate query terms are deduplicated (unit query-term weight).
    Ties broken by key for a deterministic result set."""
    terms = sorted(set(tokenize_py(query)))
    if not terms:
        return (df.select(key_col).limit(0)
                .withColumn("bm25", F.lit(0.0)))
    stats = _corpus_stats(df, text_col)
    # materialize the filtered postings ONCE: the df aggregate and the
    # scoring join below both consume `cand`, and Spark 4.1 does not
    # reuse the diamond's exchange (the round-start plan carried TWO
    # full scan->tokenize->explode subtrees of the corpus — one per
    # consumer). cand is bounded by the query terms' postings, so the
    # checkpoint is small; a window-over-term formulation was measured
    # 2x WORSE here (each query term's postings serialize onto one
    # task, where the groupBy+broadcast-join keeps every stage
    # partition-parallel).
    cand = (build_postings(df, text_col, key_col)
            .filter(F.col("term").isin(terms))
            .localCheckpoint(eager=True))
    tdf = cand.groupBy("term").agg(F.count("*").alias("df"))
    scored = (cand
              .join(F.broadcast(tdf), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn("s", _bm25_score(
                  F.col("tf"), F.col("df"), F.col("dl"),
                  F.col("n_docs"), F.col("avgdl"), k1, b)))
    return (scored.groupBy("key")
            .agg(F.round(F.sum("s"), round_to).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col("key"))
            .limit(k)
            .withColumnRenamed("key", key_col))


def bm25_build_index(df: DataFrame, target: str, text_col: str = "text",
                     key_col: str = "doc_id", n_buckets: int = 64) -> dict:
    """Persist a BM25 index partitioned by ``crc32(term) % n_buckets``.

    df (per-term document frequency) and dl are denormalized onto every
    posting row, so probes are join-free: the per-posting width grows by
    two longs, and in exchange a query never shuffles at read time. The
    df join here (build time, once) is a plain shuffle join whose
    stopword skew AQE splits. Returns the stats dict {n_docs, avgdl},
    which is also written to ``target + "_stats"``."""
    from ..io.tables import write_pages
    p = build_postings(df, text_col, key_col)
    tdf = p.groupBy("term").agg(F.count("*").alias("df"))
    idx = (p.join(tdf, "term")
           .withColumn("term_bucket", _term_bucket(F.col("term"), n_buckets)))
    write_pages(idx, target, bucket_col="term_bucket")
    stats = _corpus_stats(df, text_col)
    stats.write.mode("overwrite").parquet(target + "_stats")
    row = stats.first()
    return {"n_docs": row["n_docs"], "avgdl": row["avgdl"],
            "n_buckets": n_buckets}


def bm25_probe_topk(spark: SparkSession, index_source: str, query: str,
                    k: int = 10, key_col: str = "doc_id",
                    n_buckets: int = 64, k1: float = 1.2, b: float = 0.75,
                    stats: dict | None = None,
                    round_to: int = 6) -> DataFrame:
    """BM25 top-k against a PERSISTED index (:func:`bm25_build_index`).

    Buckets for the query's terms are ranked on the driver with the
    stdlib crc32 twin — no job launches to plan the read — and only
    those partitions are scanned (plan-gated: the scan's
    PartitionFilters carries term_bucket). Scoring is a pure map over
    the pruned postings + one groupBy(key): no join, because df/dl are
    stored on the rows."""
    from ..io.tables import read_pages
    terms = sorted(set(tokenize_py(query)))
    if not terms:
        return (read_pages(spark, index_source, bucket_col="term_bucket",
                           buckets=[])
                .select(F.col("key").alias(key_col)).limit(0)
                .withColumn("bm25", F.lit(0.0)))
    if stats is None:
        row = spark.read.parquet(index_source + "_stats").first()
        stats = {"n_docs": row["n_docs"], "avgdl": row["avgdl"]}
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in terms})
    cand = (read_pages(spark, index_source, bucket_col="term_bucket",
                       buckets=buckets)
            .filter(F.col("term").isin(terms)))
    scored = cand.withColumn("s", _bm25_score(
        F.col("tf"), F.col("df"), F.col("dl"),
        F.lit(stats["n_docs"]), F.lit(stats["avgdl"]), k1, b))
    return (scored.groupBy("key")
            .agg(F.round(F.sum("s"), round_to).alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col("key"))
            .limit(k)
            .withColumnRenamed("key", key_col))
