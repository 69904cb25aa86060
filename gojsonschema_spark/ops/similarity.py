"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; an LSH-bucketed variant
(random hyperplane signs) as the scale path — at 10^12 rows the
brute-force scan is one pass and the LSH path turns top-k into a
bucket-local problem. Dot products run as JVM higher-order functions
(zip_with + aggregate): no Python, fully codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["cosine_to_query", "brute_force_topk", "hyperplane_signature",
           "lsh_bucketed_topk"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_to_query(df: DataFrame, query_vec: list[float],
                    vec_col: str = "embedding", round_to: int = 6) -> DataFrame:
    """Append cosine similarity to a fixed query vector (driver literal —
    broadcast with the plan, no join)."""
    q = F.lit(query_vec).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, q) / (F.greatest(_norm(v), F.lit(1e-12)) *
                        F.greatest(_norm(q), F.lit(1e-12)))
    return df.withColumn("cosine", F.round(cos, round_to))


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding", key_col: str = "vec_id",
                     round_to: int = 6) -> DataFrame:
    """Exact top-k by cosine: one scan + a k-row ordered take.

    orderBy+limit compiles to TakeOrderedAndProject — each partition keeps
    only its local top-k, the driver merges; no full sort materializes."""
    return (cosine_to_query(df, query_vec, vec_col, round_to)
            .select(key_col, "cosine")
            .orderBy(F.col("cosine").desc(), F.col(key_col))
            .limit(k))


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: sign bits packed into a bigint."""
    v = vec.cast("array<double>")
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pl = F.lit(p).cast("array<double>")
        bit = F.when(_dot(v, pl) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out + bit * F.lit(1 << i).cast("long")
    return out


def lsh_bucketed_topk(df: DataFrame, query_vec: list[float], planes: list[list[float]],
                      k: int = 10, vec_col: str = "embedding",
                      key_col: str = "vec_id", round_to: int = 6) -> DataFrame:
    """ANN: restrict the scan to the query's hyperplane bucket, then exact
    cosine inside it. Partition pruning follows for tables written
    bucketed/partitioned by the signature."""
    sig = hyperplane_signature(F.col(vec_col), planes)
    q_sig_row = (df.sparkSession.range(1)
                 .select(hyperplane_signature(
                     F.lit(query_vec).cast("array<float>"), planes).alias("s"))
                 .collect())
    q_sig = q_sig_row[0]["s"]
    bucket = df.filter(sig == F.lit(q_sig))
    return brute_force_topk(bucket, query_vec, k, vec_col, key_col, round_to)
