"""Explicit skew handling for hot-key aggregations.

AQE's skew-join splitting covers joins; for groupBy aggregations over a
Zipf-ish key (host names in a web corpus: a handful of domains carry a
double-digit share of pages) the classic fix is SALTING — two-stage
aggregation where stage 1 fans each hot key out across ``n_salts``
reducers and stage 2 combines the per-salt partials. Spark already does
map-side partial aggregation for algebraic aggregates, which removes most
skew pressure; salting matters when the per-key state is NOT tiny
(collect_list/collect_set-style) or when a single reducer key still
dominates the shuffle read. These helpers make the pattern explicit and
testable instead of implicit in AQE behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["with_salt", "salted_counts", "salted_collect_sample"]


def with_salt(df: DataFrame, key: str, n_salts: int = 32,
              salt_col: str = "__salt",
              stable_cols: list[str] | None = None) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): spreads one hot key
    over n_salts reducers — including the degenerate case where the hot
    key's rows are FULLY IDENTICAL (boilerplate/empty-text pages), which a
    content-only hash would map to a single lane. The salt mixes the row's
    physical position (monotonically_increasing_id = partition id + offset
    within partition) into the content hash: rows that agree on every
    column still fan out across lanes. Position is deterministic for a
    deterministic scan (same files, same split order) — the resumable-
    rerun scenario this op is designed for — unlike rand().

    Determinism caveat (ADVICE r3): the position component depends on the
    PHYSICAL partition layout, so reruns reproduce salts only when the
    scan layout is byte-identical — same files, same
    maxPartitionBytes/AQE coalescing, no upstream repartition change. A
    layout change re-deals rows across lanes (per-lane partials differ;
    the stage-2 combine is still exact). monotonically_increasing_id is
    also a non-deterministic expression to Catalyst, which blocks
    predicate/projection pushdown THROUGH the salted projection — salt
    late, after filters, or pass ``stable_cols`` where exact
    resumability of the partials matters.

    ``stable_cols``: derive the salt purely from the named columns (an
    id column, or any high-entropy combination) — fully deterministic
    and layout-independent, so reruns reproduce identical per-lane
    partials under ANY scan layout, and the expression stays
    deterministic for Catalyst (pushdown unaffected). The caller must
    pick columns that actually vary within a hot key; fully identical
    rows then share a lane (the positional default exists precisely for
    that degenerate case)."""
    if stable_cols:
        return df.withColumn(
            salt_col,
            F.pmod(F.xxhash64(*[F.col(c) for c in stable_cols]),
                   F.lit(n_salts)).cast("int"))
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(F.monotonically_increasing_id(),
                          *[F.col(c) for c in df.columns]),
               F.lit(n_salts)).cast("int"))


def salted_counts(df: DataFrame, key: str, n_salts: int = 32) -> DataFrame:
    """Two-stage count per key: groupBy(key, salt) -> groupBy(key).

    Stage 1's shuffle spreads each hot key across n_salts reducers; stage
    2 combines at most n_salts rows per key."""
    salted = with_salt(df, key, n_salts)
    partial = (salted.groupBy(key, "__salt")
                     .agg(F.count(F.lit(1)).alias("__n")))
    return partial.groupBy(key).agg(F.sum("__n").alias("n"))


def salted_collect_sample(df: DataFrame, key: str, value: str,
                          per_key: int = 16, n_salts: int = 32) -> DataFrame:
    """Bounded per-key exemplar list under skew: each salt lane keeps at
    most ``per_key`` values (slice inside the lane), the combine step
    merges lanes and slices again — no reducer ever holds more than
    n_salts * per_key elements for even the hottest key."""
    salted = with_salt(df, key, n_salts)
    lane = (salted.groupBy(key, "__salt")
                  .agg(F.slice(F.sort_array(F.collect_list(value)),
                               1, per_key).alias("__vals")))
    return (lane.groupBy(key)
                .agg(F.slice(F.sort_array(F.flatten(F.collect_list("__vals"))),
                             1, per_key).alias("sample"),
                     F.count(F.lit(1)).alias("n_lanes")))
