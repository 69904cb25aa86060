"""Join operators Spark lacks natively, built from shuffle-friendly
primitives.

``asof_join`` is the feature-store / point-in-time join: for each left
row, the single right row with the greatest timestamp <= the left
timestamp (optionally within a tolerance window). Spark has no ASOF
join operator; the standard formulations are a range join (quadratic
blowup per key without tight bounds) or a union + last-non-null window
— this implements the latter: ONE shuffle on the key, no per-row
Python, no range explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str, value_col: str, out_col: str | None = None,
              tolerance_sec: float | None = None) -> DataFrame:
    """For every left row, attach the latest ``value_col`` from
    ``right`` whose ``ts_col`` is <= the left row's (ties at equal
    timestamps DO match, mirroring DuckDB/pandas ``merge_asof``
    defaults); rows with no prior right row get NULL.
    ``tolerance_sec`` nulls matches older than the window (the
    feature-staleness cutoff).

    Shape: right first reduces to ONE row per (key, ts) — the max value,
    making the result deterministic when right carries same-timestamp
    duplicates — then both sides union (right rows sort BEFORE left rows
    at equal timestamps, implementing the <= tie rule) and one
    last-non-null window per key fills values forward. Exactly one
    shuffle, keyed on ``key_col``; per-key data lands on one task, so a
    bot key with 10^9 events serializes there — pre-split hot keys by
    time bucket first (the sessionize_skew_guarded pattern) when the key
    histogram is skewed."""
    from pyspark.sql import Window as W

    out_col = out_col or f"asof_{value_col}"
    vt = right.schema[value_col].dataType
    tt = left.schema[ts_col].dataType

    r1 = (right.groupBy(key_col, ts_col)
          .agg(F.max(value_col).alias("__v")))
    l2 = left.select(
        "*", F.lit(1).alias("__side"),
        F.lit(None).cast(vt).alias("__v"),
        F.lit(None).cast(tt).alias("__vts"))
    extra = [c for c in left.columns if c not in (key_col, ts_col)]
    r2 = r1.select(
        key_col, ts_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in extra],
        F.lit(0).alias("__side"), F.col("__v"),
        F.col(ts_col).alias("__vts"))

    w = (W.partitionBy(key_col).orderBy(ts_col, "__side")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = l2.unionByName(r2).select(
        "*",
        F.last("__v", ignorenulls=True).over(w).alias(out_col),
        F.last("__vts", ignorenulls=True).over(w).alias("__mts"))
    res = filled.filter(F.col("__side") == 1)
    if tolerance_sec is not None:
        fresh = (F.col(ts_col).cast("double")
                 - F.col("__mts").cast("double")) <= float(tolerance_sec)
        res = res.withColumn(out_col,
                             F.when(fresh, F.col(out_col)))
    return res.drop("__side", "__v", "__vts", "__mts")
