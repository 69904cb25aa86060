"""Distributed exact weighted cumulative-share bucketing.

CCNet (Wenzek et al. 2019) splits each language's corpus into
head/middle/tail thirds by cumulative token mass in perplexity order.
The naive Spark expression — ``SUM(w) OVER (PARTITION BY lang ORDER BY
score)`` — funnels every language into ONE reducer partition: English
is ~half of a web corpus, so the window partition IS the skew, and the
job keels over exactly where it matters. This module computes the same
exact per-row cumulative share with a range-partitioned two-pass
prefix sum instead:

1. ``repartitionByRange(group, order, id)`` + ``sortWithinPartitions``
   lays the rows out in global (group, order, id) order across N
   partitions — one group spans MANY partitions, so no partition is
   bigger than rows/N regardless of group skew. The partition id is
   stamped as a column and the layout persisted (both passes must see
   the identical layout).
2. Pass 1 aggregates one ``(pid, group, weight-sum)`` row per group
   PER PARTITION. Because range partitions are contiguous in the sort
   order, a partition contains only consecutive groups: the collect is
   bounded by ``n_partitions + |groups|`` rows, not their product.
   The driver turns these into per-(pid, group) starting offsets — the
   classic distributed prefix-sum trick.
3. Pass 2 is a zero-shuffle ``mapInPandas`` over the SAME persisted
   layout: a batch-local integer cumsum per group plus the stamped
   partition's offset gives each row its exact global cumulative
   weight; share = cum/total and the bucket label follow map-side.

Weights must be integers (token counts, byte sizes, 1-per-doc): the
prefix sum is then exact and associative, so the result is independent
of partitioning AND bit-identical to any other engine's sequential
window sum — float weights would make cross-partition addition order
observable. Share values are IEEE double divisions of identical
integers, which DuckDB reproduces bit-for-bit (the oracle relies on
this).

The reference engine (gojsonschema) has no ranking surface; this is
one of the dataset-level operators the graft adds beyond validation.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType)

__all__ = ["cumulative_share_buckets", "exact_weighted_percentiles"]

_NULL_GROUP = "\x00<null>"


def cumulative_share_buckets(
        df: DataFrame, order_col: str, *, id_col: str,
        group_col: str | None = None, weight_col: str | None = None,
        cuts: Sequence[float] = (1 / 3, 2 / 3),
        labels: Sequence[str] = ("head", "middle", "tail"),
        descending: bool = True, num_partitions: int | None = None,
        max_groups: int = 100_000) -> DataFrame:
    """Exact cumulative-share bucket per row, skew-immune.

    Rows are ordered by ``(order_col, id_col)`` (``descending`` applies
    to ``order_col`` only; ``id_col`` must be unique — it makes the
    order total, hence the result deterministic). Within each group
    (the whole frame if ``group_col`` is None), every row gets:

    * ``weight``       — its integer weight (1 if ``weight_col`` is None)
    * ``cum_weight``   — exact inclusive running sum of weights in order
    * ``total_weight`` — the group's total weight
    * ``share``        — ``cum_weight / total_weight`` (0.0 for an
      all-zero-weight group)
    * ``bucket``     — ``labels[i]`` for the first ``cuts[i] >= share``,
      else the last label (i.e. boundary rows with share == cut fall in
      the earlier bucket, matching SQL ``CASE WHEN share <= cut``)

    ``len(labels) == len(cuts) + 1``; cuts must be strictly increasing.
    Negative weights raise (in the executors — no validation scan).
    ``max_groups`` bounds the driver-held offset/total tables; grouping
    by a high-cardinality column is a misuse of this op (use a plain
    window — per-group data is tiny by construction there).
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError("need len(labels) == len(cuts) + 1")
    cuts = [float(c) for c in cuts]
    if any(b <= a for a, b in zip(cuts, cuts[1:])):
        raise ValueError("cuts must be strictly increasing")
    labels = [str(x) for x in labels]

    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))

    cols = [F.col(id_col), F.col(order_col)]
    if group_col:
        cols.append(F.col(group_col))
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    grp = (F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_GROUP))
           if group_col else F.lit(""))
    base = df.select(*cols, w.alias("__w"), grp.alias("__grp"))

    order = (F.col(order_col).desc() if descending
             else F.col(order_col).asc())
    # the layout is materialized ONCE (localCheckpoint, the repo's rule
    # for multi-pass reads): both passes must see the identical
    # partition/sort layout, and the stamped __pid must not be exposed
    # to a recompute race
    ranged = (base
              .repartitionByRange(n_parts, F.col("__grp"), order,
                                  F.col(id_col))
              .sortWithinPartitions(F.col("__grp"), order, F.col(id_col))
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    # pass 1: per-(partition, group) weight sums. Contiguous range
    # partitions => bounded by n_parts + |groups| rows.
    stats = (ranged.groupBy("__pid", "__grp")
             .agg(F.sum("__w").alias("s"),
                  F.min("__w").alias("w_min"),
                  F.max(F.col("__w").isNull().cast("int"))
                  .alias("has_null"))
             .collect())
    if any(r["has_null"] for r in stats):
        raise ValueError("weights must be non-null (coalesce the "
                         "weight column first)")
    if min((r["w_min"] for r in stats), default=0) < 0:
        raise ValueError("weights must be non-negative")
    offsets: dict[tuple[int, str], int] = {}
    totals: dict[str, int] = {}
    for r in sorted(stats, key=lambda r: r["__pid"]):
        pid, g = r["__pid"], r["__grp"]
        offsets[(pid, g)] = totals.get(g, 0)
        totals[g] = totals.get(g, 0) + int(r["s"])
    if len(totals) > max_groups:
        raise ValueError(
            f"{len(totals)} groups exceeds max_groups={max_groups}; "
            "cumulative_share_buckets is for low-cardinality groups "
            "(languages, sources) — use a plain window otherwise")

    out_fields = [ranged.schema[id_col]]
    if group_col:
        out_fields.append(ranged.schema[group_col])
    out_fields += [
        ranged.schema[order_col],
        StructField("weight", LongType()),
        StructField("cum_weight", LongType()),
        StructField("total_weight", LongType()),
        StructField("share", DoubleType()),
        StructField("bucket", StringType()),
    ]
    schema = StructType(out_fields)
    keep = [f.name for f in out_fields[:len(out_fields) - 5]]
    cuts_l, labels_l = list(cuts), list(labels)

    def add_share(batches: Iterator) -> Iterator:
        import numpy as np
        running: dict[str, int] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["__pid"].iloc[0])
            wv = pdf["__w"].to_numpy(dtype="int64")
            cum_within = (pdf.groupby("__grp", sort=False)["__w"]
                          .cumsum().to_numpy(dtype="int64"))
            bases = {}
            gsum = pdf.groupby("__grp", sort=False)["__w"].sum()
            for g, s in gsum.items():
                bases[g] = running.get(g, offsets.get((pid, g), 0))
                running[g] = bases[g] + int(s)
            base_v = pdf["__grp"].map(bases).to_numpy(dtype="int64")
            cum = cum_within + base_v
            tot = pdf["__grp"].map(totals).to_numpy(dtype="int64")
            share = np.where(tot > 0, cum / np.maximum(tot, 1), 0.0)
            idx = np.searchsorted(np.asarray(cuts_l), share,
                                  side="left")
            out = pdf[keep].copy()
            out["weight"] = wv
            out["cum_weight"] = cum
            out["total_weight"] = tot
            out["share"] = share
            out["bucket"] = np.asarray(labels_l, dtype=object)[idx]
            yield out

    return ranged.mapInPandas(add_share, schema)


def exact_weighted_percentiles(
        df: DataFrame, value_col: str, qs: Sequence[float], *,
        id_col: str, group_col: str | None = None,
        weight_col: str | None = None,
        num_partitions: int | None = None,
        max_groups: int = 100_000) -> DataFrame:
    """EXACT (Type-1 / lower) weighted percentiles per group — the
    exact twin of the column profiler's ``approx_percentile``.

    For each ``q`` in ``qs`` (each in (0, 1]), returns the smallest
    value whose inclusive cumulative weight share reaches ``q``: the
    unique row where ``cum_weight/total >= q`` and
    ``(cum_weight - weight)/total < q``. With unit weights and
    q = 0.5 this is the classic lower median; with token weights it
    answers "the length below which half the corpus' TOKENS live".

    Built on the skew-immune prefix sum of
    :func:`cumulative_share_buckets` (a plain ``PARTITION BY group``
    window would single-reduce the biggest group), so it is exact at
    any scale and engine-mirrorable: the crossing test compares IEEE
    divisions of identical integers, which any SQL engine reproduces
    bit-for-bit. The q-fanout is a map-side explode of a literal
    array — no extra shuffle. Output: ``(group_col?, q, value,
    cum_weight, total_weight)``, one row per (group, q); all-zero-
    weight groups have no crossing row and are absent.

    Zero-weight rows never cross (their share interval is empty), so
    a value carried only by zero-weight rows can never be returned.
    """
    qs = [float(q) for q in qs]
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError("each q must be in (0, 1]")
    if len(set(qs)) != len(qs):
        raise ValueError("duplicate q values")

    b = cumulative_share_buckets(
        df, value_col, id_col=id_col, group_col=group_col,
        weight_col=weight_col, descending=False,
        num_partitions=num_partitions, max_groups=max_groups)
    q = F.explode(F.array(*[F.lit(x) for x in sorted(qs)])).alias("q")
    cols = ([F.col(group_col)] if group_col else []) + [
        q, F.col(value_col).alias("value"),
        F.col("cum_weight"), F.col("total_weight"), F.col("weight")]
    tot = F.col("total_weight").cast("double")
    return (b.select(*cols)
            .filter((F.col("cum_weight").cast("double") / tot
                     >= F.col("q"))
                    & ((F.col("cum_weight") - F.col("weight"))
                       .cast("double") / tot < F.col("q")))
            .drop("weight"))
