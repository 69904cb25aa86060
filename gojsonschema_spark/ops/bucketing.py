"""Bucketed tables for shuffle-free co-located joins.

At 10^12 rows the dominant cost of fact-to-fact joins (events x events,
pages x verdicts) is the shuffle. Writing both sides bucketed by the join
key with the SAME bucket count makes the join a per-bucket merge: the
scan itself produces the required hash partitioning, so the physical plan
carries NO Exchange on either side (test-gated). Bucket counts should be
sized so one bucket of the larger table fits an executor's memory; the
bucket count is a layout contract — changing it means rewriting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) table.

    Sorting within buckets lets the join skip its Sort nodes too —
    SortMergeJoin reads both sides streaming. Idempotent across sessions:
    with an in-memory catalog, a rerun in a NEW session finds the managed
    table's directory on disk but no catalog entry, and saveAsTable fails
    with LOCATION_ALREADY_EXISTS even in overwrite mode.

    Overwrite discipline (ADVICE r3): a cataloged MANAGED table is
    dropped through the catalog (Spark deletes its own location, wherever
    it actually is); a cataloged EXTERNAL/relocated table is REFUSED —
    its directory is not ours to clobber. Only when the catalog has no
    entry do we delete the DEFAULT managed location (the stale-dir case),
    computed per namespace ({warehouse}/{db}.db/{tbl} for db-qualified
    names, never the naive {warehouse}/{db.tbl})."""
    spark = df.sparkSession
    parts = table.split(".")
    if len(parts) > 2:
        raise ValueError(f"expected [db.]table, got {table!r}")
    qualified = ".".join(f"`{p}`" for p in parts)
    if mode == "overwrite":
        if spark.catalog.tableExists(table):
            ttype = spark.catalog.getTable(table).tableType
            if ttype != "MANAGED":
                raise ValueError(
                    f"refusing to overwrite {ttype} table {table}: its "
                    f"location is not owned by this writer")
            spark.sql(f"DROP TABLE {qualified}")
        else:
            warehouse = spark.conf.get("spark.sql.warehouse.dir")
            prefix = f"{parts[0]}.db/" if len(parts) == 2 else ""
            sc = spark.sparkContext
            p = sc._jvm.org.apache.hadoop.fs.Path(
                f"{warehouse}/{prefix}{parts[-1]}")
            fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
            if fs.exists(p):
                fs.delete(p, True)
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables on their bucket key: no Exchange on
    either side when bucket specs match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
