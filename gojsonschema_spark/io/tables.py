"""Table-source adapter: one entry point for parquet paths and catalog
tables (Iceberg / Delta / Hive), so pipelines write against a stable API
and pick the storage by configuration.

The production deployment (BASELINE.json north_star) reads an Iceberg
table of ~10^12 web pages partitioned by ``warc_bucket``; this container
ships no Iceberg runtime jars, so catalog reads are exercised only where
a catalog is configured — the adapter degrades to parquet paths with the
same downstream plan shape. Partition pruning works identically in both:
filters on the bucket column reach the scan (FileSourceScanExec
PartitionFilters for parquet, Iceberg's SparkScanBuilder for catalogs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_pages", "write_pages"]


def read_pages(spark: SparkSession, source: str,
               bucket_col: str = "warc_bucket",
               buckets: list | None = None,
               fmt: str | None = None,
               schema=None) -> DataFrame:
    """Load a web-pages table from a catalog table name or a file path.

    ``source`` forms:
      * ``"catalog.db.pages"`` / ``"db.pages"`` — spark.read.table
        (Iceberg/Delta/Hive, partition pruning via the catalog scan)
      * anything with a '/' or URI scheme — a file path; format from
        the extension (``.parquet`` / ``.json`` / ``.jsonl`` / ``.csv``)
        or forced via ``fmt``.

    JSONL/CSV sources REQUIRE an explicit ``schema`` (DDL string or
    StructType): schema inference reads the whole corpus once before the
    real scan — never acceptable at 100 TB — and silently widens types
    run-to-run. CSV reads with header=true.

    ``buckets`` optionally restricts to a list of partition values — the
    filter is applied BEFORE any other transformation so it prunes
    partitions at the scan.
    """
    looks_like_path = ("/" in source
                       or source.endswith((".parquet", ".json", ".jsonl",
                                           ".csv")))
    if looks_like_path:
        f = fmt or ("json" if source.endswith((".json", ".jsonl"))
                    else "csv" if source.endswith(".csv")
                    else "parquet")
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        elif f in ("json", "csv"):
            raise ValueError(
                f"{f} source {source!r} requires an explicit schema= "
                f"(inference scans the whole corpus before the real read)")
        df = (reader.json(source) if f == "json"
              else reader.option("header", "true").csv(source) if f == "csv"
              else reader.parquet(source))
    else:
        df = spark.read.table(source)
    if buckets:
        from pyspark.sql import functions as F
        df = df.filter(F.col(bucket_col).isin(list(buckets)))
    return df


def write_pages(df: DataFrame, target: str,
                bucket_col: str = "warc_bucket",
                mode: str = "overwrite") -> None:
    """Write results partitioned by the bucket column. Catalog targets use
    DataFrameWriterV2 (Iceberg-style ``createOrReplace``); paths write
    partitioned parquet with dynamic partition overwrite semantics."""
    looks_like_path = "/" in target or target.endswith(".parquet")
    if looks_like_path:
        # per-write option: overwrite replaces only the partitions present
        # in df (dynamic), not every partition previously written — without
        # it Spark's default STATIC overwrite would delete the whole target
        (df.write.mode(mode)
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy(bucket_col).parquet(target))
    else:
        w = df.writeTo(target).partitionedBy(df[bucket_col])
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
