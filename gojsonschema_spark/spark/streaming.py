"""Structured Streaming validation.

The reference is single-document/synchronous (SURVEY.md §2.7: no streaming
exists there), and the north-rule resumability is deliberately batch
(per-bucket checkpoints, plans/checkpointed.py). This module makes the
same compiled plans usable over streams: the pure-SQL column plan is a
narrow stateless projection, so it applies to a streaming DataFrame
unchanged — watermarking/windowed rollups compose downstream.

Typical use::

    stream = spark.readStream.schema(s).json(dir)
    out = validate_stream(stream, SparkValidator(schema), "doc")
    (windowed_invalid_rate(out, "ts")
       .writeStream.outputMode("update").format("memory")...)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .engine import SparkValidator

__all__ = ["validate_stream", "windowed_invalid_rate"]


def validate_stream(stream_df: DataFrame, validator: SparkValidator,
                    doc_col: str, valid_col: str = "valid") -> DataFrame:
    """Append the `valid` bit to a streaming DataFrame (stateless)."""
    if validator.column_plan is None:
        # the interpreter UDF is stateless too — works on streams, slower
        return validator.validate_json(stream_df, doc_col, valid_col,
                                       violations_col=None)
    v = F.try_parse_json(F.col(doc_col))
    return stream_df.withColumn(valid_col, validator.column_plan(v))


def windowed_invalid_rate(validated: DataFrame, ts_col: str,
                          window: str = "1 minute",
                          watermark: str = "5 minutes") -> DataFrame:
    """Late-data-tolerant windowed quality rollup over a validated stream."""
    return (validated
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((~F.col("valid")).cast("long")).alias("n_invalid")))
