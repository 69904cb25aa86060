"""Structured Streaming validation: column plan over a file stream."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from gojsonschema_spark.spark.engine import SparkValidator
from gojsonschema_spark.spark.streaming import validate_stream, windowed_invalid_rate

pytestmark = pytest.mark.spark

SCHEMA = {"type": "object", "required": ["url"],
          "properties": {"url": {"type": "string", "pattern": "^https://"}}}


def test_streaming_validation(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [{"doc": json.dumps({"url": "https://a.com"})},
            {"doc": json.dumps({"url": "ftp://b.com"})},
            {"doc": json.dumps({"nope": 1})}]
    with open(src / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = (spark.readStream
              .schema(StructType([StructField("doc", StringType())]))
              .json(str(src)))
    assert stream.isStreaming
    v = SparkValidator(SCHEMA)
    out = validate_stream(stream, v, "doc")

    q = (out.writeStream.format("memory").queryName("verdicts")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = {r.doc: r.valid for r in spark.sql("select * from verdicts").collect()}
        assert len(got) == 3
        assert got[json.dumps({"url": "https://a.com"})] is True
        assert got[json.dumps({"url": "ftp://b.com"})] is False
        assert got[json.dumps({"nope": 1})] is False
    finally:
        q.stop()


def test_windowed_invalid_rate_builds(spark):
    # plan-construction check for the watermark + window rollup
    stream = (spark.readStream.format("rate").option("rowsPerSecond", "1").load()
              .select(F.col("timestamp").alias("ts"),
                      F.to_json(F.struct(F.lit("https://x").alias("url"))).alias("doc")))
    v = SparkValidator(SCHEMA)
    out = windowed_invalid_rate(validate_stream(stream, v, "doc"), "ts")
    q = out.writeStream.format("memory").queryName("rates").outputMode("update").start()
    try:
        time.sleep(2)
        assert q.isActive
    finally:
        q.stop()
