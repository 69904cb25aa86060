"""Resumable partition-parallel validation run (plans.checkpointed)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.ops.webpages import (FLAGSHIP_SCHEMA,
                                             generate_webpages,
                                             webpage_doc_column)
from gojsonschema_spark.plans.checkpointed import CheckpointedValidationRun
from gojsonschema_spark.spark.engine import SparkValidator

pytestmark = pytest.mark.spark


def test_checkpoint_resume_and_lineage(spark, tmp_path):
    pages = generate_webpages(spark, 300, partitions=4)
    df = pages.select("url", "warc_bucket", webpage_doc_column().alias("doc"))
    # collapse to 3 coarse buckets for the test
    df = df.withColumn("warc_bucket",
                       (F.dayofmonth(F.col("warc_bucket")) % 3).cast("string"))

    out = str(tmp_path / "verdicts")
    run = CheckpointedValidationRun(SparkValidator(FLAGSHIP_SCHEMA), out)

    s1 = run.run(df)
    assert s1["buckets_total"] == 3 and s1["buckets_run"] == 3
    assert s1["docs"] == 300

    # every bucket has data + _SUCCESS checkpoint + lineage metrics
    for b in os.listdir(out):
        bdir = os.path.join(out, b)
        assert os.path.exists(os.path.join(bdir, "_SUCCESS"))
        lineage = json.load(open(os.path.join(bdir, "_lineage.json")))
        assert lineage["n_docs"] == lineage["n_valid"] + lineage["n_invalid"]
        assert lineage["engine_path"] == "column_plan"
        assert lineage["wall_sec"] > 0

    # resume: nothing re-runs
    s2 = run.run(df)
    assert s2["buckets_run"] == 0 and len(s2["skipped"]) == 3

    # simulate a torn bucket (no _SUCCESS): only that bucket re-runs
    victim = os.path.join(out, sorted(os.listdir(out))[0])
    os.remove(os.path.join(victim, "_SUCCESS"))
    s3 = run.run(df)
    assert s3["buckets_run"] == 1

    # verdict output is readable and complete
    verdicts = spark.read.parquet(out)
    assert verdicts.count() == 300
    assert set(verdicts.columns) >= {"url", "valid", "violations"}
    n_valid = verdicts.filter("valid").count()
    assert 0 < n_valid < 300  # generator plants malformed urls/empty texts
