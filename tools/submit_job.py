"""spark-submit entry point: checkpointed validation over a web-pages corpus.

Usage (north_rule launch shape):
    spark-submit --py-files gojsonschema_spark.zip tools/submit_job.py \
        <input_parquet> <output_dir> [n_rows_if_generating]

Validates the flagship schema partition-parallel over warc buckets,
resumably, with per-bucket lineage. Prints a one-line JSON summary.
"""
import json
import sys

from pyspark.sql import SparkSession


def main():
    inp, out = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("gjs-validate").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from gojsonschema_spark.ops.webpages import (FLAGSHIP_SCHEMA,
                                                 generate_webpages,
                                                 webpage_doc_column)
    from gojsonschema_spark.plans.checkpointed import CheckpointedValidationRun
    from gojsonschema_spark.spark.engine import SparkValidator

    if inp == "--generate":
        n = int(sys.argv[3])
        pages = generate_webpages(spark, n, partitions=max(n // 50000, 4))
    else:
        pages = spark.read.parquet(inp)
    df = pages.select("url", "warc_bucket", webpage_doc_column().alias("doc"))
    run = CheckpointedValidationRun(SparkValidator(FLAGSHIP_SCHEMA), out)
    summary = run.run(df)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
