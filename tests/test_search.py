"""BM25 full-text search (ops/search.py): scoring parity vs a pure-Python
reference, persisted-index probe equivalence, and the partition-pruning /
no-Python plan gates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.ops import search as se

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark hash join window"),
    (2, "hash hash hash table join"),
    (3, ""),
    (4, "Window WINDOW window functions in Spark SQL"),
    (5, "completely unrelated text about cats"),
    (6, "join the club"),
    (7, "7 numbers 42 and MixedCASE tokens split-on-punct"),
]


def ref_bm25(docs, query, k1=1.2, b=0.75):
    """Independent textbook BM25 (Lucene idf form), driver-side."""
    toks = {d: se.tokenize_py(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(se.tokenize_py(query)))
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / \
                (tf + k1 * ((1.0 - b) + b * (len(v) / avgdl)))
        if s > 0:
            out[d] = round(s, 6)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_python_reference(corpus):
    q = "hash join spark window"
    got = [(r.doc_id, r.bm25) for r in se.bm25_topk(corpus, q, k=10).collect()]
    assert got == ref_bm25(DOCS, q)


def test_bm25_tokenizer_ascii_fold_and_digits(corpus):
    # digits and case-folding: 'mixedcase' and '42' are real terms
    got = [(r.doc_id, r.bm25)
           for r in se.bm25_topk(corpus, "MIXEDcase 42", k=5).collect()]
    assert got == ref_bm25(DOCS, "MIXEDcase 42")
    assert got[0][0] == 7


def test_bm25_duplicate_query_terms_collapse(corpus):
    once = se.bm25_topk(corpus, "hash", k=10).collect()
    thrice = se.bm25_topk(corpus, "hash hash HASH", k=10).collect()
    assert [(r.doc_id, r.bm25) for r in once] == \
        [(r.doc_id, r.bm25) for r in thrice]


def test_bm25_empty_and_missing_terms(corpus):
    assert se.bm25_topk(corpus, "!!! ---").collect() == []
    # schema (incl. key type) survives the empty-query short-circuit
    empty = se.bm25_topk(corpus, "")
    assert [f.dataType.simpleString() for f in empty.schema.fields] == \
        ["bigint", "double"]
    assert se.bm25_topk(corpus, "zzznotaword").collect() == []


def test_bm25_topk_limit_and_tiebreak(corpus):
    # k smaller than the match count: highest scores kept, key tiebreak
    top2 = se.bm25_topk(corpus, "hash join spark window", k=2).collect()
    full = se.bm25_topk(corpus, "hash join spark window", k=10).collect()
    assert [(r.doc_id, r.bm25) for r in top2] == \
        [(r.doc_id, r.bm25) for r in full][:2]


def test_bm25_persisted_probe_equals_inmemory(spark, corpus, tmp_path):
    idx = str(tmp_path / "bm25_idx")
    stats = se.bm25_build_index(corpus, idx, n_buckets=8)
    assert stats["n_docs"] == len(DOCS)
    q = "hash join spark window"
    want = [(r.doc_id, r.bm25) for r in se.bm25_topk(corpus, q, k=10).collect()]
    got = [(r.doc_id, r.bm25)
           for r in se.bm25_probe_topk(spark, idx, q, k=10,
                                       n_buckets=8).collect()]
    assert got == want
    # stats may also be passed explicitly (skips the stats-table read)
    got2 = [(r.doc_id, r.bm25)
            for r in se.bm25_probe_topk(spark, idx, q, k=10, n_buckets=8,
                                        stats=stats).collect()]
    assert got2 == want


def test_bm25_probe_partition_pruned(spark, corpus, tmp_path):
    """The probe must read ONLY the buckets containing the query's terms:
    term_bucket appears in the scan's PartitionFilters and the executed
    scan reads fewer partitions than the index holds."""
    idx = str(tmp_path / "bm25_idx_prune")
    se.bm25_build_index(corpus, idx, n_buckets=16)
    probe = se.bm25_probe_topk(spark, idx, "hash", k=5, n_buckets=16)
    rows = probe.collect()
    assert rows  # non-trivial result
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "term_bucket" in plan.split("PartitionFilters")[1].split("]")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    total_buckets = (spark.read.parquet(idx)
                     .select("term_bucket").distinct().count())
    want_buckets = {se._term_bucket_py("hash", 16)}
    assert len(want_buckets) < total_buckets
    # driver-side bucket twin agrees with the Spark-side partition values
    spark_bucket = (spark.createDataFrame([("hash",)], "term string")
                    .select(se._term_bucket(F.col("term"), 16).alias("b"))
                    .first()["b"])
    assert spark_bucket == se._term_bucket_py("hash", 16)


def test_bm25_no_python_in_plan(corpus):
    plan = (se.bm25_topk(corpus, "hash join spark window", k=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
