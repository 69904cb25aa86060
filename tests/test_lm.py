"""n-gram LM training + stupid-backoff scoring (ops/lm.py).

Equivalence against a pure-Python reference implementation, edge
cases (empty docs, OOV, pruning), and plan gates (no Python eval in
the hot path; scoring aggregates map-side)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.ops.lm import lm_score, lm_train, ngram_counts

TRAIN = [(1, "the cat sat on the mat"),
         (2, "the dog sat on the log"),
         (3, "a cat and a dog"),
         (4, "The CAT the cat")]
SCORE = [(10, "the cat sat"),
         (11, "zebra the cat"),          # OOV first token
         (12, ""),                        # empty doc
         (13, "   "),                     # whitespace-only doc
         (14, "the zebra"),               # OOV backoff after seen context
         (15, "cat")]                     # single token


def _py_model(rows):
    uni: dict[str, int] = {}
    bg: dict[tuple[str, str], int] = {}
    for _, t in rows:
        ts = t.lower().split()
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    return uni, bg, sum(uni.values())


def _py_score(text, uni, bg, n, alpha=0.4):
    ts = text.lower().split()
    if not ts:
        return (0, 0.0)
    def p_uni(w):
        return uni[w] / n if w in uni else 1 / n
    lp = math.log(p_uni(ts[0]))
    for a, b in zip(ts, ts[1:]):
        if (a, b) in bg:
            lp += math.log(bg[(a, b)] / uni[a])
        else:
            lp += math.log(alpha * p_uni(b))
    return (len(ts), round(lp / len(ts), 6))


@pytest.fixture(scope="module")
def model(spark):
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return lm_train(tr)


def test_score_matches_python_reference(spark, model):
    sc = spark.createDataFrame(SCORE, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.log_prob_per_token)
           for r in lm_score(sc, model).collect()}
    uni, bg, n = _py_model(TRAIN)
    for did, text in SCORE:
        assert got[did] == _py_score(text, uni, bg, n), f"doc {did}"


def test_total_tokens_and_probability_mass(spark, model):
    uni, _, n = _py_model(TRAIN)
    assert model.total_tokens == n
    rows = model.unigrams.collect()
    assert len(rows) == len(uni)
    assert abs(sum(r.p_uni for r in rows) - 1.0) < 1e-12
    # conditionals per context sum to 1
    ctx = (model.bigrams.groupBy("prev").agg(F.sum("p_bg").alias("s"))
           .collect())
    for r in ctx:
        # contexts that end a document have mass < 1 (no continuation
        # counted); all others sum to c(prev, *)/c(prev) <= 1
        assert r.s <= 1.0 + 1e-12


def test_min_count_prunes_model_not_probabilities(spark):
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string")
    full = lm_train(tr)
    pruned = lm_train(tr, min_count=2)
    assert pruned.unigrams.count() < full.unigrams.count()
    # surviving probabilities are identical to the unpruned model's
    f = {r.word: r.p_uni for r in full.unigrams.collect()}
    for r in pruned.unigrams.collect():
        assert r.p_uni == f[r.word]
    fb = {(r.prev, r.word): r.p_bg for r in full.bigrams.collect()}
    for r in pruned.bigrams.collect():
        assert r.p_bg == fb[(r.prev, r.word)]


def test_ngram_counts_orders(spark):
    tr = spark.createDataFrame(TRAIN, "doc_id long, text string")
    uni = {r.gram: r.n for r in ngram_counts(tr, 1).collect()}
    assert uni["the"] == 6 and uni["cat"] == 4
    bi = {r.gram: r.n for r in ngram_counts(tr, 2).collect()}
    assert bi["the cat"] == 3 and bi["on the"] == 2
    tri = {r.gram: r.n for r in ngram_counts(tr, 3).collect()}
    assert tri["sat on the"] == 2
    assert ngram_counts(tr, 1, min_count=4).count() == 2  # the, cat
    with pytest.raises(ValueError):
        ngram_counts(tr, 0)


def test_scoring_plan_is_native(spark, model):
    sc = spark.createDataFrame(SCORE, "doc_id long, text string")
    plan = lm_score(sc, model)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    # final per-doc aggregate has a map-side partial
    assert "partial_sum" in plan.lower() or "HashAggregate" in plan


def test_lm_train_and_ngrams_survive_empty_docs(spark):
    """Web corpora contain empty/whitespace-only documents: training
    and n-gram counting must clamp the bigram slice, not crash
    (slice() rejects negative lengths)."""
    from gojsonschema_spark.ops.lm import lm_score, lm_train, ngram_counts

    df = spark.createDataFrame(
        [(0, "the cat sat"), (1, ""), (2, "   "), (3, "one")],
        "doc_id long, text string")
    model = lm_train(df)
    assert model.total_tokens == 4
    got = {r.doc_id: r.n_tokens for r in lm_score(df, model).collect()}
    assert got == {0: 3, 1: 0, 2: 0, 3: 1}
    grams = {(r.gram): r.n for r in ngram_counts(df, 2).collect()}
    assert grams == {"the cat": 1, "cat sat": 1}


def test_lm_save_load_roundtrip(spark, tmp_path):
    from gojsonschema_spark.ops.lm import lm_load, lm_save, lm_score, lm_train

    df = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the dog ran far")],
        "doc_id long, text string")
    model = lm_train(df, alpha=0.3)
    lm_save(model, str(tmp_path / "lm"))
    back = lm_load(spark, str(tmp_path / "lm"))
    assert (back.total_tokens, back.alpha, back.lowercase) == \
        (model.total_tokens, 0.3, True)
    a = {r.doc_id: r.log_prob_per_token for r in lm_score(df, model).collect()}
    b = {r.doc_id: r.log_prob_per_token for r in lm_score(df, back).collect()}
    assert a == b
