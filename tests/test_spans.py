"""Exact repeated-span detection / stripping (ops/spans.py)."""

from __future__ import annotations

import pytest

from gojsonschema_spark.ops import spans as sp

DOCS = [
    (0, "a b c d e f g h"),                 # shares "c d e" with doc 1
    (1, "x y c d e z w"),
    (2, "p q r p q r p q r"),               # within-doc period-3 repeats
    (3, ""),                                  # empty text
    (4, "s t"),                               # shorter than n
    (5, "unique tokens only here never repeated anywhere"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repeated_spans_stats(corpus):
    rows = {r.doc_id: r for r in
            sp.repeated_ngram_spans(corpus, n=3, min_count=2).collect()}
    assert rows[0].dup_starts == [2] and rows[0].dup_token_mass == 3
    assert rows[0].n_tokens == 8 and rows[0].dup_frac == 3 / 8
    assert rows[1].dup_starts == [2]
    # every gram of the periodic doc is duplicated; full coverage
    assert rows[2].dup_starts == list(range(7))
    assert rows[2].dup_token_mass == 9 and rows[2].dup_frac == 1.0
    # empty / too-short / unique docs: zeros, not missing rows
    for d in (3, 4, 5):
        assert rows[d].dup_starts == [] and rows[d].dup_token_mass == 0
        assert rows[d].dup_frac == 0.0
    assert rows[4].n_tokens == 2  # shorter than n still counted


def test_repeated_spans_min_count_gate(corpus):
    # "p q r" occurs 3x; the rotations occur 2x — min_count=3 keeps
    # only the 3x gram's start positions
    rows = {r.doc_id: r for r in
            sp.repeated_ngram_spans(corpus, n=3, min_count=3).collect()}
    assert rows[2].dup_starts == [0, 3, 6]
    assert rows[2].dup_token_mass == 9  # [0,3) [3,6) [6,9) tile the doc
    assert rows[0].dup_starts == []  # the 2x cross-doc gram is gated out


def test_strip_repeated_spans(corpus):
    got = {r.doc_id: r.clean_text for r in
           sp.strip_repeated_spans(corpus, n=3, min_count=2).collect()}
    assert got[0] == "a b f g h"
    assert got[1] == "x y z w"
    assert got[2] == ""          # fully covered -> everything stripped
    assert got[3] == ""
    assert got[4] == "s t"       # untouched: no grams
    assert got[5] == "unique tokens only here never repeated anywhere"


def test_overlapping_spans_union_coverage(spark):
    # two duplicated grams overlapping by 2 tokens: mass is the union,
    # not the sum (4 tokens, not 6)
    df = spark.createDataFrame(
        [(0, "a b c d x x"), (1, "a b c q q q"), (2, "z b c d y y")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            sp.repeated_ngram_spans(df, n=3, min_count=2).collect()}
    assert rows[0].dup_starts == [0, 1]
    assert rows[0].dup_token_mass == 4


def test_skew_safe_path_equivalent(corpus):
    fast = sp.repeated_ngram_spans(corpus, n=3, min_count=2) \
        .orderBy("doc_id").collect()
    safe = sp.repeated_ngram_spans(corpus, n=3, min_count=2,
                                   skew_safe=True).orderBy("doc_id").collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in safe]


def test_spans_no_python_in_plan(corpus):
    plan = (sp.repeated_ngram_spans(corpus, n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
