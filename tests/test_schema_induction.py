"""Schema induction: field profile correctness on a hand-built corpus,
the round-trip guarantee (induced schema validates its own corpus,
rejects type/range mutants via the real engine), enum/bounds knobs, and
the driver-collect guards."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.ops.schema_induction import (
    induce_schema, json_field_enums, json_field_profile)
from gojsonschema_spark.spark.engine import SparkValidator

DOCS = [
    {"id": 1, "name": "ada", "tags": ["x", "y"],
     "meta": {"score": 0.5, "ok": True}},
    {"id": 2, "name": "bo", "tags": [],
     "meta": {"score": 2.0, "ok": False}, "extra": None},
    {"id": 3, "name": "cy", "tags": ["z"],
     "meta": {"score": 1.25, "ok": True}},
]


def _df(spark, docs):
    return spark.createDataFrame(
        [(json.dumps(d),) for d in docs], ["doc"])


def test_json_field_profile(spark):
    prof = {(r.path, r.jtype): (r.n, r.min_num, r.max_num,
                                r.min_len, r.max_len)
            for r in json_field_profile(_df(spark, DOCS), "doc").collect()}
    assert prof[("$", "object")][0] == 3
    assert prof[("$.id", "integer")] == (3, 1.0, 3.0, None, None)
    assert prof[("$.name", "string")] == (3, None, None, 2, 3)
    # occurrences, not documents: 3 tag elements across 3 docs
    assert prof[("$.tags[*]", "string")][0] == 3
    assert prof[("$.tags", "array")][0] == 3
    # 2.0 profiles as integer (gojsonschema: zero-fraction float is
    # integer), 0.5/1.25 as number
    assert prof[("$.meta.score", "integer")] == (1, 2.0, 2.0, None, None)
    assert prof[("$.meta.score", "number")] == (2, 0.5, 1.25, None, None)
    assert prof[("$.extra", "null")][0] == 1
    assert ("$.extra", "string") not in prof
    # non-identifier keys render bracketed
    odd = json_field_profile(
        _df(spark, [{"a b": 1}]), "doc").collect()
    assert {r.path for r in odd} == {"$", "$['a b']"}


def test_json_field_enums_bounded(spark):
    docs = [{"lang": ["en", "de"][i % 2], "free": f"text {i}"}
            for i in range(40)]
    en = {r.path: sorted(r.vals)
          for r in json_field_enums(_df(spark, docs), "doc",
                                    max_enum=4).collect()}
    assert en['$.lang'] == ['"de"', '"en"']
    assert "$.free" not in en            # 40 distinct > max_enum


def test_induce_schema_round_trip(spark):
    df = _df(spark, DOCS)
    schema = induce_schema(df, "doc")
    assert schema["type"] == "object"
    assert sorted(schema["required"]) == ["id", "meta", "name", "tags"]
    props = schema["properties"]
    assert props["id"] == {"type": "integer", "minimum": 1, "maximum": 3,
                           "enum": [1, 2, 3]}
    assert props["name"]["minLength"] == 2
    assert props["name"]["maxLength"] == 3
    assert props["tags"]["items"]["type"] == "string"
    assert props["meta"]["required"] == ["ok", "score"]
    # zero-fraction float widens the union to number (covers integer)
    assert props["meta"]["properties"]["score"]["type"] == "number"
    assert props["extra"]["type"] == "null"
    assert "extra" not in schema["required"]

    # the contract: every contributing doc validates
    v = SparkValidator(schema, draft="draft7")
    out = v.validate_json(df, "doc")
    assert out.filter(~F.col("valid")).count() == 0
    # and mutants fail through the same engine
    mutants = [
        {**DOCS[0], "id": "one"},                 # type flip
        {**DOCS[0], "id": 99},                    # out of range + enum
        {**DOCS[1], "tags": [7]},                 # item type flip
        {k: v for k, v in DOCS[2].items() if k != "name"},  # required
    ]
    bad = v.validate_json(_df(spark, mutants), "doc")
    assert bad.filter(F.col("valid")).count() == 0


def test_induce_schema_knobs_and_guards(spark):
    df = _df(spark, DOCS)
    loose = induce_schema(df, "doc", bounds=False, enums=False)
    for p in loose["properties"].values():
        assert not ({"minimum", "maximum", "minLength", "maxLength",
                     "enum"} & set(p))
    # loose schema still validates the corpus
    assert SparkValidator(loose, draft="draft7").validate_json(df, "doc") \
        .filter(~F.col("valid")).count() == 0
    with pytest.raises(ValueError, match="max_paths"):
        induce_schema(df, "doc", max_paths=3)
    # invalid docs: skipped by default, raised on demand
    mixed = spark.createDataFrame(
        [(json.dumps(DOCS[0]),), ("{broken",), (None,)], ["doc"])
    assert induce_schema(mixed, "doc")["properties"]["id"]["enum"] == [1]
    with pytest.raises(Exception, match="invalid JSON"):
        json_field_profile(mixed, "doc", on_invalid="error").collect()
    with pytest.raises(ValueError, match="empty or all-invalid"):
        induce_schema(spark.createDataFrame([("nope",)], ["doc"]), "doc")


def test_profile_diff(spark):
    from gojsonschema_spark.ops.schema_induction import profile_diff

    old_docs = [{"id": i, "n": 10 + i, "tags": ["a"], "name": "x" * 3}
                for i in range(5)]
    new_docs = [{"id": i + 1, "n": str(10 + i), "name": "x" * (3 + i % 2),
                 "extra": True} for i in range(5)]
    old_p = json_field_profile(_df(spark, old_docs), "doc")
    new_p = json_field_profile(_df(spark, new_docs), "doc")
    d = {r.path: (r.status, r.old_types, r.new_types, r.n_old, r.n_new)
         for r in profile_diff(old_p, new_p).collect()}
    assert d["$.id"][0] == "bounds_widened"       # max 4 -> 5
    assert d["$.n"] == ("type_changed", "integer", "string", 5, 5)
    assert d["$.tags"][0] == "removed" and d["$.tags[*]"][0] == "removed"
    assert d["$.extra"] == ("added", "", "boolean", 0, 5)
    assert d["$.name"][0] == "bounds_widened"     # maxLength 3 -> 4
    assert d["$"][0] == "unchanged"
    assert d["$.tags"][4] == 0                    # n_new coalesced
