"""Seeded fuzz differential: random schemas x random documents, column
plan vs exact interpreter.

The json-schema-test-suite anchors the interpreter to the reference; this
gate anchors the SQL column plan (and its hybrid frontiers) to the
interpreter on a much wider, randomized corpus — nested combinators,
typed arrays, patternProperties, dependencies, formats — generated from a
fixed seed so failures reproduce. Documents avoid only the DOCUMENTED
divergence class (numbers needing > 12 significant digits / scale beyond
decimal(38,18) fall back to double on the SQL path by design).
"""

from __future__ import annotations

import json
import random

import pytest
from pyspark.sql import functions as F

from gojsonschema_spark.core.compiler import SchemaCompiler
from gojsonschema_spark.core.interpreter import validate_document
from gojsonschema_spark.core.jsonvalue import parse_json
from gojsonschema_spark.spark.engine import SparkValidator

pytestmark = pytest.mark.spark

# env-overridable for large out-of-CI hunts (fresh seeds, bigger corpora):
#   GJS_FUZZ_SCHEMAS=500 GJS_FUZZ_SEED=20260818 pytest -k fuzz_column_plan
import os

N_SCHEMAS = int(os.environ.get("GJS_FUZZ_SCHEMAS", "120"))
DOCS_PER_SCHEMA = int(os.environ.get("GJS_FUZZ_DOCS", "8"))
SEED = int(os.environ.get("GJS_FUZZ_SEED", "20260816"))


def _gen_value(rng: random.Random, depth: int):
    kinds = ["int", "float", "str", "bool", "null"]
    if depth > 0:
        kinds += ["obj", "arr", "obj", "arr"]
    k = rng.choice(kinds)
    if k == "int":
        if rng.random() < 0.03:
            # beyond double range: parses into the variant as +-Infinity
            # (exercises the overflow probes/frontiers in columns.py)
            return rng.choice([1, -1]) * 10 ** rng.randint(309, 400)
        return rng.randint(-50, 300)
    if k == "float":
        return round(rng.uniform(-20, 20), rng.randint(0, 6))
    if k == "str":
        return rng.choice(["", "a", "ab", "en", "x" * rng.randint(1, 12),
                           "2020-06-15", "not-a-date", "joe@example.com",
                           "hello world", "über"])
    if k == "bool":
        return rng.random() < 0.5
    if k == "null":
        return None
    if k == "arr":
        return [_gen_value(rng, depth - 1) for _ in range(rng.randint(0, 4))]
    return {rng.choice("abcdef") + str(i): _gen_value(rng, depth - 1)
            for i in range(rng.randint(0, 3))}


def _gen_schema(rng: random.Random, depth: int) -> dict | bool:
    if depth <= 0:
        return rng.choice([True, False, {"type": rng.choice(
            ["string", "integer", "number", "boolean", "null", "array", "object"])}])
    roll = rng.random()
    if roll < 0.08:
        return rng.random() < 0.5
    schema: dict = {}
    picks = rng.sample([
        "type", "const", "enum", "minimum", "maximum", "multipleOf",
        "minLength", "maxLength", "pattern", "format", "items",
        "uniqueItems", "minItems", "maxItems", "contains", "properties",
        "required", "patternProperties", "additionalProperties",
        "propertyNames", "minProperties", "maxProperties", "dependencies",
        "anyOf", "allOf", "oneOf", "not", "if",
    ], k=rng.randint(1, 4))
    for kw in picks:
        if kw == "type":
            n = rng.randint(1, 2)
            ts = rng.sample(["string", "integer", "number", "boolean",
                             "null", "array", "object"], k=n)
            schema["type"] = ts[0] if n == 1 else ts
        elif kw == "const":
            schema["const"] = _gen_value(rng, 1)
        elif kw == "enum":
            schema["enum"] = [_gen_value(rng, 1) for _ in range(rng.randint(1, 3))]
        elif kw == "minimum":
            schema["minimum"] = rng.randint(-10, 100)
        elif kw == "maximum":
            schema["maximum"] = rng.randint(-10, 200)
        elif kw == "multipleOf":
            schema["multipleOf"] = rng.choice([1, 2, 3, 0.5, 0.25, 10])
        elif kw == "minLength":
            schema["minLength"] = rng.randint(0, 5)
        elif kw == "maxLength":
            schema["maxLength"] = rng.randint(2, 12)
        elif kw == "pattern":
            schema["pattern"] = rng.choice(["^a", "b$", "^[a-z]+$", "\\d",
                                            "^x*y?$", "lo wo"])
        elif kw == "format":
            schema["format"] = rng.choice(["date", "email", "hostname",
                                           "ipv4", "uri", "uuid", "unknown-f"])
        elif kw == "items":
            if rng.random() < 0.7:
                schema["items"] = _gen_schema(rng, depth - 1)
            else:
                schema["items"] = [_gen_schema(rng, depth - 1)
                                   for _ in range(rng.randint(1, 2))]
                if rng.random() < 0.5:
                    schema["additionalItems"] = rng.choice(
                        [False, _gen_schema(rng, depth - 1)])
        elif kw == "uniqueItems":
            schema["uniqueItems"] = True
        elif kw == "minItems":
            schema["minItems"] = rng.randint(0, 3)
        elif kw == "maxItems":
            schema["maxItems"] = rng.randint(1, 5)
        elif kw == "contains":
            schema["$schema"] = "http://json-schema.org/draft-06/schema#"
            schema["contains"] = _gen_schema(rng, depth - 1)
        elif kw == "properties":
            schema["properties"] = {
                rng.choice("abcde"): _gen_schema(rng, depth - 1)
                for _ in range(rng.randint(1, 3))}
        elif kw == "required":
            schema["required"] = rng.sample("abcde", k=rng.randint(1, 2))
        elif kw == "patternProperties":
            schema["patternProperties"] = {
                rng.choice(["^a", "^[bc]", "d$"]): _gen_schema(rng, depth - 1)}
        elif kw == "additionalProperties":
            schema["additionalProperties"] = rng.choice(
                [True, False, _gen_schema(rng, depth - 1)])
        elif kw == "propertyNames":
            schema["$schema"] = "http://json-schema.org/draft-06/schema#"
            schema["propertyNames"] = rng.choice(
                [{"maxLength": rng.randint(1, 4)},
                 {"pattern": "^[a-c]"},
                 {"enum": ["a1", "b1", "a0", "b0", "c0"]}])
        elif kw == "minProperties":
            schema["minProperties"] = rng.randint(0, 3)
        elif kw == "maxProperties":
            schema["maxProperties"] = rng.randint(1, 4)
        elif kw == "dependencies":
            schema["dependencies"] = {
                rng.choice("abc"): (rng.sample("abcde", k=2)
                                    if rng.random() < 0.5
                                    else _gen_schema(rng, depth - 1))}
        elif kw in ("anyOf", "allOf", "oneOf"):
            schema[kw] = [_gen_schema(rng, depth - 1)
                          for _ in range(rng.randint(1, 3))]
        elif kw == "not":
            schema["not"] = _gen_schema(rng, depth - 1)
        elif kw == "if":
            schema["$schema"] = "http://json-schema.org/draft-07/schema#"
            schema["if"] = _gen_schema(rng, depth - 1)
            if rng.random() < 0.8:
                schema["then"] = _gen_schema(rng, depth - 1)
            if rng.random() < 0.8:
                schema["else"] = _gen_schema(rng, depth - 1)
    return schema


def test_fuzz_column_plan_vs_interpreter(spark):
    rng = random.Random(SEED)
    corpus = []  # (validator, [(doc_json, expected, label)])
    n_schemas = n_column = 0
    while n_schemas < N_SCHEMAS:
        schema = _gen_schema(rng, 3)
        n_schemas += 1
        try:
            v = SparkValidator(schema)
        except Exception:
            continue  # compile-rejected schema (e.g. bad regex): fine
        if not v.uses_column_plan:
            continue
        n_column += 1
        compiled = SchemaCompiler(auto_detect=True).compile(schema)
        rows = []
        for d in range(DOCS_PER_SCHEMA):
            doc = _gen_value(rng, 3)
            doc_json = json.dumps(doc)
            expected = validate_document(
                compiled, parse_json(doc_json)).valid()
            rows.append((doc_json, expected,
                         f"seed{SEED}/schema{n_schemas}/doc{d}: "
                         f"{json.dumps(schema)[:120]} || {doc_json[:80]}"))
        corpus.append((v, rows))
    assert n_column >= 0.85 * n_schemas, f"{n_column}/{n_schemas} on SQL plan"

    mismatches = []
    chunk_size = 20
    for start in range(0, len(corpus), chunk_size):
        chunk = corpus[start:start + chunk_size]
        data = []
        for sid, (v, rows) in enumerate(chunk):
            for doc_json, expected, label in rows:
                data.append((sid, doc_json, expected, label))
        df = spark.createDataFrame(data, ["sid", "doc", "expected", "label"])
        var = F.try_parse_json(F.col("doc"))
        pred = deep = None
        for sid, (v, _) in enumerate(chunk):
            branch = v.column_plan(var)
            fr = (v.frontier_plan(var) if v.frontier_plan is not None
                  else F.lit(False))
            pred = (F.when(F.col("sid") == sid, branch) if pred is None
                    else pred.when(F.col("sid") == sid, branch))
            deep = (F.when(F.col("sid") == sid, fr) if deep is None
                    else deep.when(F.col("sid") == sid, fr))
        out = df.withColumn("got", pred).withColumn("deep", deep).collect()
        for r in out:
            # deep rows are interpreter-verdicted by the engine: skip the
            # raw-SQL comparison exactly like the engine skips it
            if not r.deep and r.got != r.expected:
                mismatches.append(f"{r.label}: expected {r.expected}, got {r.got}")
    assert not mismatches, (f"{len(mismatches)} divergences:\n"
                            + "\n".join(mismatches[:20]))


# -- $ref graph fuzz ----------------------------------------------------------
#
# The base fuzzer never emits $ref; this arm generates definition graphs
# (acyclic and cyclic, self- and mutual-recursion) and asserts the
# SOUNDNESS of the hybrid unroll: whenever the depth-unrolled SQL plan's
# verdict would diverge from the exact interpreter, the frontier
# detector MUST have flagged that row as deep (the engine then
# re-verdicts it in Python, so a flagged row is exact by construction).

REF_SEED = int(os.environ.get("GJS_FUZZ_REF_SEED", "20260817"))
N_REF_SCHEMAS = int(os.environ.get("GJS_FUZZ_REF_SCHEMAS", "60"))
DOCS_PER_REF_SCHEMA = 10


def _gen_ref_schema(rng: random.Random, n_defs: int = 3) -> dict:
    names = [f"D{i}" for i in range(n_defs)]

    def ref_to() -> dict:
        return {"$ref": f"#/definitions/{rng.choice(names)}"}

    defs = {}
    for nm in names:
        base = _gen_schema(rng, 1)
        if not isinstance(base, dict):
            base = {}
        base.pop("$schema", None)
        slot = rng.choice(["prop", "items", "allOf", "anyOf", "none"])
        if slot == "prop":
            base.setdefault("properties", {})[rng.choice("abcde")] = ref_to()
        elif slot == "items":
            base["items"] = ref_to()
        elif slot == "allOf":
            base.setdefault("allOf", []).append(ref_to())
        elif slot == "anyOf":
            base.setdefault("anyOf", []).append(ref_to())
        defs[nm] = base
    root: dict = {"definitions": defs}
    root["properties"] = {c: ref_to() for c in rng.sample("abcde", k=2)}
    if rng.random() < 0.4:
        root["items"] = ref_to()
    if rng.random() < 0.3:
        return {"definitions": defs, "allOf": [ref_to(), root | {"definitions": {}}]}
    return root


def _gen_ref_doc(rng: random.Random, depth: int):
    """Documents over keys a-e (the keys the ref graph targets), nesting
    past the depth-3 unroll so the frontier actually fires."""
    if depth <= 0 or rng.random() < 0.25:
        return rng.choice([1, 7, -3, 0.5, "a", "xy", "2020-06-15", True, None])
    if rng.random() < 0.5:
        return [_gen_ref_doc(rng, depth - 1) for _ in range(rng.randint(0, 3))]
    return {k: _gen_ref_doc(rng, depth - 1)
            for k in rng.sample("abcde", k=rng.randint(0, 3))}


def test_fuzz_ref_graphs_frontier_sound(spark):
    rng = random.Random(REF_SEED)
    corpus = []
    n_schemas = n_plan = 0
    while n_schemas < N_REF_SCHEMAS:
        schema = _gen_ref_schema(rng)
        n_schemas += 1
        try:
            v = SparkValidator(schema)
        except Exception:
            continue
        if not v.uses_column_plan:
            continue
        n_plan += 1
        compiled = SchemaCompiler(auto_detect=True).compile(schema)
        rows = []
        for d in range(DOCS_PER_REF_SCHEMA):
            doc_json = json.dumps(_gen_ref_doc(rng, rng.randint(2, 7)))
            expected = validate_document(compiled, parse_json(doc_json)).valid()
            rows.append((doc_json, expected,
                         f"refseed{REF_SEED}/schema{n_schemas}/doc{d}: "
                         f"{json.dumps(schema)[:140]} || {doc_json[:80]}"))
        corpus.append((v, rows))
    # cyclic graphs may retry at depth 1 or fall off the plan entirely;
    # most should still compile to (hybrid) SQL
    assert n_plan >= 0.6 * n_schemas, f"{n_plan}/{n_schemas} on SQL plan"

    unsound = []
    n_deep = n_rows = 0
    for start in range(0, len(corpus), 15):
        chunk = corpus[start:start + 15]
        data = []
        for sid, (v, rows) in enumerate(chunk):
            for doc_json, expected, label in rows:
                data.append((sid, doc_json, expected, label))
        df = spark.createDataFrame(data, ["sid", "doc", "expected", "label"])
        var = F.try_parse_json(F.col("doc"))
        pred = deep = None
        for sid, (v, _) in enumerate(chunk):
            branch = v.column_plan(var)
            fr = (v.frontier_plan(var) if v.frontier_plan is not None
                  else F.lit(False))
            pred = (F.when(F.col("sid") == sid, branch) if pred is None
                    else pred.when(F.col("sid") == sid, branch))
            deep = (F.when(F.col("sid") == sid, fr) if deep is None
                    else deep.when(F.col("sid") == sid, fr))
        for r in df.withColumn("got", pred).withColumn("deep", deep).collect():
            n_rows += 1
            n_deep += bool(r.deep)
            if not r.deep and r.got != r.expected:
                unsound.append(f"{r.label}: expected {r.expected}, got {r.got}")
    assert not unsound, (f"{len(unsound)} UNSOUND shallow rows (frontier "
                         f"missed a divergence):\n" + "\n".join(unsound[:20]))
    # the corpus must actually exercise both regimes
    assert 0 < n_deep < n_rows, f"degenerate corpus: {n_deep}/{n_rows} deep"


def test_unicode_length_pattern_differential(spark):
    """Astral-plane / combining-char strings through length, pattern,
    const/enum and uniqueItems: Go counts runes, Python code points, Java
    regex works on UTF-16 — the column plan must still match the exact
    interpreter on every verdict."""
    GCLEF = "\U0001D11E"       # astral: 2 UTF-16 units, 1 code point
    EMOJI = "\U0001F600"
    COMBINING = "é"      # e + combining acute (2 code points)

    strs = ["", "a", "über", GCLEF, GCLEF + GCLEF + "x",
            "é", "☃", EMOJI + EMOJI, "a" + EMOJI + "b",
            COMBINING, " a"]
    schemas = []
    for nn in (1, 2, 3):
        schemas.append({"minLength": nn})
        schemas.append({"maxLength": nn})
    for pat in ["^.$", "^..$", ".", "^[" + GCLEF + "]$", EMOJI, "^\\w+$",
                "^" + COMBINING + "$"]:
        schemas.append({"pattern": pat})
    schemas.append({"enum": [GCLEF, "é"]})
    schemas.append({"const": EMOJI + EMOJI})
    schemas.append({"uniqueItems": True})

    corpus = []
    for schema in schemas:
        v = SparkValidator(schema)
        assert v.uses_column_plan, schema
        compiled = SchemaCompiler(auto_detect=True).compile(schema)
        docs = [json.dumps(s) for s in strs]
        if "uniqueItems" in schema:
            docs += [json.dumps(a) for a in
                     [["é", "é"], [GCLEF, GCLEF], ["a", "a "],
                      [COMBINING, "é"]]]
        rows = [(d, validate_document(compiled, parse_json(d)).valid())
                for d in docs]
        corpus.append((v, rows))

    data = []
    for sid, (v, rows) in enumerate(corpus):
        for d, exp in rows:
            data.append((sid, d, exp))
    df = spark.createDataFrame(data, ["sid", "doc", "expected"])
    var = F.try_parse_json(F.col("doc"))
    pred = deep = None
    for sid, (v, _) in enumerate(corpus):
        b = v.column_plan(var)
        fr = (v.frontier_plan(var) if v.frontier_plan is not None
              else F.lit(False))
        pred = (F.when(F.col("sid") == sid, b) if pred is None
                else pred.when(F.col("sid") == sid, b))
        deep = (F.when(F.col("sid") == sid, fr) if deep is None
                else deep.when(F.col("sid") == sid, fr))
    bad = [(r.sid, r.doc, r.got, r.expected)
           for r in df.withColumn("got", pred).withColumn("deep", deep).collect()
           if not r.deep and r.got != r.expected]
    assert not bad, bad


def test_format_models_mutation_differential(spark):
    """The pure-SQL format models (incl. the hand-built Go net/url model)
    vs the interpreter over seeded mutations of valid/near-miss format
    strings — one chunked job across all 17 formats. (A larger one-off
    hunt ran 3,385 cases at 0 divergences; this keeps ~900 in CI.)"""
    BASES = {
        "date": ["2020-06-15", "2020-02-29", "2021-02-29"],
        "time": ["10:05:08Z", "10:05:08+01:00", "23:59:60Z"],
        "date-time": ["2020-06-15T10:05:08Z", "2020-13-01T00:00:00Z"],
        "hostname": ["example.com", "-bad.com"],
        "email": ["joe@example.com", '"quoted"@example.com', "a@b@c"],
        "ipv4": ["1.2.3.4", "256.1.1.1"],
        "ipv6": ["::1", "1::2::3", "::ffff:1.2.3.4"],
        "uri": ["https://example.com/a?b=c#d", "urn:isbn:0451450523",
                "//missing-scheme"],
        "uri-reference": ["relative/path", "#frag"],
        "uri-template": ["http://x.y/{var}", "{bad"],
        "uuid": ["01234567-89ab-cdef-0123-456789abcdef"],
        "json-pointer": ["/a/b~0c", "a/b"],
        "relative-json-pointer": ["0", "0#", "-1/a"],
        "regex": ["^a+$", "a(b"],
        "iri": ["https://exämple.com/p"],
        "iri-reference": ["relätive"],
        "idn-email": ["joé@exämple.com"],
    }
    chars = list(" aZ09.:-_/@%{}[]()#?&=+~!ä中")
    rng = random.Random(424243)

    def mutate(s):
        ops = (["del", "swap", "dup"] if s else []) + ["ins", "app", "pre"]
        op = rng.choice(ops)
        i = rng.randrange(len(s)) if s else 0
        c = rng.choice(chars)
        return {"del": s[:i] + s[i + 1:], "swap": s[:i] + c + s[i + 1:],
                "dup": s[:i] + (s[i] if s else "") + s[i:],
                "ins": s[:i] + c + s[i:], "app": s + c,
                "pre": c + s}[op]

    corpus = []
    for fmt, bases in BASES.items():
        strs = set(bases)
        for b in bases:
            for _ in range(10):
                s = b
                for _ in range(rng.randint(1, 3)):
                    s = mutate(s)
                strs.add(s)
        for _ in range(10):
            strs.add("".join(rng.choice(chars)
                             for _ in range(rng.randint(0, 16))))
        v = SparkValidator({"format": fmt})
        assert v.uses_column_plan, fmt
        compiled = SchemaCompiler(auto_detect=True).compile({"format": fmt})
        rows = [(json.dumps(s),
                 validate_document(compiled, parse_json(json.dumps(s))).valid())
                for s in strs]
        corpus.append((fmt, v, rows))

    data = []
    for sid, (fmt, v, rows) in enumerate(corpus):
        for dj, exp in rows:
            data.append((sid, dj, exp, fmt))
    df = spark.createDataFrame(data, ["sid", "doc", "expected", "fmt"])
    var = F.try_parse_json(F.col("doc"))
    pred = deep = None
    for sid, (fmt, v, _) in enumerate(corpus):
        b = v.column_plan(var)
        fr = (v.frontier_plan(var) if v.frontier_plan is not None
              else F.lit(False))
        pred = (F.when(F.col("sid") == sid, b) if pred is None
                else pred.when(F.col("sid") == sid, b))
        deep = (F.when(F.col("sid") == sid, fr) if deep is None
                else deep.when(F.col("sid") == sid, fr))
    bad = [(r.fmt, r.doc, r.got, r.expected)
           for r in df.withColumn("got", pred).withColumn("deep", deep).collect()
           if not r.deep and bool(r.got) != r.expected]
    assert not bad, bad[:10]
