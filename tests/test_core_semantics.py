"""Ported semantics micro-checks (FIXTURES.md §4) — from reference unit tests."""

from __future__ import annotations

import pytest

from gojsonschema_spark import SchemaCompiler, SchemaCompileError, compile_schema
from gojsonschema_spark.core.formats import default_registry
from gojsonschema_spark.core.jsonvalue import Num, canonical_json, go_float_str, json_kind, parse_json


def test_exact_error_message():
    # reference schema_test.go:291-324
    schema = compile_schema({
        "$schema": "http://json-schema.org/draft-04/schema#",
        "type": "object",
        "properties": {
            "Device": {
                "type": "object",
                "properties": {"Color": {"type": "string"}},
                "required": ["Color"],
            }
        },
    })
    result = schema.validate({"Device": {"Color": True}})
    assert not result.valid()
    assert [str(e) for e in result.errors] == [
        "Device.Color: Invalid type. Expected: string, given: boolean"
    ]
    assert result.errors[0].error_type == "invalid_type"
    assert result.errors[0].field_path == "Device.Color"


def test_circular_refs_terminate():
    # reference schema_test.go:42-93
    schema = compile_schema({
        "definitions": {
            "player": {
                "type": "object",
                "properties": {
                    "name": {"type": "string"},
                    "team": {"$ref": "#/definitions/team"},
                },
            },
            "team": {
                "type": "object",
                "properties": {
                    "name": {"type": "string"},
                    "players": {"type": "array",
                                "items": {"$ref": "#/definitions/player"}},
                },
            },
        },
        "$ref": "#/definitions/team",
    })
    doc = {"name": "A", "players": [{"name": "p", "team": {"name": "A", "players": []}}]}
    assert schema.is_valid(doc)
    assert not schema.is_valid({"name": 3})


def test_bad_ref_is_compile_error():
    # reference schema_test.go:371-382
    with pytest.raises(SchemaCompileError):
        compile_schema({"$ref": "#/fail"})


def test_location_independent_id():
    # reference schema_test.go:326-369 (draft4 "id" anchors)
    compiler = SchemaCompiler(draft="draft4")
    schema = compiler.compile({
        "allOf": [{"$ref": "#foo"}],
        "definitions": {"A": {"id": "#foo", "type": "integer"}},
    })
    r1 = schema.validate("a string")
    assert not r1.valid()
    assert r1.errors[0].error_type == "invalid_type"
    assert schema.is_valid(3)


def test_fragment_compile():
    # reference schema_test.go:239-273: compile from a #/definitions/x fragment
    compiler = SchemaCompiler(draft="draft4")
    compiler.add_schema("http://example.test/root.json", parse_json(
        '{"definitions": {"x": {"type": "integer"}}}'))
    schema = compiler.compile(None, ref="http://example.test/root.json#/definitions/x")
    assert schema.is_valid(3)
    assert not schema.is_valid("a")


def test_draft_cross_referencing():
    """reference schemaLoader_test.go:127-163 TestDraftCrossReferencing:
    a draft-07 root $ref'ing a registered document that declares draft-04
    but uses the numeric exclusiveMinimum form. With auto-detection the
    referenced doc compiles under ITS OWN $schema (draft4 -> compile
    error, the bool form is required); with detection off, the preset
    draft governs and >= draft6 accepts the numeric form."""
    doc1 = ('{"$schema": "http://json-schema.org/draft-04/schema#",'
            ' "id": "http://localhost:1234/file.json",'
            ' "$id": "http://localhost:1234/file.json",'
            ' "exclusiveMinimum": 5}')
    doc2 = ('{"$schema": "http://json-schema.org/draft-07/schema#",'
            ' "id": "http://localhost:1234/main.json",'
            ' "$id": "http://localhost:1234/main.json",'
            ' "$ref": "file.json"}')
    for auto in (True, False):
        for draft in ("draft4", "draft6", "draft7"):
            c = SchemaCompiler(draft=draft, auto_detect=auto)
            c.add_schema("http://localhost:1234/file.json", parse_json(doc1))
            try:
                c.compile(parse_json(doc2))
                ok = True
            except SchemaCompileError:
                ok = False
            assert ok == ((not auto) and draft in ("draft6", "draft7")), \
                (auto, draft)


def test_double_id_registration_rejected():
    """reference schemaLoader_test.go:69-76 TestDoubleIDReference."""
    c = SchemaCompiler()
    c.add_schema("http://localhost:1234/test4.json", parse_json("{}"))
    with pytest.raises(SchemaCompileError):
        c.add_schema("http://localhost:1234/test4.json", parse_json('{"x":1}'))


def test_custom_metaschema():
    """reference schemaLoader_test.go:78-110 TestCustomMetaSchema: a
    registered document can serve as the $schema for meta-validation —
    here one that forbids the multipleOf keyword."""
    meta = parse_json('{"$id": "http://localhost:1234/test5.json",'
                      ' "properties": {"multipleOf": false}}')
    c = SchemaCompiler(validate_schema=True)
    c.add_schemas(meta)
    c.compile(parse_json('{"$id": "http://localhost:1234/test6.json",'
                         ' "$schema": "http://localhost:1234/test5.json",'
                         ' "type": "string"}'))
    c2 = SchemaCompiler(validate_schema=True)
    c2.add_schemas(meta)
    with pytest.raises(SchemaCompileError):
        c2.compile(parse_json('{"$id": "http://localhost:1234/test7.json",'
                              ' "$schema": "http://localhost:1234/test5.json",'
                              ' "multipleOf": 5}'))


def test_schema_detection_vs_preset():
    """reference schemaLoader_test.go:112-126 TestSchemaDetection: the
    numeric exclusiveMinimum under a draft-04 $schema errors with
    auto-detection, compiles in hybrid mode with detection off."""
    doc = ('{"$schema": "http://json-schema.org/draft-04/schema#",'
           ' "exclusiveMinimum": 5}')
    with pytest.raises(SchemaCompileError):
        SchemaCompiler().compile(parse_json(doc))
    SchemaCompiler(auto_detect=False).compile(parse_json(doc))


def test_number_classification():
    # reference utils_test.go:35-59
    assert json_kind(parse_json("1.0e+2")) == "integer"
    assert json_kind(parse_json("9223372036854775807")) == "integer"
    assert json_kind(parse_json("1.0e-2")) == "number"
    assert json_kind(parse_json("1.5")) == "number"
    assert Num("1.0").is_int() and not Num("1.00001").is_int()


def test_canonical_equality():
    # reference utils.go:84-104: 1.00 == 1.0 == 1, but "1" != 1, true != 1
    assert canonical_json(parse_json("1.00")) == canonical_json(parse_json("1"))
    assert canonical_json(parse_json('"1"')) != canonical_json(parse_json("1"))
    assert canonical_json(parse_json("true")) != canonical_json(parse_json("1"))
    assert canonical_json(parse_json('{"b":1,"a":2}')) == canonical_json(parse_json('{"a":2,"b":1}'))


def test_go_float_str():
    assert go_float_str(1.0) == "1"
    assert go_float_str(0.1) == "0.1"
    assert go_float_str(1e21) == "1e+21"
    assert go_float_str(1e20) == "100000000000000000000"
    assert go_float_str(-2.5e-7) == "-2.5e-07"


def test_format_checkers_vectors():
    # reference format_checkers_test.go:10-96
    f = default_registry
    assert f.is_format("uuid", "01234567-89ab-cdef-0123-456789abcdef")
    assert f.is_format("uuid", "f1917270-2f88-4d5c-baf9-0c26fa1c501f")
    assert not f.is_format("uuid", "not-a-uuid")
    assert not f.is_format("uuid", "g1917270-2f88-4d5c-baf9-0c26fa1c501f")
    assert f.is_format("uri-reference", "relative")
    assert f.is_format("uri-reference", "https://dummyhost.com/dummy-path?dummy-qp-name=dummy-qp-value")
    assert not f.is_format("uri", "relative")
    # unknown formats + non-string inputs always pass
    assert f.is_format("no-such-format", "anything")
    assert f.is_format("date", Num("5"))
    assert f.is_format("uri", 42)


def test_enum_duplicate_is_compile_error():
    with pytest.raises(SchemaCompileError):
        compile_schema({"enum": [1, 1.0]})


def test_goregex_multiline_and_posix():
    from gojsonschema_spark.core.goregex import (
        JavaRegexDivergence, compile_re2, translate_re2_java)

    # RE2 '$' without (?m) is end-of-text: no trailing-newline match
    assert compile_re2("^example\\.com$").search("example.com\n") is None
    # with (?m), '$' is a line anchor in BOTH RE2 and Python: keep it
    assert compile_re2("(?m)^ab$").search("xx\nab\ncd")
    # POSIX classes are RE2 syntax; Python needs the expansion
    assert compile_re2("^[[:alpha:]]+$").search("abc")
    assert compile_re2("^[[:digit:]]+$").search("12a") is None
    assert compile_re2("^[[:xdigit:]]+$").search("1aF")
    # Java-divergent syntax must raise so schemas route to the interpreter
    # — including flag groups that enable m while disabling others
    for bad in ["(?m)^a$", "(?m-i:^a$)", "(?im-sU)a", "[a&&b]", "[a[b]]",
                "x[[:alpha:]]y"]:
        with pytest.raises(JavaRegexDivergence):
            translate_re2_java(bad)
    # m only in the DISABLED section is not multiline: '$' still rewrites
    assert translate_re2_java("(?i-m:a)$").endswith("\\z")
    assert compile_re2("(?i-m:a)$").search("A\n") is None
    # plain anchors still get the end-of-text rewrite for rlike
    assert translate_re2_java("^src[0-9]+$") == "^src[0-9]+\\z"


def test_hostname_rejects_trailing_newline():
    assert default_registry.is_format("hostname", "example.com")
    assert not default_registry.is_format("hostname", "example.com\n")


def test_no_progress_ref_cycle_greatest_fixed_point():
    """Infinitely recursive schemas (json-schema-core "loops": undefined
    behavior; the reference stack-overflows) terminate with the greatest
    fixed point: the cyclic conjunct contributes only its own local
    constraints (C ∧ C ∧ ... == C). README "Differences" item 3a."""
    # pure self-cycle: no local constraints => everything valid
    s = compile_schema({"allOf": [{"$ref": "#"}]})
    assert s.validate(1).valid()
    assert s.validate({"a": [1, "x"]}).valid()

    # cycle with a local constraint: verdict == the constraint alone
    s = compile_schema({
        "definitions": {"D": {"allOf": [{"$ref": "#/definitions/D"}],
                              "type": "integer"}},
        "$ref": "#/definitions/D",
    })
    assert s.validate(7).valid()
    r = s.validate("nope")
    assert not r.valid()
    assert r.errors[0].error_type == "invalid_type"

    # mutual no-progress cycle through anyOf
    s = compile_schema({
        "definitions": {
            "A": {"anyOf": [{"$ref": "#/definitions/B"}], "minimum": 3},
            "B": {"anyOf": [{"$ref": "#/definitions/A"}]},
        },
        "$ref": "#/definitions/A",
    })
    assert s.validate(5).valid()
    assert not s.validate(1).valid()

    # a PROGRESS-consuming cycle is untouched: items descends the instance
    s = compile_schema({"items": {"$ref": "#"}, "type": ["array", "integer"]})
    assert s.validate([[1, 2], [[3]]]).valid()
    assert not s.validate([["x"]]).valid()


def test_interpreter_ref_path_thread_local():
    """The cyclic-$ref active-path set is per-thread (ADVICE r3): a
    concurrent validate over the SAME parsed instance must not see another
    thread's in-flight (schema, node) key and short-circuit to valid."""
    import threading

    from gojsonschema_spark.core.compiler import SchemaCompiler
    from gojsonschema_spark.core.interpreter import _ref_path, validate_document

    assert _ref_path() is _ref_path()  # stable within a thread
    other = {}
    t = threading.Thread(target=lambda: other.setdefault("p", _ref_path()))
    t.start(); t.join()
    assert other["p"] is not _ref_path()

    # hammer: many threads validating the same recursive schema + doc must
    # all agree with the single-threaded verdict
    schema = SchemaCompiler().compile({
        "definitions": {"node": {
            "type": "object", "required": ["v"],
            "properties": {"v": {"type": "integer"},
                           "next": {"$ref": "#/definitions/node"}}}},
        "$ref": "#/definitions/node"})
    doc = {"v": 1, "next": {"v": "bad"}}
    expect = validate_document(schema, doc).valid()
    results = []
    threads = [threading.Thread(
        target=lambda: results.append(validate_document(schema, doc).valid()))
        for _ in range(16)]
    for th in threads: th.start()
    for th in threads: th.join()
    assert results == [expect] * 16
