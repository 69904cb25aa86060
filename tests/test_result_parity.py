"""Result-model parity: scores, best-branch error selection, violation
details, locale overrides (reference result.go:206-220, validation.go:277-329).
"""

from __future__ import annotations

from gojsonschema_spark import compile_schema
from gojsonschema_spark.core.errors import MESSAGES, set_locale


def test_anyof_best_branch_errors():
    # On total anyOf failure the reference merges the errors of the
    # BEST-scoring branch — the one that got furthest (validation.go:287-299).
    schema = compile_schema({
        "anyOf": [
            {"type": "string"},
            {"type": "object",
             "required": ["a", "b"],
             "properties": {"a": {"type": "integer"},
                            "b": {"type": "integer"}}},
        ]})
    # object with a valid but b wrong: branch 2 scores far higher than the
    # type-mismatch branch 1, so its specific error is surfaced
    r = schema.validate({"a": 1, "b": "x"})
    assert not r.valid()
    kinds = [e.error_type for e in r.errors]
    assert kinds[0] == "number_any_of"
    assert "invalid_type" in kinds
    fields = {e.field_path for e in r.errors}
    assert "b" in fields  # branch-2's deep error, not branch-1's root error


def test_oneof_zero_match_merges_best():
    schema = compile_schema({
        "oneOf": [
            {"type": "object", "required": ["x"]},
            {"type": "object", "required": ["y", "z"],
             "properties": {"y": {"type": "string"}}},
        ]})
    r = schema.validate({"y": "ok"})
    assert not r.valid()
    kinds = [e.error_type for e in r.errors]
    assert kinds[0] == "number_one_of"
    # best branch is the second (y matched, z missing)
    assert any(e.error_type == "required" and e.details.get("property") == "z"
               for e in r.errors)


def test_oneof_multiple_match_no_merge():
    schema = compile_schema({"oneOf": [{"type": "integer"},
                                       {"minimum": 0}]})
    r = schema.validate(3)
    assert [e.error_type for e in r.errors] == ["number_one_of"]


def test_violation_details_and_messages():
    schema = compile_schema({"type": "object",
                             "properties": {"n": {"minimum": 10}},
                             "required": ["n"]})
    r = schema.validate({"n": 3})
    (err,) = r.errors
    assert err.error_type == "number_gte"
    assert str(err) == "n: Must be greater than or equal to 10"
    assert err.details["min"] == 10


def test_locale_override_roundtrip():
    original = MESSAGES["required"]
    try:
        set_locale({"required": "champ {property} obligatoire"})
        schema = compile_schema({"required": ["x"]})
        r = schema.validate({})
        assert str(r.errors[0]) == "(root): champ x obligatoire"
    finally:
        set_locale({"required": original})


def test_unique_items_reports_indices():
    schema = compile_schema({"uniqueItems": True})
    r = schema.validate([1, 2, 1.0])
    (err,) = r.errors
    assert err.error_type == "unique"
    assert (err.details["i"], err.details["j"]) == (0, 2)
    assert "items[0,2] must be unique" in str(err)


def test_fractional_bound_message_renders_as_float():
    """minimum 1.5 must print '1.5' in the message, not the Fraction '3/2'
    (reference locales.go NumberGTE receives a Go number)."""
    schema = compile_schema({"properties": {"n": {"minimum": 1.5,
                                                  "multipleOf": 0.5}}})
    r = schema.validate({"n": 1.25})
    msgs = sorted(str(e) for e in r.errors)
    assert msgs[0] == "n: Must be a multiple of 0.5"
    assert msgs[1] == "n: Must be greater than or equal to 1.5"


def test_error_template_funcs():
    """Custom locale + user template helper funcs (reference README
    'allcaps' example; schema.go:44-45 ErrorTemplateFuncs)."""
    from gojsonschema_spark.core.errors import set_error_template_funcs
    original = MESSAGES["number_gte"]
    try:
        set_error_template_funcs({"allcaps": lambda s: s.upper()})
        set_locale({"number_gte":
                    "{field|allcaps} must be greater than or equal to {min}"})
        schema = compile_schema({"properties": {"password": {"minimum": 8}}})
        r = schema.validate({"password": 5})
        assert str(r.errors[0]) == \
            "password: PASSWORD must be greater than or equal to 8"
        # unknown helper surfaces in the message instead of crashing
        set_locale({"number_gte": "{field|nosuch} bad"})
        r2 = schema.validate({"password": 5})
        assert "<no template func 'nosuch'>" in str(r2.errors[0])
    finally:
        set_locale({"number_gte": original})
        set_error_template_funcs({})
