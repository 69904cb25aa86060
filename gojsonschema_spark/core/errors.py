"""Validation result model: errors, paths, scores, locale messages.

Mirrors the observable output model of the reference:

* error type codes (reference errors.go:212-327) — stable keyword-keyed
  strings like ``required``, ``invalid_type``, ``number_one_of``;
* dotted JSON paths from ``(root)`` (reference jsonContext.go:30-73,
  result.go:92-96);
* default-locale message templates (reference locales.go:195-457);
* the score machinery used to pick the best-matching failed branch of
  anyOf/oneOf (reference result.go:206-220).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from fractions import Fraction

from .jsonvalue import Num, canonical_json, go_float_str

__all__ = ["ROOT_CONTEXT", "Violation", "Result", "SchemaCompileError",
           "render_value", "set_locale", "set_error_template_funcs",
           "ERROR_TEMPLATE_FUNCS"]

ROOT_CONTEXT = ("(root)",)

# Default-locale templates, {placeholders} filled from details
# (message text parity with reference locales.go DefaultLocale).
MESSAGES = {
    "false": "False always fails validation",
    "required": "{property} is required",
    "invalid_type": "Invalid type. Expected: {expected}, given: {given}",
    "number_any_of": "Must validate at least one schema (anyOf)",
    "number_one_of": "Must validate one and only one schema (oneOf)",
    "number_all_of": "Must validate all the schemas (allOf)",
    "number_not": "Must not validate the schema (not)",
    "missing_dependency": "Has a dependency on {dependency}",
    "internal": "Internal Error {error}",
    "const": "{field} does not match: {allowed}",
    "enum": "{field} must be one of the following: {allowed}",
    "array_no_additional_items": "No additional items allowed on array",
    "array_min_items": "Array must have at least {min} items",
    "array_max_items": "Array must have at most {max} items",
    "unique": "{type} items[{i},{j}] must be unique",
    "contains": "At least one of the items must match",
    "array_min_properties": "Must have at least {min} properties",
    "array_max_properties": "Must have at most {max} properties",
    "additional_property_not_allowed": "Additional property {property} is not allowed",
    "invalid_property_pattern": 'Property "{property}" does not match pattern {pattern}',
    "invalid_property_name": 'Property name of "{property}" does not match',
    "string_gte": "String length must be greater than or equal to {min}",
    "string_lte": "String length must be less than or equal to {max}",
    "pattern": "Does not match pattern '{pattern}'",
    "format": "Does not match format '{format}'",
    "multiple_of": "Must be a multiple of {multiple}",
    "number_gte": "Must be greater than or equal to {min}",
    "number_gt": "Must be greater than {min}",
    "number_lte": "Must be less than or equal to {max}",
    "number_lt": "Must be less than {max}",
    "condition_then": 'Must validate "then" as "if" was valid',
    "condition_else": 'Must validate "else" as "if" was not valid',
}

_FIELD_RX = re.compile(r"\{(\w+(?:\s*\|\s*\w+)*)\}")

# User-registered template helper funcs for custom locales, mirroring the
# reference's package-level ErrorTemplateFuncs FuncMap (schema.go:44-45,
# errors.go:344-351; README example: '{{allcaps .field}}'). Python
# syntax: '{field|allcaps}' pipes the rendered detail through the helper.
ERROR_TEMPLATE_FUNCS: dict = {}


def set_error_template_funcs(funcs: dict) -> None:
    """Register (replace) the helper-function map used by message
    templates, like assigning gojsonschema.ErrorTemplateFuncs."""
    ERROR_TEMPLATE_FUNCS.clear()
    ERROR_TEMPLATE_FUNCS.update(funcs)


def set_locale(overrides: dict) -> None:
    """Override message templates by error type (reference: pluggable
    locale, schema.go:39-46 / locales.go:28-193). Templates use
    ``{placeholder}`` fields from the violation details."""
    MESSAGES.update(overrides)


class SchemaCompileError(ValueError):
    """Raised when a schema fails to compile (reference returns error)."""


def context_string(context: tuple) -> str:
    return ".".join(context)


def field_of(context: tuple) -> str:
    s = context_string(context)
    prefix = "(root)."
    return s[len(prefix):] if s.startswith(prefix) else s


def _render_detail(v) -> str:
    """Numeric bound details are stored exact (Fraction); the reference
    locale prints them as Go numbers (locales.go NumberGTE et al. receive
    float64/int), so 3/2 must render as 1.5, never as a rational."""
    if isinstance(v, Fraction):
        if v.denominator == 1:
            return str(v.numerator)
        return go_float_str(float(v))
    return str(v)


def render_value(value) -> str:
    if value is None:
        return "null"
    if isinstance(value, Num):
        return value.lex
    return canonical_json(value)


@dataclass
class Violation:
    error_type: str
    context: tuple
    value: object
    details: dict = field(default_factory=dict)

    @property
    def field_path(self) -> str:
        return field_of(self.context)

    def description(self) -> str:
        details = dict(self.details)
        details.setdefault("field", self.field_path)
        details.setdefault("context", context_string(self.context))
        template = MESSAGES.get(self.error_type, self.error_type)

        def expand(m):
            parts = [p.strip() for p in m.group(1).split("|")]
            out = _render_detail(details.get(parts[0], "<no value>"))
            for fname in parts[1:]:
                fn = ERROR_TEMPLATE_FUNCS.get(fname)
                if fn is None:
                    # like a missing func in a Go template: surface the
                    # problem in the message rather than crash validation
                    return f"<no template func {fname!r}>"
                out = str(fn(out))
            return out

        return _FIELD_RX.sub(expand, template)

    def __str__(self) -> str:
        return f"{self.field_path}: {self.description()}"


class Result:
    """Error accumulator with the reference's score semantics."""

    __slots__ = ("errors", "score")

    def __init__(self):
        self.errors: list[Violation] = []
        self.score = 0

    def valid(self) -> bool:
        return not self.errors

    def add_error(self, error_type: str, context: tuple, value, details=None):
        self.errors.append(Violation(error_type, context, value, details or {}))
        self.score -= 2  # net -1 with the +1 from the enclosing validator

    def merge(self, other: "Result"):
        self.errors.extend(other.errors)
        self.score += other.score

    def increment_score(self):
        self.score += 1
