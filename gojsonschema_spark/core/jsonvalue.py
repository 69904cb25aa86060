"""JSON value model with lexical (exact) numbers and canonical equality.

Reproduces, from scratch in Python, the two load-bearing representation
choices of the reference engine (see /root/reference/jsonLoader.go:372-386
``decodeJSONUsingNumber`` and /root/reference/utils.go:84-125):

* numbers stay lexical and are compared as arbitrary-precision rationals
  (``Num`` wraps the source text; exact math via ``fractions.Fraction``);
* equality for const/enum/uniqueItems is canonical-JSON equality: values are
  re-rendered *without* lexical numbers (i.e. through float64) so ``1.00``,
  ``1.0`` and ``1`` collapse to the same canonical string.
"""

from __future__ import annotations

import json
import math
from decimal import Decimal
from fractions import Fraction

__all__ = [
    "Num",
    "parse_json",
    "canonical_json",
    "json_kind",
    "go_float_str",
    "JSON_TYPES",
]

JSON_TYPES = ("array", "boolean", "integer", "number", "null", "object", "string")


class Num:
    """A JSON number kept in its lexical form (reference: json.Number)."""

    __slots__ = ("lex", "_frac")

    def __init__(self, lex: str):
        self.lex = lex
        self._frac = None

    @property
    def frac(self) -> Fraction:
        if self._frac is None:
            self._frac = Fraction(self.lex)
        return self._frac

    def is_int(self) -> bool:
        """reference: utils.go:117-125 checkJSONInteger (big.Rat.IsInt);
        an unparseable lexical is "not an integer" (SetString ok=false),
        not an exception (utils_test.go TestCheckJsonNumber "123number")."""
        try:
            return self.frac.denominator == 1
        except ValueError:
            return False

    def __float__(self) -> float:
        return float(self.lex)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Num({self.lex})"

    def __eq__(self, other) -> bool:
        return isinstance(other, Num) and self.frac == other.frac

    def __hash__(self) -> int:
        return hash(self.frac)


def _object_pairs_strict(pairs):
    """Reject duplicate object keys (README "Differences" item 4).

    Go's json.Unmarshal silently keeps the LAST duplicate (so the
    reference validates {"a":1,"a":2} as {"a":2}), but Spark's variant
    parser rejects such documents outright — the SQL hot path cannot see
    them at all. One engine must give ONE verdict per document on every
    path, so the interpreter path matches the SQL path: duplicate-key
    documents are invalid_document, a data-quality signal rather than a
    silent value drop."""
    d = dict(pairs)
    if len(d) != len(pairs):
        raise ValueError("duplicate object key")
    return d


def parse_json(text: str):
    """Parse JSON keeping numbers lexical (reference: decodeJSONUsingNumber);
    duplicate object keys are rejected (see _object_pairs_strict)."""
    return json.loads(text, parse_float=Num, parse_int=Num,
                      object_pairs_hook=_object_pairs_strict)


def dump_lexical(value) -> str:
    """Serialize back to JSON preserving lexical number forms verbatim."""
    out: list = []

    def rec(v):
        if v is None:
            out.append("null")
        elif isinstance(v, bool):
            out.append("true" if v else "false")
        elif isinstance(v, Num):
            out.append(v.lex)
        elif isinstance(v, int):
            out.append(str(v))
        elif isinstance(v, float):
            out.append(repr(v))
        elif isinstance(v, str):
            out.append(json.dumps(v, ensure_ascii=False))
        elif isinstance(v, (list, tuple)):
            out.append("[")
            for i, x in enumerate(v):
                if i:
                    out.append(",")
                rec(x)
            out.append("]")
        elif isinstance(v, dict):
            out.append("{")
            for i, (k, x) in enumerate(v.items()):
                if i:
                    out.append(",")
                out.append(json.dumps(k, ensure_ascii=False))
                out.append(":")
                rec(x)
            out.append("}")
        else:  # pragma: no cover
            raise TypeError(f"not a JSON value: {type(v)}")

    rec(value)
    return "".join(out)


def go_float_str(f: float) -> str:
    """Render a float64 the way Go's encoding/json does.

    Go uses fixed notation for 1e-6 <= |f| < 1e21 and shortest scientific
    notation outside that range; integral floats print without a decimal
    point (json.Marshal(float64(1)) == "1").
    """
    if math.isinf(f) or math.isnan(f):
        # encoding/json refuses these; keep a stable marker for our own use.
        return "inf" if f > 0 else ("-inf" if f < 0 else "nan")
    if f == 0:
        return "-0" if math.copysign(1.0, f) < 0 else "0"
    a = abs(f)
    r = repr(f)  # shortest round-trip form
    if 1e-6 <= a < 1e21:
        if "e" in r or "E" in r:
            # expand scientific repr to fixed notation
            d = Decimal(r)
            r = format(d, "f")
        if r.endswith(".0"):
            r = r[:-2]
        return r
    # scientific notation, Go style: d.dddde±XX with >=2 exponent digits
    if "e" not in r and "E" not in r:
        r = format(Decimal(r).normalize(), "e").replace("E", "e")
    mant, _, exp = r.partition("e")
    iexp = int(exp)
    if mant.endswith(".0"):
        mant = mant[:-2]
    return f"{mant}e{'+' if iexp >= 0 else '-'}{abs(iexp):02d}"


def _canon(value, out: list) -> None:
    if value is None:
        out.append("null")
    elif isinstance(value, bool):
        out.append("true" if value else "false")
    elif isinstance(value, Num):
        # reference marshals the lexical number then re-parses WITHOUT
        # UseNumber -> float64 -> Go float rendering (utils.go:84-104)
        out.append(go_float_str(float(value.lex)))
    elif isinstance(value, (int, float)):
        out.append(go_float_str(float(value)))
    elif isinstance(value, str):
        out.append(json.dumps(value, ensure_ascii=False))
    elif isinstance(value, (list, tuple)):
        out.append("[")
        for i, v in enumerate(value):
            if i:
                out.append(",")
            _canon(v, out)
        out.append("]")
    elif isinstance(value, dict):
        out.append("{")
        for i, k in enumerate(sorted(value)):
            if i:
                out.append(",")
            out.append(json.dumps(k, ensure_ascii=False))
            out.append(":")
            _canon(value[k], out)
        out.append("}")
    else:  # pragma: no cover
        raise TypeError(f"not a JSON value: {type(value)}")


def canonical_json(value) -> str:
    """Canonical rendering used for const/enum/uniqueItems equality.

    Mirrors reference utils.go:84-104 ``marshalWithoutNumber``: numbers go
    through float64, object keys are sorted (Go json.Marshal sorts map keys).
    """
    out: list = []
    _canon(value, out)
    return "".join(out)


def json_kind(value) -> str:
    """Classify a parsed JSON value into one of the seven instance types.

    ``integer`` is returned for numbers whose exact rational value is
    integral (1.0 IS an integer — reference validation.go:117-142).
    """
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, Num):
        return "integer" if value.is_int() else "number"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "integer" if float(value).is_integer() else "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, (list, tuple)):
        return "array"
    if isinstance(value, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(value)}")
