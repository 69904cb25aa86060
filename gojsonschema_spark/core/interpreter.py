"""Set-at-a-time reference interpreter for compiled schemas.

Faithful from-scratch reimplementation of the reference's validation phase
(/root/reference/validation.go:71-846): type dispatch, keyword validators,
combinators with best-branch scoring, and violation construction. This is
the semantic core shared by:

* the pytest golden-corpus parity gate (draft4/6/7 suite verdicts);
* the Arrow-batched pandas-UDF fallback path of the Spark engine (used for
  schemas the Column compiler cannot express: cyclic $refs, exact bignum
  arithmetic, exotic regex dialects).
"""

from __future__ import annotations

from .compiler import CompiledSchema, SubSchema
from .errors import ROOT_CONTEXT, Result
from .jsonvalue import Num, canonical_json

__all__ = ["validate_document", "wrap_instance"]


def wrap_instance(value):
    """Convert plain Python numbers into lexical ``Num`` values so native
    dict/list inputs validate identically to JSON-parsed ones."""
    if isinstance(value, bool) or value is None or isinstance(value, (str, Num)):
        return value
    if isinstance(value, int):
        return Num(str(value))
    if isinstance(value, float):
        return Num(repr(value))
    if isinstance(value, list):
        return [wrap_instance(v) for v in value]
    if isinstance(value, dict):
        return {k: wrap_instance(v) for k, v in value.items()}
    return value


def validate_document(schema: CompiledSchema, instance) -> Result:
    result = Result()
    _validate_recursive(schema, schema.root, wrap_instance(instance), result, ROOT_CONTEXT)
    return result


def _sub_validate(schema, node, instance, context) -> Result:
    result = Result()
    _validate_recursive(schema, node, instance, result, context)
    return result


# (subschema id, instance-node id) pairs on the ACTIVE $ref-delegation
# stack. A revisit means a $ref cycle that consumed no input — infinitely
# recursive per json-schema-core §"loops" ("behavior is undefined"; the
# reference panics with a stack overflow there, validation.go has no
# guard). We choose the greatest fixed point instead: the inner revisit
# is vacuously valid. This provably agrees with the column plan's
# depth-k-unroll-then-TRUE semantics (C ∧ ... ∧ C ∧ TRUE == C) and never
# changes a verdict on any schema where the reference terminates — a
# terminating run never revisits a pair. try/finally keeps the set
# path-scoped, including during exception unwind. The set is
# THREAD-LOCAL (ADVICE r3): a module-level set shared across threads
# would let one driver thread's in-flight (schema, node) key
# short-circuit another thread's identical traversal to 'valid'
# (worker-side UDF execution is single-threaded per interpreter; the
# exposure was concurrent driver-side validate_document calls).
class _ThreadLocalRefPath:
    """threading.local holder that survives cloudpickle: UDF closures
    ship this module by value (spark/__init__.py registration) and a bare
    threading.local cannot be pickled — __reduce__ rebuilds a FRESH empty
    holder on the worker, which is exactly the right semantics (the
    active-path set is per-traversal state, never shipped state)."""

    def __init__(self):
        import threading
        self._local = threading.local()

    def get(self) -> set:
        path = getattr(self._local, "path", None)
        if path is None:
            path = self._local.path = set()
        return path

    def __reduce__(self):
        return (_ThreadLocalRefPath, ())


_REF_STATE = _ThreadLocalRefPath()


def _ref_path() -> set:
    return _REF_STATE.get()


def _validate_recursive(schema, cur: SubSchema, node, result: Result, ctx: tuple):
    # boolean schema fast path
    if cur.pass_ is not None:
        if not cur.pass_:
            result.add_error("false", ctx, node, {})
        return

    # $ref delegation
    if cur.ref_schema is not None:
        key = (id(cur), id(node))
        path = _ref_path()
        if key in path:
            return  # no-progress $ref cycle: greatest fixed point => valid
        path.add(key)
        try:
            _validate_recursive(schema, cur.ref_schema, node, result, ctx)
        finally:
            path.discard(key)
        return

    if node is None:
        if cur.types and "null" not in cur.types:
            result.add_error("invalid_type", ctx, node,
                             {"expected": cur.types_string(), "given": "null"})
            return
        _validate_schema(schema, cur, node, result, ctx)
        _validate_common(schema, cur, node, result, ctx)

    elif isinstance(node, Num):
        is_int = node.is_int()
        valid_type = ("number" in cur.types) or (is_int and "integer" in cur.types)
        if cur.types and not valid_type:
            result.add_error("invalid_type", ctx, node,
                             {"expected": cur.types_string(),
                              "given": "integer" if is_int else "number"})
            return
        _validate_schema(schema, cur, node, result, ctx)
        _validate_number(schema, cur, node, result, ctx)
        _validate_common(schema, cur, node, result, ctx)

    elif isinstance(node, list):
        if cur.types and "array" not in cur.types:
            result.add_error("invalid_type", ctx, node,
                             {"expected": cur.types_string(), "given": "array"})
            return
        _validate_schema(schema, cur, node, result, ctx)
        _validate_array(schema, cur, node, result, ctx)
        _validate_common(schema, cur, node, result, ctx)

    elif isinstance(node, dict):
        if cur.types and "object" not in cur.types:
            result.add_error("invalid_type", ctx, node,
                             {"expected": cur.types_string(), "given": "object"})
            return
        _validate_schema(schema, cur, node, result, ctx)
        _validate_object(schema, cur, node, result, ctx)
        _validate_common(schema, cur, node, result, ctx)
        for child in cur.properties_children:
            if child.property in node:
                _validate_recursive(schema, child, node[child.property],
                                    result, ctx + (child.property,))

    elif isinstance(node, bool):
        if cur.types and "boolean" not in cur.types:
            result.add_error("invalid_type", ctx, node,
                             {"expected": cur.types_string(), "given": "boolean"})
            return
        _validate_schema(schema, cur, node, result, ctx)
        _validate_common(schema, cur, node, result, ctx)

    elif isinstance(node, str):
        if cur.types and "string" not in cur.types:
            result.add_error("invalid_type", ctx, node,
                             {"expected": cur.types_string(), "given": "string"})
            return
        _validate_schema(schema, cur, node, result, ctx)
        _validate_common(schema, cur, node, result, ctx)
        _validate_string(schema, cur, node, result, ctx)

    result.increment_score()


def _validate_schema(schema, cur: SubSchema, node, result: Result, ctx: tuple):
    """Combinators + dependencies + if/then/else (validation.go:270-399)."""
    if cur.any_of:
        validated = False
        best = None
        for sub in cur.any_of:
            if not validated:
                r = _sub_validate(schema, sub, node, ctx)
                validated = r.valid()
                if not validated and (best is None or r.score > best.score):
                    best = r
        if not validated:
            result.add_error("number_any_of", ctx, node, {})
            if best is not None:
                result.merge(best)

    if cur.one_of:
        nb = 0
        best = None
        for sub in cur.one_of:
            r = _sub_validate(schema, sub, node, ctx)
            if r.valid():
                nb += 1
            elif nb == 0 and (best is None or r.score > best.score):
                best = r
        if nb != 1:
            result.add_error("number_one_of", ctx, node, {})
            if nb == 0:
                result.merge(best)

    if cur.all_of:
        nb = 0
        for sub in cur.all_of:
            r = _sub_validate(schema, sub, node, ctx)
            if r.valid():
                nb += 1
            result.merge(r)
        if nb != len(cur.all_of):
            result.add_error("number_all_of", ctx, node, {})

    if cur.not_ is not None:
        r = _sub_validate(schema, cur.not_, node, ctx)
        if r.valid():
            result.add_error("number_not", ctx, node, {})

    if cur.dependencies and isinstance(node, dict):
        for key in node:
            dep = cur.dependencies.get(key)
            if dep is None:
                continue
            if isinstance(dep, list):
                for need in dep:
                    if need not in node:
                        result.add_error("missing_dependency", ctx, node,
                                         {"dependency": need})
            else:
                _validate_recursive(schema, dep, node, result, ctx)

    if cur.if_ is not None:
        r_if = _sub_validate(schema, cur.if_, node, ctx)
        if cur.then_ is not None and r_if.valid():
            r_then = _sub_validate(schema, cur.then_, node, ctx)
            if not r_then.valid():
                result.add_error("condition_then", ctx, node, {})
                result.merge(r_then)
        if cur.else_ is not None and not r_if.valid():
            r_else = _sub_validate(schema, cur.else_, node, ctx)
            if not r_else.valid():
                result.add_error("condition_else", ctx, node, {})
                result.merge(r_else)

    result.increment_score()


def _validate_common(schema, cur: SubSchema, value, result: Result, ctx: tuple):
    """const / enum / format (validation.go:401-456)."""
    if cur.const_ is not None:
        if canonical_json(value) != cur.const_:
            result.add_error("const", ctx, value, {"allowed": cur.const_})

    if cur.enum:
        if canonical_json(value) not in cur.enum:
            result.add_error("enum", ctx, value,
                             {"allowed": ", ".join(cur.enum)})

    if cur.format:
        if not schema.formats.is_format(cur.format, value):
            result.add_error("format", ctx, value, {"format": cur.format})

    result.increment_score()


def _validate_array(schema, cur: SubSchema, value: list, result: Result, ctx: tuple):
    nb = len(value)

    if cur.items_single and cur.items_children:
        child = cur.items_children[0]
        for i, item in enumerate(value):
            r = _sub_validate(schema, child, item, ctx + (str(i),))
            result.merge(r)
    elif cur.items_children:
        n_items = len(cur.items_children)
        for i in range(min(n_items, nb)):
            r = _sub_validate(schema, cur.items_children[i], value[i], ctx + (str(i),))
            result.merge(r)
        if n_items < nb:
            if cur.additional_items is False:
                result.add_error("array_no_additional_items", ctx, value, {})
            elif isinstance(cur.additional_items, SubSchema):
                for i in range(n_items, nb):
                    r = _sub_validate(schema, cur.additional_items, value[i],
                                      ctx + (str(i),))
                    result.merge(r)

    if cur.min_items is not None and nb < cur.min_items:
        result.add_error("array_min_items", ctx, value, {"min": cur.min_items})
    if cur.max_items is not None and nb > cur.max_items:
        result.add_error("array_max_items", ctx, value, {"max": cur.max_items})

    if cur.unique_items:
        seen: dict[str, int] = {}
        for j, item in enumerate(value):
            key = canonical_json(item)
            if key in seen:
                result.add_error("unique", ctx, value,
                                 {"type": "array", "i": seen[key], "j": j})
            seen[key] = j

    if cur.contains is not None:
        found = False
        best = None
        for i, item in enumerate(value):
            r = _sub_validate(schema, cur.contains, item, ctx + (str(i),))
            if r.valid():
                found = True
                break
            if best is None or r.score > best.score:
                best = r
        if not found:
            result.add_error("contains", ctx, value, {})
            if best is not None:
                result.merge(best)

    result.increment_score()


def _validate_object(schema, cur: SubSchema, value: dict, result: Result, ctx: tuple):
    if cur.min_properties is not None and len(value) < cur.min_properties:
        result.add_error("array_min_properties", ctx, value, {"min": cur.min_properties})
    if cur.max_properties is not None and len(value) > cur.max_properties:
        result.add_error("array_max_properties", ctx, value, {"max": cur.max_properties})

    for req in cur.required:
        if req in value:
            result.increment_score()
        else:
            result.add_error("required", ctx, value, {"property": req})

    declared = {c.property for c in cur.properties_children}
    for pk, pv in value.items():
        found = pk in declared
        pp_match = _validate_pattern_property(schema, cur, pk, pv, result, ctx)
        if not found and not pp_match:
            ap = cur.additional_properties
            if ap is False:
                result.add_error("additional_property_not_allowed", ctx, pv,
                                 {"property": pk})
            elif isinstance(ap, SubSchema):
                r = _sub_validate(schema, ap, pv, ctx + (pk,))
                result.merge(r)

    if cur.property_names is not None:
        for pk in value:
            r = _sub_validate(schema, cur.property_names, pk, ctx)
            if not r.valid():
                result.add_error("invalid_property_name", ctx, value, {"property": pk})
                result.merge(r)

    result.increment_score()


def _validate_pattern_property(schema, cur, key, value, result, ctx) -> bool:
    if not cur.pattern_properties:
        return False
    validated = False
    for _, (rx, child) in cur.pattern_properties.items():
        if rx.search(key):
            validated = True
            r = _sub_validate(schema, child, value, ctx + (key,))
            result.merge(r)
    if not validated:
        return False
    result.increment_score()
    return True


def _validate_string(schema, cur: SubSchema, value, result: Result, ctx: tuple):
    if isinstance(value, Num) or not isinstance(value, str):
        return
    if cur.min_length is not None and len(value) < cur.min_length:
        result.add_error("string_gte", ctx, value, {"min": cur.min_length})
    if cur.max_length is not None and len(value) > cur.max_length:
        result.add_error("string_lte", ctx, value, {"max": cur.max_length})
    if cur.pattern is not None and not cur.pattern.search(value):
        result.add_error("pattern", ctx, value, {"pattern": cur.pattern_src})
    result.increment_score()


def _validate_number(schema, cur: SubSchema, value, result: Result, ctx: tuple):
    if not isinstance(value, Num):
        return
    v = value.frac
    if cur.multiple_of is not None and (v / cur.multiple_of).denominator != 1:
        result.add_error("multiple_of", ctx, value, {"multiple": cur.multiple_of})
    if cur.maximum is not None and v > cur.maximum:
        result.add_error("number_lte", ctx, value, {"max": cur.maximum})
    if cur.exclusive_maximum is not None and v >= cur.exclusive_maximum:
        result.add_error("number_lt", ctx, value, {"max": cur.exclusive_maximum})
    if cur.minimum is not None and v < cur.minimum:
        result.add_error("number_gte", ctx, value, {"min": cur.minimum})
    if cur.exclusive_minimum is not None and v <= cur.exclusive_minimum:
        result.add_error("number_gt", ctx, value, {"min": cur.exclusive_minimum})
    result.increment_score()
