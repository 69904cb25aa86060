"""Schema compiler: raw JSON schema -> immutable SubSchema graph.

Driver-side reimplementation (from scratch, in Python) of the reference's
compile pipeline (see SURVEY.md §3.2):

* schema pool — documents keyed by canonical URL, ``$id`` scopes registered
  as addressable documents, every ``$ref`` rewritten to its absolute
  resolved form honoring ``$id`` inheritance (reference schemaPool.go:48-137);
* draft auto-detection from ``$schema`` (reference draft.go:90-125) with
  per-draft keyword enablement (reference schema.go:77-966);
* reference pool — compiled ``$ref`` targets memoized *before* parsing so
  circular references terminate (reference schema.go:236-246,
  schemaReferencePool.go:32-68);
* the three draft meta-schemas embedded for offline meta-validation
  (reference draft.go:45-63; vendored as JSON under metaschemas/).

No network and no executor-side work: compilation happens once on the
driver; the resulting graph is broadcast/pickled to Spark workers.
"""

from __future__ import annotations

import copy
import json
import os
from fractions import Fraction

from .errors import Result, SchemaCompileError
from .formats import FormatRegistry, default_registry
from .goregex import compile_re2
from .jsonvalue import JSON_TYPES, Num, canonical_json, parse_json
from .refs import is_canonical, pointer_get, resolve_ref, split_fragment

__all__ = ["Draft", "SchemaCompiler", "CompiledSchema", "SubSchema", "compile_schema"]


class Draft:
    D4 = 4
    D6 = 6
    D7 = 7
    HYBRID = 2**31 - 1

    _BY_NAME = {"draft4": 4, "draft6": 6, "draft7": 7, "hybrid": 2**31 - 1}

    @classmethod
    def of(cls, d) -> int:
        if isinstance(d, str):
            return cls._BY_NAME[d.lower()]
        return int(d)


_META_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "metaschemas")

METASCHEMA_URLS = {
    "http://json-schema.org/draft-04/schema": (Draft.D4, "draft4.json"),
    "http://json-schema.org/draft-06/schema": (Draft.D6, "draft6.json"),
    "http://json-schema.org/draft-07/schema": (Draft.D7, "draft7.json"),
}


def _load_metaschema(fname: str):
    # importlib.resources is zip-safe: required when the package ships via
    # spark-submit --py-files (zipimport has no real filesystem paths)
    try:
        from importlib.resources import files

        text = files("gojsonschema_spark").joinpath(
            f"metaschemas/{fname}").read_text()
    except Exception:
        with open(os.path.join(_META_DIR, fname)) as f:
            text = f.read()
    return parse_json(text)


def parse_schema_url(document) -> tuple[str, int | None]:
    """Read $schema and map it to a draft (reference draft.go:90-125)."""
    if isinstance(document, bool):
        return "", None
    if not isinstance(document, dict):
        raise SchemaCompileError("schema is invalid")
    if "$schema" in document:
        if not isinstance(document["$schema"], str):
            raise SchemaCompileError("$schema must be of type string")
        url = resolve_ref("", document["$schema"])
        entry = METASCHEMA_URLS.get(url)
        return url, (entry[0] if entry else None)
    return "", None


def _must_be_number(v) -> Fraction | None:
    if isinstance(v, Num):
        return v.frac
    return None


def _must_be_integer(v) -> int | None:
    if isinstance(v, Num) and v.is_int():
        return int(v.frac)
    return None


class SubSchema:
    """One compiled schema node (reference subSchema.go:79-149)."""

    __slots__ = (
        "draft", "property", "parent", "id", "ref", "ref_schema", "pass_",
        "types", "const_", "enum", "properties_children", "pattern_properties",
        "additional_properties", "property_names", "dependencies",
        "items_children", "items_single", "additional_items", "contains",
        "min_items", "max_items", "unique_items", "min_properties",
        "max_properties", "required", "min_length", "max_length", "pattern",
        "pattern_src", "format", "multiple_of", "minimum", "maximum",
        "exclusive_minimum", "exclusive_maximum", "any_of", "one_of",
        "all_of", "not_", "if_", "then_", "else_",
    )

    def __init__(self, property="", parent=None, draft=None, id=None, ref=None):
        self.draft = draft
        self.property = property
        self.parent = parent
        self.id = id
        self.ref = ref
        self.ref_schema = None
        self.pass_ = None
        self.types: list[str] = []
        self.const_ = None
        self.enum: list[str] = []
        self.properties_children: list[SubSchema] = []
        self.pattern_properties: dict = {}
        self.additional_properties = None
        self.property_names = None
        self.dependencies: dict = {}
        self.items_children: list[SubSchema] = []
        self.items_single = False
        self.additional_items = None
        self.contains = None
        self.min_items = None
        self.max_items = None
        self.unique_items = False
        self.min_properties = None
        self.max_properties = None
        self.required: list[str] = []
        self.min_length = None
        self.max_length = None
        self.pattern = None
        self.pattern_src = None
        self.format = ""
        self.multiple_of = None
        self.minimum = None
        self.maximum = None
        self.exclusive_minimum = None
        self.exclusive_maximum = None
        self.any_of: list[SubSchema] = []
        self.one_of: list[SubSchema] = []
        self.all_of: list[SubSchema] = []
        self.not_ = None
        self.if_ = None
        self.then_ = None
        self.else_ = None

    def types_string(self) -> str:
        if not self.types:
            return "undefined"
        if len(self.types) > 1:
            return "[" + ",".join(self.types) + "]"
        return self.types[0]


class SchemaPool:
    """Document pool: canonical-URL -> (document, detected draft).

    ``fetcher`` is the optional remote-resolution hook (r5): a callable
    ``url -> JSON text | parsed document`` consulted at COMPILE time for
    canonical URLs absent from the registered store — the counterpart of
    the reference's live GET (jsonLoader.go:180-204, the suite's
    localhost:1234 server jsonschema_test.go:129-135). Fetching stays
    driver-side: executors only ever see the compiled graph."""

    def __init__(self, store: dict, auto_detect: bool, fetcher=None):
        self.docs: dict[str, tuple[object, int | None]] = {}
        self.store = store
        self.auto_detect = auto_detect
        self.fetcher = fetcher

    def parse_references(self, document, ref: str, pooled: bool) -> None:
        if pooled and ref in self.docs:
            raise SchemaCompileError(f'Reference already exists: "{ref}"')
        draft = None
        if self.auto_detect:
            _, draft = parse_schema_url(document)
        self._walk(document, ref, draft, top=True)
        if pooled:
            self.docs[ref] = (document, draft)

    def _walk(self, node, scope: str, draft, top: bool = False) -> None:
        if isinstance(node, list):
            for v in node:
                self._walk(v, scope, draft)
            return
        if not isinstance(node, dict):
            return
        local = scope
        key_id = "id" if "id" in node else "$id"
        if key_id in node and isinstance(node[key_id], str):
            local = resolve_ref(scope, node[key_id])
            if local in self.docs:
                # duplicate $id: the reference errors here, but nested
                # errors are discarded by its callers; only the top node's
                # error propagates (schemaPool.go:100-105, 118-134).
                if top:
                    raise SchemaCompileError(f'Reference already exists: "{local}"')
                return
            self.docs[local] = (node, draft)
        if "$ref" in node and isinstance(node["$ref"], str):
            node["$ref"] = resolve_ref(local, node["$ref"])
        for k, v in node.items():
            if k in ("const", "enum"):
                continue  # interpreted literally, never schemas
            if k in ("properties", "dependencies", "patternProperties"):
                if isinstance(v, dict):
                    for child in v.values():
                        self._walk(child, local, draft)
            else:
                self._walk(v, local, draft)

    def get_document(self, ref: str) -> tuple[object, int | None]:
        # 1. exact match (covers $id scopes + location-independent ids)
        if ref in self.docs:
            return self.docs[ref]
        # 2. strip fragment, JSON-pointer into a pooled document
        url, frag = split_fragment(ref)
        if url in self.docs:
            base_doc, base_draft = self.docs[url]
            try:
                node = pointer_get(base_doc, frag)
            except KeyError as e:
                raise SchemaCompileError(str(e)) from None
            self.docs[ref] = (node, base_draft)
            return node, base_draft
        # 3. "remote" fetch — registered store first, then the optional
        # driver-side fetcher hook (reference jsonLoader.go:180-204)
        if not is_canonical(ref):
            raise SchemaCompileError(f"Reference {ref} must be canonical")
        if url not in self.store and self.fetcher is not None:
            try:
                fetched = self.fetcher(url)
            except Exception as e:
                raise SchemaCompileError(
                    f"Could not resolve schema document {url!r}: remote "
                    f"fetch failed: {e}") from None
            if isinstance(fetched, bytes):
                fetched = fetched.decode("utf-8")
            if isinstance(fetched, str):
                fetched = parse_json(fetched)   # lexical numbers
            else:
                fetched = _as_lexical(fetched)
            self.store[url] = fetched
        if url not in self.store:
            raise SchemaCompileError(
                f"Could not resolve schema document {url!r}: not in the "
                f"registered schema store and no fetcher hook is installed "
                f"(pass fetcher= to SchemaCompiler for live resolution)"
            )
        document = copy.deepcopy(self.store[url])
        self.parse_references(document, url, pooled=True)
        _, draft = parse_schema_url(document)
        try:
            node = pointer_get(document, frag)
        except KeyError as e:
            raise SchemaCompileError(str(e)) from None
        return node, draft


class CompiledSchema:
    def __init__(self, root: SubSchema, draft: int, formats: FormatRegistry):
        self.root = root
        self.draft = draft
        self.formats = formats

    def validate(self, instance) -> Result:
        from .interpreter import validate_document

        return validate_document(self, instance)

    def is_valid(self, instance) -> bool:
        return self.validate(instance).valid()


class SchemaCompiler:
    """SchemaLoader-equivalent: owns the pool + compile options."""

    def __init__(self, draft=Draft.HYBRID, auto_detect: bool = True,
                 validate_schema: bool = False, formats: FormatRegistry = None,
                 fetcher=None):
        self.draft = Draft.of(draft)
        self.auto_detect = auto_detect
        self.validate_schema = validate_schema
        self.formats = formats or default_registry
        self.store: dict[str, object] = {}
        for url, (_, fname) in METASCHEMA_URLS.items():
            self.store[url] = _load_metaschema(fname)
        # fetcher: optional url -> JSON text/doc hook for canonical $refs
        # not pre-registered (see SchemaPool; io/loaders.py http_fetcher)
        self.pool = SchemaPool(self.store, auto_detect, fetcher=fetcher)
        self._reference_pool: dict[str, SubSchema] = {}

    # -- store management (reference SchemaLoader.AddSchema/AddSchemas) ----
    def add_schema(self, url: str, document) -> None:
        """Register a fetchable schema document under a URL."""
        document = _as_lexical(document)
        self.pool.parse_references(document, resolve_ref("", url), pooled=True)

    def add_schemas(self, *documents) -> None:
        """Register documents addressable only via their $id."""
        for document in documents:
            self.pool.parse_references(_as_lexical(document), "", pooled=False)

    # -- compile ------------------------------------------------------------
    def compile(self, schema, ref: str = "") -> CompiledSchema:
        """Compile a schema given as dict/bool (parsed with lexical numbers),
        JSON text, or by reference into the registered store."""
        if isinstance(schema, str) and schema.lstrip()[:1] in ("{", "[", "t", "f"):
            schema = parse_json(schema)
        if ref:
            ref = resolve_ref("", ref)
            doc, _ = self.pool.get_document(ref)
        else:
            doc = copy.deepcopy(_as_lexical(schema))
            self.pool.parse_references(doc, ref, pooled=True)

        if self.validate_schema:
            self._validate_metaschema(doc)

        draft = self.draft
        if self.auto_detect:
            _, detected = parse_schema_url(doc)
            if detected is not None:
                draft = detected

        root = SubSchema(property="(root)", draft=draft, id=ref, ref=ref)
        self._parse(doc, root)
        return CompiledSchema(root, draft, self.formats)

    def _validate_metaschema(self, doc) -> None:
        url = ""
        if self.auto_detect:
            url, _ = parse_schema_url(doc)
        if not url:
            if self.draft == Draft.HYBRID:
                return
            for u, (d, _) in METASCHEMA_URLS.items():
                if d == self.draft:
                    url = u
        sub = SchemaCompiler(draft=self.draft, auto_detect=self.auto_detect,
                             validate_schema=False, formats=self.formats)
        # share the document pool: a CUSTOM $schema URL registered via
        # add_schema/add_schemas must resolve for meta-validation too
        # (reference schemaLoader_test.go:78-110 TestCustomMetaSchema —
        # the SchemaLoader's pool serves both roles there)
        sub.store = self.store
        sub.pool = self.pool
        meta = sub.compile(None, ref=url)
        result = meta.validate(doc)
        if not result.valid():
            raise SchemaCompileError(
                "\n".join(str(e) for e in result.errors))

    # -- the keyword parser (reference schema.go:77-966) --------------------
    def _parse(self, node, cur: SubSchema) -> None:
        if cur.draft is None:
            if cur.parent is None:
                raise SchemaCompileError("Draft not set")
            cur.draft = cur.parent.draft

        if cur.draft >= Draft.D6 and isinstance(node, bool):
            cur.pass_ = node
            return

        if not isinstance(node, dict):
            raise SchemaCompileError("Expected: schema, given: Invalid JSON")

        m = node

        if cur.id is None and cur.parent is not None:
            cur.id = cur.parent.id

        if cur.draft == Draft.D4:
            key_id = "id"
        elif cur.draft == Draft.HYBRID:
            key_id = "id" if "id" in m else "$id"
        else:
            key_id = "$id"
        if key_id in m and not isinstance(m[key_id], str):
            raise SchemaCompileError(
                f"Invalid type. Expected: string, given: {key_id}")
        if isinstance(m.get(key_id), str):
            if cur.parent is None:
                cur.id = resolve_ref("", m[key_id])
            else:
                cur.id = resolve_ref(cur.parent.id or "", m[key_id])

        if "definitions" in m:
            defs = m["definitions"]
            if isinstance(defs, dict):
                for dv in defs.values():
                    if isinstance(dv, (dict, bool)):
                        child = SubSchema(property="definitions", parent=cur)
                        self._parse(dv, child)
                    else:
                        raise SchemaCompileError(
                            "Invalid type. Expected: array of schemas, given: definitions")
            elif not isinstance(defs, bool):
                raise SchemaCompileError(
                    "Invalid type. Expected: array of schemas, given: definitions")

        for key in ("title", "description"):
            if key in m and not isinstance(m[key], str):
                raise SchemaCompileError(
                    f"Invalid type. Expected: string, given: {key}")

        if "$ref" in m and not isinstance(m["$ref"], str):
            raise SchemaCompileError("Invalid type. Expected: string, given: $ref")
        if isinstance(m.get("$ref"), str):
            cur.ref = m["$ref"]  # already absolute (pool walk rewrote it)
            memo = self._reference_pool.get(cur.ref)
            if memo is not None:
                cur.ref_schema = memo
                # fall through: the reference keeps parsing siblings here
            else:
                self._parse_reference(cur)
                return  # siblings ignored on first parse of a $ref

        if "type" in m:
            t = m["type"]
            if isinstance(t, str):
                self._add_type(cur, t)
            elif isinstance(t, list):
                for ti in t:
                    if not isinstance(ti, str):
                        raise SchemaCompileError(
                            "Invalid type. Expected: string/array of strings, given: type")
                    self._add_type(cur, ti)
            else:
                raise SchemaCompileError(
                    "Invalid type. Expected: string/array of strings, given: type")

        if "properties" in m:
            props = m["properties"]
            if not isinstance(props, dict):
                raise SchemaCompileError("properties must be of type object")
            for k, v in props.items():
                child = SubSchema(property=k, parent=cur)
                cur.properties_children.append(child)
                self._parse(v, child)

        if "additionalProperties" in m:
            ap = m["additionalProperties"]
            if isinstance(ap, bool):
                cur.additional_properties = ap
            elif isinstance(ap, dict):
                child = SubSchema(property="additionalProperties", parent=cur)
                cur.additional_properties = child
                self._parse(ap, child)
            else:
                raise SchemaCompileError(
                    "Invalid type. Expected: boolean/schema, given: additionalProperties")

        if "patternProperties" in m:
            pp = m["patternProperties"]
            if not isinstance(pp, dict):
                raise SchemaCompileError(
                    "Invalid type. Expected: schema, given: patternProperties")
            for k, v in pp.items():
                try:
                    rx = compile_re2(k)
                except Exception:
                    raise SchemaCompileError(f"Invalid regex pattern '{k}'") from None
                child = SubSchema(property=k, parent=cur)
                self._parse(v, child)
                cur.pattern_properties[k] = (rx, child)

        if "propertyNames" in m and cur.draft >= Draft.D6:
            pn = m["propertyNames"]
            if isinstance(pn, (dict, bool)):
                child = SubSchema(property="propertyNames", parent=cur)
                cur.property_names = child
                self._parse(pn, child)
            else:
                raise SchemaCompileError(
                    "Invalid type. Expected: schema, given: propertyNames")

        if "dependencies" in m:
            self._parse_dependencies(m["dependencies"], cur)

        if "items" in m:
            items = m["items"]
            if isinstance(items, list):
                for el in items:
                    if isinstance(el, (dict, bool)):
                        child = SubSchema(property="items", parent=cur)
                        cur.items_children.append(child)
                        self._parse(el, child)
                    else:
                        raise SchemaCompileError(
                            "Invalid type. Expected: schema/array of schemas, given: items")
                cur.items_single = False
            elif isinstance(items, (dict, bool)):
                child = SubSchema(property="items", parent=cur)
                cur.items_children.append(child)
                self._parse(items, child)
                cur.items_single = True
            else:
                raise SchemaCompileError(
                    "Invalid type. Expected: schema/array of schemas, given: items")

        if "additionalItems" in m:
            ai = m["additionalItems"]
            if isinstance(ai, bool):
                cur.additional_items = ai
            elif isinstance(ai, dict):
                child = SubSchema(property="additionalItems", parent=cur)
                cur.additional_items = child
                self._parse(ai, child)
            else:
                raise SchemaCompileError(
                    "Invalid type. Expected: boolean/schema, given: additionalItems")

        # numbers
        if "multipleOf" in m:
            mo = _must_be_number(m["multipleOf"])
            if mo is None:
                raise SchemaCompileError(
                    "Invalid type. Expected: number, given: multipleOf")
            if mo <= 0:
                raise SchemaCompileError("multipleOf must be strictly greater than 0")
            cur.multiple_of = mo

        if "minimum" in m:
            v = _must_be_number(m["minimum"])
            if v is None:
                raise SchemaCompileError("minimum must be of a number")
            cur.minimum = v

        if "exclusiveMinimum" in m:
            self._parse_exclusive(cur, m["exclusiveMinimum"], minimum=True)

        if "maximum" in m:
            v = _must_be_number(m["maximum"])
            if v is None:
                raise SchemaCompileError("maximum must be of a number")
            cur.maximum = v

        if "exclusiveMaximum" in m:
            self._parse_exclusive(cur, m["exclusiveMaximum"], minimum=False)

        # strings
        for key, attr in (("minLength", "min_length"), ("maxLength", "max_length")):
            if key in m:
                iv = _must_be_integer(m[key])
                if iv is None:
                    raise SchemaCompileError(f"{key} must be of an integer")
                if iv < 0:
                    raise SchemaCompileError(f"{key} must be greater than or equal to 0")
                setattr(cur, attr, iv)
        if cur.min_length is not None and cur.max_length is not None:
            if cur.min_length > cur.max_length:
                raise SchemaCompileError("minLength cannot be greater than maxLength")

        if "pattern" in m:
            if not isinstance(m["pattern"], str):
                raise SchemaCompileError("pattern must be of a string")
            try:
                cur.pattern = compile_re2(m["pattern"])
            except Exception:
                raise SchemaCompileError("pattern must be a valid regex") from None
            cur.pattern_src = m["pattern"]

        if "format" in m:
            if not isinstance(m["format"], str):
                raise SchemaCompileError("format must be of type string")
            cur.format = m["format"]

        # objects
        for key, attr in (("minProperties", "min_properties"),
                          ("maxProperties", "max_properties")):
            if key in m:
                iv = _must_be_integer(m[key])
                if iv is None:
                    raise SchemaCompileError(f"{key} must be of an integer")
                if iv < 0:
                    raise SchemaCompileError(f"{key} must be greater than or equal to 0")
                setattr(cur, attr, iv)
        if (cur.min_properties is not None and cur.max_properties is not None
                and cur.min_properties > cur.max_properties):
            raise SchemaCompileError("minProperties cannot be greater than maxProperties")

        if "required" in m:
            req = m["required"]
            if not isinstance(req, list):
                raise SchemaCompileError("required must be of an array")
            for rv in req:
                if not isinstance(rv, str):
                    raise SchemaCompileError("required items must be string")
                if rv in cur.required:
                    raise SchemaCompileError("required items must be unique")
                cur.required.append(rv)

        # arrays
        for key, attr in (("minItems", "min_items"), ("maxItems", "max_items")):
            if key in m:
                iv = _must_be_integer(m[key])
                if iv is None:
                    raise SchemaCompileError(f"{key} must be of an integer")
                if iv < 0:
                    raise SchemaCompileError(f"{key} must be greater than or equal to 0")
                setattr(cur, attr, iv)

        if "uniqueItems" in m:
            if not isinstance(m["uniqueItems"], bool):
                raise SchemaCompileError("uniqueItems must be of a boolean")
            cur.unique_items = m["uniqueItems"]

        if "contains" in m and cur.draft >= Draft.D6:
            child = SubSchema(property="contains", parent=cur)
            cur.contains = child
            self._parse(m["contains"], child)

        if "const" in m and cur.draft >= Draft.D6:
            cur.const_ = canonical_json(m["const"])

        if "enum" in m:
            if not isinstance(m["enum"], list):
                raise SchemaCompileError("enum must be of an array")
            for v in m["enum"]:
                canon = canonical_json(v)
                if canon in cur.enum:
                    raise SchemaCompileError("enum items must be unique")
                cur.enum.append(canon)

        for key, bucket in (("oneOf", cur.one_of), ("anyOf", cur.any_of),
                            ("allOf", cur.all_of)):
            if key in m:
                if not isinstance(m[key], list):
                    raise SchemaCompileError(f"{key} must be of an array")
                for v in m[key]:
                    child = SubSchema(property=key, parent=cur)
                    bucket.append(child)
                    self._parse(v, child)

        if "not" in m:
            if not isinstance(m["not"], (dict, bool)):
                raise SchemaCompileError("not must be of an object")
            child = SubSchema(property="not", parent=cur)
            cur.not_ = child
            self._parse(m["not"], child)

        if cur.draft >= Draft.D7:
            for key, attr in (("if", "if_"), ("then", "then_"), ("else", "else_")):
                if key in m:
                    if not isinstance(m[key], (dict, bool)):
                        raise SchemaCompileError(f"{key} must be of an object")
                    child = SubSchema(property=key, parent=cur)
                    setattr(cur, attr, child)
                    self._parse(m[key], child)

    def _add_type(self, cur: SubSchema, t: str) -> None:
        if t not in JSON_TYPES:
            raise SchemaCompileError(
                f"has a primitive type that is NOT VALID -- given: /{t}/ "
                f"Expected valid values are:{list(JSON_TYPES)}")
        if t in cur.types:
            raise SchemaCompileError(f"{t} type is duplicated")
        cur.types.append(t)

    def _parse_exclusive(self, cur: SubSchema, value, minimum: bool) -> None:
        key = "exclusiveMinimum" if minimum else "exclusiveMaximum"
        base = "minimum" if minimum else "maximum"
        draft = cur.draft
        if draft == Draft.D4:
            if not isinstance(value, bool):
                raise SchemaCompileError(
                    f"Invalid type. Expected: boolean, given: {key}")
            bound = getattr(cur, base)
            if bound is None:
                raise SchemaCompileError(f"{key} cannot be used without {base}")
            if value:
                setattr(cur, "exclusive_minimum" if minimum else "exclusive_maximum", bound)
                setattr(cur, base, None)
        elif draft == Draft.HYBRID:
            if isinstance(value, bool):
                bound = getattr(cur, base)
                if bound is None:
                    raise SchemaCompileError(f"{key} cannot be used without {base}")
                if value:
                    setattr(cur, "exclusive_minimum" if minimum else "exclusive_maximum", bound)
                    setattr(cur, base, None)
            elif isinstance(value, Num):
                setattr(cur, "exclusive_minimum" if minimum else "exclusive_maximum", value.frac)
            else:
                raise SchemaCompileError(
                    f"Invalid type. Expected: boolean/number, given: {key}")
        else:
            if isinstance(value, Num):
                setattr(cur, "exclusive_minimum" if minimum else "exclusive_maximum", value.frac)
            else:
                raise SchemaCompileError(
                    f"Invalid type. Expected: number, given: {key}")

    def _parse_dependencies(self, node, cur: SubSchema) -> None:
        if not isinstance(node, dict):
            raise SchemaCompileError("dependencies must be of type object")
        for k, v in node.items():
            if isinstance(v, list):
                names = []
                for item in v:
                    if not isinstance(item, str):
                        raise SchemaCompileError(
                            "dependency must be of type schema or array of strings")
                    names.append(item)
                cur.dependencies[k] = names
            elif isinstance(v, (dict, bool)):
                child = SubSchema(property=k, parent=cur)
                self._parse(v, child)
                cur.dependencies[k] = child
            else:
                raise SchemaCompileError(
                    "dependency must be of type schema or array of strings")

    def _parse_reference(self, cur: SubSchema) -> None:
        """reference schema.go:968-1008 — memo registered BEFORE parsing the
        target, which is what makes circular $refs terminate."""
        new = SubSchema(property="$ref", parent=cur)
        self._reference_pool[cur.ref] = new
        document, doc_draft = self.pool.get_document(cur.ref)
        new.id = cur.ref
        new.draft = doc_draft
        if not isinstance(document, (dict, bool)):
            raise SchemaCompileError("schema must be of type object")
        self._parse(document, new)
        cur.ref_schema = new


def _as_lexical(value):
    """Convert plain Python numbers to lexical Num (for dict-literal input)."""
    if isinstance(value, bool) or value is None or isinstance(value, (str, Num)):
        return value
    if isinstance(value, int):
        return Num(str(value))
    if isinstance(value, float):
        return Num(repr(value))
    if isinstance(value, list):
        return [_as_lexical(v) for v in value]
    if isinstance(value, dict):
        return {k: _as_lexical(v) for k, v in value.items()}
    return value


def compile_schema(schema, draft=Draft.HYBRID, **kw) -> CompiledSchema:
    """One-shot convenience (reference NewSchema)."""
    return SchemaCompiler(draft=draft, **kw).compile(schema)
