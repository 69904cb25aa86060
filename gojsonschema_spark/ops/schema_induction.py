"""JSON Schema induction — infer a draft-07 schema FROM a corpus of
JSON documents, the reverse direction of the validation engine (and the
tool that bootstraps it: induce on yesterday's crawl, validate today's
against the result, alert on drift).

Two layers:

* :func:`json_field_profile` — **distributed**: one Arrow-batched pass
  over the documents emitting a row per JSON node visit, aggregated to
  per-(path, type) occurrence counts + numeric/string bounds. The
  corpus is scanned exactly once; every aggregate after the emit is
  PATH-sized (thousands of rows at web scale, vs 10^12 documents).
  The walker is Python by necessity — arbitrary nesting is not
  expressible as native columns — but Arrow-batched and typically run
  on a sample (``sample_fraction``).
* :func:`induce_schema` — **driver-side**: collects the (bounded,
  ``max_paths``-guarded) profile plus a bounded enum-candidate table
  and assembles a draft-07 schema dict: union types, ``required`` from
  exact presence arithmetic (child occurrences == parent OBJECT
  occurrences — correct under arrays of objects, where "per document"
  counting is wrong), min/max bounds for numbers, min/maxLength for
  strings, ``enum`` for low-cardinality scalar paths, recursive
  ``items`` / ``properties``.

Type naming matches the engine's gojsonschema semantics
(core/jsonvalue.py; reference validation.go:560-607): a float with
zero fraction profiles as **integer** — so an induced ``"type":
"integer"`` accepts the same documents the engine later validates.

Round-trip contract (pinned in tests and the driver oracle): the
induced schema VALIDATES every document it was induced from.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

__all__ = ["json_field_profile", "json_field_enums", "induce_schema",
           "profile_diff"]

_LONG = "\x00LONG"           # enum-killing sentinel for oversized scalars
_PROFILE_SCHEMA = ("steps array<string>, path string, jtype string, "
                   "strlen bigint, num double, val string")
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _render_step(parent: str, step: str) -> str:
    if step == "*":
        return parent + "[*]"
    key = step[1:]
    if _IDENT.match(key):
        return f"{parent}.{key}"
    return f"{parent}['{key}']"


def _jtype(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "integer" if v.is_integer() else "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _walk(value, steps: tuple, path: str, out: list,
          max_enum_repr: int) -> None:
    t = _jtype(value)
    strlen = num = rep = None
    if t == "string":
        strlen = len(value)
    elif t in ("integer", "number"):
        try:
            num = float(value)
        except OverflowError:
            num = None
    if t not in ("array", "object"):
        rep = json.dumps(value, ensure_ascii=False)
        if len(rep) > max_enum_repr:
            rep = _LONG
    out.append((list(steps), path, t, strlen, num, rep))
    if t == "array":
        for item in value:
            _walk(item, steps + ("*",), path + "[*]", out, max_enum_repr)
    elif t == "object":
        for k, v in value.items():
            _walk(v, steps + ("." + k,), _render_step(path, "." + k),
                  out, max_enum_repr)


def _node_rows(df: DataFrame, json_col: str, sample_fraction: float | None,
               on_invalid: str, max_enum_repr: int = 64) -> DataFrame:
    """The shared emit stage: one row per JSON node visit."""
    import pandas as pd

    if on_invalid not in ("skip", "error"):
        raise ValueError("on_invalid must be 'skip' or 'error'")
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=7)
    docs = df.select(F.col(json_col).alias("doc"))

    def _emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list = []
            for doc in pdf["doc"]:
                if doc is None:
                    continue
                try:
                    value = json.loads(doc)
                except (ValueError, RecursionError) as e:
                    if on_invalid == "error":
                        raise ValueError(f"invalid JSON document: {e}")
                    continue
                try:
                    _walk(value, (), "$", rows, max_enum_repr)
                except RecursionError:
                    if on_invalid == "error":
                        raise
                    continue
            yield pd.DataFrame(
                rows, columns=["steps", "path", "jtype", "strlen",
                               "num", "val"])

    return docs.mapInPandas(_emit, _PROFILE_SCHEMA)


def json_field_profile(df: DataFrame, json_col: str,
                       sample_fraction: float | None = None,
                       on_invalid: str = "skip") -> DataFrame:
    """Per-(path, type) field profile of a JSON column: ``(steps, path,
    jtype, n, min_num, max_num, min_len, max_len)``. ``n`` counts node
    OCCURRENCES (an array element path counts once per element), which
    is what the required-ness arithmetic needs. ``steps`` is the
    machine-parseable path (object keys prefixed ``.``, array items
    ``*``); ``path`` the display form (``$.meta.len``, ``$.tags[*]``).
    Invalid-JSON documents are skipped (``on_invalid='error'`` raises).
    """
    rows = _node_rows(df, json_col, sample_fraction, on_invalid)
    return (rows.groupBy("steps", "path", "jtype")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("num").alias("min_num"),
                 F.max("num").alias("max_num"),
                 F.min("strlen").alias("min_len"),
                 F.max("strlen").alias("max_len")))


def json_field_enums(df: DataFrame, json_col: str, max_enum: int = 16,
                     sample_fraction: float | None = None,
                     on_invalid: str = "skip") -> DataFrame:
    """Low-cardinality scalar paths and their exact value sets:
    ``(path, vals array<string>)`` (JSON-encoded scalars) for every
    path with at most ``max_enum`` distinct scalar values. Bounded by
    construction: values aggregate to (path, val) COUNTS first
    (vocabulary-sized shuffle), the per-path collect_set only ever sees
    paths already proven small — the unbounded-collect_list trap from
    dedup's r2 bucket bug never arises. Oversized scalar reprs profile
    as a sentinel that kills the enum (a path with a 10 KB value is
    not an enum candidate)."""
    rows = _node_rows(df, json_col, sample_fraction, on_invalid)
    vals = (rows.filter(F.col("val").isNotNull())
            .groupBy("path", "val").agg(F.count(F.lit(1)).alias("c")))
    small = (vals.groupBy("path").agg(F.count(F.lit(1)).alias("d"))
             .filter(F.col("d") <= max_enum).select("path"))
    return (vals.join(small, "path", "left_semi")
            .groupBy("path").agg(F.collect_set("val").alias("vals")))


def _scalar_constraints(node: dict, types: set) -> dict:
    out: dict = {}
    nums = [node[t] for t in ("integer", "number") if t in node]
    if ("integer" in types or "number" in types) and \
            not types - {"integer", "number", "null"}:
        mins = [s["min_num"] for s in nums if s["min_num"] is not None]
        maxs = [s["max_num"] for s in nums if s["max_num"] is not None]
        if mins:
            lo, hi = min(mins), max(maxs)
            out["minimum"] = int(lo) if float(lo).is_integer() else lo
            out["maximum"] = int(hi) if float(hi).is_integer() else hi
    if "string" in types and not types - {"string", "null"}:
        s = node["string"]
        if s["min_len"] is not None:
            out["minLength"] = int(s["min_len"])
            out["maxLength"] = int(s["max_len"])
    return out


def induce_schema(df: DataFrame, json_col: str, *,
                  max_enum: int = 16, max_paths: int = 10_000,
                  sample_fraction: float | None = None,
                  bounds: bool = True, enums: bool = True,
                  on_invalid: str = "skip") -> dict:
    """Induce a draft-07 schema from a corpus of JSON documents
    (EAGER — runs the profile jobs and collects path-sized results).

    Guarantee: every document that contributed to the profile validates
    against the induced schema (types are unions of what was seen,
    bounds/enums cover all observed values, ``required`` lists only
    always-present members). ``bounds=False`` / ``enums=False`` induce
    a looser structural schema (types + required only) for corpora
    where tomorrow's values legitimately exceed today's ranges.
    ``max_paths`` guards the driver collect — a corpus of pathological
    key diversity (maps keyed by user id) raises instead of OOMing the
    driver; profile those columns with :func:`json_field_profile`
    directly."""
    prof = json_field_profile(df, json_col, sample_fraction, on_invalid) \
        .limit(max_paths + 1).collect()
    if len(prof) > max_paths:
        raise ValueError(
            f"more than max_paths={max_paths} (path, type) rows — key "
            "diversity too high to induce a closed schema; raise "
            "max_paths or profile with json_field_profile directly")
    if not prof:
        raise ValueError("no JSON nodes profiled (empty or all-invalid "
                         "corpus)")

    enum_vals: dict[str, list] = {}
    if enums:
        for r in json_field_enums(df, json_col, max_enum,
                                  sample_fraction, on_invalid).collect():
            if _LONG not in r.vals:
                enum_vals[r.path] = sorted(
                    (json.loads(v) for v in r.vals),
                    key=lambda v: (str(type(v)), str(v)))

    # nodes[steps] = {jtype: stats-row-dict}; children[steps] = set(step)
    nodes: dict[tuple, dict] = {}
    children: dict[tuple, set] = {}
    paths: dict[tuple, str] = {}
    for r in prof:
        steps = tuple(r.steps)
        nodes.setdefault(steps, {})[r.jtype] = {
            "n": r.n, "min_num": r.min_num, "max_num": r.max_num,
            "min_len": r.min_len, "max_len": r.max_len}
        paths[steps] = r.path
        if steps:
            children.setdefault(steps[:-1], set()).add(steps[-1])

    def build(steps: tuple) -> dict:
        node = nodes[steps]
        types = set(node)
        if "number" in types:
            types.discard("integer")     # number covers integer
        schema: dict = {}
        tl = sorted(types)
        schema["type"] = tl[0] if len(tl) == 1 else tl
        if "object" in types:
            kids = sorted(k for k in children.get(steps, ())
                          if k != "*")
            if kids:
                schema["properties"] = {
                    k[1:]: build(steps + (k,)) for k in kids}
                n_obj = node["object"]["n"]
                req = [k[1:] for k in kids
                       if sum(s["n"] for s in
                              nodes[steps + (k,)].values()) == n_obj]
                if req:
                    schema["required"] = req
        if "array" in types and "*" in children.get(steps, ()):
            schema["items"] = build(steps + ("*",))
        if bounds:
            schema.update(_scalar_constraints(node, set(node)))
        path = paths[steps]
        if enums and path in enum_vals and \
                not set(node) - {"string", "integer", "number",
                                 "boolean", "null"}:
            schema["enum"] = enum_vals[path]
        return schema

    root = build(())
    root["$schema"] = "http://json-schema.org/draft-07/schema#"
    return root


def profile_diff(old_prof: DataFrame, new_prof: DataFrame) -> DataFrame:
    """Schema drift between two field profiles (both outputs of
    :func:`json_field_profile`, e.g. yesterday's crawl vs today's):
    one row per path with

    * ``status`` — ``added`` / ``removed`` / ``type_changed`` (observed
      type sets differ) / ``bounds_widened`` (new values outside the
      old numeric/length envelope — documents that would FAIL a schema
      induced from the old crawl with ``bounds=True``) / ``unchanged``
    * ``old_types`` / ``new_types`` — CSV of observed types (CSV, not
      array: the driver-side result hashers can't sort array columns)
    * ``n_old`` / ``n_new`` — total occurrences.

    Both profiles roll up to path grain first (path-sized), then one
    full-outer join on path — nothing here scales with the corpus, only
    with the path vocabulary. This is the alerting table: feed
    ``status != 'unchanged'`` to the crawl-health dashboard next to
    ops/incremental.crawl_diff_summary."""
    def _rollup(prof: DataFrame, tag: str) -> DataFrame:
        return prof.groupBy("path").agg(
            F.array_join(F.array_sort(F.collect_set("jtype")), ",")
            .alias(f"{tag}_types"),
            F.min("min_num").alias(f"{tag}_min_num"),
            F.max("max_num").alias(f"{tag}_max_num"),
            F.min("min_len").alias(f"{tag}_min_len"),
            F.max("max_len").alias(f"{tag}_max_len"),
            F.sum("n").alias(f"n_{tag}"))

    o = _rollup(old_prof, "old")
    n = _rollup(new_prof, "new")
    j = o.join(n, "path", "full_outer")
    # comparisons against NULL bounds yield NULL -> when() falls through
    widened = ((F.col("new_min_num") < F.col("old_min_num")) |
               (F.col("new_max_num") > F.col("old_max_num")) |
               (F.col("new_min_len") < F.col("old_min_len")) |
               (F.col("new_max_len") > F.col("old_max_len")))
    status = (F.when(F.col("old_types").isNull(), F.lit("added"))
              .when(F.col("new_types").isNull(), F.lit("removed"))
              .when(F.col("old_types") != F.col("new_types"),
                    F.lit("type_changed"))
              .when(widened, F.lit("bounds_widened"))
              .otherwise(F.lit("unchanged")))
    return j.select(
        "path", status.alias("status"),
        F.coalesce("old_types", F.lit("")).alias("old_types"),
        F.coalesce("new_types", F.lit("")).alias("new_types"),
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"))
