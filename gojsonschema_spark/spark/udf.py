"""Arrow-batched pandas-UDF validation path (the general/fallback path).

Wraps the exact core interpreter in a vectorized pandas UDF over JSON
string columns. Used (a) for schemas the Column plan cannot express
(cyclic $refs, exact bignum arithmetic, uniqueItems on composites, RE2
dialect corners) and (b) as pass 2 of the two-pass design: elaborating
full violation rows only for documents the SQL pass flagged invalid
(SURVEY.md §4 'two-pass error elaboration').

The compiled SubSchema graph is pickled into the UDF closure once on the
driver and shipped to Python workers; all transfer is Arrow batches.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, BooleanType, MapType, StringType,
                               StructField, StructType)

from ..core.compiler import CompiledSchema
from ..core.errors import render_value
from ..core.interpreter import validate_document
from ..core.jsonvalue import Num

__all__ = ["VIOLATION_SCHEMA", "VERDICT_SCHEMA", "make_verdict_udf", "make_violations_udf"]

VIOLATION_SCHEMA = ArrayType(StructType([
    StructField("field", StringType()),
    StructField("keyword", StringType()),
    StructField("message", StringType()),
    StructField("value", StringType()),
    StructField("details", MapType(StringType(), StringType())),
]))

VERDICT_SCHEMA = StructType([
    StructField("valid", BooleanType()),
    StructField("violations", VIOLATION_SCHEMA),
])

_PARSE_FAILED = [{
    "field": "(root)",
    "keyword": "invalid_document",
    "message": "Document is not valid JSON",
    "value": None,
    "details": {},
}]


def _loads(doc: str):
    return json.loads(doc, parse_float=Num, parse_int=Num)


def _violation_rows(result) -> list[dict]:
    rows = []
    for e in result.errors:
        rows.append({
            "field": e.field_path,
            "keyword": e.error_type,
            "message": e.description(),
            "value": render_value(e.value),
            "details": {k: str(v) for k, v in e.details.items()},
        })
    return rows


def make_verdict_udf(compiled: CompiledSchema, with_violations: bool = True):
    """pandas UDF: json string -> struct(valid, violations)."""

    def run(doc: str):
        if doc is None:
            return False, _PARSE_FAILED
        try:
            instance = _loads(doc)
        except (ValueError, RecursionError):
            return False, _PARSE_FAILED
        result = validate_document(compiled, instance)
        if result.valid():
            return True, []
        return False, _violation_rows(result) if with_violations else []

    @pandas_udf(VERDICT_SCHEMA)
    def verdict(docs: pd.Series) -> pd.DataFrame:
        out_valid, out_viol = [], []
        for doc in docs:
            ok, viol = run(doc)
            out_valid.append(ok)
            out_viol.append(viol)
        return pd.DataFrame({"valid": out_valid, "violations": out_viol})

    # semantically deterministic, but marked otherwise so Catalyst never
    # DUPLICATES the eval: filters derived from downstream operators
    # (InferFiltersFromGenerate's size(violations)>0, predicate pushdown
    # through Project) would otherwise clone a second ArrowEvalPython
    # below the valid-bit filter and run Python over the whole corpus
    return verdict.asNondeterministic()


def make_violations_udf(compiled: CompiledSchema):
    """pandas UDF for pass 2: (json string, valid bit) -> violations.

    Documents already known valid skip parsing entirely, so the cost of
    this pass is proportional to the invalid subset.
    """

    def run(doc: str, valid) -> list[dict]:
        if valid:
            return []
        if doc is None:
            return _PARSE_FAILED
        try:
            instance = _loads(doc)
        except (ValueError, RecursionError):
            return _PARSE_FAILED
        result = validate_document(compiled, instance)
        return _violation_rows(result)

    @pandas_udf(VIOLATION_SCHEMA)
    def violations(docs: pd.Series, valid: pd.Series) -> pd.Series:
        return pd.Series([run(d, v) for d, v in zip(docs, valid)])

    # see make_verdict_udf: prevents Catalyst from cloning the eval node
    return violations.asNondeterministic()
