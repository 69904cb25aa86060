"""Column-level format predicates for the SQL fast path.

Regex-expressible formats compile to pure ``rlike``/date expressions
(JVM-side, codegen). Parser-backed formats (email/uri/ip/...) become ONE
Arrow-batched pandas UDF wrapping the exact checker from core.formats —
usable in the plan wherever a Python UDF is legal (i.e. not inside
higher-order-function lambdas; the plan compiler enforces that).

Returns (pred, is_sql) from :func:`format_column_pred`; pred is None for
formats with no column implementation (-> whole-schema UDF fallback).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

from ..core import formats as core_formats

__all__ = ["format_column_pred"]

_FRAC = r"(?:\.\d+)?"
_ZONE = r"(?:Z|[+-]\d{2}:\d{2})"
_DATE_RX = r"^\d{4}-\d{2}-\d{2}\z"
_TIME_CORE = r"\d{1,2}:\d{2}:\d{2}"

_HOSTNAME_RX = (
    r"^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])"
    r"(\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]))*\z"
)
_UUID_RX = r"(?i)^[a-f0-9]{8}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{12}\z"
_JSON_PTR_RX = r"^(?:/(?:[^~/]|~0|~1)*)*\z"
_REL_JSON_PTR_RX = r"^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~/]|~0|~1)*)*)\z"
_IPV4_RX = r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\z"


def _hms_ok(prefix: Column) -> Column:
    h = F.split(prefix, ":").getItem(0).cast("int")
    mi = F.split(prefix, ":").getItem(1).cast("int")
    s = F.regexp_extract(prefix, r"^\d{1,2}:\d{2}:(\d{2})", 1).cast("int")
    return (h <= 23) & (mi <= 59) & (s <= 59)


def _date_ok(s: Column) -> Column:
    # strict shape + real calendar date (try_to_date validates ranges)
    return s.rlike(_DATE_RX) & F.try_to_date(s, "yyyy-MM-dd").isNotNull()


def _time_ok(s: Column) -> Column:
    shape = s.rlike(f"^{_TIME_CORE}{_FRAC}{_ZONE}\\z") | s.rlike(
        f"^{_TIME_CORE}{_FRAC}\\z")
    return shape & _hms_ok(s)


def _datetime_ok(s: Column) -> Column:
    dt_shape = s.rlike(r"^\d{4}-\d{2}-\d{2}T\d{1,2}:\d{2}:\d{2}" + _FRAC + _ZONE + r"\z")
    date_part = F.substring(s, 1, 10)
    time_part = F.regexp_extract(s, r"T(\d{1,2}:\d{2}:\d{2})", 1)
    full = dt_shape & _date_ok(date_part) & _hms_ok(time_part)
    return full | _time_ok(s) | _date_ok(s)


_UDF_CACHE: dict = {}


def _udf_for(name: str):
    """Deferred Arrow-batched checker UDF: created (and cached) on first
    application, so plan compilation needs no SparkSession."""
    checker = core_formats.default_registry._checkers[name]

    def pred(s: Column) -> Column:
        udf = _UDF_CACHE.get(name)
        if udf is None:
            @pandas_udf("boolean")
            def check(col: pd.Series) -> pd.Series:
                return col.map(lambda x: True if x is None else checker(x))

            udf = _UDF_CACHE[name] = check
        return udf(s)

    return pred


_SQL_PREDS = {
    "date": _date_ok,
    "time": _time_ok,
    "date-time": _datetime_ok,
    "hostname": lambda s: s.rlike(_HOSTNAME_RX) & (F.length(s) < 256),
    "uuid": lambda s: s.rlike(_UUID_RX),
    "json-pointer": lambda s: s.rlike(_JSON_PTR_RX),
    "relative-json-pointer": lambda s: s.rlike(_REL_JSON_PTR_RX),
    "ipv4": lambda s: s.rlike(_IPV4_RX),
}

# parser-backed formats: exact checker via one Arrow-batched pandas UDF
_UDF_FORMATS = {
    "email", "idn-email", "ipv6", "uri", "uri-reference", "iri",
    "iri-reference", "uri-template", "regex",
}


def format_column_pred(name: str):
    if name in _SQL_PREDS:
        return _SQL_PREDS[name], True
    if name in _UDF_FORMATS:
        return _udf_for(name), False
    # unknown formats always pass (reference format_checkers.go:182-185)
    return (lambda s: F.lit(True)), True
