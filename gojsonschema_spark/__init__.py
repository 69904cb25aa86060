"""gojsonschema_spark — PySpark-native JSON Schema validation engine.

A from-scratch reimplementation of the query/data-processing capabilities
of xeipuuv/gojsonschema (JSON Schema draft-4/6/7 validation) as a
Spark-first engine: schemas compile on the driver into either a DAG of
Spark SQL Column expressions (hot path) or an Arrow-batched pandas-UDF
interpreter (general path), evaluated set-at-a-time over DataFrames of
documents. Adds the dataset-level operators the single-document reference
cannot express: column stats, uniqueness, referential integrity,
distribution drift, dedup, similarity search and text analysis.
"""

from .core.compiler import Draft, SchemaCompiler, CompiledSchema, compile_schema
from .core.errors import Result, SchemaCompileError, Violation
from .core.formats import FormatRegistry, default_registry

# Self-shipping for pandas-UDF closures must engage on ANY entry into
# the package (a user importing only ops.multimodal still ships UDF
# callables to executors) — not just via the spark subpackage.
from .spark import _register_by_value as _rbv  # noqa: E402

_rbv()
del _rbv

__all__ = [
    "Draft",
    "SchemaCompiler",
    "CompiledSchema",
    "compile_schema",
    "Result",
    "SchemaCompileError",
    "Violation",
    "FormatRegistry",
    "default_registry",
]

__version__ = "0.1.0"
