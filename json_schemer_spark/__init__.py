"""json_schemer_spark — a PySpark-native schema + constraint validation engine.

A from-scratch rebuild of the capabilities of davishmcclurg/json_schemer
(JSON Schema drafts 4/6/7/2019-09/2020-12) as a compiled-constraint plan
over Spark DataFrames:

- ``compile_schema(schema)`` — compile a JSON Schema document (driver-side)
  into a :class:`CompiledSchema` plan.
- ``CompiledSchema.validate_json_column(df, col)`` — batch-validate a JSON
  string column; returns verdict + violations columns. Structurally-lowerable
  schemas run as pure Column expressions (JVM-side, whole-stage codegen);
  the general case runs as an Arrow-batched ``mapInPandas`` interpreter.
- Table-level validators (``operators/``): per-column stats, uniqueness,
  referential anti-joins, distribution drift, dedup, similarity, text ops.

Reference semantics: /root/reference (davishmcclurg/json_schemer). This is
NOT a port — see SURVEY.md for the mapping.
"""

from json_schemer_spark.schema.compiler import (
    CompiledSchema,
    compile_schema,
    valid_schema,
    validate_schema,
)
from json_schemer_spark.schema.dialects import (
    DRAFT4,
    DRAFT6,
    DRAFT7,
    DRAFT201909,
    DRAFT202012,
    OPENAPI30,
    OPENAPI31,
)
from json_schemer_spark.schema.openapi import (
    OpenAPIDocument,
    openapi,
    openapi30_document,
    openapi31_document,
)
from json_schemer_spark.schema.infer import (
    infer_schema,
    json_pointer_profile,
    profile_drift,
)
from json_schemer_spark.errors import pretty, pretty_errors_column
from json_schemer_spark.configuration import Configuration, configuration, configure, configured

__all__ = [
    "compile_schema",
    "valid_schema",
    "validate_schema",
    "CompiledSchema",
    "infer_schema",
    "json_pointer_profile",
    "profile_drift",
    "pretty",
    "Configuration",
    "configuration",
    "configure",
    "configured",
    "pretty_errors_column",
    "openapi",
    "openapi30_document",
    "openapi31_document",
    "OpenAPIDocument",
    "DRAFT4",
    "DRAFT6",
    "DRAFT7",
    "DRAFT201909",
    "DRAFT202012",
    "OPENAPI30",
    "OPENAPI31",
]

__version__ = "0.1.0"
