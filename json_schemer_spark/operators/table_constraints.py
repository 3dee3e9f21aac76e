"""Typed-table constraint validation: JSON Schema keywords over columns.

The corpus path validates JSON documents in a string column; this operator
applies the same keyword semantics to a *typed* DataFrame, treating each row
as an object whose properties are the columns (the reference's instance
model mapped onto relational rows — SURVEY.md §1.3). Everything lowers to
Column predicates; one projection, no shuffle, no Python.

Keyword → predicate mapping (type-guarded vacuous pass, as in
draft202012/vocab/validation.rb):
- required          → NOT NULL          (reference validation.rb:243-266)
- type              → static column-type check at compile time
- minimum/maximum/… → numeric compare    (validation.rb:95-133)
- minLength/maxLength/pattern → length/rlike (validation.rb:135-167)
- enum/const        → isin / ==          (validation.rb:65-83)
- multipleOf        → decimal modulo     (validation.rb:85-93)
"""

from __future__ import annotations

from typing import Any, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

VIOLATION_STRUCT = "struct<keyword:string,instance_pointer:string,schema_pointer:string,message:string>"

_NUMERIC_SPARK = {"int", "bigint", "smallint", "tinyint", "double", "float"}


def _is_numeric_type(dt: str) -> bool:
    return dt in _NUMERIC_SPARK or dt.startswith("decimal")


class TableConstraints:
    """Compiled constraint plan over a typed table."""

    def __init__(self, schema: dict) -> None:
        self.schema = schema
        self.properties: dict[str, dict] = schema.get("properties", {})
        self.required: list[str] = schema.get("required", [])

    def _checks(self, df: DataFrame) -> list[tuple[Any, str, str, str]]:
        """→ [(fail_cond, keyword, pointer, message)] for this DataFrame."""
        dtypes = dict(df.dtypes)
        checks: list[tuple[Any, str, str, str]] = []

        for key in self.required:
            if key not in dtypes:
                checks.append((F.lit(True), "required", f"/{key}", f"column {key} absent"))
            else:
                checks.append(
                    (F.col(key).isNull(), "required", f"/{key}", f"{key} is null")
                )

        for key, spec in self.properties.items():
            if key not in dtypes:
                continue
            dt = dtypes[key]
            col = F.col(key)
            ptr = f"/{key}"
            sptr = f"/properties/{key}"
            numeric = _is_numeric_type(dt)
            stringy = dt == "string"

            ty = spec.get("type")
            if ty is not None:
                allowed = ty if isinstance(ty, list) else [ty]
                ok = (
                    ("number" in allowed and numeric)
                    or ("integer" in allowed and (dt in {"int", "bigint", "smallint", "tinyint"}))
                    or ("string" in allowed and stringy)
                    or ("boolean" in allowed and dt == "boolean")
                    or ("array" in allowed and dt.startswith("array"))
                    or ("object" in allowed and (dt.startswith("struct") or dt.startswith("map")))
                )
                if not ok and not ("integer" in allowed and numeric):
                    # static type mismatch: every non-null value violates
                    checks.append(
                        (col.isNotNull(), "type", ptr, f"{key}: column type {dt} != {allowed}")
                    )
                elif "integer" in allowed and numeric and dt not in {"int", "bigint", "smallint", "tinyint"}:
                    checks.append(
                        (col.isNotNull() & (col != F.floor(col)), "type", ptr,
                         f"{key} is not an integer")
                    )

            if numeric:
                if "minimum" in spec:
                    checks.append((col < spec["minimum"], "minimum", ptr,
                                   f"{key} below minimum {spec['minimum']}"))
                if "maximum" in spec:
                    checks.append((col > spec["maximum"], "maximum", ptr,
                                   f"{key} above maximum {spec['maximum']}"))
                if "exclusiveMinimum" in spec and isinstance(spec["exclusiveMinimum"], (int, float)):
                    checks.append((col <= spec["exclusiveMinimum"], "exclusiveMinimum", ptr,
                                   f"{key} not > {spec['exclusiveMinimum']}"))
                if "exclusiveMaximum" in spec and isinstance(spec["exclusiveMaximum"], (int, float)):
                    checks.append((col >= spec["exclusiveMaximum"], "exclusiveMaximum", ptr,
                                   f"{key} not < {spec['exclusiveMaximum']}"))
                if "multipleOf" in spec:
                    div = spec["multipleOf"]
                    checks.append(
                        (col.cast("decimal(38,12)") % F.lit(div).cast("decimal(38,12)") != 0,
                         "multipleOf", ptr, f"{key} not a multiple of {div}"))

            if stringy:
                if "minLength" in spec:
                    checks.append((F.length(col) < spec["minLength"], "minLength", ptr,
                                   f"{key} shorter than {spec['minLength']}"))
                if "maxLength" in spec:
                    checks.append((F.length(col) > spec["maxLength"], "maxLength", ptr,
                                   f"{key} longer than {spec['maxLength']}"))
                if "pattern" in spec:
                    checks.append((~col.rlike(spec["pattern"]), "pattern", ptr,
                                   f"{key} does not match {spec['pattern']!r}"))

            if "enum" in spec:
                checks.append((~col.isin(list(spec["enum"])), "enum", ptr,
                               f"{key} not in enumeration"))
            if "const" in spec:
                checks.append((col != F.lit(spec["const"]), "const", ptr,
                               f"{key} != const"))

            if dt.startswith("array"):
                if "minItems" in spec:
                    checks.append((F.size(col) < spec["minItems"], "minItems", ptr,
                                   f"{key} has fewer than {spec['minItems']} items"))
                if "maxItems" in spec:
                    checks.append((F.size(col) > spec["maxItems"], "maxItems", ptr,
                                   f"{key} has more than {spec['maxItems']} items"))
                if spec.get("uniqueItems") is True:
                    checks.append((F.size(col) != F.size(F.array_distinct(col)),
                                   "uniqueItems", ptr, f"{key} items not unique"))

        return checks

    def validate(self, df: DataFrame) -> DataFrame:
        """df + ``valid: boolean`` + ``violations: array<struct>``."""
        checks = self._checks(df)
        structs = [
            F.when(
                F.coalesce(cond, F.lit(False)),
                F.struct(
                    F.lit(kw).alias("keyword"),
                    F.lit(ptr).alias("instance_pointer"),
                    F.lit(f"{sp_prefix(ptr, kw)}").alias("schema_pointer"),
                    F.lit(msg).alias("message"),
                ),
            )
            for cond, kw, ptr, msg in checks
        ]
        if not structs:
            return df.withColumn("valid", F.lit(True)).withColumn(
                "violations", F.array().cast(f"array<{VIOLATION_STRUCT}>")
            )
        violations = F.filter(F.array(*structs), lambda x: x.isNotNull())
        return df.withColumn("violations", violations).withColumn(
            "valid", F.size("violations") == 0
        )

    def verdict(self, df: DataFrame) -> Any:
        """Just the boolean Column (flag output — result.rb:111-113)."""
        checks = self._checks(df)
        fail = None
        for cond, *_ in checks:
            c = F.coalesce(cond, F.lit(False))
            fail = c if fail is None else (fail | c)
        return ~fail if fail is not None else F.lit(True)

    def violations_flat(self, df: DataFrame, id_cols: list[str]) -> DataFrame:
        """Classic output: one row per violation (result.rb:162-179 shape)."""
        out = self.validate(df)
        return (
            out.filter(~F.col("valid"))
            .select(*id_cols, F.explode("violations").alias("v"))
            .select(
                *id_cols,
                F.col("v.keyword").alias("keyword"),
                F.col("v.instance_pointer").alias("instance_pointer"),
                F.col("v.message").alias("message"),
            )
        )


def sp_prefix(ptr: str, kw: str) -> str:
    """Classic convention: schema_pointer addresses the schema object."""
    if kw == "required":
        return ""
    return f"/properties{ptr}"
