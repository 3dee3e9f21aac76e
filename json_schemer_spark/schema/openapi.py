"""OpenAPI 3.0 / 3.1 document support.

Mirrors the reference's ``JSONSchemer.openapi(document)`` surface
(lib/json_schemer.rb, openapi{30,31}/document.rb): a compiled OpenAPI
document exposes its ``components/schemas`` entries as validators, with
``$ref``/``discriminator`` resolution happening against the WHOLE document.

Dialects: 3.1 schemas are the 2020-12 dialect + the OAS base vocabulary
(``discriminator`` — openapi31/meta.rb, vocab/base.rb); 3.0 schemas are
draft4-based + ``nullable`` + ``discriminator`` (openapi30/meta.rb,
vocab/base.rb).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

from json_schemer_spark.schema import compiler as compiler_mod
from json_schemer_spark.schema.compiler import CompiledSchema
from json_schemer_spark.schema.dialects import OPENAPI30, OPENAPI31, Dialect
from json_schemer_spark.schema.interpreter import Evaluator
from json_schemer_spark.schema.jsonvalue import resolve_json_pointer
from json_schemer_spark.schema.registry import Registry

OPENAPI_BASE_URI = "json-schemer-spark://openapi"


def _esc(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


def _document_dialect(document: dict) -> Dialect:
    version = str(document.get("openapi", "3.1"))
    return OPENAPI30 if version.startswith("3.0") else OPENAPI31


def build_document_evaluator(
    document: dict,
    pointer: str,
    dialect: Dialect,
    ref_resolver: Optional[Callable[[str], Any]] = None,
    assert_formats: bool = False,
    formats: Optional[dict] = None,
    keywords: Optional[dict] = None,
) -> Evaluator:
    """Evaluator for the schema at ``pointer`` within an OpenAPI document.

    The registry indexes the whole document (so ``#/components/schemas/...``
    refs and discriminator dispatch resolve) plus every components/schemas
    subtree (so nested ``$id``/``$anchor`` register)."""
    registry = Registry(ref_resolver=ref_resolver, default_dialect=dialect)
    resource = registry.add_document(document, base_uri=OPENAPI_BASE_URI, dialect=dialect)
    schemas = (document.get("components") or {}).get("schemas") or {}
    if isinstance(schemas, dict):
        for name, sub in schemas.items():
            registry._walk(sub, resource, resource.uri, dialect,
                           f"/components/schemas/{_esc(name)}")
    target = resolve_json_pointer(document, pointer) if pointer else document
    if isinstance(target, dict) and registry.info(target) is None:
        registry._walk(target, resource, resource.uri, dialect, pointer)
    return Evaluator(
        target,
        registry=registry,
        dialect=dialect,
        assert_formats=assert_formats,
        formats=formats,
        keywords=keywords,
    )


class OpenAPISchema(CompiledSchema):
    """CompiledSchema whose evaluator is rooted at a pointer inside an
    OpenAPI document (refs resolve document-wide)."""

    def __init__(
        self,
        document: dict,
        pointer: str,
        dialect: Dialect,
        ref_resolver: Optional[Callable[[str], Any]] = None,
        assert_formats: bool = False,
        formats: Optional[dict] = None,
        keywords: Optional[dict] = None,
    ) -> None:
        self.document = document
        self.pointer = pointer
        self.schema = resolve_json_pointer(document, pointer) if pointer else document
        self.assert_formats = assert_formats
        self.formats = formats
        self.keywords = keywords
        self._ext_opts: dict = {}
        self._evaluator = build_document_evaluator(
            document, pointer, dialect,
            ref_resolver=ref_resolver, assert_formats=assert_formats,
            formats=formats, keywords=keywords,
        )
        self.dialect = self._evaluator.root_resource.dialect
        self._prepared = compiler_mod._UNSET  # memoized prepare() (see base)

    def _evaluator_factory(self):
        document_json = json.dumps(self.document)
        pointer = self.pointer
        dialect_name = self.dialect.name
        assert_formats = self.assert_formats
        formats = self.formats
        keywords = self.keywords

        def build() -> Evaluator:
            from json_schemer_spark.schema.dialects import DIALECTS_BY_NAME
            from json_schemer_spark.schema.openapi import build_document_evaluator as _b

            return _b(
                json.loads(document_json), pointer,
                DIALECTS_BY_NAME[dialect_name],
                assert_formats=assert_formats, formats=formats, keywords=keywords,
            )

        return build


_DOC_SCHEMERS: dict[int, CompiledSchema] = {}

# http://json-schema.org/blog/posts/validating-openapi-and-json-schema —
# the dialect list the reference supports for jsonSchemaDialect / $schema
# re-validation of embedded schema objects (openapi31/document.rb DIALECTS)
OAS31_DIALECT_URIS = (
    "https://spec.openapis.org/oas/3.1/dialect/base",
    "https://json-schema.org/draft/2020-12/schema",
    "https://json-schema.org/draft/2019-09/schema",
    "http://json-schema.org/draft-07/schema#",
    "http://json-schema.org/draft-06/schema#",
    "http://json-schema.org/draft-04/schema#",
)

_SCHEMA_BASE_URI = "json-schemer-spark://openapi31/schema-base"


def _oas31_dialect_meta() -> dict:
    """The OAS 3.1 base dialect meta-schema (reference openapi31/meta.rb:
    28-36): 2020-12 ∧ the OAS base vocabulary."""
    return {
        "$id": "https://spec.openapis.org/oas/3.1/dialect/base",
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$dynamicAnchor": "meta",
        "allOf": [
            {"$ref": "https://json-schema.org/draft/2020-12/schema"},
            {"$ref": "https://spec.openapis.org/oas/3.1/meta/base"},
        ],
    }


def _dialect_wrap(dialect_uri: str, idx: int) -> dict:
    """openapi31/document.rb ``dialect_schema``: wraps the official OAS 3.1
    document schema in a resource whose ``$defs/schema`` OVERRIDES the
    document schema's ``$dynamicAnchor: meta`` — every embedded schema
    object re-validates under its ``$schema``-declared dialect, defaulting
    to ``dialect_uri`` (the document's jsonSchemaDialect)."""
    others = [d for d in OAS31_DIALECT_URIS if d != dialect_uri]
    return {
        "$id": f"json-schemer-spark://openapi31/dialect-wrap/{idx}",
        "$ref": "https://spec.openapis.org/oas/3.1/schema/2022-10-07",
        "$defs": {
            "schema": {
                "$dynamicAnchor": "meta",
                "properties": {
                    "$schema": {"$ref": f"{_SCHEMA_BASE_URI}#/$defs/dialect"},
                },
                "allOf": [
                    # no $schema (the `if` passes vacuously) -> the default
                    # dialect's meta applies; an explicit $schema dispatches
                    # to that dialect's meta instead
                    {"if": {"properties": {"$schema": {"const": dialect_uri}}},
                     "then": {"$ref": dialect_uri}},
                    *[
                        {"if": {"type": "object", "required": ["$schema"],
                                "properties": {"$schema": {"const": other}}},
                         "then": {"$ref": other}}
                        for other in others
                    ],
                ],
            }
        },
    }


def _oas31_schema_base() -> dict:
    """openapi31/document.rb SCHEMA_BASE: dispatch on the document-level
    ``jsonSchemaDialect`` (defaulting to the OAS base dialect) into the
    matching :func:`_dialect_wrap` resource."""
    default, *others = OAS31_DIALECT_URIS
    return {
        "$id": _SCHEMA_BASE_URI,
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$defs": {"dialect": {"enum": list(OAS31_DIALECT_URIS)}},
        "properties": {"jsonSchemaDialect": {"$ref": "#/$defs/dialect"}},
        "allOf": [
            {"if": {"properties": {"jsonSchemaDialect": {"const": default}}},
             "then": _dialect_wrap(default, 0)},
            *[
                {"if": {"type": "object", "required": ["jsonSchemaDialect"],
                        "properties": {"jsonSchemaDialect": {"const": other}}},
                 "then": _dialect_wrap(other, i + 1)}
                for i, other in enumerate(others)
            ],
        ],
    }


def _document_schemer(version: int) -> CompiledSchema:
    """Validator FOR OpenAPI documents of the given version (reference
    openapi.rb:10-15, openapi{30,31}/document.rb). Formats assert (the
    reference's default). 3.1 documents validate against the reference's
    SCHEMA_BASE wrapper (round-3 review divergence, closed in round 4):
    embedded schema objects re-validate under the document-declared
    ``jsonSchemaDialect`` / per-object ``$schema`` via dynamic-anchor
    override."""
    got = _DOC_SCHEMERS.get(version)
    if got is None:
        from json_schemer_spark.schema.dialects import DRAFT4, DRAFT202012
        from json_schemer_spark.schema.metaschemas import METASCHEMAS
        from json_schemer_spark.schema.oas_documents import (
            OAS30_DOCUMENT_SCHEMA,
            OAS31_DOCUMENT_SCHEMA,
            OAS31_META_BASE,
        )

        def resolver(uri: str):
            bare = uri.rstrip("#")
            if bare == "https://spec.openapis.org/oas/3.1/schema/2022-10-07":
                return OAS31_DOCUMENT_SCHEMA
            if bare == "https://spec.openapis.org/oas/3.1/dialect/base":
                return _oas31_dialect_meta()
            if bare.startswith("https://spec.openapis.org/oas/3.1/meta/base"):
                return OAS31_META_BASE
            return METASCHEMAS.get(uri) or METASCHEMAS.get(bare)

        if version == 30:
            got = CompiledSchema(
                OAS30_DOCUMENT_SCHEMA, dialect=DRAFT4, assert_formats=True,
                base_uri="https://spec.openapis.org/oas/3.0/schema/2021-09-28",
                ref_resolver=resolver,
            )
        else:
            got = CompiledSchema(
                _oas31_schema_base(), dialect=DRAFT202012, assert_formats=True,
                base_uri=_SCHEMA_BASE_URI,
                ref_resolver=resolver,
            )
        _DOC_SCHEMERS[version] = got
    return got


class OpenAPIDocument:
    """Compiled OpenAPI document — ``schema(name)`` / ``ref(pointer)`` return
    validators; ``valid()`` / ``validate()`` self-validate the document
    against the official OAS document schema (reference openapi.rb:22-28)."""

    def __init__(
        self,
        document: dict,
        ref_resolver: Optional[Callable[[str], Any]] = None,
        # the reference asserts formats by default for OpenAPI documents
        # (openapi meta FORMATS; open_api_test.rb int32 expectations)
        assert_formats: bool = True,
        formats: Optional[dict] = None,
        keywords: Optional[dict] = None,
    ) -> None:
        if isinstance(document, str):
            document = json.loads(document)
        self.document = document
        self.dialect = _document_dialect(document)
        self._version = self.dialect.openapi
        # OAS 3.1: a document-level jsonSchemaDialect sets the DEFAULT
        # dialect for components/schemas entries (reference openapi.rb:11 —
        # meta_schema = document.fetch('jsonSchemaDialect') { OAS 3.1 base };
        # unknown dialects raise, open_api_test.rb
        # test_unsupported_json_schema_dialect)
        jsd = document.get("jsonSchemaDialect") if self._version == 31 else None
        if jsd is not None:
            from json_schemer_spark.schema.dialects import DIALECTS_BY_URI
            from json_schemer_spark.schema.interpreter import SchemaCompileError

            got = DIALECTS_BY_URI.get(jsd) or DIALECTS_BY_URI.get(str(jsd).rstrip("#"))
            if got is None:
                raise SchemaCompileError(f"unknown jsonSchemaDialect {jsd!r}")
            self.dialect = got
        self._opts = dict(
            ref_resolver=ref_resolver, assert_formats=assert_formats,
            formats=formats, keywords=keywords,
        )
        self._cache: dict[str, OpenAPISchema] = {}

    def valid(self) -> bool:
        """Is the OpenAPI DOCUMENT itself valid? (reference OpenAPI#valid?)"""
        return _document_schemer(self._version).valid_value(self.document)

    def validate(self, output_format: str = "classic") -> Any:
        """Document self-validation errors (reference OpenAPI#validate)."""
        return _document_schemer(self._version).validate_value(
            self.document, output_format=output_format)

    def schema(self, name: Optional[str] = None) -> OpenAPISchema:
        pointer = f"/components/schemas/{_esc(name)}" if name is not None else ""
        return self.ref(pointer)

    def ref(self, pointer: str) -> OpenAPISchema:
        pointer = pointer.lstrip("#")
        got = self._cache.get(pointer)
        if got is None:
            got = OpenAPISchema(self.document, pointer, self.dialect, **self._opts)
            self._cache[pointer] = got
        return got


def openapi30_document() -> CompiledSchema:
    """Parity with ``JSONSchemer.openapi30_document``
    (reference `lib/json_schemer.rb:227-233`): the memoized compiled
    validator for OpenAPI 3.0 documents themselves (the embedded official
    OAS 3.0 document schema + its ref resolver)."""
    return _document_schemer(30)


def openapi31_document() -> CompiledSchema:
    """Parity with ``JSONSchemer.openapi31_document``
    (reference `lib/json_schemer.rb:219-225`): the memoized compiled
    validator for OpenAPI 3.1 documents (SCHEMA_BASE + dialect metas)."""
    return _document_schemer(31)


def openapi(document: Any, **opts) -> OpenAPIDocument:
    """Compile an OpenAPI 3.0/3.1 document (reference: JSONSchemer.openapi)."""
    return OpenAPIDocument(document, **opts)
