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


def _document_schemer(version: int) -> CompiledSchema:
    """Validator FOR OpenAPI documents of the given version, compiled from
    the embedded official document schemas (reference openapi.rb:10-15,
    openapi{30,31}/document.rb). Formats assert (the reference's default).

    Known divergence (documented): the reference additionally rebinds
    embedded Schema objects to a document-declared ``jsonSchemaDialect``
    meta-schema (openapi31/document.rb SCHEMA_BASE); here documents
    validate against the PLAIN official schema."""
    got = _DOC_SCHEMERS.get(version)
    if got is None:
        from json_schemer_spark.schema.dialects import DRAFT4, DRAFT202012
        from json_schemer_spark.schema.metaschemas import METASCHEMAS
        from json_schemer_spark.schema.oas_documents import (
            OAS30_DOCUMENT_SCHEMA,
            OAS31_DOCUMENT_SCHEMA,
        )

        def resolver(uri: str):
            return METASCHEMAS.get(uri) or METASCHEMAS.get(uri.rstrip("#"))

        if version == 30:
            got = CompiledSchema(
                OAS30_DOCUMENT_SCHEMA, dialect=DRAFT4, assert_formats=True,
                base_uri="https://spec.openapis.org/oas/3.0/schema/2021-09-28",
                ref_resolver=resolver,
            )
        else:
            got = CompiledSchema(
                OAS31_DOCUMENT_SCHEMA, dialect=DRAFT202012, assert_formats=True,
                base_uri="https://spec.openapis.org/oas/3.1/schema/2022-10-07",
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
        self._opts = dict(
            ref_resolver=ref_resolver, assert_formats=assert_formats,
            formats=formats, keywords=keywords,
        )
        self._cache: dict[str, OpenAPISchema] = {}

    def valid(self) -> bool:
        """Is the OpenAPI DOCUMENT itself valid? (reference OpenAPI#valid?)"""
        return _document_schemer(self.dialect.openapi).valid_value(self.document)

    def validate(self, output_format: str = "classic") -> Any:
        """Document self-validation errors (reference OpenAPI#validate)."""
        return _document_schemer(self.dialect.openapi).validate_value(
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


def openapi(document: Any, **opts) -> OpenAPIDocument:
    """Compile an OpenAPI 3.0/3.1 document (reference: JSONSchemer.openapi)."""
    return OpenAPIDocument(document, **opts)
