"""Dialect registry: drafts 4/6/7/2019-09/2020-12 (+ OpenAPI 3.x later).

Mirrors the reference's per-draft vocabularies
(lib/json_schemer/draft202012/vocab.rb:6-102 and the draft7/6/4 deltas at
lib/json_schemer/draft{7,6,4}/vocab.rb) as *behavior flags* plus a map of
which keyword values are schema positions — needed to walk a document for
``$id``/``$anchor`` registration without treating e.g. ``enum`` members or
``const`` values as schemas (a classic suite trap).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class Dialect:
    name: str
    uri: str
    # draft4: 1.0 is NOT an integer (draft4/vocab/validation.rb:6-10)
    strict_integer: bool = False
    # drafts <= 7: `$ref` ignores sibling keywords (schema.rb:384-395)
    exclusive_ref: bool = False
    # keyword spellings / presence
    id_keyword: str = "$id"
    defs_keyword: str = "$defs"           # "definitions" for drafts <= 7
    has_dollar_anchor: bool = False          # $anchor (2019+)
    has_dynamic_ref: bool = False            # $dynamicRef/$dynamicAnchor (2020-12)
    has_recursive_ref: bool = False          # $recursiveRef/$recursiveAnchor (2019-09)
    has_prefix_items: bool = False           # 2020-12 prefixItems/items split
    array_form_items: bool = True            # items may be an array (<= 2019-09)
    has_contains: bool = True                # draft4 lacks contains
    has_min_max_contains: bool = False       # 2019+
    has_dependent_keywords: bool = False     # dependentRequired/dependentSchemas (2019+)
    has_legacy_dependencies: bool = True     # dependencies (<= 7; 2019-09 keeps it too)
    has_if_then_else: bool = False           # draft7+
    has_unevaluated: bool = False            # 2019+
    has_property_names: bool = True          # draft6+
    has_const: bool = True                   # draft6+
    boolean_exclusive_bounds: bool = False   # draft4 exclusiveMaximum: true form
    plain_name_fragment_ids: bool = True     # "#foo" fragments in id (<= 7)
    content_assertion: bool = False          # draft7: content* keywords assert
    # OpenAPI dialect level: 0 = plain JSON Schema, 30 = OAS 3.0, 31 = OAS 3.1.
    # 30 ⇒ `nullable` extends `type` (openapi30/vocab/base.rb:6-14);
    # any non-zero ⇒ `discriminator` dispatch (openapi31/vocab/base.rb:36-123)
    # and the OAS format set (int32/int64/float/double/password/byte/binary).
    openapi: int = 0
    # $vocabulary-derived keyword gating (None = all vocabularies active);
    # members are vocabulary URI tail segments, e.g. "validation".
    enabled_vocabs: Optional[frozenset] = None

    def vocab_enabled(self, name: str) -> bool:
        return self.enabled_vocabs is None or name in self.enabled_vocabs


DRAFT202012 = Dialect(
    name="draft2020-12",
    uri="https://json-schema.org/draft/2020-12/schema",
    has_dollar_anchor=True,
    has_dynamic_ref=True,
    has_prefix_items=True,
    array_form_items=False,
    has_min_max_contains=True,
    has_dependent_keywords=True,
    # removed from the spec but honored for compatibility (the suite's
    # optional/dependencies-compatibility.json expects it; the reference
    # keeps it too)
    has_legacy_dependencies=True,
    has_if_then_else=True,
    has_unevaluated=True,
    plain_name_fragment_ids=False,
)

DRAFT201909 = Dialect(
    name="draft2019-09",
    uri="https://json-schema.org/draft/2019-09/schema",
    has_dollar_anchor=True,
    has_recursive_ref=True,
    has_min_max_contains=True,
    has_dependent_keywords=True,
    has_legacy_dependencies=True,
    has_if_then_else=True,
    has_unevaluated=True,
    plain_name_fragment_ids=False,
)

DRAFT7 = Dialect(
    name="draft7",
    uri="http://json-schema.org/draft-07/schema#",
    exclusive_ref=True,
    defs_keyword="definitions",
    has_if_then_else=True,
    content_assertion=True,
)

DRAFT6 = Dialect(
    name="draft6",
    uri="http://json-schema.org/draft-06/schema#",
    exclusive_ref=True,
    defs_keyword="definitions",
)

DRAFT4 = Dialect(
    name="draft4",
    uri="http://json-schema.org/draft-04/schema#",
    strict_integer=True,
    defs_keyword="definitions",
    exclusive_ref=True,
    id_keyword="id",
    has_contains=False,
    has_property_names=False,
    has_const=False,
    boolean_exclusive_bounds=True,
)

# OpenAPI 3.1: the 2020-12 dialect + OAS base vocabulary (discriminator)
# — reference openapi31/meta.rb:14-38, openapi31/vocab.rb:6-16
OPENAPI31 = Dialect(
    name="openapi31",
    uri="https://spec.openapis.org/oas/3.1/dialect/base",
    has_dollar_anchor=True,
    has_dynamic_ref=True,
    has_prefix_items=True,
    array_form_items=False,
    has_min_max_contains=True,
    has_dependent_keywords=True,
    has_legacy_dependencies=True,
    has_if_then_else=True,
    has_unevaluated=True,
    plain_name_fragment_ids=False,
    openapi=31,
)

# OpenAPI 3.0: draft4-based schema object + nullable + discriminator
# — reference openapi30/meta.rb:15-25, openapi30/vocab/base.rb:6-14
OPENAPI30 = Dialect(
    name="openapi30",
    uri="json-schemer://openapi30/schema",
    strict_integer=True,
    defs_keyword="definitions",
    exclusive_ref=True,
    id_keyword="id",
    has_contains=False,
    has_property_names=False,
    has_const=False,
    boolean_exclusive_bounds=True,
    openapi=30,
)

_ALL = (DRAFT202012, DRAFT201909, DRAFT7, DRAFT6, DRAFT4, OPENAPI31, OPENAPI30)

DIALECTS_BY_URI: dict[str, Dialect] = {}
for _d in _ALL:
    DIALECTS_BY_URI[_d.uri] = _d
    DIALECTS_BY_URI[_d.uri.rstrip("#")] = _d
    DIALECTS_BY_URI[_d.uri.rstrip("#") + "#"] = _d

DIALECTS_BY_NAME = {d.name: d for d in _ALL}

DEFAULT_DIALECT = DRAFT202012


def dialect_for(schema_uri: str | None, default: Dialect = DEFAULT_DIALECT) -> Dialect:
    if not schema_uri:
        return default
    return DIALECTS_BY_URI.get(schema_uri, DIALECTS_BY_URI.get(schema_uri.rstrip("#"), default))


# --- schema-position shapes (for the $id registry walker) -------------------
# value kinds: "schema" | "schema_map" | "schema_list" | "schema_or_list"
#              | "dependencies" (map of schema-or-string-array)

SCHEMA_VALUE = "schema"
SCHEMA_MAP = "schema_map"
SCHEMA_LIST = "schema_list"
SCHEMA_OR_LIST = "schema_or_list"
DEPENDENCIES = "dependencies"

KEYWORD_SHAPES: dict[str, str] = {
    "additionalProperties": SCHEMA_VALUE,
    "additionalItems": SCHEMA_VALUE,
    "unevaluatedItems": SCHEMA_VALUE,
    "unevaluatedProperties": SCHEMA_VALUE,
    "propertyNames": SCHEMA_VALUE,
    "contains": SCHEMA_VALUE,
    "if": SCHEMA_VALUE,
    "then": SCHEMA_VALUE,
    "else": SCHEMA_VALUE,
    "not": SCHEMA_VALUE,
    "contentSchema": SCHEMA_VALUE,
    "items": SCHEMA_OR_LIST,
    "prefixItems": SCHEMA_LIST,
    "allOf": SCHEMA_LIST,
    "anyOf": SCHEMA_LIST,
    "oneOf": SCHEMA_LIST,
    "properties": SCHEMA_MAP,
    "patternProperties": SCHEMA_MAP,
    "dependentSchemas": SCHEMA_MAP,
    "$defs": SCHEMA_MAP,
    "definitions": SCHEMA_MAP,
    "dependencies": DEPENDENCIES,
}

# Keywords whose values must NEVER be walked as schemas.
NON_SCHEMA_KEYWORDS = frozenset(
    {"enum", "const", "default", "examples", "$comment", "title", "description"}
)
