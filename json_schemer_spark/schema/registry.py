"""Schema resource registry: $id/$anchor/$dynamicAnchor resolution.

Re-implements (from scratch, driver-side, compile-time) what the reference
does with its ``Resources`` lexical/dynamic maps and lazy-but-memoized ref
resolution (lib/json_schemer/resources.rb:3-24, schema.rb:175-217,335-360,
draft202012/vocab/core.rb:36-110). All resolution happens on the driver at
plan-compile time — executors only ever see the finished closure.
"""

from __future__ import annotations

import json
import os
import urllib.parse
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from json_schemer_spark.schema.dialects import (
    DEPENDENCIES,
    DEFAULT_DIALECT,
    KEYWORD_SHAPES,
    SCHEMA_LIST,
    SCHEMA_MAP,
    SCHEMA_OR_LIST,
    SCHEMA_VALUE,
    Dialect,
    dialect_for,
)
from json_schemer_spark.schema.jsonvalue import resolve_json_pointer

DEFAULT_BASE_URI = "json-schemer-spark://schema"


def split_fragment(uri: str) -> tuple[str, Optional[str]]:
    if "#" in uri:
        base, frag = uri.split("#", 1)
        return base, frag
    return uri, None


def resolve_uri(base: str, ref: str) -> str:
    """RFC3986 reference resolution with URN tolerance."""
    if ref.startswith("#"):
        return split_fragment(base)[0] + ref
    parsed = urllib.parse.urlsplit(ref)
    if parsed.scheme:
        return ref
    if base.startswith("urn:"):
        # URNs are non-hierarchical; only same-document fragments make sense.
        return ref
    return urllib.parse.urljoin(base, ref)


@dataclass
class Resource:
    """One schema resource (a document or an embedded ``$id`` subtree)."""

    uri: str
    root: Any  # dict | bool
    dialect: Dialect
    anchors: dict[str, Any] = field(default_factory=dict)
    dynamic_anchors: dict[str, Any] = field(default_factory=dict)
    recursive_anchor: bool = False
    # document-relative pointers for anchor targets (boolean schemas have
    # no identity, so pointers cannot always be recovered from _info)
    anchor_ptrs: dict[str, str] = field(default_factory=dict)
    dynamic_anchor_ptrs: dict[str, str] = field(default_factory=dict)


@dataclass
class SchemaInfo:
    resource: "Resource"
    base_uri: str
    dialect: Dialect
    # JSON pointer of this schema within its enclosing DOCUMENT (the
    # add_document root) — the reference's classic output addresses error
    # schema locations this way (schema.rb:272-283)
    pointer: str = ""


class Registry:
    """All resources reachable from a root schema document.

    Remote refs resolve through ``ref_resolver(uri) -> parsed JSON`` —
    memoized, driver-side only (mirrors cached_resolver.rb:3-16 semantics).
    """

    def __init__(
        self,
        ref_resolver: Optional[Callable[[str], Any]] = None,
        default_dialect: Dialect = DEFAULT_DIALECT,
    ) -> None:
        self.resources: dict[str, Resource] = {}
        self._info: dict[int, SchemaInfo] = {}
        self._ref_resolver = ref_resolver
        self._default_dialect = default_dialect
        self._fetched: set[str] = set()
        # keep refs to documents so id()-keyed info stays valid
        self._pins: list[Any] = []

    # -- construction ---------------------------------------------------

    def add_document(
        self,
        document: Any,
        base_uri: str = DEFAULT_BASE_URI,
        dialect: Optional[Dialect] = None,
    ) -> Resource:
        self._pins.append(document)
        if isinstance(document, dict) and isinstance(document.get("$schema"), str):
            dialect = self._dialect_for_uri(document["$schema"], dialect or self._default_dialect)
        dialect = dialect or self._default_dialect

        base_uri = split_fragment(base_uri)[0]
        if isinstance(document, dict):
            declared = document.get(dialect.id_keyword)
            if isinstance(declared, str) and not declared.startswith("#"):
                base_uri = split_fragment(resolve_uri(base_uri, declared))[0]

        resource = Resource(uri=base_uri, root=document, dialect=dialect)
        self.resources[base_uri] = resource
        self._walk(document, resource, base_uri, dialect, "")
        return resource

    def _register_subresource(
        self, schema: dict, uri: str, dialect: Dialect
    ) -> Resource:
        resource = Resource(uri=uri, root=schema, dialect=dialect)
        self.resources[uri] = resource
        return resource

    def _walk(self, schema: Any, resource: Resource, base_uri: str, dialect: Dialect, pointer: str) -> None:
        if isinstance(schema, bool):
            return
        if not isinstance(schema, dict):
            return

        if isinstance(schema.get("$schema"), str):
            dialect = self._dialect_for_uri(schema["$schema"], dialect)

        declared = schema.get(dialect.id_keyword)
        # drafts 4-7: ALL siblings of $ref are ignored, including an id that
        # would rebind the base URI (suite: "$ref prevents a sibling id from
        # changing the base uri"; reference schema.rb:384-395)
        if dialect.exclusive_ref and isinstance(schema.get("$ref"), str):
            declared = None
        if isinstance(declared, str):
            if declared.startswith("#") and dialect.plain_name_fragment_ids:
                if len(declared) > 1:
                    resource.anchors[declared[1:]] = schema
            else:
                new_uri = split_fragment(resolve_uri(base_uri, declared))[0]
                if schema is not resource.root:
                    resource = self._register_subresource(schema, new_uri, dialect)
                base_uri = new_uri

        anchor = schema.get("$anchor")
        if dialect.has_dollar_anchor and isinstance(anchor, str):
            resource.anchors[anchor] = schema
            resource.anchor_ptrs[anchor] = pointer

        dyn = schema.get("$dynamicAnchor")
        if dialect.has_dynamic_ref and isinstance(dyn, str):
            resource.dynamic_anchors[dyn] = schema
            resource.dynamic_anchor_ptrs[dyn] = pointer
            resource.anchors.setdefault(dyn, schema)
            resource.anchor_ptrs.setdefault(dyn, pointer)

        if (
            dialect.has_recursive_ref
            and schema.get("$recursiveAnchor") is True
            and schema is resource.root
        ):
            resource.recursive_anchor = True

        self._info[id(schema)] = SchemaInfo(
            resource=resource, base_uri=base_uri, dialect=dialect, pointer=pointer
        )

        def esc(token: str) -> str:
            return token.replace("~", "~0").replace("/", "~1")

        for keyword, value in schema.items():
            shape = KEYWORD_SHAPES.get(keyword)
            if shape is None:
                continue
            kp = f"{pointer}/{esc(keyword)}"
            if shape == SCHEMA_VALUE:
                self._walk(value, resource, base_uri, dialect, kp)
            elif shape == SCHEMA_LIST:
                if isinstance(value, list):
                    for i, sub in enumerate(value):
                        self._walk(sub, resource, base_uri, dialect, f"{kp}/{i}")
            elif shape == SCHEMA_MAP:
                if isinstance(value, dict):
                    for key, sub in value.items():
                        self._walk(sub, resource, base_uri, dialect, f"{kp}/{esc(key)}")
            elif shape == SCHEMA_OR_LIST:
                if isinstance(value, list):
                    for i, sub in enumerate(value):
                        self._walk(sub, resource, base_uri, dialect, f"{kp}/{i}")
                else:
                    self._walk(value, resource, base_uri, dialect, kp)
            elif shape == DEPENDENCIES:
                if isinstance(value, dict):
                    for key, sub in value.items():
                        if not isinstance(sub, list):
                            self._walk(sub, resource, base_uri, dialect, f"{kp}/{esc(key)}")

    def _dialect_for_uri(self, schema_uri: str, fallback: Dialect) -> Dialect:
        """Known draft URI → its Dialect; custom meta-schema URI → fetch it
        and derive keyword gating from its ``$vocabulary`` declaration."""
        from json_schemer_spark.schema.dialects import DIALECTS_BY_URI

        known = DIALECTS_BY_URI.get(schema_uri) or DIALECTS_BY_URI.get(schema_uri.rstrip("#"))
        if known is not None:
            return known
        if self._ref_resolver is None:
            return fallback
        cache_key = f"__dialect__{schema_uri}"
        meta = self._ref_resolver(split_fragment(schema_uri)[0])
        if isinstance(meta, dict) and isinstance(meta.get("$vocabulary"), dict):
            import dataclasses

            base = fallback
            if isinstance(meta.get("$schema"), str):
                base = DIALECTS_BY_URI.get(meta["$schema"], fallback)
            vocabs = frozenset(
                uri.rstrip("/").rsplit("/", 1)[-1] for uri in meta["$vocabulary"]
            )
            return dataclasses.replace(base, enabled_vocabs=vocabs)
        return fallback

    # -- lookup -----------------------------------------------------------

    def info(self, schema: Any) -> Optional[SchemaInfo]:
        return self._info.get(id(schema))

    def resolve_ref(self, ref: str, base_uri: str) -> tuple[Any, Resource]:
        """Resolve a ``$ref`` URI → (schema value, owning resource)."""
        target, resource, _ptr = self.resolve_ref_with_pointer(ref, base_uri)
        return target, resource

    def resolve_ref_with_pointer(
        self, ref: str, base_uri: str
    ) -> tuple[Any, Resource, Optional[str]]:
        """→ (schema value, owning resource, document-relative pointer).

        Pointer is resolvable even for boolean targets (which carry no
        object identity for the _info map)."""
        absolute = resolve_uri(base_uri, ref)
        res_uri, fragment = split_fragment(absolute)
        resource = self.resources.get(res_uri)
        if resource is None:
            resource = self._fetch(res_uri)
        if resource is None:
            raise KeyError(f"unresolvable $ref: {absolute!r} (base {base_uri!r})")

        root_info = self._info.get(id(resource.root))
        root_ptr = root_info.pointer if root_info else ""
        if not fragment:
            return resource.root, resource, root_ptr
        fragment = urllib.parse.unquote(fragment)
        if fragment.startswith("/"):
            target = resolve_json_pointer(resource.root, fragment)
            info = self._info.get(id(target))
            owner = info.resource if info else resource
            ptr = info.pointer if info else f"{root_ptr}{fragment}"
            return target, owner, ptr
        if fragment in resource.anchors:
            target = resource.anchors[fragment]
            info = self._info.get(id(target))
            ptr = info.pointer if info else resource.anchor_ptrs.get(fragment)
            return target, (info.resource if info else resource), ptr
        raise KeyError(f"anchor {fragment!r} not found in {res_uri!r}")

    def _fetch(self, uri: str) -> Optional[Resource]:
        if uri in self._fetched or self._ref_resolver is None:
            return self.resources.get(uri)
        self._fetched.add(uri)
        document = self._ref_resolver(uri)
        if document is None:
            return None
        # the fetched document may declare its own $id different from `uri`
        resource = self.add_document(document, base_uri=uri)
        self.resources.setdefault(uri, resource)
        return self.resources.get(uri)


def file_ref_resolver(root_dir: str, url_prefix: str) -> Callable[[str], Any]:
    """Map ``url_prefix``-rooted URIs to JSON files under ``root_dir``
    (used to replay the vendored JSON-Schema-Test-Suite remotes, the same
    way the reference's suite runner maps localhost:1234)."""

    def resolve(uri: str) -> Any:
        if not uri.startswith(url_prefix):
            return None
        rel = uri[len(url_prefix) :].lstrip("/")
        path = os.path.join(root_dir, rel)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    return resolve
