"""Compound-document bundling (reference ``Schema#bundle``, schema.rb:223-270).

``bundle`` rewrites a schema with remote ``$ref``s into ONE self-contained
document per the 2020-12 "bundling" process: every externally-referenced
resource is embedded under the dialect's defs keyword, keyed and stamped
with its absolute ``$id`` (refs themselves are NOT rewritten — resolution
inside the compound document finds the embedded resources by their ``$id``).
This is how users ship schemas to offline/air-gapped validators; the
reference's suite runner asserts bundled-schema verdict equivalence for
every remote-ref case (test/json_schema_test_suite_test.rb:63-79), and
tests/test_bundle.py replays the same assertion here.

Mechanics mirrored from the reference:
- the compound root gets its absolute ``$id`` and explicit ``$schema``;
- in exclusive-``$ref`` dialects (drafts 4-7) a root-level ``$ref`` is
  hoisted into ``allOf`` so the added ``$id``/``$schema`` siblings are not
  ignored (schema.rb:236-239);
- the walk is transitive: embedded resources are scanned for THEIR remote
  refs (schema.rb:241-266).
"""

from __future__ import annotations

from typing import Any

from json_schemer_spark.schema.dialects import (
    DEPENDENCIES,
    KEYWORD_SHAPES,
    SCHEMA_LIST,
    SCHEMA_MAP,
    SCHEMA_OR_LIST,
    SCHEMA_VALUE,
    Dialect,
)
from json_schemer_spark.schema.registry import Registry, resolve_uri, split_fragment

_REF_KEYWORDS = ("$ref", "$dynamicRef", "$recursiveRef")


def _iter_subschemas(schema: Any, dialect: Dialect):
    """Yield every schema-position dict under ``schema`` (same traversal as
    Registry._walk — enum/const members are data, not schemas)."""
    if not isinstance(schema, dict):
        return
    yield schema
    for keyword, value in schema.items():
        shape = KEYWORD_SHAPES.get(keyword)
        if shape is None:
            continue
        if shape == SCHEMA_VALUE:
            yield from _iter_subschemas(value, dialect)
        elif shape == SCHEMA_LIST:
            if isinstance(value, list):
                for sub in value:
                    yield from _iter_subschemas(sub, dialect)
        elif shape == SCHEMA_MAP:
            if isinstance(value, dict):
                for sub in value.values():
                    yield from _iter_subschemas(sub, dialect)
        elif shape == SCHEMA_OR_LIST:
            if isinstance(value, list):
                for sub in value:
                    yield from _iter_subschemas(sub, dialect)
            else:
                yield from _iter_subschemas(value, dialect)
        elif shape == DEPENDENCIES:
            if isinstance(value, dict):
                for sub in value.values():
                    if not isinstance(sub, list):
                        yield from _iter_subschemas(sub, dialect)


def _ref_targets(node: dict, dialect: Dialect):
    """The ref keywords present on one schema node under ``dialect``."""
    for kw in _REF_KEYWORDS:
        val = node.get(kw)
        if not isinstance(val, str):
            continue
        if kw == "$dynamicRef" and not dialect.has_dynamic_ref:
            continue
        if kw == "$recursiveRef" and not dialect.has_recursive_ref:
            continue
        yield val


def bundle_document(registry: Registry, root_resource, value: Any) -> Any:
    """Build the compound document for ``value`` (the root schema document
    of ``root_resource``) using ``registry`` for resolution state."""
    if not isinstance(value, dict):
        return value

    dialect = root_resource.dialect
    id_kw, defs_kw = dialect.id_keyword, dialect.defs_keyword

    compound = dict(value)
    compound[id_kw] = root_resource.uri
    compound["$schema"] = dialect.uri
    existing_defs = compound.get(defs_kw)
    embedded: dict[str, Any] = dict(existing_defs) if isinstance(existing_defs, dict) else {}
    compound[defs_kw] = embedded

    # drafts 4-7: $ref ignores ALL siblings, including the $id/$schema we
    # just stamped — hoist the root $ref into allOf (schema.rb:236-239)
    if "$ref" in compound and dialect.exclusive_ref:
        all_of = list(compound.get("allOf") or [])
        all_of.append({"$ref": compound.pop("$ref")})
        compound["allOf"] = all_of

    # same-document references (including nested-$id subresources of the
    # bundling document) never embed — reference's `ref_schema == root` skip
    root_nodes = {id(n) for n in _iter_subschemas(value, dialect)}

    # transitive scan: embed every externally-referenced resource, then
    # scan the embedded resource for ITS refs
    queue: list[Any] = [value]
    scanned: set[int] = set()
    while queue:
        doc = queue.pop(0)
        if id(doc) in scanned:
            continue
        scanned.add(id(doc))
        for node in _iter_subschemas(doc, dialect):
            info = registry.info(node)
            node_dialect = info.dialect if info else dialect
            node_base = info.base_uri if info else root_resource.uri
            for ref in _ref_targets(node, node_dialect):
                absolute = resolve_uri(node_base, ref)
                ref_id = split_fragment(absolute)[0]
                if not ref_id or ref_id in embedded:
                    continue
                # force resolution (fetches remote documents into the
                # registry; raises on unresolvable refs, like the reference)
                registry.resolve_ref(ref, node_base)
                res = registry.resources.get(ref_id)
                if res is None or id(res.root) in root_nodes:
                    continue  # same-document (or anchor-only) reference
                if not isinstance(res.root, dict):
                    embedded[ref_id] = res.root  # boolean schema resource
                    continue
                embedded_resource = dict(res.root)
                embedded_resource[res.dialect.id_keyword] = ref_id
                embedded_resource["$schema"] = res.dialect.uri
                embedded[ref_id] = embedded_resource
                queue.append(res.root)

    # the reference always materializes the defs keyword on the compound
    # root, even when no resources were embedded (schema.rb:234)
    return compound
