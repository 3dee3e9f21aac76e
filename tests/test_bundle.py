"""Compound-document bundling (reference schema.rb:223-270).

Replays the suite's bundling assertion (test/json_schema_test_suite_test.rb:
63-79): for every ref-heavy suite schema, `bundle()` must produce a
SELF-CONTAINED document (no remote fetches allowed) that yields identical
verdicts on every test case and is itself a valid schema document.
"""

import json
import os

import pytest

from json_schemer_spark import compile_schema
from json_schemer_spark.schema.dialects import DIALECTS_BY_NAME
from json_schemer_spark.schema.interpreter import Evaluator
from json_schemer_spark.schema.registry import Registry
from json_schemer_spark.schema.suite import (
    SUITE_ROOT,
    _metaschema_resolver,
    _remotes_resolver,
    iter_cases,
)

# every file exercising $ref/$id/anchor machinery, where bundling can break
REF_FILES = {
    "ref.json", "refRemote.json", "anchor.json", "id.json",
    "dynamicRef.json", "recursiveRef.json", "defs.json",
    "infinite-loop-detection.json",
}


def _strict_resolver():
    """Resolver for the BUNDLED schema: meta-schemas only — any other fetch
    means the compound document was not self-contained."""
    meta = _metaschema_resolver()

    def resolve(uri: str):
        doc = meta(uri)
        if doc is None:
            raise AssertionError(f"bundled schema fetched remote {uri!r}")
        return doc

    return resolve


@pytest.mark.parametrize(
    "draft", ["draft4", "draft6", "draft7", "draft2019-09", "draft2020-12"]
)
def test_bundled_schema_equivalence(draft):
    dialect = DIALECTS_BY_NAME[draft]
    by_schema: dict[int, tuple] = {}
    for c in iter_cases(draft):
        if c.file in REF_FILES:
            by_schema.setdefault(id(c.schema), (c.schema, []))[1].append(c)
    assert by_schema, "no ref-file cases found"

    n_schemas = 0
    for schema, cases in by_schema.values():
        plan = compile_schema(
            schema, dialect=dialect, ref_resolver=_remotes_resolver()
        )
        # original must already pass its cases (sanity)
        bundled = plan.bundle()
        n_schemas += 1
        if isinstance(schema, dict):
            assert bundled["$schema"] == dialect.uri
            assert dialect.id_keyword in bundled
        ev = Evaluator(
            bundled,
            registry=Registry(
                ref_resolver=_strict_resolver(), default_dialect=dialect
            ),
            dialect=dialect,
        )
        for c in cases:
            got = ev.valid(c.data)
            assert got == c.valid, (
                f"{draft} {c.file} [{c.group}] {c.description}: "
                f"bundled verdict {got} != {c.valid}\n{json.dumps(bundled)[:400]}"
            )
        # the compound document is itself a valid schema document
        bundled_plan = compile_schema(bundled, dialect=dialect,
                                      ref_resolver=_strict_resolver())
        assert bundled_plan.valid_schema(), json.dumps(bundled)[:400]
    assert n_schemas >= 20  # the walk actually covered the ref files


def test_bundle_embeds_remote_resources_with_ids():
    remote = {"type": "integer", "minimum": 3}
    docs = {"https://example.com/remote.json": remote}
    plan = compile_schema(
        {"$ref": "https://example.com/remote.json"},
        ref_resolver=docs.get,
    )
    bundled = plan.bundle()
    assert bundled["$schema"] == "https://json-schema.org/draft/2020-12/schema"
    emb = bundled["$defs"]["https://example.com/remote.json"]
    assert emb["$id"] == "https://example.com/remote.json"
    assert emb["$schema"] == "https://json-schema.org/draft/2020-12/schema"
    assert emb["minimum"] == 3
    # self-contained: validates with no resolver at all
    p2 = compile_schema(bundled)
    assert p2.valid_value(5) and not p2.valid_value(2) and not p2.valid_value("x")


def test_bundle_hoists_exclusive_root_ref():
    """Drafts 4-7: a root-level $ref would ignore the stamped $id/$schema
    siblings — it must move into allOf (schema.rb:236-239)."""
    from json_schemer_spark import DRAFT7

    remote = {"type": "string"}
    plan = compile_schema(
        {"$ref": "https://example.com/s.json"},
        dialect=DRAFT7,
        ref_resolver={"https://example.com/s.json": remote}.get,
    )
    bundled = plan.bundle()
    assert "$ref" not in bundled
    assert {"$ref": "https://example.com/s.json"} in bundled["allOf"]
    assert bundled["definitions"]["https://example.com/s.json"]["type"] == "string"
    p2 = compile_schema(bundled, dialect=DRAFT7)
    assert p2.valid_value("ok") and not p2.valid_value(1)


def test_bundle_transitive_remote_refs():
    """A remote that itself references another remote: both embed."""
    docs = {
        "https://example.com/a.json": {"$ref": "b.json"},
        "https://example.com/b.json": {"const": 42},
    }
    plan = compile_schema(
        {"$ref": "https://example.com/a.json"}, ref_resolver=docs.get
    )
    bundled = plan.bundle()
    assert set(bundled["$defs"]) == {
        "https://example.com/a.json", "https://example.com/b.json"
    }
    p2 = compile_schema(bundled)
    assert p2.valid_value(42) and not p2.valid_value(41)
