"""Verbose / detailed output trees (reference result.rb:136-160).

Three nets:
1. FULL-suite differential — the tree evaluator's root verdict must equal
   the compiled flat evaluator's verdict on every conformance case.
2. Structural validity — emitted verbose trees validate against the
   suite's official output schema (output-tests/draft2020-12/output-schema
   #/$defs/verbose), using this engine itself as the validator.
3. Shape fixtures — hand-derived verbose/detailed shapes for the pruning
   semantics (single-matching-child collapse, mismatched-branch drop).
"""

import json

import pytest

from json_schemer_spark import compile_schema
from json_schemer_spark.schema.interpreter import Evaluator
from json_schemer_spark.schema.output_tree import TreeEvaluator, detailed
from json_schemer_spark.schema.suite import SUITE_ROOT, iter_cases, make_evaluator


@pytest.mark.parametrize(
    "draft", ["draft4", "draft6", "draft7", "draft2019-09", "draft2020-12"]
)
def test_tree_verdicts_match_flat_evaluator(draft):
    eval_cache: dict[int, Evaluator] = {}
    n = 0
    for case in iter_cases(draft):
        ev = eval_cache.get(id(case.schema))
        if ev is None:
            ev = eval_cache[id(case.schema)] = make_evaluator(case.schema, draft)
        flat = ev.valid(case.data)
        tree = TreeEvaluator(ev).tree(case.data)
        assert tree["valid"] == flat == case.valid, (
            f"{draft} {case.file} [{case.group}] {case.description}: "
            f"tree={tree['valid']} flat={flat} expected={case.valid}"
        )
        n += 1
    assert n > 500


def _output_schema_plan():
    with open(f"{SUITE_ROOT}/output-tests/draft2020-12/output-schema.json") as f:
        doc = json.load(f)
    return compile_schema({"$ref": "https://json-schema.org/draft/2020-12/output/schema#/$defs/verbose"},
                          ref_resolver=lambda uri: doc if "output/schema" in uri else None)


def test_verbose_trees_validate_against_official_output_schema():
    checker = _output_schema_plan()
    n_checked = 0
    for case in iter_cases("draft2020-12"):
        if case.file not in ("type.json", "required.json", "allOf.json",
                             "anyOf.json", "oneOf.json", "ref.json",
                             "unevaluatedProperties.json", "not.json"):
            continue
        ev = make_evaluator(case.schema, "draft2020-12")
        tree = TreeEvaluator(ev).tree(case.data)
        errs = checker.validate_value(tree)
        assert not errs, (
            f"{case.file} [{case.group}] {case.description}: "
            f"{errs[:2]}\n{json.dumps(tree)[:400]}"
        )
        # the detailed projection must satisfy the output schema too
        errs2 = checker.validate_value(detailed(tree))
        assert not errs2, f"{case.file}: detailed failed output schema"
        n_checked += 1
    assert n_checked > 100


def test_verbose_tree_shape():
    plan = compile_schema({
        "type": "object",
        "properties": {"n": {"type": "integer", "minimum": 5}},
    })
    out = plan.validate_value({"n": 3}, output_format="verbose")
    assert out["valid"] is False
    assert out["keywordLocation"] == "" and out["instanceLocation"] == ""
    units = out["errors"]  # invalid node → nested under "errors"
    kws = [u["keywordLocation"] for u in units]
    assert kws == ["/type", "/properties"]
    type_u, props_u = units
    assert type_u["valid"] is True  # it IS an object
    assert props_u["valid"] is False
    (child,) = props_u["errors"]
    assert child["keywordLocation"] == "/properties/n"
    assert child["instanceLocation"] == "/n"
    assert child["absoluteKeywordLocation"].endswith("#/properties/n")
    nested_kws = {u["keywordLocation"]: u for u in child["errors"]}
    assert nested_kws["/properties/n/type"]["valid"] is True
    assert nested_kws["/properties/n/minimum"]["valid"] is False
    assert "error" in nested_kws["/properties/n/minimum"]

    # valid instance → tree nests under "annotations", no "error" fields
    ok = plan.validate_value({"n": 7}, output_format="verbose")
    assert ok["valid"] is True
    assert "errors" not in ok and "annotations" in ok


def test_detailed_collapses_single_matching_child():
    """result.rb:142-144: exactly one validity-matching nested result →
    the node is REPLACED by that child's detailed output."""
    plan = compile_schema({
        "properties": {"a": {"properties": {"b": {"type": "integer"}}}},
    })
    out = plan.validate_value({"a": {"b": "x"}}, output_format="detailed")
    # root → properties → /a → properties → /a/b → type: every level has
    # exactly one failing child, so detailed collapses to the leaf
    assert out["valid"] is False
    assert out["keywordLocation"] == "/properties/a/properties/b/type"
    assert out["instanceLocation"] == "/a/b"
    assert "errors" not in out and "error" in out


def test_detailed_keeps_multiple_matching_children():
    plan = compile_schema({
        "type": "object",
        "required": ["x"],
        "properties": {"n": {"type": "integer"}},
    })
    out = plan.validate_value({"n": "s"}, output_format="detailed")
    assert out["valid"] is False
    kws = sorted(u["keywordLocation"] for u in out["errors"])
    # two independent failures survive as siblings; each collapsed to its leaf
    assert kws == ["/properties/n/type", "/required"]


def test_detailed_through_ref_keeps_dynamic_location():
    plan = compile_schema({
        "$ref": "#/$defs/pos",
        "$defs": {"pos": {"type": "integer", "minimum": 1}},
    })
    out = plan.validate_value(0, output_format="detailed")
    assert out["valid"] is False
    # dynamic path goes through /$ref; absolute location is the lexical one
    assert out["keywordLocation"] == "/$ref/minimum"
    assert out["absoluteKeywordLocation"].endswith("#/$defs/pos/minimum")


def test_verbose_exclusive_ref_drafts():
    from json_schemer_spark import DRAFT7

    plan = compile_schema(
        {"$ref": "#/definitions/t", "definitions": {"t": {"type": "string"}}},
        dialect=DRAFT7,
    )
    out = plan.validate_value(1, output_format="verbose")
    assert out["valid"] is False
    (ref_u,) = out["errors"]
    assert ref_u["keywordLocation"] == "/$ref"


def _find(unit, kloc):
    """Depth-first unit lookup by keywordLocation."""
    if unit.get("keywordLocation") == kloc:
        return unit
    for key in ("errors", "annotations"):
        for child in unit.get(key) or []:
            got = _find(child, kloc)
            if got is not None:
                return got
    return None


def _child_klocs(unit):
    return sorted(
        c["keywordLocation"]
        for key in ("errors", "annotations")
        for c in unit.get(key) or []
    )


def test_verbose_not_adopts_subschema_results():
    """Reference Not (applicator.rb:73-76) passes the SUBSCHEMA's nested
    results as its own — the subschema unit itself never surfaces
    (round-3 review divergence, closed in round 4)."""
    from json_schemer_spark import compile_schema

    tree = compile_schema({"not": {"type": "integer"}}).validate_value(3, "verbose")
    assert not tree["valid"]
    not_unit = _find(tree, "/not")
    assert not_unit is not None and not not_unit["valid"]
    # children are the subschema's KEYWORD units (/not/type), with no
    # intermediate /not schema unit
    assert _child_klocs(not_unit) == ["/not/type"]


def test_verbose_if_annotation_and_adoption():
    """Reference If (applicator.rb:84-87): valid unit, annotation = the
    condition verdict, subschema results adopted."""
    from json_schemer_spark import compile_schema

    plan = compile_schema({"if": {"type": "integer"}, "then": {"minimum": 5}})
    tree = plan.validate_value(3, "verbose")
    if_unit = _find(tree, "/if")
    assert if_unit["valid"] is True and if_unit["annotation"] is True
    assert _child_klocs(if_unit) == ["/if/type"]
    then_unit = _find(tree, "/then")
    assert not then_unit["valid"]
    assert _child_klocs(then_unit) == ["/then/minimum"]


def test_verbose_oneof_multimatch_is_leaf():
    """Reference ignore_nested (applicator.rb:60): >1 matching branch
    suppresses the branch units in every output walk."""
    from json_schemer_spark import compile_schema

    plan = compile_schema({"oneOf": [{"type": "number"}, {"minimum": 0}]})
    tree = plan.validate_value(3, "verbose")
    one = _find(tree, "/oneOf")
    assert not one["valid"]
    assert _child_klocs(one) == []
    # single match still shows its branches
    tree2 = plan.validate_value(-1, "verbose")
    one2 = _find(tree2, "/oneOf")
    assert one2["valid"] and _child_klocs(one2) != []


def test_verbose_contains_is_leaf():
    """Reference Contains sets ignore_nested => true (applicator.rb:214)."""
    from json_schemer_spark import compile_schema

    tree = compile_schema({"contains": {"type": "integer"}}).validate_value(
        ["a", 1], "verbose")
    c = _find(tree, "/contains")
    assert c["valid"] and _child_klocs(c) == []


def test_verbose_ref_adopts_target_unit():
    """Reference Ref.validate (core.rb:66-68) returns the target's result
    as the $ref keyword unit — no wrapper level (round-4 close of the last
    documented verbose-shape divergence)."""
    from json_schemer_spark import compile_schema

    plan = compile_schema({"$defs": {"s": {"type": "string", "minLength": 2}},
                           "$ref": "#/$defs/s"})
    tree = plan.validate_value("x", "verbose")
    ref_unit = _find(tree, "/$ref")
    assert ref_unit is not None and not ref_unit["valid"]
    # children are the TARGET's keyword units directly
    assert _child_klocs(ref_unit) == ["/$ref/minLength", "/$ref/type"]
    # the absolute location points into the target's lexical position
    assert ref_unit["absoluteKeywordLocation"].endswith("#/$defs/s")


def test_unit_error_wording_matches_reference():
    """Round 5: keyword-unit error strings use the reference's wording
    (each vocab class's `error` + result.rb:225 formatted_instance_location
    — e.g. draft202012/vocab/applicator.rb:7-9 for allOf). Pin a sample
    across leaf keywords and in-place applicators, at root and at a nested
    pointer."""
    from json_schemer_spark import compile_schema

    def errs(schema, instance):
        out = compile_schema(schema).validate_value(instance, output_format="verbose")

        def walk(u):
            if "error" in u:
                yield u["keywordLocation"], u["error"]
            for key in ("errors", "annotations"):
                for c in u.get(key, []):
                    yield from walk(c)

        d = {}
        for k, v in walk(out):  # parent yields before children: keep outermost
            d.setdefault(k, v)
        return d

    e = errs({"allOf": [{"type": "string"}]}, 5)
    assert e["/allOf"] == "value at root does not match all `allOf` schemas"
    assert e["/allOf/0/type"] == "value at root is not a string"

    e = errs({"properties": {"a": {"anyOf": [{"minimum": 3}]}}}, {"a": 1})
    assert e["/properties"] == (
        "object properties at root do not match corresponding `properties` schemas")
    assert e["/properties/a/anyOf"] == (
        "value at `/a` does not match any `anyOf` schemas")
    assert e["/properties/a/anyOf/0/minimum"] == "number at `/a` is less than: 3"

    e = errs({"oneOf": [{"type": "integer"}, {"type": "number"}]}, "x")
    assert e["/oneOf"] == "value at root does not match exactly one `oneOf` schema"

    e = errs({"not": {"type": "string"}}, "s")
    assert e["/not"] == "value at root matches `not` schema"

    e = errs({"items": {"maxLength": 1}}, ["ab"])
    assert e["/items"] == "array items at root do not match `items` schema"
    assert e["/items/maxLength"] == "string length at `/0` is greater than: 1"

    e = errs({"required": ["x", "y"], "enum": [1]}, {"z": 0})
    assert e["/required"] == "object at root is missing required properties: x, y"
    assert e["/enum"] == "value at root is not one of: [1]"

    e = errs({"if": {"type": "object"}, "then": {"required": ["k"]}}, {})
    assert e["/then"] == "value at root does not match conditional `then` schema"

    e = errs({"contains": {"const": 9}, "minContains": 2}, [9])
    assert e["/contains"] == (
        "array at root does not contain enough items that match `contains` schema")
    assert e["/minContains"] == (
        "number of array items at root matching `contains` schema is less than: 2")

    e = errs({"unevaluatedProperties": False}, {"a": 1})
    assert e["/unevaluatedProperties"] == (
        "object properties at root do not match `unevaluatedProperties` schema")
