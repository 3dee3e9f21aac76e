"""Output formats: the suite's output-tests replay (basic format validated
against the official output schema — the reference does the same at
test/json_schema_test_suite_test.rb:123-157, here SELF-HOSTED: our own
engine validates our own output), plus direct shape checks for
basic/detailed/verbose and annotations."""

import glob
import json
import os

import pytest

from json_schemer_spark import compile_schema

SUITE = "/root/reference/JSON-Schema-Test-Suite"


def _output_schema(draft: str) -> dict:
    return json.load(open(f"{SUITE}/output-tests/{draft}/output-schema.json"))


def _output_test_files(draft: str):
    return sorted(glob.glob(f"{SUITE}/output-tests/{draft}/content/*.json"))


@pytest.mark.parametrize("draft", ["draft2020-12"])
def test_output_tests_replay(draft):
    out_schema = _output_schema(draft)
    resolver = lambda uri: out_schema if uri == out_schema["$id"] else None
    files = _output_test_files(draft)
    assert files, "no output-tests found"
    n = 0
    for f in files:
        for defn in json.load(open(f)):
            schemer = compile_schema(defn["schema"])
            for test in defn["tests"]:
                for output_format, checker_schema in test["output"].items():
                    output = schemer.validate_value(
                        test["data"], output_format=output_format
                    )
                    checker = compile_schema(checker_schema, ref_resolver=resolver)
                    errs = checker.validate_value(output)
                    assert not errs, (
                        f"{os.path.basename(f)} / {defn['description']} / "
                        f"{test['description']}: output {json.dumps(output)[:300]} "
                        f"fails checker: {errs[:3]}"
                    )
                    n += 1
    assert n >= 4


def test_basic_output_shape_invalid():
    s = compile_schema({"type": "object", "required": ["a"],
                        "properties": {"a": {"type": "integer"}}})
    out = s.validate_value({"a": "x"}, output_format="basic")
    assert out["valid"] is False
    assert out["keywordLocation"] == "" and out["instanceLocation"] == ""
    kls = {e["keywordLocation"] for e in out["errors"]}
    assert "/properties/a/type" in kls
    assert all(e["valid"] is False and "annotation" not in e for e in out["errors"])
    assert "annotations" not in out


def test_basic_output_annotations_valid():
    s = compile_schema({
        "title": "Doc", "readOnly": True,
        "properties": {"a": {"type": "integer", "custom-meta": 7}},
    })
    out = s.validate_value({"a": 1}, output_format="basic")
    assert out["valid"] is True and "errors" not in out
    anns = {(u["keywordLocation"], json.dumps(u["annotation"])) for u in out["annotations"]}
    assert ("/readOnly", "true") in anns
    assert ("/title", '"Doc"') in anns
    assert ("/properties/a/custom-meta", "7") in anns
    # annotation units carry instance locations
    locs = {u["keywordLocation"]: u["instanceLocation"] for u in out["annotations"]}
    assert locs["/properties/a/custom-meta"] == "/a"


def test_annotations_dropped_from_invalid_branches():
    s = compile_schema({
        "anyOf": [
            {"type": "string", "branch-tag": "s"},
            {"type": "integer", "branch-tag": "i"},
        ],
    })
    out = s.validate_value(3, output_format="basic")
    tags = {json.dumps(u["annotation"]) for u in out.get("annotations", [])
            if u["keywordLocation"].endswith("branch-tag")}
    assert tags == {'"i"'}  # only the valid branch's annotation survives


def test_verbose_and_detailed_shapes():
    s = compile_schema({"title": "T", "properties": {"a": {"type": "integer"}},
                        "required": ["b"]})
    v = s.validate_value({"a": "x"}, output_format="verbose")
    assert v["valid"] is False and v["errors"]
    d = s.validate_value({"a": "x"}, output_format="detailed")
    assert d["valid"] is False
    inner = {u["instanceLocation"] for u in d["errors"]}
    assert "/a" in inner and "" in inner
    ok = s.validate_value({"a": 1, "b": 2}, output_format="verbose")
    assert ok["valid"] is True and any(
        u["keywordLocation"] == "/title" for u in ok["annotations"])
