"""Errors.pretty parity — the reference's human-readable formatter
(errors.rb:7-30), replayed from test/pretty_errors_test.rb, plus the
Column-expression variant over validate_json_column violations."""

import json

import pyspark.sql.functions as F

from json_schemer_spark import compile_schema, pretty, pretty_errors_column


def test_required_message():
    plan = compile_schema({
        "properties": {"one": {"type": "string"}}, "required": ["one"],
    })
    assert plan.pretty_errors({"two": "optional"}) == [
        "root is missing required keys: one"
    ]


def test_basic_type_messages():
    for t in ["string", "integer", "number", "boolean", "null", "object"]:
        plan = compile_schema({"properties": {"one": {"type": t}}})
        assert plan.pretty_errors({"one": ["wrong"]}) == [
            f"property '/one' is not of type: {t}"
        ]


def test_array_message():
    plan = compile_schema({"properties": {"one": {"type": "array"}}})
    assert plan.pretty_errors({"one": "wrong"}) == [
        "property '/one' is not of type: array"
    ]


def test_format_message():
    plan = compile_schema(
        {"properties": {"one": {"type": "string", "format": "date-time"}}},
        assert_formats=True,
    )
    assert plan.pretty_errors({"one": "abc"}) == [
        "property '/one' does not match format: date-time"
    ]


def test_pattern_message():
    plan = compile_schema({"properties": {"one": {"type": "string", "pattern": "\\d+"}}})
    assert plan.pretty_errors({"one": "abc"}) == [
        "property '/one' does not match pattern: \\d+"
    ]


def test_enum_message():
    plan = compile_schema({"properties": {"one": {"type": "string", "enum": ["one", "two"]}}})
    assert plan.pretty_errors({"one": "abc"}) == [
        'property \'/one\' is not one of: ["one", "two"]'
    ]


def test_const_message():
    plan = compile_schema({"properties": {"one": {"type": "string", "const": "one"}}})
    assert plan.pretty_errors({"one": "abc"}) == [
        "property '/one' is not: \"one\""
    ]


def test_generic_message():
    plan = compile_schema({"properties": {"two": {"type": "integer", "maximum": 2}}})
    assert plan.pretty_errors({"two": 3}) == [
        "property '/two' is invalid: error_type=maximum"
    ]


def test_pretty_accepts_reference_shape():
    # the reference error-hash shape works directly (no enrichment needed)
    err = {
        "data_pointer": "", "type": "required",
        "details": {"missing_keys": ["a", "b"]},
    }
    assert pretty(err) == "root is missing required keys: a, b"


def test_pretty_errors_column(spark):
    schema = {
        "type": "object",
        "required": ["name", "size"],
        "properties": {
            "name": {"type": "string", "pattern": "^[a-z]+$"},
            "kind": {"enum": ["a", "b"]},
            "tag": {"const": "x"},
        },
    }
    plan = compile_schema(schema)
    rows = [
        ('{"size": 1, "name": "BAD"}',),   # required name ok, pattern fails... name present: pattern
        ('{"name": "ok"}',),               # missing size
        ('{"name": "ok", "size": 1, "kind": "z"}',),  # enum
        ('{"name": "ok", "size": 1, "tag": "y"}',),   # const
        ('{"name": "ok", "size": 1}',),    # valid
    ]
    df = spark.createDataFrame(rows, "content string")
    out = plan.validate_json_column(df, "content").withColumn(
        "pretty", pretty_errors_column(schema, F.col("violations"), content="content")
    )
    got = [sorted(r.pretty) for r in out.collect()]
    assert got[0] == ["property '/name' does not match pattern: ^[a-z]+$"]
    assert got[1] == ["root is missing required keys: size"]
    assert got[2] == ["property '/kind' is not one of: [\"a\", \"b\"]"]
    assert got[3] == ["property '/tag' is not: \"x\""]
    assert got[4] == []
    # all-JVM: no Python workers in the plan
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in p and "MapInPandas" not in p


def test_pretty_errors_column_quoted_property_name(spark):
    """A required violation under a property whose NAME contains a quote
    cannot be rendered through the JSONPath bracket form — the safe-path
    guard must fall back to the generic sentence (round-4 advice: it
    previously degraded via get_json_object returning null, silently)."""
    schema = {
        "type": "object",
        "properties": {
            "o'brien": {"type": "object", "required": ["x"]},
            'q"uote': {"type": "object", "required": ["y"]},
        },
    }
    plan = compile_schema(schema)
    rows = [
        ('{"o\'brien": {}}',),
        ('{"q\\"uote": {}}',),
    ]
    df = spark.createDataFrame(rows, "content string")
    out = plan.validate_json_column(df, "content").withColumn(
        "pretty",
        pretty_errors_column(schema, F.col("violations"), content="content"),
    )
    got = [r.pretty for r in out.collect()]
    assert got[0] == ["property '/o'brien' is invalid: error_type=required"]
    assert got[1] == ['property \'/q"uote\' is invalid: error_type=required']
