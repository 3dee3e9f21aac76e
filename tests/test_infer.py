"""Schema inference (schema/infer.py): pointer profile + assembly +
the round-trip invariant (inferred schema validates its own corpus)."""

import json

import pytest

import pyspark.sql.functions as F

from json_schemer_spark.schema.infer import (
    infer_schema,
    json_pointer_profile,
)


def _df(spark, docs):
    return spark.createDataFrame([(d,) for d in docs], "j string")


def test_pointer_profile_types_counts_and_stats(spark):
    df = _df(spark, [
        '{"a":1,"b":[1,"xy"],"c":{"d":true}}',
        '{"a":2.5,"b":[],"c":{"d":null}}',
        'not json at all',
    ])
    rows = {(r["pointer"], r["jtype"]):
            (r["n"], r["min_num"], r["max_num"], r["min_len"], r["max_len"])
            for r in json_pointer_profile(df, "j").collect()}
    assert rows[("", "object")][0] == 2  # unparsable row skipped
    assert rows[("/a", "integer")] == (1, 1.0, 1.0, None, None)
    assert rows[("/a", "number")] == (1, 2.5, 2.5, None, None)
    assert rows[("/b", "array")][0] == 2
    assert rows[("/b/*", "integer")] == (1, 1.0, 1.0, None, None)
    assert rows[("/b/*", "string")] == (1, None, None, 2, 2)
    assert rows[("/c/d", "boolean")][0] == 1
    assert rows[("/c/d", "null")][0] == 1
    assert ("/b/*", "array") not in rows


def test_pointer_profile_escapes_rfc6901(spark):
    df = _df(spark, ['{"a/b":1,"t~":2}'])
    ptrs = {r["pointer"] for r in json_pointer_profile(df, "j").collect()}
    assert "/a~1b" in ptrs and "/t~0" in ptrs
    # and the assembled schema unescapes back to the raw keys
    sch = infer_schema(df, "j")
    assert set(sch["properties"]) == {"a/b", "t~"}


def test_pointer_profile_max_depth_bounds_descent(spark):
    df = _df(spark, ['{"a":{"b":{"c":1}}}'])
    ptrs = {r["pointer"]
            for r in json_pointer_profile(df, "j", max_depth=2).collect()}
    assert "/a/b" in ptrs and "/a/b/c" not in ptrs
    with pytest.raises(ValueError, match="max_depth"):
        json_pointer_profile(df, "j", max_depth=-1)


def test_pointer_profile_plan_is_python_free(spark):
    df = _df(spark, ['{"a":1}'])
    out = json_pointer_profile(df, "j")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_infer_schema_required_items_and_unions(spark):
    df = _df(spark, [
        '{"id":1,"tags":["a"],"meta":{"k":1},"opt":"x"}',
        '{"id":2,"tags":[],"meta":{"k":null}}',
    ])
    sch = infer_schema(df, "j")
    assert sch["type"] == "object"
    assert sch["required"] == ["id", "meta", "tags"]
    assert sch["properties"]["opt"]["type"] == "string"
    assert sch["properties"]["tags"] == {
        "type": "array", "items": {"type": "string"}}
    assert sch["properties"]["meta"]["required"] == ["k"]
    assert sch["properties"]["meta"]["properties"]["k"]["type"] == [
        "integer", "null"]


def test_infer_schema_required_counts_per_object_not_per_doc(spark):
    # two objects inside ONE document's array: a key present in only one
    # of them must not be required
    df = _df(spark, ['{"xs":[{"a":1,"b":2},{"a":3}]}'])
    sch = infer_schema(df, "j")
    items = sch["properties"]["xs"]["items"]
    assert items["required"] == ["a"]
    assert set(items["properties"]) == {"a", "b"}


def test_infer_schema_bounds_and_empty_corpus(spark):
    df = _df(spark, ['{"n":3,"s":"abcd"}', '{"n":-1.5,"s":""}'])
    sch = infer_schema(df, "j", include_bounds=True)
    assert sch["properties"]["n"]["minimum"] == -1.5
    assert sch["properties"]["n"]["maximum"] == 3.0
    assert sch["properties"]["s"]["minLength"] == 0
    assert sch["properties"]["s"]["maxLength"] == 4
    empty = infer_schema(_df(spark, ["nope"]), "j")
    assert empty == {"$schema": "https://json-schema.org/draft/2020-12/schema"}


def test_infer_schema_max_pointers_guard(spark):
    df = _df(spark, ['{"a":1,"b":2,"c":3}'])
    with pytest.raises(ValueError, match="max_pointers"):
        infer_schema(df, "j", max_pointers=2)


def test_infer_roundtrip_validates_own_corpus(spark):
    from json_schemer_spark import compile_schema

    i = F.col("id")
    docs = spark.range(200).select(F.concat(
        F.lit('{"id":'), i.cast("string"),
        F.lit(',"vals":['), F.when(i % 3 == 0, F.lit('1,2')).otherwise(
            F.concat(F.lit('"s'), (i % 5).cast("string"), F.lit('"'))),
        F.lit("]"),
        F.when(i % 4 == 0, F.lit(',"opt":null')).otherwise(F.lit("")),
        F.lit("}")).alias("j"))
    for bounds in (False, True):
        sch = infer_schema(docs, "j", include_bounds=bounds)
        out = compile_schema(sch).validate_json_column(docs, "j")
        assert out.where(~F.col("valid")).count() == 0
    # and the schema is strict enough to reject a shape not in the corpus
    sch = infer_schema(docs, "j")
    bad = _df(spark, ['{"vals":[true]}'])
    res = compile_schema(sch).validate_json_column(bad, "j").collect()
    assert not res[0]["valid"]


def test_profile_drift_classifies_changes(spark):
    old = _df(spark, ['{"a":1,"c":true}', '{"a":2}'])
    new = _df(spark, ['{"a":"s","b":[1]}', '{"a":3}'])
    from json_schemer_spark.schema.infer import profile_drift

    rows = {(r["pointer"], r["jtype"]): (r["change"], r["old_n"], r["new_n"])
            for r in profile_drift(old, new, "j").collect()}
    assert rows[("/a", "integer")] == ("count_changed", 2, 1)
    assert rows[("/a", "string")] == ("added", None, 1)
    assert rows[("/b", "array")] == ("added", None, 1)
    assert rows[("/b/*", "integer")] == ("added", None, 1)
    assert rows[("/c", "boolean")] == ("removed", 1, None)
    assert ("", "object") not in rows  # stable filtered by default

    with_stable = profile_drift(old, new, "j", include_stable=True)
    stable = {(r["pointer"], r["jtype"]) for r in with_stable.collect()
              if r["change"] == "stable"}
    assert ("", "object") in stable
