"""Global configuration defaults — reference JSONSchemer.configure
(configuration.rb:3-31, json_schemer.rb:239-245; shapes from
test/configuration_test.rb): globals apply when per-call options are
absent, per-call always wins, restore works."""

from json_schemer_spark import (
    compile_schema, configuration, configure, configured, Configuration,
    DRAFT4, DRAFT201909,
)


def test_configure_yields_the_configuration_object():
    seen = []
    configure(lambda c: seen.append(c))
    assert seen[0] is configuration()
    assert isinstance(seen[0], Configuration)


def test_default_configuration_changes_nothing():
    # untouched globals == per-call defaults
    plan = compile_schema({"maximum": 1})
    assert plan.valid_value(1) and not plan.valid_value(2)
    assert not plan.assert_formats


def test_meta_schema_default_dialect():
    # configuration_test.rb test_string_meta_schema, draft4 arm: boolean
    # exclusiveMaximum only parses under draft4 semantics
    with configured(dialect=DRAFT4):
        assert compile_schema({"maximum": 1}).valid_value(1)
        assert not compile_schema(
            {"maximum": 1, "exclusiveMaximum": True}).valid_value(1)
    # and 2019-09: numeric exclusiveMaximum
    with configured(dialect=DRAFT201909):
        assert not compile_schema({"exclusiveMaximum": 1}).valid_value(1)


def test_assert_formats_global_and_per_call_override():
    schema = {"format": "ipv4"}
    assert compile_schema(schema).valid_value("not-an-ip")  # annotation only
    with configured(assert_formats=True):
        assert not compile_schema(schema).valid_value("not-an-ip")
        # per-call wins over global
        assert compile_schema(schema, assert_formats=False).valid_value("not-an-ip")
    # restored
    assert compile_schema(schema).valid_value("not-an-ip")


def test_insert_property_defaults_global():
    schema = {"properties": {"a": {"default": 7}}}
    with configured(insert_property_defaults=True):
        doc = {}
        compile_schema(schema).validate_value(doc)
        assert doc == {"a": 7}
    doc2 = {}
    compile_schema(schema).validate_value(doc2)
    assert doc2 == {}


def test_custom_keywords_global():
    def even(data, curr_schema, pointer):
        return data % 2 == 0 if isinstance(data, int) else True

    with configured(keywords={"x-even": even}):
        plan = compile_schema({"x-even": True})
        assert plan.valid_value(2) and not plan.valid_value(3)


def test_ref_resolver_global():
    remote = {"type": "integer"}
    with configured(ref_resolver=lambda uri: remote):
        plan = compile_schema({"$ref": "http://example.com/int.json"})
        assert plan.valid_value(3) and not plan.valid_value("s")


def test_default_base_uri_matches_engine_default():
    """An untouched Configuration must not change $ref/keyword-location
    resolution (round-4 advice: a divergent DEFAULT_BASE_URI literal here
    silently rewrote absoluteKeywordLocation for every compile_schema)."""
    from json_schemer_spark import CompiledSchema, compile_schema
    from json_schemer_spark.configuration import DEFAULT_BASE_URI
    from json_schemer_spark.schema.registry import DEFAULT_BASE_URI as ENGINE_URI

    assert DEFAULT_BASE_URI == ENGINE_URI
    schema = {"properties": {"a": {"type": "integer"}}}
    via_config = compile_schema(schema)
    direct = CompiledSchema(schema)
    out_a = via_config.validate_value({"a": "x"}, output_format="basic")
    out_b = direct.validate_value({"a": "x"}, output_format="basic")
    assert out_a == out_b
    locs = {e["absoluteKeywordLocation"] for e in out_a["errors"]
            if "absoluteKeywordLocation" in e}
    assert locs and all(u.startswith(ENGINE_URI) for u in locs), locs
