"""OpenAPI 3.0/3.1 dialect support — replays the key scenarios of the
reference's test/open_api_test.rb (discriminator dispatch, mapping,
nullable, OAS formats) against the interpreter tier, plus one Spark
end-to-end discriminator query."""

import json

import pytest

from json_schemer_spark import OPENAPI30, OPENAPI31, compile_schema, openapi

CAT_SCHEMA = {"type": "object", "properties": {"name": {"type": "string"}}}
DOG_SCHEMA = {"properties": {"bark": {"type": "string"}}}
LIZARD_SCHEMA = {"properties": {"lovesRocks": {"type": "boolean"}}}

CAT = {"id": 12345, "petType": "Cat"}
MISTY = {"petType": "Cat", "name": "misty"}
INVALID_CAT = {"petType": "Cat", "name": 1}
DOG = {"petType": "Dog", "bark": "soft"}
INVALID_DOG = {"petType": "Dog", "bark": 1}
LIZARD = {"petType": "Lizard", "lovesRocks": True}
INVALID_LIZARD = {"petType": "Lizard", "lovesRocks": "yes"}


def _pointers(schemer, instance):
    return [e["schema_pointer"] for e in schemer.validate_value(instance)]


def test_discriminator_specification_example():
    doc = {
        "openapi": "3.1.0",
        "components": {"schemas": {
            "Pet": {
                "type": "object",
                "discriminator": {"propertyName": "petType"},
                "properties": {"name": {"type": "string"}, "petType": {"type": "string"}},
                "required": ["name", "petType"],
            },
            "Cat": {"allOf": [
                {"$ref": "#/components/schemas/Pet"},
                {"type": "object",
                 "properties": {"huntingSkill": {"type": "string",
                                                 "enum": ["clueless", "lazy", "adventurous", "aggressive"]}},
                 "required": ["huntingSkill"]},
            ]},
            "Dog": {"allOf": [
                {"$ref": "#/components/schemas/Pet"},
                {"type": "object",
                 "properties": {"packSize": {"type": "integer", "format": "int32", "minimum": 0}},
                 "required": ["packSize"]},
            ]},
        }},
    }
    s = openapi(doc).schema("Pet")
    assert s.valid_value({"petType": "Cat", "name": "George", "huntingSkill": "aggressive"})
    assert s.valid_value({"petType": "Dog", "name": "Edie", "packSize": 2})

    def kw_sp(v):
        return [(e["keyword"], e["schema_pointer"]) for e in s.validate_value(v)]

    # expectations copied from the reference (open_api_test.rb:202-214)
    assert kw_sp({"petType": "Cat", "name": "Peace"}) == [
        ("required", "/components/schemas/Cat/allOf/1")]
    assert kw_sp({"petType": "Cat", "name": "Maverick", "huntingSkill": "untamed"}) == [
        ("enum", "/components/schemas/Cat/allOf/1/properties/huntingSkill")]
    assert kw_sp({"petType": "Dog", "name": "Loner"}) == [
        ("required", "/components/schemas/Dog/allOf/1")]
    assert kw_sp({"petType": "Dog", "name": "Heaven", "packSize": 2**31}) == [
        ("format", "/components/schemas/Dog/allOf/1/properties/packSize")]
    assert kw_sp({"name": "Brian"}) == [
        ("discriminator", "/components/schemas/Pet"),
        ("required", "/components/schemas/Pet")]
    assert kw_sp({"petType": "Rock", "name": "Crystal"}) == [
        ("discriminator", "/components/schemas/Pet")]


def test_all_of_discriminator_with_mapping():
    doc = {
        "openapi": "3.1.0",
        "components": {"schemas": {
            "Pet": {
                "type": "object",
                "required": ["petType"],
                "properties": {"petType": {"type": "string"}},
                "discriminator": {"propertyName": "petType", "mapping": {"dog": "Dog"}},
            },
            "Cat": {"allOf": [{"$ref": "#/components/schemas/Pet"}, CAT_SCHEMA]},
            "Dog": {"allOf": [{"$ref": "#/components/schemas/Pet"}, DOG_SCHEMA]},
            "Lizard": {"allOf": [{"$ref": "#/components/schemas/Pet"}, LIZARD_SCHEMA]},
        }},
    }
    s = openapi(doc).schema("Pet")
    assert s.valid_value(CAT)
    assert s.valid_value(MISTY)
    assert _pointers(s, INVALID_CAT) == ["/components/schemas/Cat/allOf/1/properties/name"]
    assert s.valid_value(DOG)
    assert _pointers(s, INVALID_DOG) == ["/components/schemas/Dog/allOf/1/properties/bark"]
    assert s.valid_value(LIZARD)
    assert _pointers(s, INVALID_LIZARD) == ["/components/schemas/Lizard/allOf/1/properties/lovesRocks"]
    # standalone subclass schemas work on their own (open_api_test.rb:378)
    c = openapi(doc).schema("Cat")
    assert c.valid_value(MISTY)
    assert not c.valid_value(INVALID_CAT)


@pytest.mark.parametrize("branch_kw", ["anyOf", "oneOf"])
def test_any_one_of_discriminator(branch_kw):
    doc = {
        "openapi": "3.1.0",
        "components": {"schemas": {
            "MyResponseType": {
                branch_kw: [
                    {"$ref": "#/components/schemas/Cat"},
                    {"$ref": "#/components/schemas/Dog"},
                    {"$ref": "#/components/schemas/Lizard"},
                ],
                "discriminator": {"propertyName": "petType"},
            },
            "Cat": CAT_SCHEMA, "Dog": DOG_SCHEMA, "Lizard": LIZARD_SCHEMA,
        }},
    }
    s = openapi(doc).schema("MyResponseType")
    assert s.valid_value(CAT)
    assert s.valid_value(MISTY)
    assert _pointers(s, INVALID_CAT) == ["/components/schemas/Cat/properties/name"]
    assert s.valid_value(DOG)
    assert _pointers(s, INVALID_DOG) == ["/components/schemas/Dog/properties/bark"]
    assert s.valid_value(LIZARD)
    assert _pointers(s, INVALID_LIZARD) == ["/components/schemas/Lizard/properties/lovesRocks"]
    # unmatched discriminator value → single discriminator error
    assert _pointers(s, {"petType": "Turtle"}) == ["/components/schemas/MyResponseType"]


def test_discriminator_mapping_overrides_implicit():
    doc = {
        "openapi": "3.1.0",
        "components": {"schemas": {
            "MyResponseType": {
                "oneOf": [
                    {"$ref": "#/components/schemas/Cat"},
                    {"$ref": "#/components/schemas/Dog"},
                ],
                "discriminator": {
                    "propertyName": "petType",
                    "mapping": {"c": "#/components/schemas/Cat", "d": "Dog", "dog": "Dog"},
                },
            },
            "Cat": CAT_SCHEMA, "Dog": DOG_SCHEMA,
        }},
    }
    s = openapi(doc).schema("MyResponseType")
    assert s.valid_value({**CAT, "petType": "c"})
    # 'Cat' implicit name removed: its subschema is an explicit mapping target
    assert not s.valid_value({**MISTY, "petType": "Cat"})
    assert _pointers(s, {**INVALID_CAT, "petType": "c"}) == ["/components/schemas/Cat/properties/name"]
    assert s.valid_value({**DOG, "petType": "d"})
    assert _pointers(s, {**INVALID_DOG, "petType": "dog"}) == ["/components/schemas/Dog/properties/bark"]


def test_all_any_one_without_discriminator():
    assert compile_schema({"allOf": [True, True, True]}, dialect=OPENAPI31).valid_value({})
    assert not compile_schema({"allOf": [True, True, False]}, dialect=OPENAPI31).valid_value({})
    assert compile_schema({"anyOf": [True, True, False]}, dialect=OPENAPI31).valid_value({})
    assert not compile_schema({"anyOf": [False, False, False]}, dialect=OPENAPI31).valid_value({})
    assert compile_schema({"oneOf": [True, False, False]}, dialect=OPENAPI31).valid_value({})
    assert not compile_schema({"oneOf": [True, True, False]}, dialect=OPENAPI31).valid_value({})


def test_discriminator_non_object_and_missing_property_name():
    s = compile_schema(
        {
            "anyOf": [{"$ref": "#/components/schemas/z"}],
            "discriminator": {"propertyName": "x"},
            "components": {"schemas": {"z": True}},
        },
        dialect=OPENAPI31,
    )
    assert not s.valid_value(1)
    assert not s.valid_value({"y": "z"})
    assert s.valid_value({"x": "z"})


def test_openapi30_nullable():
    s = compile_schema({"type": "string", "nullable": True}, dialect=OPENAPI30)
    assert s.valid_value("x")
    assert s.valid_value(None)
    assert not s.valid_value(1)
    s2 = compile_schema({"type": "string"}, dialect=OPENAPI30)
    assert not s2.valid_value(None)
    # draft4 base: strict integers, boolean exclusive bounds
    s3 = compile_schema({"type": "integer"}, dialect=OPENAPI30)
    assert not s3.valid_value(1.0)
    assert s3.valid_value(1)


def test_openapi31_formats():
    MAX_INT32 = 2**31 - 1
    s = compile_schema(
        {"properties": {
            "a": {"format": "int32"}, "b": {"format": "int64"},
            "c": {"format": "float"}, "d": {"format": "double"},
            "e": {"format": "password"},
        }},
        dialect=OPENAPI31, assert_formats=True,
    )
    assert s.valid_value({"a": MAX_INT32})
    assert s.valid_value({"a": float(MAX_INT32)})
    assert s.valid_value({"a": str(MAX_INT32)})
    assert not s.valid_value({"a": 2**31})
    assert not s.valid_value({"a": float(2**31)})
    assert s.valid_value({"b": 2**63 - 1})
    assert not s.valid_value({"b": 2**63})
    assert s.valid_value({"c": 2.0})
    assert not s.valid_value({"c": 2})
    assert s.valid_value({"d": 2.0})
    assert not s.valid_value({"d": 2})
    assert s.valid_value({"e": "anything"})
    assert s.valid_value({"e": 2})


def test_openapi30_nullable_columnar_spark(spark):
    """nullable lowers to a type union in the pure-Column tier."""
    from json_schemer_spark.schema.columnar import lowerable, validate_json_column_lowered

    schema = {"type": "object",
              "properties": {"x": {"type": "integer", "nullable": True}},
              "required": ["x"]}
    assert lowerable(schema, OPENAPI30)
    df = spark.createDataFrame(
        [('{"x": 1}',), ('{"x": null}',), ('{"x": "s"}',), ("{}",)], "content string")
    out = validate_json_column_lowered(df, "content", schema, OPENAPI30)
    assert [r.valid for r in out.select("valid").collect()] == [True, True, False, False]


def test_discriminator_spark_end_to_end(spark):
    """Discriminator dispatch over a JSON column (interpreter tier)."""
    doc = {
        "openapi": "3.1.0",
        "components": {"schemas": {
            "Event": {
                "oneOf": [
                    {"$ref": "#/components/schemas/Click"},
                    {"$ref": "#/components/schemas/View"},
                ],
                "discriminator": {"propertyName": "kind", "mapping": {"click": "Click", "view": "View"}},
            },
            "Click": {"type": "object", "required": ["x", "y"],
                      "properties": {"x": {"type": "integer"}, "y": {"type": "integer"}}},
            "View": {"type": "object", "required": ["url"],
                     "properties": {"url": {"type": "string"}}},
        }},
    }
    s = openapi(doc).schema("Event")
    assert not s.is_lowerable()
    rows = [
        {"kind": "click", "x": 1, "y": 2},
        {"kind": "view", "url": "http://a"},
        {"kind": "click", "x": 1},
        {"kind": "scroll"},
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in rows], "content string")
    out = s.validate_json_column(df, "content")
    assert [r.valid for r in out.select("valid").collect()] == [True, True, False, False]


def test_openapi_components_schema_lowers_without_discriminator(spark):
    """#/components refs inline through the document registry — plain OAS
    schemas run on the pure-Column tier."""
    doc = {
        "openapi": "3.1.0",
        "components": {"schemas": {
            "Address": {"type": "object", "required": ["city"],
                        "properties": {"city": {"type": "string", "minLength": 2}}},
            "User": {"type": "object",
                     "properties": {"name": {"type": "string"},
                                    "address": {"$ref": "#/components/schemas/Address"}}},
        }},
    }
    s = openapi(doc, assert_formats=False).schema("User")
    assert s.is_lowerable()
    df = spark.createDataFrame(
        [('{"name":"a","address":{"city":"Roma"}}',),
         ('{"name":"a","address":{"city":"R"}}',),
         ('{"name":"a","address":{}}',),
         ('{"name":"a"}',)], "content string")
    out = s.validate_json_column(df, "content")
    assert [r.valid for r in out.select("valid").collect()] == [True, False, False, True]
    assert "MapInPandas" not in out._jdf.queryExecution().executedPlan().toString()


def test_openapi_document_self_validation():
    """reference openapi.rb:22-28: document.valid()/validate() check the
    DOCUMENT against the official OAS document schema."""
    from json_schemer_spark import openapi

    doc31 = {
        "openapi": "3.1.0",
        "info": {"title": "t", "version": "1"},
        "components": {"schemas": {"Thing": {"type": "object"}}},
    }
    d = openapi(doc31)
    assert d.valid()
    assert d.validate() == []

    # missing required `info`
    bad = openapi({"openapi": "3.1.0"})
    assert not bad.valid()
    assert bad.validate()

    # wrong-typed info.version
    bad2 = openapi({"openapi": "3.1.0", "info": {"title": "t", "version": 3}})
    assert not bad2.valid()

    doc30 = {
        "openapi": "3.0.3",
        "info": {"title": "t", "version": "1"},
        "paths": {},
        "components": {"schemas": {"Thing": {"type": "object"}}},
    }
    d30 = openapi(doc30)
    assert d30.valid(), d30.validate()[:2]
    # 3.0 documents REQUIRE paths
    assert not openapi({"openapi": "3.0.3", "info": {"title": "t", "version": "1"}}).valid()
    # additional top-level properties are rejected (closed document schema)
    assert not openapi({**doc30, "bogus": 1}).valid()


def test_openapi30_schema_object_meta_validation():
    """Round-2 ADVICE: valid_schema for OAS 3.0 must use the closed
    Schema|Reference meta (openapi30/meta.rb), not just base draft4."""
    from json_schemer_spark import compile_schema
    from json_schemer_spark.schema.dialects import OPENAPI30, OPENAPI31

    ok = compile_schema({"type": "object", "nullable": True}, dialect=OPENAPI30)
    assert ok.valid_schema()
    # `const` is not an OAS 3.0 schema-object field → rejected by the
    # closed property set (the reference rejects it; base draft4 would not)
    bad = compile_schema({"const": 5}, dialect=OPENAPI30)
    assert not bad.valid_schema()
    # Reference form is allowed
    assert compile_schema({"$ref": "#/components/schemas/X"},
                          dialect=OPENAPI30).valid_schema()

    # 3.1: the dialect meta asserts the OAS base vocabulary — a
    # discriminator missing propertyName is invalid
    bad31 = compile_schema({"discriminator": {"mapping": {}}}, dialect=OPENAPI31)
    assert not bad31.valid_schema()
    ok31 = compile_schema(
        {"oneOf": [{"$ref": "#/c"}], "discriminator": {"propertyName": "t"}},
        dialect=OPENAPI31)
    assert ok31.valid_schema()


def test_json_schema_dialect_document_validation():
    """open_api_test.rb test_openapi_documents: embedded schema objects
    re-validate under the document-declared jsonSchemaDialect (or their own
    $schema) via the SCHEMA_BASE dynamic-anchor wrapper
    (openapi31/document.rb) — round-3 review divergence, closed."""
    from json_schemer_spark import openapi

    d4 = "http://json-schema.org/draft-04/schema#"
    d2020 = "https://json-schema.org/draft/2020-12/schema"
    base = {"openapi": "3.1.0",
            "info": {"title": "test document", "version": "0.0.1"}}
    d4_max = {"maximum": 1, "exclusiveMaximum": True}
    implicit = {**base, "components": {"schemas": {"m": dict(d4_max)}}}
    explicit = {**base, "components": {"schemas": {"m": {**d4_max, "$schema": d4}}}}

    # implicit draft-04 syntax under the default OAS dialect: INVALID
    doc = openapi(implicit)
    assert not doc.valid()
    errs = doc.validate()
    assert any(e["schema_pointer"] == "/properties/exclusiveMaximum"
               and e["keyword"] == "number" for e in errs), errs[:3]
    # declaring jsonSchemaDialect: draft-04 makes it VALID
    assert openapi({**implicit, "jsonSchemaDialect": d4}).valid()
    assert openapi({**implicit, "jsonSchemaDialect": d4}).validate() == []
    # a per-object $schema works without the document-level dialect
    assert openapi(explicit).valid()
    assert openapi(explicit).validate() == []
    assert openapi({**explicit, "jsonSchemaDialect": d4}).valid()

    # nested $defs re-dispatch through the dynamic anchor: the inner
    # schema has NO $schema, so it follows the DOCUMENT dialect even
    # though its parent declared 2020-12
    nested_implicit = {**base, "components": {"schemas": {"m": {
        "$schema": d2020, "exclusiveMaximum": 1,
        "$defs": {"inner": dict(d4_max)},
    }}}}
    nested_explicit = {**base, "components": {"schemas": {"m": {
        "$schema": d2020, "exclusiveMaximum": 1,
        "$defs": {"inner": {**d4_max, "$schema": d4}},
    }}}}
    assert not openapi(nested_implicit).valid()
    assert openapi({**nested_implicit, "jsonSchemaDialect": d4}).valid()
    assert openapi(nested_explicit).valid()


def test_json_schema_dialect_selects_schema_dialect():
    """openapi.rb:11 — jsonSchemaDialect is the default meta-schema for
    components/schemas validators."""
    from json_schemer_spark import openapi

    d4 = "http://json-schema.org/draft-04/schema#"
    doc = {
        "openapi": "3.1.0",
        "info": {"title": "t", "version": "1"},
        "jsonSchemaDialect": d4,
        "components": {"schemas": {"m": {"maximum": 1, "exclusiveMaximum": True}}},
    }
    schemer = openapi(doc).schema("m")
    # draft4 boolean exclusiveMaximum semantics: must be strictly < 1
    assert schemer.valid_value(0)
    assert not schemer.valid_value(1)


def test_unknown_json_schema_dialect_raises():
    """open_api_test.rb test_unsupported_json_schema_dialect."""
    import pytest as _pytest

    from json_schemer_spark import openapi
    from json_schemer_spark.schema.interpreter import SchemaCompileError

    with _pytest.raises(SchemaCompileError):
        openapi({"openapi": "3.1.0", "jsonSchemaDialect": "unsupported"})


def test_openapi_document_accessors():
    """Parity with JSONSchemer.openapi30_document / openapi31_document
    (reference lib/json_schemer.rb:219-233): public memoized compiled
    validators for OAS documents themselves."""
    from json_schemer_spark import openapi30_document, openapi31_document

    d30, d31 = openapi30_document(), openapi31_document()
    assert d30 is openapi30_document() and d31 is openapi31_document()
    ok = {"openapi": "3.0.3", "info": {"title": "t", "version": "1"},
          "paths": {}}
    assert d30.valid_value(ok)
    assert not d30.valid_value({"openapi": "3.0.3"})  # missing info/paths
    ok31 = {"openapi": "3.1.0", "info": {"title": "t", "version": "1"},
            "paths": {}}
    assert d31.valid_value(ok31)
    assert not d31.valid_value({"openapi": "3.1.0", "info": {}})
