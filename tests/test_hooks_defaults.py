"""Extension surface: before/after_property_validation hooks,
insert_property_defaults, readOnly/writeOnly access_mode, pluggable
regexp_resolver / content encodings / media types / property default
resolver — mirrors the reference's test/hooks_test.rb key cases and the
README extension examples."""

import json
import re

from json_schemer_spark import DRAFT7, compile_schema


# --- insert_property_defaults (hooks_test.rb:4-68) --------------------------

def test_it_inserts_defaults():
    schema = {
        "required": ["a", "c", "d"],
        "properties": {
            "a": {"default": 1},
            "b": {"default": 2},
            "c": {"required": ["x"],
                  "properties": {"x": {"default": 3}, "y": {"default": 4}}},
            "d": {"required": ["x"],
                  "default": {"x": {"y": {"z": 1}}},
                  "properties": {"x": {"required": ["y"], "properties": {
                      "y": {"required": ["z"], "properties": {"z": {"type": "integer"}}}}}}},
        },
    }
    data = {"a": 10, "c": {"x": 30}}
    assert not compile_schema(schema).valid_value(data)
    assert compile_schema(schema, insert_property_defaults=True).valid_value(data)
    assert data == {
        "a": 10, "b": 2,
        "c": {"x": 30, "y": 4},
        "d": {"x": {"y": {"z": 1}}},
    }


def test_singular_unique_defaults_in_conditional_subschemas():
    c_schema = {"const": 3}
    properties = {"a": {"const": 1}, "b": {"const": 2, "default": 2}, "c": c_schema}

    def sub(c_default):
        return {"properties": {**properties, "c": {**c_schema, "default": c_default}}}

    schema = {"allOf": [sub(1)], "anyOf": [sub(2)], "oneOf": [sub(3)], "if": sub(4)}
    data = {"a": 1}
    assert compile_schema(schema, insert_property_defaults=True).valid_value(data)
    # b agrees (2) everywhere → inserted; c conflicts (1,2,3,4) → not
    assert data == {"a": 1, "b": 2}

    data2 = {"a": 1, "b": 2}
    merged = {**schema, "not": {"properties": properties}}
    assert not compile_schema(merged, insert_property_defaults=True).valid_value(data2)
    assert data2 == {"a": 1, "b": 2}


def test_only_default_in_conditional_subschemas_through_ref():
    schemer = compile_schema(
        {
            "oneOf": [{"$ref": "#/definitions/a"}],
            "required": ["field", "default_field"],
            "definitions": {"a": {"properties": {
                "field": {"type": "string", "const": "a"},
                "default_field": {"enum": ["f1", "f2"], "default": "f1"},
            }}},
        },
        insert_property_defaults=True,
    )
    data = {"field": "a"}
    assert schemer.valid_value(data)
    assert data == {"field": "a", "default_field": "f1"}


def test_does_not_insert_defaults_in_not_subschemas():
    schema = {"properties": {"a": {"default": 1}}}
    data = {"b": 2}
    assert compile_schema(schema, insert_property_defaults=True).valid_value(data)
    assert data == {"b": 2, "a": 1}

    data = {"b": 2}
    assert not compile_schema({"not": schema}, insert_property_defaults=True).valid_value(data)
    assert data == {"b": 2}


def test_inserts_default_for_successful_branch():
    schema = {"oneOf": [
        {"type": "object", "properties": {"foo": {"enum": ["a"]},
                                          "bar": {"enum": ["a"], "default": "a"}}},
        {"type": "object", "properties": {"foo": {"enum": ["b"]},
                                          "bar": {"enum": ["b"], "default": "b"}}},
    ]}
    for foo in ("a", "b"):
        data = {"foo": foo}
        assert compile_schema(schema, insert_property_defaults=True).valid_value(data)
        assert data == {"foo": foo, "bar": foo}


def test_insert_property_defaults_through_ref_chain():
    schema = {
        "properties": {"x": {"$ref": "#/$defs/withdefault"}},
        "$defs": {"withdefault": {"$ref": "#/$defs/deeper"},
                  "deeper": {"default": 42}},
    }
    data = {}
    assert compile_schema(schema, insert_property_defaults=True).valid_value(data)
    assert data == {"x": 42}


def test_insert_property_defaults_ref_no_default():
    schema = {"properties": {"x": {"$ref": "#/$defs/nodefault"}},
              "$defs": {"nodefault": {"type": "integer"}}}
    data = {}
    assert compile_schema(schema, insert_property_defaults=True).valid_value(data)
    assert data == {}


def test_custom_property_default_resolver():
    calls = []

    def resolver(instance, prop, results):
        calls.append((prop, results))
        instance[prop] = "custom"
        return True

    schema = {"properties": {"a": {"default": 1}}}
    data = {}
    compile_schema(schema, insert_property_defaults=True,
                   property_default_resolver=resolver).valid_value(data)
    assert data == {"a": "custom"}
    assert calls == [("a", [(1, True)])]


# --- before/after hooks (hooks_test.rb:293-483) -----------------------------

def test_before_validation_hook_modifies_data():
    def parse_array(data, prop, prop_schema, _schema):
        if prop in data and isinstance(prop_schema, dict) and prop_schema.get("type") == "array":
            parsed = str(data[prop]).split(",")
            if prop_schema["items"]["type"] == "integer":
                parsed = [int(x) for x in parsed]
            data[prop] = parsed

    schema = {"properties": {"list": {"type": "array", "items": {"type": "integer"}}}}
    schemer = compile_schema(schema, before_property_validation=[parse_array])
    data = {"list": "1,2,3"}
    assert schemer.valid_value(data)
    assert data == {"list": [1, 2, 3]}


def test_after_validation_hook_modifies_data():
    import datetime

    def convert_date(data, prop, prop_schema, _schema):
        if prop in data and isinstance(prop_schema, dict) and prop_schema.get("format") == "date":
            data[prop] = datetime.date.fromisoformat(data[prop])

    schemer = compile_schema(
        {"properties": {"start_date": {"type": "string", "format": "date"}}},
        assert_formats=True,
        after_property_validation=convert_date,  # single callable accepted
    )
    data = {"start_date": "2020-09-01"}
    assert schemer.valid_value(data)
    assert data == {"start_date": datetime.date(2020, 9, 1)}


def test_before_hook_runs_with_defaults():
    def fill(data, prop, prop_schema, _schema):
        if prop == "b" and "b" not in data:
            data["hook_saw_b_missing"] = True

    schema = {"properties": {"b": {"default": 5}}}
    data = {}
    assert compile_schema(schema, insert_property_defaults=True,
                          before_property_validation=[fill]).valid_value(data)
    assert data["b"] == 5


# --- readOnly/writeOnly access_mode (meta_data.rb:6-26) ---------------------

def test_access_mode_read_only_write_only():
    schema = {"properties": {
        "id": {"readOnly": True},
        "password": {"writeOnly": True},
    }}
    s = compile_schema(schema)
    # no access mode → annotations only
    assert s.valid_value({"id": 1, "password": "x"})
    # writing a readOnly value fails
    assert not s.valid_value({"id": 1}, access_mode="write")
    assert s.valid_value({"password": "x"}, access_mode="write")
    # reading a writeOnly value fails
    assert not s.valid_value({"password": "x"}, access_mode="read")
    assert s.valid_value({"id": 1}, access_mode="read")
    errs = s.validate_value({"id": 1}, access_mode="write")
    assert errs[0]["keyword"] == "readOnly"


def test_access_mode_trims_required():
    schema = {
        "required": ["id", "name"],
        "properties": {"id": {"readOnly": True}, "name": {"type": "string"}},
    }
    s = compile_schema(schema)
    # writing: readOnly `id` exempt from required
    assert s.valid_value({"name": "x"}, access_mode="write")
    assert not s.valid_value({"name": "x"}, access_mode="read")
    assert not s.valid_value({}, access_mode="write")


# --- pluggable regexp_resolver (schema.rb:351-360) ---------------------------

def test_regexp_resolver():
    seen = []

    def resolver(pattern):
        seen.append(pattern)
        return re.compile(pattern, re.IGNORECASE)

    s = compile_schema({"pattern": "^ABC$"}, regexp_resolver=resolver)
    assert s.valid_value("abc")  # case-insensitive via custom resolver
    assert s.valid_value("ABC")
    assert not s.valid_value("xyz")
    assert seen == ["^ABC$"]


# --- custom content encodings / media types (schema.rb:311-325) -------------

def test_custom_content_encoding_and_media_type():
    def rot13(value):
        import codecs

        try:
            return True, codecs.decode(value, "rot13")
        except Exception:
            return False, None

    def csv_media(value):
        return ("," in value, value.split(","))

    s = compile_schema(
        {"contentEncoding": "rot13", "contentMediaType": "text/csv"},
        dialect=DRAFT7,
        content_encodings={"rot13": rot13},
        content_media_types={"text/csv": csv_media},
    )
    assert s.valid_value("n,o")          # rot13 → "a,b" → csv ok
    assert not s.valid_value("ab")       # no comma after decode → csv fails
    # non-strings pass vacuously
    assert s.valid_value(5)


def test_defaults_in_dataframe_path(spark):
    """insert_property_defaults forces the interpreter tier and still
    verdicts correctly over a JSON column."""
    s = compile_schema(
        {"required": ["a", "b"], "properties": {"b": {"default": 2}}},
        insert_property_defaults=True,
    )
    assert not s.is_lowerable()
    df = spark.createDataFrame([('{"a": 1}',), ('{"c": 3}',)], "content string")
    out = s.validate_json_column(df, "content")
    assert [r.valid for r in out.select("valid").collect()] == [True, False]


# --- x-error custom messages (core.rb:122-126, result.rb:28-35) -------------

def test_x_error_string_template():
    s = compile_schema({"type": "string", "x-error": "want a string, got %{instance}"})
    errs = s.validate_value(5)
    assert errs == [{"keyword": "string", "instance_pointer": "",
                     "schema_pointer": "", "message": "want a string, got 5"}]


def test_x_error_keyword_map_with_catchall():
    s = compile_schema({
        "type": "integer", "minimum": 3,
        "x-error": {"minimum": "too small: %{instance} < %{keywordValue}", "*": "nope"},
    })
    assert [e["message"] for e in s.validate_value(1)] == ["too small: 1 < 3"]
    assert [e["message"] for e in s.validate_value("x")] == ["nope"]


def test_x_error_nested_property():
    s = compile_schema({
        "properties": {"a": {"type": "integer", "x-error": "a at %{instanceLocation} must be int"}},
    })
    assert [e["message"] for e in s.validate_value({"a": "x"})] == ["a at /a must be int"]


# --- i18n-style message tables (result.rb:50-75) -----------------------------

def test_i18n_message_fallback_chain():
    s = compile_schema(
        {"type": "integer", "minimum": 3},
        i18n_messages={
            "#/minimum": "trop petit: %{instance}",
            "integer": "doit être un entier",
            "*": "invalide",
        },
    )
    assert [e["message"] for e in s.validate_value(1)] == ["trop petit: 1"]
    assert [e["message"] for e in s.validate_value("x")] == ["doit être un entier"]


def test_x_error_wins_over_i18n():
    s = compile_schema(
        {"type": "integer", "x-error": "custom"},
        i18n_messages={"*": "i18n"},
    )
    assert [e["message"] for e in s.validate_value("x")] == ["custom"]
