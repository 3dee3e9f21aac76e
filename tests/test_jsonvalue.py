"""JSON value semantics (reference: draft202012/vocab/validation.rb:7-93)."""

from json_schemer_spark.schema.jsonvalue import (
    is_json_integer,
    is_multiple_of,
    json_equal,
    json_type,
    unique_items,
)


def test_json_type_bool_is_not_number():
    assert json_type(True) == "boolean"
    assert json_type(1) == "integer"
    assert json_type(1.5) == "number"


def test_integer_semantics():
    assert is_json_integer(1)
    assert is_json_integer(1.0)              # drafts >= 6
    assert not is_json_integer(1.0, strict=True)  # draft 4
    assert not is_json_integer(1.5)
    assert not is_json_integer(True)
    assert not is_json_integer(float("nan"))
    assert not is_json_integer(float("inf"))


def test_json_equal_number_vs_bool():
    assert json_equal(1, 1.0)
    assert not json_equal(True, 1)
    assert not json_equal(False, 0)
    assert json_equal({"a": [1, 2.0]}, {"a": [1.0, 2]})
    assert not json_equal({"a": 1}, {"a": True})


def test_unique_items():
    assert unique_items([1, 2, 3])
    assert not unique_items([1, 1.0])
    assert unique_items([1, True])           # number vs bool distinct
    assert not unique_items([{"a": 1}, {"a": 1.0}])
    assert unique_items([[], {}])


def test_multiple_of_exact():
    # the classic binary-float traps (suite: multipleOf "by small number")
    assert is_multiple_of(0.0075, 0.0001)
    assert is_multiple_of(1.0, 0.25)
    assert not is_multiple_of(0.00751, 0.0001)
    assert is_multiple_of(9, 3)
    assert not is_multiple_of(9, 4)
    assert not is_multiple_of(1, 0)


def test_unevaluated_does_not_leak_from_positional_children():
    """Round-3 fix: evaluated-property/item annotations of a POSITIONAL
    child (different instance location) must not mark the parent's keys/
    indices as evaluated — {"a": {"b": 1}, "b": 2} has an unevaluated "b"
    at the root even though the child evaluated ITS "b"."""
    from json_schemer_spark.schema.dialects import DRAFT202012
    from json_schemer_spark.schema.interpreter import Evaluator

    s = {"properties": {"a": {"properties": {"b": {"type": "integer"}}}},
         "unevaluatedProperties": False}
    ev = Evaluator(s, dialect=DRAFT202012)
    assert ev.valid({"a": {"b": 1}})
    assert not ev.valid({"a": {"b": 1}, "b": 2})

    s2 = {"prefixItems": [{"prefixItems": [{}, {}]}], "unevaluatedItems": False}
    ev2 = Evaluator(s2, dialect=DRAFT202012)
    assert ev2.valid([[1, 2]])
    assert not ev2.valid([[1, 2], 3])

    # in-place applicators DO merge evaluated sets (same location)
    s3 = {"allOf": [{"properties": {"b": {}}}], "unevaluatedProperties": False}
    ev3 = Evaluator(s3, dialect=DRAFT202012)
    assert ev3.valid({"b": 1})


def test_openapi_format_tables_split_by_version():
    """Round-2 ADVICE: 3.0 int32/int64 are draft4-strict (integral floats
    vacuous-pass); byte/binary/date exist only in the 3.0 table."""
    from json_schemer_spark.schema.formats import (
        OPENAPI30_FORMATS,
        OPENAPI31_FORMATS,
    )

    # 3.0: floats vacuous-pass int32; 3.1: integral floats are checked
    assert OPENAPI30_FORMATS["int32"](3e10, "int32")
    assert not OPENAPI31_FORMATS["int32"](3e10, "int32")
    assert not OPENAPI30_FORMATS["int32"](2**40, "int32")
    assert OPENAPI30_FORMATS["int64"](2**40, "int64")
    # byte/binary/date are 3.0-only
    for f in ("byte", "binary", "date"):
        assert f in OPENAPI30_FORMATS and f not in OPENAPI31_FORMATS
    assert not OPENAPI30_FORMATS["byte"]("not base64!!", "byte")
