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
