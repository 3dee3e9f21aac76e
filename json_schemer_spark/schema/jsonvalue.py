"""JSON value semantics: typing, deep equality, pointers, exact arithmetic.

Mirrors the semantics of json_schemer's instance model
(reference: lib/json_schemer/draft202012/vocab/validation.rb:7-62) without
porting any code: JSON booleans are NOT numbers, ``1 == 1.0``, ``integer``
means "mathematical integer" in drafts >= 6 but strictly non-float in draft 4,
and ``multipleOf`` uses exact (non-binary-float) arithmetic
(validation.rb:85-93 uses BigDecimal; we use Fraction).
"""

from __future__ import annotations

from fractions import Fraction
from math import isinf, isnan
from typing import Any

JSON_TYPES = ("null", "boolean", "object", "array", "number", "integer", "string")


def json_type(value: Any) -> str:
    """The JSON type name of a parsed JSON value (bool checked before int)."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, (list, tuple)):
        return "array"
    if isinstance(value, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(value)!r}")


def is_json_number(value: Any) -> bool:
    return isinstance(value, (int, float)) and not isinstance(value, bool)


def is_json_integer(value: Any, *, strict: bool = False) -> bool:
    """``integer`` type check. strict=True is draft-4 semantics (1.0 fails);
    otherwise a float with zero fractional part is an integer
    (reference validation.rb:7-9 vs draft4/vocab/validation.rb:6-10)."""
    if isinstance(value, bool):
        return False
    if isinstance(value, int):
        return True
    if isinstance(value, float) and not strict:
        return not (isnan(value) or isinf(value)) and value == int(value)
    return False


def json_equal(a: Any, b: Any) -> bool:
    """Deep JSON equality: bools are never equal to numbers, 1 == 1.0."""
    a_bool, b_bool = isinstance(a, bool), isinstance(b, bool)
    if a_bool or b_bool:
        return a_bool and b_bool and a is b
    if is_json_number(a) and is_json_number(b):
        return a == b
    if isinstance(a, dict):
        if not isinstance(b, dict) or len(a) != len(b):
            return False
        for k, va in a.items():
            if k not in b or not json_equal(va, b[k]):
                return False
        return True
    if isinstance(a, list):
        if not isinstance(b, list) or len(a) != len(b):
            return False
        return all(json_equal(x, y) for x, y in zip(a, b))
    if type(a) is not type(b):
        return False
    return a == b


def _hashable_key(value: Any) -> Any:
    """A hashable canonical key preserving json_equal classes (fast-path for
    uniqueItems / enum membership on large inputs)."""
    if isinstance(value, bool):
        return ("b", value)
    if is_json_number(value):
        # 1 and 1.0 must collide; Python hash(1) == hash(1.0) and 1 == 1.0.
        return ("n", value)
    if isinstance(value, str):
        return ("s", value)
    if value is None:
        return ("z",)
    if isinstance(value, list):
        return ("a", tuple(_hashable_key(v) for v in value))
    if isinstance(value, dict):
        return ("o", frozenset((k, _hashable_key(v)) for k, v in value.items()))
    raise TypeError(type(value))


def unique_items(arr: list) -> bool:
    """True when the array has no json_equal duplicates."""
    try:
        seen = set()
        for v in arr:
            k = _hashable_key(v)
            if k in seen:
                return False
            seen.add(k)
        return True
    except TypeError:  # non-JSON value snuck in; fall back to O(n^2)
        for i, a in enumerate(arr):
            for b in arr[i + 1 :]:
                if json_equal(a, b):
                    return False
        return True


def is_multiple_of(value: Any, divisor: Any) -> bool:
    """Exact multipleOf — no binary-float modulo (0.0075 % 0.0001 pitfalls).

    The reference promotes to BigDecimal (validation.rb:85-93); Fractions of
    the decimal string repr give identical results for JSON-representable
    numbers.
    """
    if isinstance(value, int) and isinstance(divisor, int):
        return divisor != 0 and value % divisor == 0
    try:
        fv = Fraction(repr(float(value))) if isinstance(value, float) else Fraction(value)
        fd = Fraction(repr(float(divisor))) if isinstance(divisor, float) else Fraction(divisor)
        if fd == 0:
            return False
        q = fv / fd
        return q.denominator == 1
    except (OverflowError, ValueError, ZeroDivisionError):
        return False


def escape_json_pointer_token(token: str) -> str:
    """RFC6901 escaping (reference location.rb:20-22 equivalent)."""
    return token.replace("~", "~0").replace("/", "~1")


def join_pointer(base: str, token: Any) -> str:
    if isinstance(token, int):
        return f"{base}/{token}"
    return f"{base}/{escape_json_pointer_token(token)}"


def resolve_json_pointer(doc: Any, pointer: str) -> Any:
    """Resolve an RFC6901 pointer (already %-decoded) against a document.

    Raises KeyError/IndexError/TypeError when the pointer does not exist.
    """
    if pointer == "":
        return doc
    if not pointer.startswith("/"):
        raise KeyError(pointer)
    node = doc
    for raw in pointer[1:].split("/"):
        token = raw.replace("~1", "/").replace("~0", "~")
        if isinstance(node, list):
            node = node[int(token)]
        elif isinstance(node, dict):
            node = node[token]
        else:
            raise TypeError(f"cannot index {type(node)} with {token!r}")
    return node
