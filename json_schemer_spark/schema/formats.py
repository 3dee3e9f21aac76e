"""Format validators (SURVEY.md §2.8; reference lib/json_schemer/format.rb
and format/*.rb — re-implemented from the public RFCs, not ported).

Two surfaces:
- ``FORMAT_CHECKS``: python callables ``(value, format_name) -> bool`` used
  by the interpreter tier (and the optional-suite replay). Non-string
  values pass vacuously, matching the reference (format.rb:5-68).
- ``FORMAT_RLIKE``: Java-regex strings for formats that lower to
  ``Column.rlike`` in the columnar tier (uuid, duration, json-pointer,
  uri-template, ipv4 fast path).
"""

from __future__ import annotations

import ipaddress
import re
from typing import Any, Callable

# ---------------------------------------------------------------------------
# regex-lowerable formats (used both as python re and Java rlike)
# ---------------------------------------------------------------------------

UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
# RFC3339 appendix-A duration
DURATION_RE = (
    r"^P(?:\d+W|"
    r"(?=\d|T)(?:\d+Y)?(?:\d+M)?(?:\d+D)?"
    r"(?:T(?=\d)(?:\d+H)?(?:\d+M)?(?:\d+(?:\.\d+)?S)?)?)$"
)
JSON_POINTER_RE = r"^(?:/(?:[^~/]|~0|~1)*)*$"
RELATIVE_JSON_POINTER_RE = r"^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~/]|~0|~1)*)*)$"
# leading zeros rejected (would be octal per historic inet_aton)
IPV4_RE = r"^(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
# RFC6570 URI template
URI_TEMPLATE_RE = (
    r"^(?:[^\x00-\x20\x7f\"'%<>\\^`{|}]|%[0-9A-Fa-f]{2}|"
    r"\{[+#./;?&=,!@|]?(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})+"
    r"(?::[1-9][0-9]{0,3}|\*)?"
    r"(?:,(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})+(?::[1-9][0-9]{0,3}|\*)?)*\})*$"
)
HOSTNAME_RE = (
    r"^[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"
)

FORMAT_RLIKE: dict[str, str] = {
    "uuid": UUID_RE,
    "duration": DURATION_RE,
    "json-pointer": JSON_POINTER_RE,
    "relative-json-pointer": RELATIVE_JSON_POINTER_RE,
    "ipv4": IPV4_RE,
    "uri-template": URI_TEMPLATE_RE,
    "hostname": HOSTNAME_RE,
}

# ---------------------------------------------------------------------------
# python-side checkers (interpreter tier / full parity)
# ---------------------------------------------------------------------------

# re.ASCII: Python \d matches Unicode digits by default; RFC3339 is ASCII
_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$", re.ASCII)
_TIME_RE = re.compile(
    r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?([zZ]|[+-]\d{2}:\d{2})$", re.ASCII
)
_DAYS = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def check_date(v: str) -> bool:
    m = _DATE_RE.match(v)
    if not m:
        return False
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12 and 1 <= d <= _DAYS[mo - 1]):
        return False
    if mo == 2 and d == 29 and not _leap(y):
        return False
    return True


def check_time(v: str) -> bool:
    m = _TIME_RE.match(v)
    if not m:
        return False
    h, mi, s = int(m.group(1)), int(m.group(2)), int(m.group(3))
    off = m.group(5)
    if h > 23 or mi > 59 or s > 60:
        return False
    if s == 60:
        # leap second only valid at 23:59:60 UTC (offset applied)
        if off in ("z", "Z"):
            utc_h, utc_m = h, mi
        else:
            sign = 1 if off[0] == "-" else -1
            oh, om = int(off[1:3]), int(off[4:6])
            if oh > 23 or om > 59:
                return False
            total = h * 60 + mi + sign * (oh * 60 + om)
            utc_h, utc_m = (total % 1440) // 60, total % 60
        if (utc_h, utc_m) != (23, 59):
            return False
    if off not in ("z", "Z"):
        oh, om = int(off[1:3]), int(off[4:6])
        if oh > 23 or om > 59:
            return False
    return True


def check_date_time(v: str) -> bool:
    if len(v) < 11 or v[10] not in "tT":
        return False
    return check_date(v[:10]) and check_time(v[11:])


_EMAIL_LOCAL_RE = re.compile(
    r"^(?:[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\.[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+)*|"
    r'"(?:[^"\\]|\\.)*")$'
)


def check_email(v: str) -> bool:
    if "@" not in v:
        return False
    local, _, domain = v.rpartition("@")
    if not local or not _EMAIL_LOCAL_RE.match(local):
        return False
    if domain.startswith("[") and domain.endswith("]"):
        inner = domain[1:-1]
        if inner.lower().startswith("ipv6:"):
            return check_ipv6(inner[5:])
        return check_ipv4(inner)
    return re.match(HOSTNAME_RE, domain) is not None and len(domain) <= 253


def check_ipv4(v: str) -> bool:
    if not re.match(IPV4_RE, v):
        return False
    return True


def check_ipv6(v: str) -> bool:
    if not re.match(r"^[0-9A-Fa-f:.]+$", v):
        return False
    try:
        ipaddress.IPv6Address(v)
        return True
    except ValueError:
        return False


def check_hostname(v: str) -> bool:
    return re.match(HOSTNAME_RE, v) is not None and len(v) <= 253


# authority: host may contain ':' only inside an IP-literal bracket;
# when an authority is present the path must be empty or start with a
# single '/' (a '//'-prefixed remainder without a valid authority is
# NOT a path — RFC3986 §3.3)
_AUTHORITY = r"(?:[^\s/?#@]*@)?(?:\[[0-9A-Fa-f:.]+\]|[^\s/?#@:\[\]]*)(?::\d*)?"
_HIER = rf"(?://{_AUTHORITY}(?:/[^\s?#]*)?|/(?!/)[^\s?#]*|[^/\s?#][^\s?#]*|)"
_URI_RE = re.compile(
    rf"^[A-Za-z][A-Za-z0-9+.-]*:{_HIER}(?:\?[^\s#]*)?(?:#\S*)?$"
)
_URI_REF_RE = re.compile(
    rf"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?{_HIER}(?:\?[^\s#]*)?(?:#\S*)?$"
)
_ASCII = re.compile(r"^[\x00-\x7f]*$")


def check_uri(v: str) -> bool:
    return _URI_RE.match(v) is not None and _ASCII.match(v) is not None and "\\" not in v


def check_uri_reference(v: str) -> bool:
    return _URI_REF_RE.match(v) is not None and _ASCII.match(v) is not None and "\\" not in v


def check_iri(v: str) -> bool:
    return _URI_RE.match(v) is not None and "\\" not in v


def check_iri_reference(v: str) -> bool:
    return _URI_REF_RE.match(v) is not None and "\\" not in v


# escapes legal in ECMA-262 regex; \a etc. are SyntaxErrors there even
# though Python accepts them (reject-unsupported-token stance, mirroring
# the reference's ecma_regexp.rb:38-49)
_ECMA_BAD_ESCAPE = re.compile(r"\\([A-Za-z])")
_ECMA_OK_ESCAPES = set("bBdDfnrsStvwWxucpPk0123456789")


def check_regex(v: str) -> bool:
    for m in _ECMA_BAD_ESCAPE.finditer(v):
        if m.group(1) not in _ECMA_OK_ESCAPES:
            return False
    try:
        re.compile(v)
        return True
    except re.error:
        return False


def _rx(name: str) -> Callable[[str], bool]:
    # re.ASCII: Java regex \d is ASCII-only; keep python behavior identical
    rx = re.compile(FORMAT_RLIKE[name], re.ASCII)
    return lambda v: rx.match(v) is not None


_IDN_LABEL_RE = re.compile(r"^[\w](?:[\w-]{0,61}[\w])?$", re.UNICODE)


def check_idn_email(v: str) -> bool:
    if check_email(v):
        return True
    if "@" not in v:
        return False
    local, _, domain = v.rpartition("@")
    if not local or any(ch.isspace() for ch in local):
        return False
    labels = domain.split(".")
    return all(_IDN_LABEL_RE.match(l) for l in labels) and len(labels) >= 1


def _idn_hostname(v: str) -> bool:
    from json_schemer_spark.schema.idna import check_idn_hostname

    return check_idn_hostname(v)


def _wrap(fn: Callable[[str], bool]) -> Callable[[Any, Any], bool]:
    def check(value: Any, _fmt: Any = None) -> bool:
        if not isinstance(value, str):
            return True  # non-strings pass vacuously (format.rb:5-68)
        return fn(value)

    return check


FORMAT_CHECKS: dict[str, Callable[[Any, Any], bool]] = {
    "date": _wrap(check_date),
    "time": _wrap(check_time),
    "date-time": _wrap(check_date_time),
    "duration": _wrap(_rx("duration")),
    "email": _wrap(check_email),
    "idn-email": _wrap(check_idn_email),
    "hostname": _wrap(check_hostname),
    "idn-hostname": _wrap(_idn_hostname),
    "ipv4": _wrap(check_ipv4),
    "ipv6": _wrap(check_ipv6),
    "uri": _wrap(check_uri),
    "uri-reference": _wrap(check_uri_reference),
    "iri": _wrap(check_iri),
    "iri-reference": _wrap(check_iri_reference),
    "uuid": _wrap(_rx("uuid")),
    "uri-template": _wrap(_rx("uri-template")),
    "json-pointer": _wrap(_rx("json-pointer")),
    "relative-json-pointer": _wrap(_rx("relative-json-pointer")),
    "regex": _wrap(check_regex),
}


# ---------------------------------------------------------------------------
# OpenAPI 3.x data-type formats (reference openapi31/meta.rb:5-12,
# openapi30/meta.rb:5-12). Unlike the core formats, these apply to
# non-string instances too (int32/int64/float/double on numbers); each
# checker vacuous-passes on non-applicable types, reference style.
# ---------------------------------------------------------------------------

def _int_value(v) -> int | None:
    """JSON-integer value (int or integral float), else None."""
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return None


def _check_int_bits(v: Any, bits: int) -> bool:
    i = _int_value(v)
    if i is None:
        return True
    return -(2 ** (bits - 1)) <= i <= 2 ** (bits - 1) - 1


def _check_float_format(v: Any, _f: Any) -> bool:
    # numbers must be floats (integers fail `float`/`double` — reference:
    # `!instance.is_a?(Numeric) || instance.is_a?(Float)`)
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return True
    return isinstance(v, float)


def _check_byte(v: Any, _f: Any) -> bool:
    if not isinstance(v, str):
        return True
    import base64
    import binascii

    try:
        base64.b64decode(v, validate=True)
        return True
    except (binascii.Error, ValueError):
        return False


def _strict_int_value(v) -> "int | None":
    """Draft4 valid_integer?: strict Integer only — integral Floats are NOT
    integers, so OAS 3.0 int32/int64 vacuous-pass them (openapi30/meta.rb:7-8,
    round-2 ADVICE)."""
    if isinstance(v, bool) or not isinstance(v, int):
        return None
    return v


def _check_int_bits_strict(v: Any, bits: int) -> bool:
    i = _strict_int_value(v)
    if i is None:
        return True
    return -(2 ** (bits - 1)) <= i <= 2 ** (bits - 1) - 1


# OAS 3.1 format set (openapi31/meta.rb:6-12): int32/int64 use the 2020-12
# integer notion (integral Floats count); byte/binary/date are NOT in 3.1.
OPENAPI31_FORMATS: dict[str, Callable[[Any, Any], bool]] = {
    "int32": lambda v, _f: _check_int_bits(v, 32),
    "int64": lambda v, _f: _check_int_bits(v, 64),
    "float": _check_float_format,
    "double": _check_float_format,
    "password": lambda _v, _f: True,
}

# OAS 3.0 (openapi30/meta.rb:6-12): 3.1 set + draft4-strict int32/int64 +
# byte/binary/date.
OPENAPI30_FORMATS: dict[str, Callable[[Any, Any], bool]] = {
    **OPENAPI31_FORMATS,
    "int32": lambda v, _f: _check_int_bits_strict(v, 32),
    "int64": lambda v, _f: _check_int_bits_strict(v, 64),
    "byte": _check_byte,
    # JSON strings are text by construction; the reference's
    # encoding==BINARY check has no analogue here → always valid
    "binary": lambda _v, _f: True,
    "date": _wrap(check_date),
}


def openapi_formats(version: int) -> dict[str, Callable[[Any, Any], bool]]:
    """The OAS format table for dialect.openapi (30 or 31)."""
    return OPENAPI30_FORMATS if version == 30 else OPENAPI31_FORMATS


# union table, kept for places that only gate on "is this an OAS format"
OPENAPI_FORMATS: dict[str, Callable[[Any, Any], bool]] = OPENAPI30_FORMATS
