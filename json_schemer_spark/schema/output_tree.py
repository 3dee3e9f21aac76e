"""Nested output-unit trees: the ``verbose`` and ``detailed`` formats.

The reference builds a Result tree during evaluation — one Result per
schema application, whose ``nested`` holds one Result per evaluated
KEYWORD, whose ``nested`` holds the subschema applications (result.rb:12,
output.rb:15-17). ``verbose`` emits that tree whole (result.rb:152-160);
``detailed`` prunes it by collapsing nodes with exactly one
validity-matching child (result.rb:136-150).

This module is the tree-producing twin of the compiled interpreter: a
recursive evaluator that mirrors :mod:`interpreter`'s keyword semantics but
records a unit per keyword application instead of flat rows. It runs
driver-side only (``validate_value(output_format='verbose'|'detailed')``) —
the flat compiled path stays the hot tier. Two safety nets keep the twins
honest: ``tests/test_output_tree.py`` replays the ENTIRE conformance suite
asserting tree verdict == compiled verdict, and validates emitted trees
against the suite's official output schema.

Unit fields follow the 2019-09/2020-12 output spec: ``valid``,
``keywordLocation`` (the DYNAMIC evaluation path, through ``$ref``),
``absoluteKeywordLocation`` (resource base URI + lexical pointer),
``instanceLocation``, and ``error``/``annotation``; children sit under
``errors``/``annotations`` per the unit's own validity (output.rb:16).
Keyword-unit ``error`` strings use the REFERENCE's wording (each vocab
class's ``error`` method + result.rb:225 ``formatted_instance_location``,
round-5 close of the last documented divergence); keyword values
interpolate Ruby ``to_s``-style (bare strings, true/false, JSON for
arrays — ``_rb``).
The reference's ``ignore_nested`` flag and subresult adoption ARE modeled
(round-4): ``oneOf`` with >1 match and ``contains`` render as leaves;
``not``/``if``/``then``/``else`` adopt their subschema's nested results
(result.rb:121,137,167; applicator.rb:60,73-118,214); and
``$ref``/``$dynamicRef``/``$recursiveRef`` adopt the TARGET's result as
the keyword unit itself (core.rb:66-68 returns it directly) — no wrapper
level.
"""

from __future__ import annotations

from typing import Any, Optional

from json_schemer_spark.schema.dialects import Dialect
from json_schemer_spark.schema.interpreter import (
    Evaluator,
    SchemaCompileError,
    _BUILTIN_ENCODINGS,
    _BUILTIN_MEDIA_TYPES,
    _NON_ANNOTATION_KEYWORDS,
)
from json_schemer_spark.schema.jsonvalue import (
    is_json_number,
    is_multiple_of,
    join_pointer,
    json_equal,
    json_type,
    unique_items,
)
from json_schemer_spark.schema.registry import Resource, split_fragment


def _floc(ipath: str) -> str:
    """result.rb:225-227 formatted_instance_location."""
    return "root" if not ipath else f"`{ipath}`"


def _rb_float(f: float) -> str:
    """Ruby ``Float#to_s``: same fixed/exponent thresholds as Python repr
    (1e16 / 1e-5), but the mantissa always carries a decimal point
    (``1.0e+16``, not ``1e+16``)."""
    s = repr(f)
    if "e" in s:
        mant, exp = s.split("e")
        if "." not in mant:
            mant += ".0"
        return mant + "e" + exp
    if "." not in s and "inf" not in s and "nan" not in s:
        s += ".0"
    return s


def _rb_str(s: str) -> str:
    """Ruby ``String#inspect`` for list members: double-quoted, literal
    UTF-8 kept (unlike json.dumps' \\uXXXX), controls escaped."""
    out = ['"']
    esc = {'"': '\\"', "\\": "\\\\", "\n": "\\n", "\t": "\\t", "\r": "\\r"}
    for ch in s:
        if ch in esc:
            out.append(esc[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04X}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _rb(v: Any, nested: bool = False) -> str:
    """Ruby ``#{value}`` interpolation parity for keyword values in error
    messages: bare strings / "" for nil at top level, ``Array#to_s``
    member inspection inside lists (``nil``, literal UTF-8 strings,
    ``1.0e+16``-style floats — review finding: json.dumps diverged on all
    three). Hashes fall back to json.dumps (no hash-valued keywords reach
    unit messages)."""
    import json as _json

    if v is None:
        return "nil" if nested else ""
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return _rb_str(v) if nested else v
    if isinstance(v, float):
        return _rb_float(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, list):
        return "[" + ", ".join(_rb(x, nested=True) for x in v) + "]"
    return _json.dumps(v)


def _esc(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


class _Node:
    """One schema application while building the tree."""

    __slots__ = ("valid", "units", "props", "items")

    def __init__(self) -> None:
        self.valid = True
        self.units: list = []       # keyword-level units, evaluation order
        self.props: set = set()     # evaluated property names (this location)
        self.items: set = set()     # evaluated item indices (this location)


class TreeEvaluator:
    """Builds the full output-unit tree for one instance.

    Wraps a host :class:`Evaluator` for its registry (ref resolution,
    dialect dispatch), regex cache, format checkers and configuration.
    """

    def __init__(self, host: Evaluator) -> None:
        self.host = host
        self._access_mode: Optional[str] = None

    # -- public -----------------------------------------------------------

    def tree(self, instance: Any, access_mode: Optional[str] = None) -> dict:
        host = self.host
        self._access_mode = access_mode
        scope = [host.root_resource]
        info = host.registry.info(host.root)
        spath = info.pointer if info is not None else ""
        return self._apply(host.root, instance, "", "", spath, scope,
                           host.root_resource.dialect)[0]

    # -- node application --------------------------------------------------

    def _unit(self, valid: bool, kloc: str, abs_loc: str, iloc: str,
              error: Optional[str] = None, annotation: Any = None,
              nested: Optional[list] = None) -> dict:
        out = {
            "valid": valid,
            "keywordLocation": kloc,
            "absoluteKeywordLocation": abs_loc,
            "instanceLocation": iloc,
        }
        if not valid and error is not None:
            out["error"] = error
        if valid and annotation is not None:
            out["annotation"] = annotation
        if nested:
            out["errors" if not valid else "annotations"] = nested
        return out

    def _apply(
        self,
        schema: Any,
        instance: Any,
        ipath: str,
        kloc: str,
        spath: str,
        scope: list[Resource],
        dialect: Dialect,
    ) -> tuple[dict, set, set]:
        """Apply one schema node → (node unit, evaluated props, items)."""
        host = self.host
        registry = host.registry

        if schema is True or (isinstance(schema, dict) and not schema):
            base = scope[-1].uri
            return (self._unit(True, kloc, f"{base}#{spath}", ipath), set(), set())
        if schema is False:
            base = scope[-1].uri
            return (
                self._unit(False, kloc, f"{base}#{spath}", ipath,
                           error="false schema disallows everything"),
                set(), set(),
            )
        if not isinstance(schema, dict):
            raise SchemaCompileError(f"invalid schema at {spath!r}: {type(schema)}")

        info = registry.info(schema)
        pushed = False
        if info is not None:
            dialect = info.dialect
            base_uri = info.base_uri
            spath = info.pointer
            if info.resource is not scope[-1]:
                scope.append(info.resource)
                pushed = True
        else:
            base_uri = scope[-1].uri
        try:
            return self._apply_object(schema, instance, ipath, kloc, spath,
                                      scope, dialect, base_uri)
        finally:
            if pushed:
                scope.pop()

    def _apply_object(self, schema, instance, ipath, kloc, spath, scope,
                      dialect, base_uri) -> tuple[dict, set, set]:
        host = self.host
        registry = host.registry
        node = _Node()
        res_base = scope[-1].uri

        def abs_kw(kw: str) -> str:
            return f"{res_base}#{spath}/{_esc(kw)}"

        def assert_unit(kw: str, ok: bool, message: str, at: Optional[str] = None):
            node.units.append(self._unit(
                ok, f"{kloc}/{kw}", abs_kw(kw), ipath if at is None else at,
                error=None if ok else message))
            if not ok:
                node.valid = False

        def applicator_unit(kw: str, ok: bool, children: list,
                            message: Optional[str] = None,
                            assert_: bool = True, at: Optional[str] = None):
            node.units.append(self._unit(
                ok, f"{kloc}/{kw}", abs_kw(kw), ipath if at is None else at,
                error=None if ok else (message or f"instance failed {kw!r}"),
                nested=children))
            if assert_ and not ok:
                node.valid = False

        def merge_inplace(child_unit: dict, props: set, items: set):
            """Same-location child: evaluated sets merge when valid."""
            if child_unit["valid"]:
                node.props.update(props)
                node.items.update(items)

        # --- referencing --------------------------------------------------
        ref = schema.get("$ref")
        if isinstance(ref, str):
            try:
                target, _res, tptr = registry.resolve_ref_with_pointer(ref, base_uri)
            except (KeyError, IndexError, TypeError) as exc:
                raise SchemaCompileError(f"unresolvable $ref {ref!r}: {exc}") from exc
            if tptr is None:
                tptr = f"{spath}/$ref"
            cu, cp, ci = self._apply(target, instance, ipath, f"{kloc}/$ref",
                                     tptr, scope, dialect)
            # reference Ref.validate (core.rb:66-68) RETURNS the target's
            # result — the target unit (already addressed at .../$ref) IS
            # the $ref keyword unit; no wrapper level (round-4 close of the
            # last documented verbose-shape divergence)
            node.units.append(cu)
            if not cu["valid"]:
                node.valid = False
            merge_inplace(cu, cp, ci)
            if dialect.exclusive_ref:
                # drafts 4-7: $ref replaces all sibling keywords
                base = res_base
                root_unit = self._unit(node.valid, kloc, f"{base}#{spath}",
                                       ipath, nested=node.units)
                return root_unit, node.props, node.items

        dref = schema.get("$dynamicRef")
        if dialect.has_dynamic_ref and isinstance(dref, str):
            target, tptr = self._resolve_dynamic(dref, spath, scope, base_uri)
            cu, cp, ci = self._apply(target, instance, ipath,
                                     f"{kloc}/$dynamicRef", tptr, scope, dialect)
            node.units.append(cu)  # adopt the target result (core.rb:98-109)
            if not cu["valid"]:
                node.valid = False
            merge_inplace(cu, cp, ci)

        rref = schema.get("$recursiveRef")
        if dialect.has_recursive_ref and isinstance(rref, str):
            target, tptr = self._resolve_recursive(spath, scope)
            cu, cp, ci = self._apply(target, instance, ipath,
                                     f"{kloc}/$recursiveRef", tptr, scope, dialect)
            node.units.append(cu)  # adopt the target result
            if not cu["valid"]:
                node.valid = False
            merge_inplace(cu, cp, ci)

        # --- OpenAPI discriminator (verdict only — dispatch internals stay
        # in the flat tier; open OAS verbose trees are out of spec scope) ---
        disc = schema.get("discriminator") if dialect.openapi else None
        disc_active = isinstance(disc, dict) and isinstance(disc.get("propertyName"), str)
        if disc_active:
            r = host._eval_discriminator(schema, disc, instance, ipath, spath,
                                         scope, dialect, base_uri)
            assert_unit("discriminator", r.valid,
                        f"value at {_floc(ipath)} does not match `discriminator` schema")

        v_on = dialect.vocab_enabled("validation")

        # --- type / enum / const -----------------------------------------
        ty = schema.get("type") if v_on else None
        if ty is not None:
            allowed = ty if isinstance(ty, list) else [ty]
            if dialect.openapi == 30 and schema.get("nullable") is True:
                allowed = list(allowed) + ["null"]
            ok = any(host._type_ok(instance, t, dialect) for t in allowed)
            _art = {"null": "is not null", "boolean": "is not a boolean",
                    "number": "is not a number", "integer": "is not an integer",
                    "string": "is not a string", "array": "is not an array",
                    "object": "is not an object"}
            tmsg = (
                f"value at {_floc(ipath)} {_art[ty]}"
                if isinstance(ty, str) and ty in _art
                else f"value at {_floc(ipath)} is not one of the types: {_rb(ty)}"
            )
            assert_unit("type", ok, tmsg)

        if v_on and "enum" in schema:
            ok = any(json_equal(instance, v) for v in schema["enum"])
            assert_unit("enum", ok,
                        f"value at {_floc(ipath)} is not one of: {_rb(schema['enum'])}")

        if v_on and dialect.has_const and "const" in schema:
            ok = json_equal(instance, schema["const"])
            assert_unit("const", ok,
                        f"value at {_floc(ipath)} is not: {_rb(schema['const'])}")

        # --- readOnly / writeOnly under access_mode -----------------------
        if self._access_mode:
            if schema.get("readOnly") is True and self._access_mode != "read":
                assert_unit("readOnly", False, f"value at {_floc(ipath)} is `readOnly`")
            if schema.get("writeOnly") is True and self._access_mode != "write":
                assert_unit("writeOnly", False, f"value at {_floc(ipath)} is `writeOnly`")

        # --- format assertion --------------------------------------------
        assert_fmt = host.assert_formats or (
            dialect.enabled_vocabs is not None
            and "format-assertion" in dialect.enabled_vocabs
        )
        if assert_fmt and "format" in schema:
            fmt = schema["format"]
            checker = host.formats.get(fmt)
            if checker is None and not host.formats:
                from json_schemer_spark.schema.formats import FORMAT_CHECKS

                checker = FORMAT_CHECKS.get(fmt)
            if checker is None and dialect.openapi:
                from json_schemer_spark.schema.formats import openapi_formats

                checker = openapi_formats(dialect.openapi).get(fmt)
            if checker is not None:
                assert_unit("format", bool(checker(instance, fmt)),
                            f"value at {_floc(ipath)} does not match format: {fmt}")

        # --- numbers ------------------------------------------------------
        if is_json_number(instance) and v_on:
            if "multipleOf" in schema:
                assert_unit("multipleOf", is_multiple_of(instance, schema["multipleOf"]),
                            f"number at {_floc(ipath)} is not a multiple of: {_rb(schema['multipleOf'])}")
            maximum = schema.get("maximum")
            if is_json_number(maximum):
                excl = dialect.boolean_exclusive_bounds and schema.get("exclusiveMaximum") is True
                bad = (instance >= maximum) if excl else (instance > maximum)
                assert_unit(
                    "exclusiveMaximum" if excl else "maximum", not bad,
                    f"number at {_floc(ipath)} is greater than or equal to `maximum`"
                    if excl else
                    f"number at {_floc(ipath)} is greater than: {_rb(maximum)}")
            minimum = schema.get("minimum")
            if is_json_number(minimum):
                excl = dialect.boolean_exclusive_bounds and schema.get("exclusiveMinimum") is True
                bad = (instance <= minimum) if excl else (instance < minimum)
                assert_unit(
                    "exclusiveMinimum" if excl else "minimum", not bad,
                    f"number at {_floc(ipath)} is less than or equal to `minimum`"
                    if excl else
                    f"number at {_floc(ipath)} is less than: {_rb(minimum)}")
            if not dialect.boolean_exclusive_bounds:
                exmax = schema.get("exclusiveMaximum")
                if is_json_number(exmax):
                    assert_unit("exclusiveMaximum", instance < exmax,
                                f"number at {_floc(ipath)} is greater than or equal to: {_rb(exmax)}")
                exmin = schema.get("exclusiveMinimum")
                if is_json_number(exmin):
                    assert_unit("exclusiveMinimum", instance > exmin,
                                f"number at {_floc(ipath)} is less than or equal to: {_rb(exmin)}")

        # --- strings ------------------------------------------------------
        elif isinstance(instance, str):
            if v_on and "maxLength" in schema:
                assert_unit("maxLength", len(instance) <= schema["maxLength"],
                            f"string length at {_floc(ipath)} is greater than: {_rb(schema['maxLength'])}")
            if v_on and "minLength" in schema:
                assert_unit("minLength", len(instance) >= schema["minLength"],
                            f"string length at {_floc(ipath)} is less than: {_rb(schema['minLength'])}")
            if v_on and "pattern" in schema:
                ok = bool(host._regex(schema["pattern"]).search(instance))
                assert_unit("pattern", ok,
                            f"string at {_floc(ipath)} does not match pattern: {schema['pattern']}")
            if dialect.content_assertion and (
                "contentEncoding" in schema or "contentMediaType" in schema
            ):
                decoded: Any = instance
                ok = True
                enc = schema.get("contentEncoding")
                if enc is not None:
                    codec = host.content_encodings.get(enc) or _BUILTIN_ENCODINGS.get(enc)
                    if codec is not None:
                        ok, dec2 = codec(decoded)
                        assert_unit("contentEncoding", ok,
                                    f"string at {_floc(ipath)} could not be decoded using encoding: {enc}")
                        if ok:
                            decoded = dec2
                mt = schema.get("contentMediaType")
                if ok and mt is not None:
                    parser = host.content_media_types.get(mt) or _BUILTIN_MEDIA_TYPES.get(mt)
                    if parser is not None:
                        ok2, _parsed = parser(decoded)
                        assert_unit("contentMediaType", ok2,
                                    f"string at {_floc(ipath)} could not be parsed using media type: {mt}")

        # --- arrays -------------------------------------------------------
        elif isinstance(instance, list):
            n = len(instance)
            if v_on and "maxItems" in schema:
                assert_unit("maxItems", n <= schema["maxItems"],
                            f"array size at {_floc(ipath)} is greater than: {_rb(schema['maxItems'])}")
            if v_on and "minItems" in schema:
                assert_unit("minItems", n >= schema["minItems"],
                            f"array size at {_floc(ipath)} is less than: {_rb(schema['minItems'])}")
            if v_on and schema.get("uniqueItems") is True:
                assert_unit("uniqueItems", unique_items(instance),
                            f"array items at {_floc(ipath)} are not unique")

            def apply_items(kw: str, pairs):
                """pairs: [(index, subschema, child_spath, child_kloc)]."""
                children = []
                ok = True
                for i, sub, csp, ckl in pairs:
                    cu, _cp, _ci = self._apply(sub, instance[i], f"{ipath}/{i}",
                                               ckl, csp, scope, dialect)
                    children.append(cu)
                    ok = ok and cu["valid"]
                    node.items.add(i)
                if children:
                    msgs = {
                        "prefixItems": f"array items at {_floc(ipath)} do not match corresponding `prefixItems` schemas",
                        "items": (
                            f"array items at {_floc(ipath)} do not match `items` schema"
                            if dialect.has_prefix_items else
                            f"array items at {_floc(ipath)} do not match `items` schema(s)"
                        ),
                        "additionalItems": f"array items at {_floc(ipath)} do not match `additionalItems` schema",
                    }
                    applicator_unit(kw, ok, children, message=msgs[kw])

            if dialect.has_prefix_items:
                prefix = schema.get("prefixItems")
                plen = len(prefix) if isinstance(prefix, list) else 0
                if plen:
                    apply_items("prefixItems", [
                        (i, prefix[i], f"{spath}/prefixItems/{i}",
                         f"{kloc}/prefixItems/{i}")
                        for i in range(min(plen, n))
                    ])
                it = schema.get("items")
                if it is not None and plen < n:
                    apply_items("items", [
                        (i, it, f"{spath}/items", f"{kloc}/items")
                        for i in range(plen, n)
                    ])
            elif dialect.array_form_items:
                it = schema.get("items")
                if isinstance(it, list):
                    apply_items("items", [
                        (i, it[i], f"{spath}/items/{i}", f"{kloc}/items/{i}")
                        for i in range(min(len(it), n))
                    ])
                    add = schema.get("additionalItems")
                    if add is not None and n > len(it):
                        apply_items("additionalItems", [
                            (i, add, f"{spath}/additionalItems",
                             f"{kloc}/additionalItems")
                            for i in range(len(it), n)
                        ])
                elif it is not None:
                    apply_items("items", [
                        (i, it, f"{spath}/items", f"{kloc}/items")
                        for i in range(n)
                    ])

            if dialect.has_contains and "contains" in schema:
                sub = schema["contains"]
                children = []
                matched = []
                for i in range(n):
                    cu, _cp, _ci = self._apply(sub, instance[i], f"{ipath}/{i}",
                                               f"{kloc}/contains",
                                               f"{spath}/contains", scope, dialect)
                    children.append(cu)
                    if cu["valid"]:
                        matched.append(i)
                min_c = schema.get("minContains", 1) if dialect.has_min_max_contains else 1
                max_c = schema.get("maxContains") if dialect.has_min_max_contains else None
                ok = len(matched) >= min_c
                # reference Contains sets ignore_nested => true
                # (applicator.rb:214): per-element results never surface
                applicator_unit("contains", ok, [],
                                message=f"array at {_floc(ipath)} does not contain enough items that match `contains` schema")
                if dialect.has_min_max_contains:
                    if "minContains" in schema:
                        assert_unit("minContains", len(matched) >= min_c,
                                    f"number of array items at {_floc(ipath)} matching `contains` schema is less than: {_rb(schema['minContains'])}")
                    if max_c is not None:
                        assert_unit("maxContains", len(matched) <= max_c,
                                    f"number of array items at {_floc(ipath)} matching `contains` schema is greater than: {_rb(max_c)}")
                node.items.update(matched)

        # --- objects ------------------------------------------------------
        elif isinstance(instance, dict):
            n = len(instance)
            if v_on and "maxProperties" in schema:
                assert_unit("maxProperties", n <= schema["maxProperties"],
                            f"object size at {_floc(ipath)} is greater than: {_rb(schema['maxProperties'])}")
            if v_on and "minProperties" in schema:
                assert_unit("minProperties", n >= schema["minProperties"],
                            f"object size at {_floc(ipath)} is less than: {_rb(schema['minProperties'])}")
            req = schema.get("required") if v_on else None
            if isinstance(req, list):
                req_keys = req
                if self._access_mode and isinstance(schema.get("properties"), dict):
                    mode = self._access_mode

                    def _inapplicable(k):
                        sub = schema["properties"].get(k)
                        if not isinstance(sub, dict):
                            return False
                        if mode == "write" and sub.get("readOnly") is True:
                            return True
                        return mode == "read" and sub.get("writeOnly") is True

                    req_keys = [k for k in req if not _inapplicable(k)]
                missing = [k for k in req_keys if k not in instance]
                assert_unit("required", not missing,
                            f"object at {_floc(ipath)} is missing required properties: {', '.join(missing)}")

            dep_req = None
            if v_on and dialect.has_dependent_keywords:
                dep_req = schema.get("dependentRequired")
            if isinstance(dep_req, dict):
                for key, needs in dep_req.items():
                    if key in instance:
                        missing = [k for k in needs if k not in instance]
                        if missing:
                            assert_unit("dependentRequired", False,
                                        f"object at {_floc(join_pointer(ipath, key))} is missing required `dependentRequired` properties",
                                        at=join_pointer(ipath, key))

            matched_keys: set = set()
            properties = schema.get("properties")
            if isinstance(properties, dict):
                children = []
                ok = True
                for k, sub in properties.items():
                    if k in instance:
                        cu, _cp, _ci = self._apply(
                            sub, instance[k], join_pointer(ipath, k),
                            f"{kloc}/properties/{_esc(k)}",
                            f"{spath}/properties/{_esc(k)}", scope, dialect)
                        children.append(cu)
                        ok = ok and cu["valid"]
                        matched_keys.add(k)
                if children:
                    applicator_unit("properties", ok, children,
                                    message=f"object properties at {_floc(ipath)} do not match corresponding `properties` schemas")

            pattern_props = schema.get("patternProperties")
            if isinstance(pattern_props, dict):
                children = []
                ok = True
                for pattern, sub in pattern_props.items():
                    rx = host._regex(pattern)
                    for k in instance:
                        if rx.search(k):
                            cu, _cp, _ci = self._apply(
                                sub, instance[k], join_pointer(ipath, k),
                                f"{kloc}/patternProperties/{_esc(pattern)}",
                                f"{spath}/patternProperties/{_esc(pattern)}",
                                scope, dialect)
                            children.append(cu)
                            ok = ok and cu["valid"]
                            matched_keys.add(k)
                if children:
                    applicator_unit("patternProperties", ok, children,
                                    message=f"object properties at {_floc(ipath)} do not match corresponding `patternProperties` schemas")

            node.props.update(matched_keys)

            if "additionalProperties" in schema:
                sub = schema["additionalProperties"]
                children = []
                ok = True
                for k in instance:
                    if k not in matched_keys:
                        cu, _cp, _ci = self._apply(
                            sub, instance[k], join_pointer(ipath, k),
                            f"{kloc}/additionalProperties",
                            f"{spath}/additionalProperties", scope, dialect)
                        children.append(cu)
                        ok = ok and cu["valid"]
                        node.props.add(k)
                if children:
                    applicator_unit("additionalProperties", ok, children,
                                    message=f"object properties at {_floc(ipath)} do not match `additionalProperties` schema")

            if dialect.has_property_names and "propertyNames" in schema:
                sub = schema["propertyNames"]
                children = []
                ok = True
                for k in instance:
                    cu, _cp, _ci = self._apply(
                        sub, k, ipath, f"{kloc}/propertyNames",
                        f"{spath}/propertyNames", scope, dialect)
                    children.append(cu)
                    ok = ok and cu["valid"]
                if children:
                    applicator_unit("propertyNames", ok, children,
                                    message=f"object property names at {_floc(ipath)} do not match `propertyNames` schema")

            deps = schema.get("dependencies") if dialect.has_legacy_dependencies else None
            if isinstance(deps, dict):
                for key, dep in deps.items():
                    if key in instance:
                        if isinstance(dep, list):
                            missing = [k for k in dep if k not in instance]
                            if missing:
                                assert_unit("dependencies", False,
                                            f"object at {_floc(ipath)} either does not match applicable `dependencies` schemas or is missing required `dependencies` properties")
                        else:
                            cu, cp, ci = self._apply(
                                dep, instance, ipath,
                                f"{kloc}/dependencies/{_esc(key)}",
                                f"{spath}/dependencies/{_esc(key)}", scope, dialect)
                            applicator_unit("dependencies", cu["valid"], [cu],
                                            message=f"object at {_floc(ipath)} either does not match applicable `dependencies` schemas or is missing required `dependencies` properties")
                            merge_inplace(cu, cp, ci)

            dep_schemas = schema.get("dependentSchemas") if dialect.has_dependent_keywords else None
            if isinstance(dep_schemas, dict):
                for key, sub in dep_schemas.items():
                    if key in instance:
                        cu, cp, ci = self._apply(
                            sub, instance, ipath,
                            f"{kloc}/dependentSchemas/{_esc(key)}",
                            f"{spath}/dependentSchemas/{_esc(key)}", scope, dialect)
                        applicator_unit("dependentSchemas", cu["valid"], [cu],
                                        message=f"value at {_floc(ipath)} does not match applicable `dependentSchemas` schemas")
                        merge_inplace(cu, cp, ci)

        # --- in-place applicators ----------------------------------------
        all_of = schema.get("allOf")
        if isinstance(all_of, list):
            children = []
            ok = True
            for i, sub in enumerate(all_of):
                cu, cp, ci = self._apply(sub, instance, ipath,
                                         f"{kloc}/allOf/{i}",
                                         f"{spath}/allOf/{i}", scope, dialect)
                children.append(cu)
                ok = ok and cu["valid"]
                merge_inplace(cu, cp, ci)
            applicator_unit("allOf", ok, children,
                            message=f"value at {_floc(ipath)} does not match all `allOf` schemas")

        any_of = None if disc_active else schema.get("anyOf")
        if isinstance(any_of, list):
            children = []
            ok = False
            for i, sub in enumerate(any_of):
                cu, cp, ci = self._apply(sub, instance, ipath,
                                         f"{kloc}/anyOf/{i}",
                                         f"{spath}/anyOf/{i}", scope, dialect)
                children.append(cu)
                if cu["valid"]:
                    ok = True
                    merge_inplace(cu, cp, ci)
            applicator_unit("anyOf", ok, children,
                            message=f"value at {_floc(ipath)} does not match any `anyOf` schemas")

        one_of = None if disc_active else schema.get("oneOf")
        if isinstance(one_of, list):
            children = []
            n_valid = 0
            for i, sub in enumerate(one_of):
                cu, cp, ci = self._apply(sub, instance, ipath,
                                         f"{kloc}/oneOf/{i}",
                                         f"{spath}/oneOf/{i}", scope, dialect)
                children.append(cu)
                if cu["valid"]:
                    n_valid += 1
                    merge_inplace(cu, cp, ci)
            # reference ignore_nested (applicator.rb:60): when MORE than one
            # branch matched, the branch units are suppressed in every
            # output walk — the oneOf unit renders as a leaf
            applicator_unit("oneOf", n_valid == 1,
                            [] if n_valid > 1 else children,
                            message=f"value at {_floc(ipath)} does not match exactly one `oneOf` schema")

        if "not" in schema:
            cu, _cp, _ci = self._apply(schema["not"], instance, ipath,
                                       f"{kloc}/not", f"{spath}/not", scope, dialect)
            # reference Not (applicator.rb:73-76) adopts the SUBSCHEMA's
            # nested results directly — the subschema unit itself does not
            # surface as a nested unit (round-3 review divergence, closed)
            applicator_unit("not", not cu["valid"], _nested_of(cu),
                            message=f"value at {_floc(ipath)} matches `not` schema")

        if dialect.has_if_then_else and "if" in schema:
            cu_if, cp, ci = self._apply(schema["if"], instance, ipath,
                                        f"{kloc}/if", f"{spath}/if", scope, dialect)
            # `if` never asserts: valid unit, annotation = condition verdict,
            # subschema children adopted (applicator.rb:86)
            node.units.append(self._unit(
                True, f"{kloc}/if", abs_kw("if"), ipath,
                annotation=cu_if["valid"], nested=_nested_of(cu_if)))
            if cu_if["valid"]:
                merge_inplace(cu_if, cp, ci)
                if "then" in schema:
                    cu, cp2, ci2 = self._apply(schema["then"], instance, ipath,
                                               f"{kloc}/then", f"{spath}/then",
                                               scope, dialect)
                    applicator_unit("then", cu["valid"], _nested_of(cu),
                                    message=f"value at {_floc(ipath)} does not match conditional `then` schema")
                    merge_inplace(cu, cp2, ci2)
            elif "else" in schema:
                cu, cp2, ci2 = self._apply(schema["else"], instance, ipath,
                                           f"{kloc}/else", f"{spath}/else",
                                           scope, dialect)
                applicator_unit("else", cu["valid"], _nested_of(cu),
                                message=f"value at {_floc(ipath)} does not match conditional `else` schema")
                merge_inplace(cu, cp2, ci2)

        # --- custom keywords ---------------------------------------------
        for kw, fn in host.custom_keywords.items():
            if kw in schema:
                result = fn(instance, schema[kw], ipath)
                if result is True or result is None:
                    assert_unit(kw, True, "")
                elif result is False:
                    assert_unit(kw, False, f"custom keyword {kw!r} failed")
                elif isinstance(result, (list, tuple)) and result:
                    for err_type in result:
                        assert_unit(str(err_type), False,
                                    f"custom keyword {kw!r}: {err_type}")

        # --- unevaluated* (consume annotations; last) ---------------------
        if dialect.has_unevaluated:
            if "unevaluatedProperties" in schema and isinstance(instance, dict):
                sub = schema["unevaluatedProperties"]
                children = []
                ok = True
                for k in instance:
                    if k not in node.props:
                        cu, _cp, _ci = self._apply(
                            sub, instance[k], join_pointer(ipath, k),
                            f"{kloc}/unevaluatedProperties",
                            f"{spath}/unevaluatedProperties", scope, dialect)
                        children.append(cu)
                        ok = ok and cu["valid"]
                        node.props.add(k)
                if children:
                    applicator_unit("unevaluatedProperties", ok, children,
                                    message=f"object properties at {_floc(ipath)} do not match `unevaluatedProperties` schema")
            if "unevaluatedItems" in schema and isinstance(instance, list):
                sub = schema["unevaluatedItems"]
                children = []
                ok = True
                for i in range(len(instance)):
                    if i not in node.items:
                        cu, _cp, _ci = self._apply(
                            sub, instance[i], f"{ipath}/{i}",
                            f"{kloc}/unevaluatedItems",
                            f"{spath}/unevaluatedItems", scope, dialect)
                        children.append(cu)
                        ok = ok and cu["valid"]
                        node.items.add(i)
                if children:
                    applicator_unit("unevaluatedItems", ok, children,
                                    message=f"array items at {_floc(ipath)} do not match `unevaluatedItems` schema")

        # --- annotation producers ----------------------------------------
        for kw in ("title", "description", "default", "deprecated",
                   "readOnly", "writeOnly", "examples"):
            if kw in schema:
                node.units.append(self._unit(
                    True, f"{kloc}/{_esc(kw)}", abs_kw(kw), ipath,
                    annotation=schema[kw]))
        if "format" in schema and not host.assert_formats:
            node.units.append(self._unit(
                True, f"{kloc}/format", abs_kw("format"), ipath,
                annotation=schema["format"]))
        for kw, value in schema.items():
            if kw not in _NON_ANNOTATION_KEYWORDS and kw not in (
                "title", "description", "default", "deprecated",
                "readOnly", "writeOnly", "examples", "format",
            ):
                node.units.append(self._unit(
                    True, f"{kloc}/{_esc(kw)}", abs_kw(kw), ipath,
                    annotation=value))

        root_unit = self._unit(node.valid, kloc, f"{res_base}#{spath}", ipath,
                               nested=node.units)
        return root_unit, node.props, node.items

    # -- dynamic / recursive resolution (mirrors interpreter helpers) -------

    def _resolve_dynamic(self, ref: str, spath: str, scope, base_uri: str):
        registry = self.host.registry
        target, tres, tptr = registry.resolve_ref_with_pointer(ref, base_uri)
        frag = split_fragment(ref)[1]
        if frag and not frag.startswith("/") and frag in tres.dynamic_anchors:
            for res in scope:  # outermost-first
                if frag in res.dynamic_anchors:
                    target = res.dynamic_anchors[frag]
                    tptr = res.dynamic_anchor_ptrs.get(frag, tptr)
                    break
        if tptr is None:
            tptr = f"{spath}/$dynamicRef"
        return target, tptr

    def _resolve_recursive(self, spath: str, scope):
        registry = self.host.registry
        current = scope[-1]
        target = current.root
        if current.recursive_anchor:
            for res in scope:
                if res.recursive_anchor:
                    target = res.root
                    break
        tinfo = registry.info(target)
        tptr = tinfo.pointer if tinfo is not None else f"{spath}/$recursiveRef"
        return target, tptr


# ---------------------------------------------------------------------------
# tree → output-format projections (result.rb:136-160)
# ---------------------------------------------------------------------------

_NESTED_KEYS = ("errors", "annotations")


def _nested_of(unit: dict) -> list:
    for k in _NESTED_KEYS:
        if k in unit and isinstance(unit[k], list):
            return unit[k]
    return []


def _bare(unit: dict) -> dict:
    return {k: v for k, v in unit.items() if k not in _NESTED_KEYS}


def verbose(unit: dict) -> dict:
    """The full tree (result.rb:152-160) — already in final shape."""
    return unit


def detailed(unit: dict) -> dict:
    """Pruned hierarchy (result.rb:136-150): drop validity-mismatched
    branches; collapse nodes with exactly ONE matching child into that
    child; keep multi-child nodes with their matching children."""
    nested = _nested_of(unit)
    if not nested:
        return _bare(unit)
    matching = [n for n in nested if n["valid"] == unit["valid"]]
    if len(matching) == 1:
        return detailed(matching[0])
    out = _bare(unit)
    if matching:
        out["errors" if not unit["valid"] else "annotations"] = [
            detailed(n) for n in matching
        ]
    return out
