"""Batch-oriented JSON Schema evaluator (drafts 4/6/7/2019-09/2020-12).

This is the engine's *general-case* evaluation path: a from-scratch
re-implementation of the keyword semantics catalogued in SURVEY.md §2
(reference: lib/json_schemer/draft202012/vocab/{validation,applicator,core,
unevaluated}.rb and the per-draft deltas). It runs driver-side for schema
compilation/tests and executor-side inside Arrow-batched ``mapInPandas``
stages for schemas that cannot be lowered to pure Column expressions.

Design notes (NOT a port):
- One :class:`Evaluator` per compiled schema; reused across every row of a
  batch (compile-once/validate-many, the reference's core optimization —
  schema.rb:101,368-408).
- Results carry evaluated-property/evaluated-item annotation sets so
  ``unevaluatedProperties``/``unevaluatedItems`` (SURVEY.md §2.6) compose
  with in-place applicators; annotations merge only from *valid* child
  applications.
- Violations are flat rows ``(keyword, instance_pointer, schema_pointer,
  message)`` — the "classic" output shape (result.rb:162-179 equivalent).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

from json_schemer_spark.schema.dialects import DEFAULT_DIALECT, Dialect
from json_schemer_spark.schema.jsonvalue import (
    is_json_integer,
    is_json_number,
    is_multiple_of,
    join_pointer,
    json_equal,
    json_type,
    unique_items,
)
from json_schemer_spark.schema.registry import (
    DEFAULT_BASE_URI,
    Registry,
    Resource,
    split_fragment,
)


class SchemaCompileError(ValueError):
    pass


class _NeverMatches:
    """Stand-in for an uncompilable-yet-ECMA-valid regex (e.g. ``[]``)."""

    @staticmethod
    def search(_s):
        return None


_NEVER_MATCHES = _NeverMatches()


class _Result:
    __slots__ = ("valid", "errors", "props", "items", "anns")

    def __init__(self, valid: bool, errors: Optional[list], props: Optional[set],
                 items: Optional[set], anns: Optional[list] = None):
        self.valid = valid
        self.errors = errors
        self.props = props
        self.items = items
        # annotation rows (keyword, instance_pointer, schema_pointer, value);
        # populated only under collect_annotations (2019-09 output formats)
        self.anns = anns


_VALID = _Result(True, None, None, None)


def _builtin_base64(value: Any):
    import base64
    import binascii

    try:
        return True, base64.b64decode(value, validate=True)
    except (binascii.Error, ValueError, TypeError):
        return False, None


def _builtin_json_media(value: Any):
    import json as _json

    try:
        return True, _json.loads(value)
    except (ValueError, TypeError, UnicodeDecodeError):
        return False, None


# reference lib/json_schemer/content.rb:4-17
_BUILTIN_ENCODINGS: dict[str, Callable] = {"base64": _builtin_base64}
_BUILTIN_MEDIA_TYPES: dict[str, Callable] = {"application/json": _builtin_json_media}

# keywords that are evaluated or structural — everything OUTSIDE this set is
# an unknown keyword, collected as an annotation (core.rb:128-156)
_NON_ANNOTATION_KEYWORDS = frozenset({
    "type", "enum", "const", "multipleOf", "maximum", "minimum",
    "exclusiveMaximum", "exclusiveMinimum", "maxLength", "minLength",
    "pattern", "maxItems", "minItems", "uniqueItems", "maxContains",
    "minContains", "maxProperties", "minProperties", "required",
    "dependentRequired", "contains", "items", "prefixItems",
    "additionalItems", "properties", "patternProperties",
    "additionalProperties", "propertyNames", "dependencies",
    "dependentSchemas", "allOf", "anyOf", "oneOf", "not", "if", "then",
    "else", "$ref", "$dynamicRef", "$recursiveRef", "unevaluatedItems",
    "unevaluatedProperties", "$schema", "$id", "id", "$anchor",
    "$dynamicAnchor", "$recursiveAnchor", "$vocabulary", "$defs",
    "definitions", "$comment", "x-error", "contentEncoding",
    "contentMediaType", "contentSchema", "discriminator", "nullable",
})

_X_ERROR_VAR = re.compile(r"%\{(\w+)\}")


def _interpolate_x_error(template: str, instance: Any, ipath: str,
                         keyword: str, keyword_value: Any, spath: str) -> str:
    """``%{var}`` interpolation for x-error templates (result.rb:243-257)."""
    import json as _json

    def fmt(v):
        return v if isinstance(v, str) else _json.dumps(v)

    variables = {
        "instance": fmt(instance),
        "instanceLocation": ipath or "",
        "formattedInstanceLocation": f"`{ipath or 'root'}`",
        "keyword": keyword,
        "keywordValue": fmt(keyword_value),
        "keywordLocation": f"{spath}/{keyword}",
    }
    return _X_ERROR_VAR.sub(lambda m: variables.get(m.group(1), m.group(0)), template)


class _DefaultsCollector:
    """insert_property_defaults support (reference result.rb:181-217,
    schema.rb:32-44): candidate defaults for missing properties, each with
    the chain of ancestor-validity cells (tree validity is only known after
    the full evaluation — cells are filled as each node finishes)."""

    def __init__(self) -> None:
        self.stack: list[list] = []
        # (instance_dict, property, default_value, ancestor-cells snapshot)
        self.records: list[tuple] = []

    def add(self, instance: dict, prop: str, value: Any) -> None:
        self.records.append((instance, prop, value, list(self.stack)))

    def apply(self, resolver: Callable) -> bool:
        grouped: dict[tuple, tuple] = {}
        for inst, prop, val, chain in self.records:
            key = (id(inst), prop)
            grouped.setdefault(key, (inst, prop, []))[2].append(
                (val, all(c[0] for c in chain))
            )
        inserted = False
        for inst, prop, results in grouped.values():
            if resolver(inst, prop, results) is not False:
                inserted = True
        return inserted


def default_property_default_resolver(instance: dict, prop: str, results: list) -> bool:
    """Reference DEFAULT_PROPERTY_DEFAULT_RESOLVER (schema.rb:32-44): keep
    tree-valid candidates (unless there is only one), insert iff they agree
    on exactly one distinct value."""
    import copy
    import json as _json

    if len(results) != 1:
        results = [r for r in results if r[1]]
    distinct = {_json.dumps(v, sort_keys=True) for v, _ in results}
    if len(distinct) == 1:
        instance[prop] = copy.deepcopy(results[0][0])
        return True
    return False


class Evaluator:
    """Compiled evaluator for one root schema (+ its reachable resources)."""

    def __init__(
        self,
        root_schema: Any,
        registry: Optional[Registry] = None,
        base_uri: str = DEFAULT_BASE_URI,
        dialect: Optional[Dialect] = None,
        ref_resolver: Optional[Callable[[str], Any]] = None,
        assert_formats: bool = False,
        formats: Optional[dict[str, Callable[[Any, Any], bool]]] = None,
        keywords: Optional[dict[str, Callable]] = None,
        before_property_validation: Any = None,
        after_property_validation: Any = None,
        insert_property_defaults: bool = False,
        property_default_resolver: Optional[Callable] = None,
        regexp_resolver: Optional[Callable[[str], Any]] = None,
        content_encodings: Optional[dict[str, Callable]] = None,
        content_media_types: Optional[dict[str, Callable]] = None,
        i18n_messages: Optional[dict[str, str]] = None,
    ) -> None:
        if not isinstance(root_schema, (dict, bool)):
            raise SchemaCompileError(f"schema must be an object or boolean, got {type(root_schema)}")
        self.registry = registry or Registry(ref_resolver=ref_resolver, default_dialect=dialect or DEFAULT_DIALECT)
        if self.registry.info(root_schema) is None:
            self.root_resource = self.registry.add_document(root_schema, base_uri=base_uri, dialect=dialect)
        else:
            self.root_resource = self.registry.info(root_schema).resource
        self.root = root_schema
        self.assert_formats = assert_formats
        if formats is None and assert_formats:
            from json_schemer_spark.schema.formats import FORMAT_CHECKS

            formats = FORMAT_CHECKS
        self.formats = formats or {}
        # custom keywords: name -> callable(data, schema_value, pointer)
        # returning bool OR a list of error-type strings (reference:
        # schema.rb:153-166, the `keywords:` option)
        self.custom_keywords = keywords or {}
        self._regex_cache: dict[str, Any] = {}
        # OpenAPI discriminator loop guards (replace the reference's
        # skip_ref_once handoff, openapi31/vocab/base.rb:8-21,115-118):
        # ids of schemas currently dispatching / currently being evaluated
        self._disc_stack: list[int] = []
        self._eval_stack: list[int] = []
        # extension surface (reference schema.rb:32-44,108-118,311-360;
        # applicator.rb:232-260; SURVEY.md §2.7)
        def _as_list(h):
            if h is None:
                return []
            return list(h) if isinstance(h, (list, tuple)) else [h]

        self.before_property_validation = _as_list(before_property_validation)
        self.after_property_validation = _as_list(after_property_validation)
        self.insert_property_defaults = bool(insert_property_defaults)
        self.property_default_resolver = property_default_resolver
        self.regexp_resolver = regexp_resolver
        self.content_encodings = content_encodings or {}
        self.content_media_types = content_media_types or {}
        # message-template table with the reference's i18n lookup fallback
        # chain (result.rb:50-75): most-specific location key → keyword →
        # catch-all. Templates use the same %{var} interpolation as x-error.
        self.i18n_messages = i18n_messages or {}
        # per-validate state (Evaluator is used single-threaded per row)
        self._access_mode: Optional[str] = None
        self._defaults: Optional[_DefaultsCollector] = None
        self._not_depth = 0
        self._collect_anns = False

    # -- public API -------------------------------------------------------

    def validate(self, instance: Any, access_mode: Optional[str] = None,
                 collect_annotations: bool = False) -> dict[str, Any]:
        """Full validation → {'valid': bool, 'errors': [violation rows]}
        (+ 'annotations' rows when ``collect_annotations``).

        ``access_mode`` ('read'/'write') activates readOnly/writeOnly
        assertions (reference meta_data.rb:6-26, schema.rb:108)."""
        if self.insert_property_defaults:
            self._defaults = _DefaultsCollector()
            self._run(instance, access_mode)
            resolver = self.property_default_resolver or default_property_default_resolver
            inserted = self._defaults.apply(resolver)
            self._defaults = None
            # reference revalidates ONCE after insertion (schema.rb:111-114)
            return self._run(instance, access_mode, collect_annotations)
        return self._run(instance, access_mode, collect_annotations)

    def _run(self, instance: Any, access_mode: Optional[str] = None,
             collect_annotations: bool = False) -> dict[str, Any]:
        scope = [self.root_resource]
        info = self.registry.info(self.root)
        root_spath = info.pointer if info is not None else ""
        self._access_mode = access_mode
        self._collect_anns = collect_annotations
        try:
            r = self._eval(self.root, instance, "", root_spath, scope, self.root_resource.dialect)
        except RecursionError:
            return {
                "valid": False,
                "errors": [
                    {"keyword": "$ref", "instance_pointer": "", "schema_pointer": "",
                     "message": "recursion limit exceeded (cyclic schema on self-similar data)"}
                ],
            }
        errors = [
            {"keyword": k, "instance_pointer": ip, "schema_pointer": sp, "message": m}
            for (k, ip, sp, m) in (r.errors or [])
        ]
        out = {"valid": r.valid, "errors": errors}
        if collect_annotations:
            # annotations survive only from a VALID result tree — failed
            # validation produces none (output-tests general.json)
            out["annotations"] = [
                {"keyword": k, "instance_pointer": ip, "schema_pointer": sp, "annotation": v}
                for (k, ip, sp, v) in ((r.anns or []) if r.valid else [])
            ]
        return out

    def valid(self, instance: Any) -> bool:
        return self.validate(instance)["valid"]

    # -- internals ----------------------------------------------------------

    def _regex(self, pattern: str):
        rx = self._regex_cache.get(pattern)
        if rx is None:
            from json_schemer_spark.schema.ecma_regex import EcmaRegexError, compile_ecma

            if self.regexp_resolver is not None:
                # pluggable pattern→regex (reference schema.rb:351-360);
                # must return an object with .search
                rx = self.regexp_resolver(pattern)
                self._regex_cache[pattern] = rx
                return rx
            try:
                rx = compile_ecma(pattern)
            except EcmaRegexError:
                try:
                    rx = re.compile(pattern)  # permissive fallback
                except re.error:
                    # ECMA-valid but Python-uncompilable (e.g. '[]' — an
                    # ECMA class matching nothing): degrade to never-matches
                    # instead of crashing the executor task (ADVICE r1)
                    rx = _NEVER_MATCHES
            self._regex_cache[pattern] = rx
        return rx

    def _eval(
        self,
        schema: Any,
        instance: Any,
        ipath: str,
        spath: str,
        scope: list[Resource],
        dialect: Dialect,
    ) -> _Result:
        if schema is True or (isinstance(schema, dict) and not schema):
            return _VALID
        if schema is False:
            return _Result(False, [("schema", ipath, spath, "false schema disallows everything")], None, None)
        if not isinstance(schema, dict):
            raise SchemaCompileError(f"invalid schema at {spath!r}: {type(schema)}")

        info = self.registry.info(schema)
        pushed = False
        if info is not None:
            dialect = info.dialect
            base_uri = info.base_uri
            if info.resource is not scope[-1]:
                scope.append(info.resource)
                pushed = True
        else:
            base_uri = scope[-1].uri

        try:
            return self._eval_object(schema, instance, ipath, spath, scope, dialect, base_uri)
        finally:
            if pushed:
                scope.pop()

    def _eval_object(
        self,
        schema: dict,
        instance: Any,
        ipath: str,
        spath: str,
        scope: list[Resource],
        dialect: Dialect,
        base_uri: str,
    ) -> _Result:
        # track in-flight schema nodes (discriminator loop guard) and the
        # ancestor-validity cell chain (insert_property_defaults)
        self._eval_stack.append(id(schema))
        cell = None
        if self._defaults is not None and self._not_depth == 0:
            cell = [True]
            self._defaults.stack.append(cell)
        try:
            r = self._eval_object_inner(
                schema, instance, ipath, spath, scope, dialect, base_uri)
            if cell is not None:
                cell[0] = r.valid
            return r
        finally:
            if cell is not None:
                self._defaults.stack.pop()
            self._eval_stack.pop()

    def _eval_object_inner(
        self,
        schema: dict,
        instance: Any,
        ipath: str,
        spath: str,
        scope: list[Resource],
        dialect: Dialect,
        base_uri: str,
    ) -> _Result:
        errors: list = []
        props: set = set()
        items: set = set()
        anns: list = []

        def merge(r: _Result, assert_: bool = True) -> bool:
            """Fold a child result in; annotations only from valid children."""
            nonlocal errors
            if r.valid:
                if r.props:
                    props.update(r.props)
                if r.items:
                    items.update(r.items)
                if r.anns:
                    anns.extend(r.anns)
            elif assert_:
                if r.errors:
                    errors.extend(r.errors)
            return r.valid

        valid = True

        x_error = schema.get("x-error")

        def fail(keyword: str, message: str, at: str = None) -> None:
            # classic-output convention (reference result.rb:162-179): the
            # schema pointer addresses the schema OBJECT; the failing
            # keyword rides in the type field
            nonlocal valid
            valid = False
            at_path = at if at is not None else ipath
            template = None
            if x_error is not None:
                # custom message templates with %{var} interpolation
                # (core.rb:122-126 XError; result.rb:28-35,243-257)
                template = (
                    x_error.get(keyword, x_error.get("*"))
                    if isinstance(x_error, dict) else x_error
                )
            elif self.i18n_messages:
                # i18n fallback chain (result.rb:50-75): location key first,
                # then keyword, then catch-all
                for key in (f"{base_uri}#{spath}/{keyword}",
                            f"#{spath}/{keyword}", keyword, "*"):
                    if key in self.i18n_messages:
                        template = self.i18n_messages[key]
                        break
            if isinstance(template, str):
                message = _interpolate_x_error(
                    template, instance, at_path, keyword,
                    schema.get(keyword), spath,
                )
            errors.append((keyword, at_path, spath, message))

        # --- referencing -------------------------------------------------
        ref = schema.get("$ref")
        if isinstance(ref, str):
            try:
                target, _res, tptr = self.registry.resolve_ref_with_pointer(ref, base_uri)
            except (KeyError, IndexError, TypeError) as exc:
                raise SchemaCompileError(f"unresolvable $ref {ref!r}: {exc}") from exc
            # classic output addresses errors at the resolved TARGET's
            # location, not through the $ref chain (schema.rb:272-283)
            if tptr is None:
                tptr = f"{spath}/$ref"
            if id(target) in self._disc_stack:
                # a ref back into a schema that is mid-discriminator-dispatch
                # is skipped once (allOf inheritance — skip_ref_once analogue)
                pass
            else:
                r = self._eval(target, instance, ipath, tptr, scope, dialect)
                if not merge(r):
                    valid = False
            if dialect.exclusive_ref:
                # drafts 4-7: $ref replaces all sibling keywords
                return _Result(valid, errors or None, props or None, items or None, anns or None)

        dref = schema.get("$dynamicRef")
        if dialect.has_dynamic_ref and isinstance(dref, str):
            r = self._eval_dynamic_ref(dref, instance, ipath, spath, scope, dialect, base_uri)
            if not merge(r):
                valid = False

        rref = schema.get("$recursiveRef")
        if dialect.has_recursive_ref and isinstance(rref, str):
            r = self._eval_recursive_ref(instance, ipath, spath, scope, dialect, base_uri)
            if not merge(r):
                valid = False

        # --- OpenAPI discriminator (before validation keywords — the
        # reference emits its error first, open_api_test.rb:212) ------------
        disc = schema.get("discriminator") if dialect.openapi else None
        disc_active = isinstance(disc, dict) and isinstance(disc.get("propertyName"), str)
        if disc_active and id(schema) not in self._disc_stack:
            r = self._eval_discriminator(
                schema, disc, instance, ipath, spath, scope, dialect, base_uri
            )
            if not merge(r):
                valid = False

        # --- type / enum / const -----------------------------------------
        v_on = dialect.vocab_enabled("validation")

        ty = schema.get("type") if v_on else None
        if ty is not None:
            allowed = ty if isinstance(ty, list) else [ty]
            # OpenAPI 3.0: `nullable: true` extends `type` with null
            # (reference openapi30/vocab/base.rb:6-14)
            if dialect.openapi == 30 and schema.get("nullable") is True:
                allowed = list(allowed) + ["null"]
            if not any(self._type_ok(instance, t, dialect) for t in allowed):
                # single type → error type is the expected type name
                # (reference convention); type arrays → "type"
                kw = ty if isinstance(ty, str) else "type"
                fail(kw, f"expected {ty}, got {json_type(instance)}")

        if v_on and "enum" in schema:
            if not any(json_equal(instance, v) for v in schema["enum"]):
                fail("enum", "value not in enumeration")

        if v_on and dialect.has_const and "const" in schema:
            if not json_equal(instance, schema["const"]):
                fail("const", "value does not equal const")

        # --- readOnly / writeOnly under access_mode (meta_data.rb:6-26) ----
        if self._access_mode:
            if schema.get("readOnly") is True and self._access_mode != "read":
                fail("readOnly", f"value at {ipath or '/'} is `readOnly`")
            if schema.get("writeOnly") is True and self._access_mode != "write":
                fail("writeOnly", f"value at {ipath or '/'} is `writeOnly`")

        # --- format assertion (all instance types — checkers vacuous-pass
        # non-applicable types, reference format.rb:5-68; OAS int32/int64/
        # float/double apply to numbers, openapi31/meta.rb:5-12) ------------
        assert_fmt = self.assert_formats or (
            dialect.enabled_vocabs is not None
            and "format-assertion" in dialect.enabled_vocabs
        )
        if assert_fmt and "format" in schema:
            fmt = schema["format"]
            checker = self.formats.get(fmt)
            if checker is None and not self.formats:
                from json_schemer_spark.schema.formats import FORMAT_CHECKS

                checker = FORMAT_CHECKS.get(fmt)
            if checker is None and dialect.openapi:
                from json_schemer_spark.schema.formats import OPENAPI_FORMATS

                checker = OPENAPI_FORMATS.get(fmt)
            if checker is not None and not checker(instance, fmt):
                fail("format", f"not a valid {fmt}")

        # --- numbers -------------------------------------------------------
        if is_json_number(instance) and v_on:
            if "multipleOf" in schema and not is_multiple_of(instance, schema["multipleOf"]):
                fail("multipleOf", f"not a multiple of {schema['multipleOf']}")
            maximum = schema.get("maximum")
            if is_json_number(maximum):
                excl = dialect.boolean_exclusive_bounds and schema.get("exclusiveMaximum") is True
                if (instance >= maximum) if excl else (instance > maximum):
                    fail("exclusiveMaximum" if excl else "maximum",
                         f"{instance} above {'exclusive ' if excl else ''}maximum {maximum}")
            minimum = schema.get("minimum")
            if is_json_number(minimum):
                excl = dialect.boolean_exclusive_bounds and schema.get("exclusiveMinimum") is True
                if (instance <= minimum) if excl else (instance < minimum):
                    fail("exclusiveMinimum" if excl else "minimum",
                         f"{instance} below {'exclusive ' if excl else ''}minimum {minimum}")
            if not dialect.boolean_exclusive_bounds:
                exmax = schema.get("exclusiveMaximum")
                if is_json_number(exmax) and instance >= exmax:
                    fail("exclusiveMaximum", f"{instance} not < {exmax}")
                exmin = schema.get("exclusiveMinimum")
                if is_json_number(exmin) and instance <= exmin:
                    fail("exclusiveMinimum", f"{instance} not > {exmin}")

        # --- strings -------------------------------------------------------
        elif isinstance(instance, str):
            if v_on and "maxLength" in schema and len(instance) > schema["maxLength"]:
                fail("maxLength", f"length {len(instance)} > {schema['maxLength']}")
            if v_on and "minLength" in schema and len(instance) < schema["minLength"]:
                fail("minLength", f"length {len(instance)} < {schema['minLength']}")
            if v_on and "pattern" in schema and not self._regex(schema["pattern"]).search(instance):
                fail("pattern", f"does not match pattern {schema['pattern']!r}")

            # draft7: contentEncoding/contentMediaType assert
            # (draft7/vocab/validation.rb:38-65 in the reference; annotation
            # only in 2019+)
            if dialect.content_assertion and (
                "contentEncoding" in schema or "contentMediaType" in schema
            ):
                decoded: Any = instance
                ok = True
                enc = schema.get("contentEncoding")
                if enc is not None:
                    codec = self.content_encodings.get(enc) or _BUILTIN_ENCODINGS.get(enc)
                    if codec is not None:
                        ok, dec2 = codec(decoded)
                        if ok:
                            decoded = dec2
                        else:
                            fail("contentEncoding", f"not valid {enc}")
                mt = schema.get("contentMediaType")
                if ok and mt is not None:
                    parser = self.content_media_types.get(mt) or _BUILTIN_MEDIA_TYPES.get(mt)
                    if parser is not None:
                        ok2, _parsed = parser(decoded)
                        if not ok2:
                            fail("contentMediaType", f"not parseable as {mt}")

        # --- arrays ---------------------------------------------------------
        elif isinstance(instance, list):
            n = len(instance)
            if v_on and "maxItems" in schema and n > schema["maxItems"]:
                fail("maxItems", f"{n} items > {schema['maxItems']}")
            if v_on and "minItems" in schema and n < schema["minItems"]:
                fail("minItems", f"{n} items < {schema['minItems']}")
            if v_on and schema.get("uniqueItems") is True and not unique_items(instance):
                fail("uniqueItems", "array items are not unique")

            if dialect.has_prefix_items:
                prefix = schema.get("prefixItems")
                plen = 0
                if isinstance(prefix, list):
                    plen = len(prefix)
                    for i, sub in enumerate(prefix[:n]):
                        r = self._eval(sub, instance[i], f"{ipath}/{i}",
                                       f"{spath}/prefixItems/{i}", scope, dialect)
                        if not merge(r):
                            valid = False
                        items.add(i)
                it = schema.get("items")
                if it is not None and plen < n:
                    for i in range(plen, n):
                        r = self._eval(it, instance[i], f"{ipath}/{i}", f"{spath}/items", scope, dialect)
                        if not merge(r):
                            valid = False
                        items.add(i)
            elif dialect.array_form_items:
                it = schema.get("items")
                if isinstance(it, list):
                    for i, sub in enumerate(it[:n]):
                        r = self._eval(sub, instance[i], f"{ipath}/{i}", f"{spath}/items/{i}", scope, dialect)
                        if not merge(r):
                            valid = False
                        items.add(i)
                    add = schema.get("additionalItems")
                    if add is not None and n > len(it):
                        for i in range(len(it), n):
                            r = self._eval(add, instance[i], f"{ipath}/{i}",
                                           f"{spath}/additionalItems", scope, dialect)
                            if not merge(r):
                                valid = False
                            items.add(i)
                elif it is not None:
                    for i in range(n):
                        r = self._eval(it, instance[i], f"{ipath}/{i}", f"{spath}/items", scope, dialect)
                        if not merge(r):
                            valid = False
                        items.add(i)

            if dialect.has_contains and "contains" in schema:
                sub = schema["contains"]
                matched = [
                    i for i in range(n)
                    if self._eval(sub, instance[i], f"{ipath}/{i}", f"{spath}/contains", scope, dialect).valid
                ]
                min_c = schema.get("minContains", 1) if dialect.has_min_max_contains else 1
                max_c = schema.get("maxContains") if dialect.has_min_max_contains else None
                if len(matched) < min_c:
                    # the reference emits BOTH: contains asserts the bound
                    # itself AND minContains re-asserts via the annotation
                    # (draft202012 vocab: applicator.rb:191-216 +
                    # validation.rb:199-221)
                    fail("contains", f"{len(matched)} items match contains, need >= {min_c}")
                    if "minContains" in schema:
                        fail("minContains",
                             f"{len(matched)} items match contains, need >= {min_c}")
                if max_c is not None and len(matched) > max_c:
                    fail("maxContains", f"{len(matched)} items match contains, need <= {max_c}")
                items.update(matched)

        # --- objects ----------------------------------------------------------
        elif isinstance(instance, dict):
            n = len(instance)
            if v_on and "maxProperties" in schema and n > schema["maxProperties"]:
                fail("maxProperties", f"{n} properties > {schema['maxProperties']}")
            if v_on and "minProperties" in schema and n < schema["minProperties"]:
                fail("minProperties", f"{n} properties < {schema['minProperties']}")
            req = schema.get("required") if v_on else None
            if isinstance(req, list):
                req_keys = req
                if self._access_mode and isinstance(schema.get("properties"), dict):
                    # required trims keys inapplicable under the access mode
                    # (validation.rb:243-266)
                    def _inapplicable(k):
                        sub = schema["properties"].get(k)
                        if not isinstance(sub, dict):
                            return False
                        if self._access_mode == "write" and sub.get("readOnly") is True:
                            return True
                        return self._access_mode == "read" and sub.get("writeOnly") is True

                    req_keys = [k for k in req if not _inapplicable(k)]
                missing = [k for k in req_keys if k not in instance]
                if missing:
                    fail("required", f"missing required properties: {missing}")

            dep_req = None
            if v_on and dialect.has_dependent_keywords:
                dep_req = schema.get("dependentRequired")
            if isinstance(dep_req, dict):
                for key, needs in dep_req.items():
                    if key in instance:
                        missing = [k for k in needs if k not in instance]
                        if missing:
                            # error located at the TRIGGERING key's value
                            fail("dependentRequired",
                                 f"{key!r} present but missing {missing}",
                                 at=join_pointer(ipath, key))

            properties = schema.get("properties")
            matched_keys: set = set()
            if isinstance(properties, dict):
                # before_property_validation hooks mutate the instance
                # around the `properties` application (applicator.rb:232-240)
                for hook in self.before_property_validation:
                    for k, sub in properties.items():
                        hook(instance, k, sub, schema)
                if self._defaults is not None and self._not_depth == 0:
                    for k, sub in properties.items():
                        if k not in instance:
                            d = self._resolve_default(sub, base_uri)
                            if d is not None:
                                self._defaults.add(instance, k, d[0])
                for k, sub in properties.items():
                    if k in instance:
                        r = self._eval(sub, instance[k], join_pointer(ipath, k),
                                       f"{spath}/properties/{_esc(k)}", scope, dialect)
                        if not merge(r):
                            valid = False
                        matched_keys.add(k)
                for hook in self.after_property_validation:
                    for k, sub in properties.items():
                        hook(instance, k, sub, schema)

            pattern_props = schema.get("patternProperties")
            if isinstance(pattern_props, dict):
                for pattern, sub in pattern_props.items():
                    rx = self._regex(pattern)
                    for k in instance:
                        if rx.search(k):
                            r = self._eval(sub, instance[k], join_pointer(ipath, k),
                                           f"{spath}/patternProperties/{_esc(pattern)}", scope, dialect)
                            if not merge(r):
                                valid = False
                            matched_keys.add(k)

            props.update(matched_keys)

            if "additionalProperties" in schema:
                sub = schema["additionalProperties"]
                for k in instance:
                    if k not in matched_keys:
                        r = self._eval(sub, instance[k], join_pointer(ipath, k),
                                       f"{spath}/additionalProperties", scope, dialect)
                        if not merge(r):
                            valid = False
                        props.add(k)

            if dialect.has_property_names and "propertyNames" in schema:
                sub = schema["propertyNames"]
                for k in instance:
                    # errors locate at the OBJECT (a key is not an
                    # addressable instance location — reference convention)
                    r = self._eval(sub, k, ipath,
                                   f"{spath}/propertyNames", scope, dialect)
                    if not merge(r):
                        valid = False

            deps = schema.get("dependencies") if dialect.has_legacy_dependencies else None
            if isinstance(deps, dict):
                for key, dep in deps.items():
                    if key in instance:
                        if isinstance(dep, list):
                            # unlike dependentRequired, legacy dependencies
                            # errors locate at the OBJECT (reference conv.)
                            missing = [k for k in dep if k not in instance]
                            if missing:
                                fail("dependencies",
                                     f"{key!r} present but missing {missing}")
                        else:
                            r = self._eval(dep, instance, ipath,
                                           f"{spath}/dependencies/{_esc(key)}", scope, dialect)
                            if not merge(r):
                                valid = False

            dep_schemas = schema.get("dependentSchemas") if dialect.has_dependent_keywords else None
            if isinstance(dep_schemas, dict):
                for key, sub in dep_schemas.items():
                    if key in instance:
                        r = self._eval(sub, instance, ipath,
                                       f"{spath}/dependentSchemas/{_esc(key)}", scope, dialect)
                        if not merge(r):
                            valid = False

        # --- in-place applicators (all instance types) -------------------------
        # OpenAPI: `discriminator` replaces anyOf/oneOf dispatch entirely
        # (openapi31/vocab/base.rb:25-35 — AnyOf/OneOf validate → nil)
        all_of = schema.get("allOf")
        if isinstance(all_of, list):
            for i, sub in enumerate(all_of):
                r = self._eval(sub, instance, ipath, f"{spath}/allOf/{i}", scope, dialect)
                if not merge(r):
                    valid = False

        any_of = schema.get("anyOf")
        if disc_active:
            any_of = None
        if isinstance(any_of, list):
            results = [
                self._eval(sub, instance, ipath, f"{spath}/anyOf/{i}", scope, dialect)
                for i, sub in enumerate(any_of)
            ]
            if any(r.valid for r in results):
                for r in results:
                    merge(r, assert_=False)
            else:
                # all branches failed: propagate branch errors only
                # (the reference emits no anyOf summary row)
                valid = False
                for r in results:
                    if r.errors:
                        errors.extend(r.errors)

        one_of = schema.get("oneOf")
        if disc_active:
            one_of = None
        if isinstance(one_of, list):
            results = [
                self._eval(sub, instance, ipath, f"{spath}/oneOf/{i}", scope, dialect)
                for i, sub in enumerate(one_of)
            ]
            n_valid = sum(1 for r in results if r.valid)
            if n_valid == 1:
                for r in results:
                    merge(r, assert_=False)
            else:
                valid = False
                if n_valid == 0:
                    # propagate branch errors (no summary — reference conv.)
                    for r in results:
                        if r.errors:
                            errors.extend(r.errors)
                else:
                    # annotations of individually-valid branches survive a
                    # multi-valid oneOf failure (reference: adjacent_results
                    # keep dynamically-valid nested results, schema.rb:150)
                    for r in results:
                        merge(r, assert_=False)
                    errors.append(("oneOf", ipath, spath,
                                   f"{n_valid} subschemas matched, need exactly 1"))

        if "not" in schema:
            # defaults are never collected under `not` (result.rb:186)
            self._not_depth += 1
            try:
                r = self._eval(schema["not"], instance, ipath, f"{spath}/not", scope, dialect)
            finally:
                self._not_depth -= 1
            if r.valid:
                fail("not", "instance matched 'not' subschema")

        if dialect.has_if_then_else and "if" in schema:
            r_if = self._eval(schema["if"], instance, ipath, f"{spath}/if", scope, dialect)
            if r_if.valid:
                merge(r_if, assert_=False)
                if "then" in schema:
                    r = self._eval(schema["then"], instance, ipath, f"{spath}/then", scope, dialect)
                    if not merge(r):
                        valid = False
            else:
                if "else" in schema:
                    r = self._eval(schema["else"], instance, ipath, f"{spath}/else", scope, dialect)
                    if not merge(r):
                        valid = False

        # --- custom keywords (extension surface, §2.7) ---------------------------
        for kw, fn in self.custom_keywords.items():
            if kw in schema:
                result = fn(instance, schema[kw], ipath)
                if result is True or result is None:
                    pass
                elif result is False:
                    fail(kw, f"custom keyword {kw!r} failed")
                elif isinstance(result, (list, tuple)):
                    for err_type in result:
                        fail(str(err_type), f"custom keyword {kw!r}: {err_type}")

        # --- unevaluated* (consume annotations; must run last — §2.6) -----------
        if dialect.has_unevaluated:
            if "unevaluatedProperties" in schema and isinstance(instance, dict):
                sub = schema["unevaluatedProperties"]
                for k in instance:
                    if k not in props:
                        r = self._eval(sub, instance[k], join_pointer(ipath, k),
                                       f"{spath}/unevaluatedProperties", scope, dialect)
                        if not merge(r):
                            valid = False
                        props.add(k)
            if "unevaluatedItems" in schema and isinstance(instance, list):
                sub = schema["unevaluatedItems"]
                for i in range(len(instance)):
                    if i not in items:
                        r = self._eval(sub, instance[i], f"{ipath}/{i}",
                                       f"{spath}/unevaluatedItems", scope, dialect)
                        if not merge(r):
                            valid = False
                        items.add(i)

        # --- annotation producers (meta-data values, annotation-mode format,
        # unknown keywords — reference meta_data.rb, format_annotation.rb,
        # core.rb:128-156 UnknownKeyword) -----------------------------------
        if self._collect_anns:
            for kw in ("title", "description", "default", "deprecated",
                       "readOnly", "writeOnly", "examples"):
                if kw in schema:
                    anns.append((kw, ipath, f"{spath}/{_esc(kw)}", schema[kw]))
            if "format" in schema and not self.assert_formats:
                anns.append(("format", ipath, f"{spath}/format", schema["format"]))
            for kw, value in schema.items():
                if kw not in _NON_ANNOTATION_KEYWORDS and kw not in (
                    "title", "description", "default", "deprecated",
                    "readOnly", "writeOnly", "examples", "format",
                ):
                    anns.append((kw, ipath, f"{spath}/{_esc(kw)}", value))

        return _Result(valid, errors or None, props or None, items or None, anns or None)

    # -- dynamic / recursive refs -----------------------------------------------

    def _eval_dynamic_ref(
        self, ref: str, instance: Any, ipath: str, spath: str,
        scope: list[Resource], dialect: Dialect, base_uri: str,
    ) -> _Result:
        target, tres, tptr = self.registry.resolve_ref_with_pointer(ref, base_uri)
        frag = split_fragment(ref)[1]
        if frag and not frag.startswith("/") and frag in tres.dynamic_anchors:
            for res in scope:  # outermost-first
                if frag in res.dynamic_anchors:
                    target = res.dynamic_anchors[frag]
                    tptr = res.dynamic_anchor_ptrs.get(frag, tptr)
                    break
        if tptr is None:
            tptr = f"{spath}/$dynamicRef"
        return self._eval(target, instance, ipath, tptr, scope, dialect)

    def _eval_recursive_ref(
        self, instance: Any, ipath: str, spath: str,
        scope: list[Resource], dialect: Dialect, base_uri: str,
    ) -> _Result:
        current = scope[-1]
        target = current.root
        if current.recursive_anchor:
            for res in scope:  # outermost-first
                if res.recursive_anchor:
                    target = res.root
                    break
        tinfo = self.registry.info(target)
        tptr = tinfo.pointer if tinfo is not None else f"{spath}/$recursiveRef"
        return self._eval(target, instance, ipath, tptr, scope, dialect)

    def _resolve_default(self, sub: Any, base_uri: str, depth: int = 0):
        """The `default` keyword of a property subschema, resolved through
        ``$ref``/``$dynamicRef`` chains (reference schema.rb default keyword
        resolution for insert_property_defaults). Returns a 1-tuple (so a
        literal None default is distinguishable) or None."""
        if not isinstance(sub, dict) or depth > 16:
            return None
        if "default" in sub:
            return (sub["default"],)
        ref = sub.get("$ref") or sub.get("$dynamicRef") or sub.get("$recursiveRef")
        if isinstance(ref, str):
            try:
                target, res, _ptr = self.registry.resolve_ref_with_pointer(ref, base_uri)
            except (KeyError, IndexError, TypeError):
                return None
            return self._resolve_default(target, res.uri, depth + 1)
        return None

    # -- OpenAPI discriminator (openapi31/vocab/base.rb:36-123) -----------------

    _FIXED_FIELD = re.compile(r"^[a-zA-Z0-9.\-_]+$")

    def _eval_discriminator(
        self, schema: dict, disc: dict, instance: Any, ipath: str, spath: str,
        scope: list[Resource], dialect: Dialect, base_uri: str,
    ) -> _Result:
        def failure() -> _Result:
            return _Result(
                False,
                [("discriminator", ipath, spath,
                  "value does not match `discriminator` schema")],
                None, None,
            )

        if not isinstance(instance, dict):
            return failure()
        pname = disc["propertyName"]
        if pname not in instance:
            return failure()
        pval = instance[pname]
        mapping = disc.get("mapping") or {}

        branches: list = []
        if isinstance(schema.get("anyOf"), list):
            branches += schema["anyOf"]
        if isinstance(schema.get("oneOf"), list):
            branches += schema["oneOf"]

        target = None
        tspath = f"{spath}/discriminator"
        if branches:
            # anyOf/oneOf form: branches MUST be $ref schemas; dispatch table
            # = implicit (#/components/schemas/ names) merged with explicit
            # `mapping` (explicit wins) — openapi31/vocab/base.rb:50-77
            by_ref: dict[str, Any] = {}
            by_name: dict[str, Any] = {}
            for sub in branches:
                if not isinstance(sub, dict) or not isinstance(sub.get("$ref"), str):
                    raise SchemaCompileError(
                        "discriminator anyOf/oneOf branches must be $ref schemas")
                ref = sub["$ref"]
                by_ref[ref] = sub
                if ref.startswith("#/components/schemas/"):
                    name = ref[len("#/components/schemas/"):]
                    if self._FIXED_FIELD.match(name):
                        by_name[name] = sub
            explicit: dict[str, Any] = {}
            for k, name_or_ref in mapping.items():
                tgt = by_name.get(name_or_ref) or by_ref.get(name_or_ref)
                if tgt is None:
                    raise SchemaCompileError(
                        f"discriminator mapping target {name_or_ref!r} not in anyOf/oneOf")
                explicit[k] = tgt
            explicit_ids = {id(s) for s in explicit.values()}
            table = {n: s for n, s in by_name.items() if id(s) not in explicit_ids}
            table.update(explicit)
            if not isinstance(pval, str) or pval not in table:
                return failure()
            target = table[pval]
        else:
            # bare form: resolve `#/components/schemas/{value}` (fixed-field
            # names), else as a raw ref — openapi31/vocab/base.rb:79-100
            if not isinstance(pval, str):
                return failure()
            name_or_ref = mapping.get(pval, pval)
            if not isinstance(name_or_ref, str):
                return failure()
            if self._FIXED_FIELD.match(name_or_ref):
                try:
                    target, _res, tptr = self.registry.resolve_ref_with_pointer(
                        f"#/components/schemas/{name_or_ref}", base_uri)
                    tspath = tptr if tptr is not None else tspath
                except (KeyError, IndexError, TypeError):
                    target = None
            if target is None:
                try:
                    target, _res, tptr = self.registry.resolve_ref_with_pointer(
                        name_or_ref, base_uri)
                    tspath = tptr if tptr is not None else tspath
                except (KeyError, IndexError, TypeError):
                    return failure()

        # skip_ref_once equivalents (openapi31/vocab/base.rb:8-21,115-118):
        # dispatching into a schema that is already mid-evaluation = the
        # child-standalone direction (child.allOf → parent → parent's
        # discriminator must not dispatch back to the child)
        if id(target) in self._eval_stack:
            return _VALID
        # while dispatching, a $ref back into this schema (the parent-
        # dispatch direction) is skipped inside _eval_object's $ref handling
        self._disc_stack.append(id(schema))
        try:
            # target errors flow through as-is — the reference emits no
            # discriminator summary for a failed dispatch (open_api_test.rb
            # missing_hunting_skill expectations)
            return self._eval(target, instance, ipath, tspath, scope, dialect)
        finally:
            self._disc_stack.pop()

    # -- type dispatch ----------------------------------------------------------

    @staticmethod
    def _type_ok(instance: Any, t: str, dialect: Dialect) -> bool:
        if t == "integer":
            return is_json_integer(instance, strict=dialect.strict_integer)
        if t == "number":
            return is_json_number(instance)
        if t == "string":
            return isinstance(instance, str)
        if t == "boolean":
            return isinstance(instance, bool)
        if t == "null":
            return instance is None
        if t == "array":
            return isinstance(instance, list)
        if t == "object":
            return isinstance(instance, dict)
        return False


def _esc(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")
