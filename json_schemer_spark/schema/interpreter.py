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


class _St:
    """Per-application mutable state for a compiled node plan. Containers
    allocate lazily — most applications produce no errors/props/items."""

    __slots__ = ("valid", "errors", "props", "items", "anns")

    def __init__(self) -> None:
        self.valid = True
        self.errors = None
        self.props = None
        self.items = None
        self.anns = None


def _merge(st: "_St", r: _Result) -> None:
    """Fold an asserting IN-PLACE child application ($ref/allOf/
    dependentSchemas/...) into the node state: verdict asserts; evaluated
    props/items and annotations merge when the child is valid."""
    if r.valid:
        if r.props:
            if st.props is None:
                st.props = set(r.props)
            else:
                st.props.update(r.props)
        if r.items:
            if st.items is None:
                st.items = set(r.items)
            else:
                st.items.update(r.items)
        if r.anns:
            if st.anns is None:
                st.anns = list(r.anns)
            else:
                st.anns.extend(r.anns)
    else:
        st.valid = False
        if r.errors:
            if st.errors is None:
                st.errors = list(r.errors)
            else:
                st.errors.extend(r.errors)


def _merge_soft(st: "_St", r: _Result) -> None:
    """Non-asserting in-place merge (anyOf winners, a passing `if`)."""
    if r.valid:
        _merge(st, r)


def _merge_pos(st: "_St", r: _Result) -> None:
    """Fold a POSITIONAL child application (properties/items/contains/
    propertyNames/unevaluated*) in: verdict asserts and annotations flow up,
    but the child's evaluated-property/item sets do NOT — they describe a
    different instance location (round-3 fix: merging them made
    unevaluatedProperties miss parent/child name collisions)."""
    if r.valid:
        if r.anns:
            if st.anns is None:
                st.anns = list(r.anns)
            else:
                st.anns.extend(r.anns)
    else:
        st.valid = False
        if r.errors:
            if st.errors is None:
                st.errors = list(r.errors)
            else:
                st.errors.extend(r.errors)


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
        # track the eval stack for EVERY node when the document's root is
        # OpenAPI: a discriminator can re-dispatch into branches that rebind
        # $schema to a plain draft, and the loop guard must see them too
        # (round-3 ADVICE; per-node dialect alone missed that case)
        self._track_eval_stack = bool(self.root_resource.dialect.openapi)
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
        # compiled node plans, memoized by schema-node identity with the
        # node object stored alongside for an identity check on lookup
        # (nodes are kept alive by the registry's document pins; the check
        # turns an id()-recycling collision into a recompile, round-3 ADVICE)
        self._plans: dict[int, tuple] = {}
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
        """Evaluate via the schema node's COMPILED plan (round-3 rework:
        per-node closure pre-dispatch — the round-2 profile attributed ~45%
        of interpreter time to re-walking the schema dict and its ~60
        keyword/dialect branches on every application). Plans compile
        lazily on first application (preserving the reference's lazy $ref
        resolution: unresolvable refs raise on first validate) and are
        memoized by node identity; everything static — keyword values,
        dialect gates, compiled regexes, resolved refs, child plans, error
        templates, schema pointers — binds at compile time."""
        if schema is True or (isinstance(schema, dict) and not schema):
            return _VALID
        if schema is False:
            return _Result(False, [("schema", ipath, spath, "false schema disallows everything")], None, None)
        if not isinstance(schema, dict):
            raise SchemaCompileError(f"invalid schema at {spath!r}: {type(schema)}")
        got = self._plans.get(id(schema))
        if got is not None and got[0] is schema:
            plan = got[1]
        else:
            # identity verified on lookup (round-3 ADVICE): a recycled id()
            # from a collected transient dict must miss loudly, not return
            # a stale plan silently
            plan = self._compile(schema, spath, dialect)
            self._plans[id(schema)] = (schema, plan)
        return plan(instance, ipath, scope)

    def _child(self, sub: Any, child_spath: str, dialect: Dialect):
        """Compile-time: a runnable ``fn(instance, ipath, scope) -> _Result``
        for a subschema position. Dict children resolve their compiled plan
        lazily through the shared memo (cycle-safe; shared $ref targets
        share one plan)."""
        if sub is True or (isinstance(sub, dict) and not sub):
            return lambda instance, ipath, scope: _VALID
        if sub is False:
            def run_false(instance, ipath, scope, _sp=child_spath):
                return _Result(False, [("schema", ipath, _sp, "false schema disallows everything")], None, None)
            return run_false
        if not isinstance(sub, dict):
            raise SchemaCompileError(f"invalid schema at {child_spath!r}: {type(sub)}")
        key = id(sub)
        plans = self._plans
        cell: list = [None]

        def run_dict(instance, ipath, scope):
            p = cell[0]
            if p is None:
                got = plans.get(key)
                if got is not None and got[0] is sub:
                    p = got[1]
                else:
                    p = self._compile(sub, child_spath, dialect)
                    plans[key] = (sub, p)
                cell[0] = p
            return p(instance, ipath, scope)

        return run_dict

    def _compile(self, schema: dict, fb_spath: str, fb_dialect: Dialect):
        """Build the node plan: lists of bound check closures per phase.

        Every closure receives ``(instance, ipath, scope, st)`` and mutates
        the per-application ``_St``. Evaluation ORDER is part of the
        contract (classic error rows are order-sensitive in the golden
        fixtures): refs, discriminator, type/enum/const, access-mode,
        format, the instance-typed block, in-place applicators, custom
        keywords, unevaluated*, annotations.

        Positional children (properties/items/contains/...) do NOT merge
        their evaluated-property/item sets into this node — those describe
        a DIFFERENT instance location (round-3 fix: the round-2 evaluator
        leaked them, so `unevaluatedProperties` missed name collisions like
        {"a": {"b": 1}, "b": 2}). In-place applicators (refs, allOf/anyOf/
        oneOf/if/then/else, dependentSchemas, discriminator) do merge.
        """
        registry = self.registry
        info = registry.info(schema)
        if info is not None:
            dialect = info.dialect
            base_uri = info.base_uri
            spath = info.pointer
            resource = info.resource
        else:
            dialect = fb_dialect or self.root_resource.dialect
            base_uri = self.root_resource.uri
            spath = fb_spath
            resource = None

        sid = id(schema)
        x_error = schema.get("x-error")
        i18n = self.i18n_messages

        def bind_fail(keyword: str):
            """Per-keyword error emitter with the x-error / i18n template
            resolution done at COMPILE time (result.rb:28-75)."""
            template = None
            if x_error is not None:
                template = (
                    x_error.get(keyword, x_error.get("*"))
                    if isinstance(x_error, dict) else x_error
                )
            elif i18n:
                for key in (f"{base_uri}#{spath}/{keyword}",
                            f"#{spath}/{keyword}", keyword, "*"):
                    if key in i18n:
                        template = i18n[key]
                        break
            kval = schema.get(keyword)
            if isinstance(template, str):
                def emit(st, instance, ipath, message, at=None, _t=template,
                         _kw=keyword, _kv=kval, _sp=spath):
                    at_path = ipath if at is None else at
                    st.valid = False
                    msg = _interpolate_x_error(_t, instance, at_path, _kw, _kv, _sp)
                    if st.errors is None:
                        st.errors = []
                    st.errors.append((_kw, at_path, _sp, msg))
            else:
                def emit(st, instance, ipath, message, at=None, _kw=keyword, _sp=spath):
                    at_path = ipath if at is None else at
                    st.valid = False
                    if st.errors is None:
                        st.errors = []
                    st.errors.append((_kw, at_path, _sp, message))
            return emit

        common: list = []
        num_checks: list = []
        str_checks: list = []
        arr_checks: list = []
        obj_checks: list = []
        tail: list = []

        # --- referencing -------------------------------------------------
        exclusive_ref_only = False
        ref = schema.get("$ref")
        if isinstance(ref, str):
            disc_stack = self._disc_stack

            def compile_ref(_ref=ref):
                try:
                    target, _res, tptr = registry.resolve_ref_with_pointer(_ref, base_uri)
                except (KeyError, IndexError, TypeError) as exc:
                    raise SchemaCompileError(f"unresolvable $ref {_ref!r}: {exc}") from exc
                # classic output addresses errors at the resolved TARGET's
                # location, not through the $ref chain (schema.rb:272-283)
                if tptr is None:
                    tptr = f"{spath}/$ref"
                return self._child(target, tptr, dialect), id(target)

            ref_cell: list = [None]

            def ref_check(instance, ipath, scope, st):
                bound = ref_cell[0]
                if bound is None:
                    bound = ref_cell[0] = compile_ref()
                runner, tid = bound
                if tid in disc_stack:
                    # a ref back into a schema mid-discriminator-dispatch is
                    # skipped once (allOf inheritance — skip_ref_once)
                    return
                _merge(st, runner(instance, ipath, scope))

            common.append(ref_check)
            if dialect.exclusive_ref:
                # drafts 4-7: $ref replaces ALL sibling keywords
                exclusive_ref_only = True

        if not exclusive_ref_only:
            dref = schema.get("$dynamicRef")
            if dialect.has_dynamic_ref and isinstance(dref, str):
                def dref_check(instance, ipath, scope, st, _r=dref):
                    _merge(st, self._eval_dynamic_ref(
                        _r, instance, ipath, spath, scope, dialect, base_uri))
                common.append(dref_check)

            rref = schema.get("$recursiveRef")
            if dialect.has_recursive_ref and isinstance(rref, str):
                def rref_check(instance, ipath, scope, st):
                    _merge(st, self._eval_recursive_ref(
                        instance, ipath, spath, scope, dialect, base_uri))
                common.append(rref_check)

        # --- OpenAPI discriminator (before validation keywords) -----------
        disc = schema.get("discriminator") if dialect.openapi else None
        disc_active = isinstance(disc, dict) and isinstance(disc.get("propertyName"), str)
        if disc_active and not exclusive_ref_only:
            def disc_check(instance, ipath, scope, st, _d=disc):
                if sid not in self._disc_stack:
                    _merge(st, self._eval_discriminator(
                        schema, _d, instance, ipath, spath, scope, dialect, base_uri))
            common.append(disc_check)

        v_on = dialect.vocab_enabled("validation")

        if not exclusive_ref_only:
            # --- type / enum / const -------------------------------------
            ty = schema.get("type") if v_on else None
            if ty is not None:
                allowed = ty if isinstance(ty, list) else [ty]
                if dialect.openapi == 30 and schema.get("nullable") is True:
                    allowed = list(allowed) + ["null"]
                strict = dialect.strict_integer
                preds = []
                for t in allowed:
                    if t == "integer":
                        preds.append(lambda i, _s=strict: is_json_integer(i, strict=_s))
                    elif t == "number":
                        preds.append(is_json_number)
                    elif t == "string":
                        preds.append(lambda i: isinstance(i, str))
                    elif t == "boolean":
                        preds.append(lambda i: isinstance(i, bool))
                    elif t == "null":
                        preds.append(lambda i: i is None)
                    elif t == "array":
                        preds.append(lambda i: isinstance(i, list))
                    elif t == "object":
                        preds.append(lambda i: isinstance(i, dict))
                    else:
                        preds.append(lambda i: False)
                kw = ty if isinstance(ty, str) else "type"
                type_fail = bind_fail(kw)
                if len(preds) == 1:
                    pred = preds[0]

                    def type_check(instance, ipath, scope, st, _ty=ty):
                        if not pred(instance):
                            type_fail(st, instance, ipath,
                                      f"expected {_ty}, got {json_type(instance)}")
                else:
                    def type_check(instance, ipath, scope, st, _ty=ty, _ps=tuple(preds)):
                        for p in _ps:
                            if p(instance):
                                return
                        type_fail(st, instance, ipath,
                                  f"expected {_ty}, got {json_type(instance)}")
                common.append(type_check)

            if v_on and "enum" in schema:
                enum_vals = tuple(schema["enum"])
                enum_fail = bind_fail("enum")

                def enum_check(instance, ipath, scope, st, _vs=enum_vals):
                    for v in _vs:
                        if json_equal(instance, v):
                            return
                    enum_fail(st, instance, ipath, "value not in enumeration")
                common.append(enum_check)

            if v_on and dialect.has_const and "const" in schema:
                const_val = schema["const"]
                const_fail = bind_fail("const")

                def const_check(instance, ipath, scope, st, _v=const_val):
                    if not json_equal(instance, _v):
                        const_fail(st, instance, ipath, "value does not equal const")
                common.append(const_check)

            # --- readOnly / writeOnly under access_mode -------------------
            if schema.get("readOnly") is True or schema.get("writeOnly") is True:
                ro = schema.get("readOnly") is True
                wo = schema.get("writeOnly") is True
                ro_fail = bind_fail("readOnly") if ro else None
                wo_fail = bind_fail("writeOnly") if wo else None

                def access_check(instance, ipath, scope, st):
                    mode = self._access_mode
                    if not mode:
                        return
                    if ro and mode != "read":
                        ro_fail(st, instance, ipath, f"value at {ipath or '/'} is `readOnly`")
                    if wo and mode != "write":
                        wo_fail(st, instance, ipath, f"value at {ipath or '/'} is `writeOnly`")
                common.append(access_check)

            # --- format assertion ----------------------------------------
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
                    from json_schemer_spark.schema.formats import openapi_formats

                    checker = openapi_formats(dialect.openapi).get(fmt)
                if checker is not None:
                    fmt_fail = bind_fail("format")

                    def format_check(instance, ipath, scope, st, _c=checker, _f=fmt):
                        if not _c(instance, _f):
                            fmt_fail(st, instance, ipath, f"not a valid {_f}")
                    common.append(format_check)

            # --- numbers --------------------------------------------------
            if v_on:
                if "multipleOf" in schema:
                    mo = schema["multipleOf"]
                    mo_fail = bind_fail("multipleOf")

                    def mo_check(instance, ipath, scope, st, _m=mo):
                        if not is_multiple_of(instance, _m):
                            mo_fail(st, instance, ipath, f"not a multiple of {_m}")
                    num_checks.append(mo_check)

                bexcl = dialect.boolean_exclusive_bounds
                maximum = schema.get("maximum")
                if is_json_number(maximum):
                    excl = bexcl and schema.get("exclusiveMaximum") is True
                    kw = "exclusiveMaximum" if excl else "maximum"
                    mx_fail = bind_fail(kw)
                    prefix = "exclusive " if excl else ""

                    if excl:
                        def max_check(instance, ipath, scope, st, _b=maximum):
                            if instance >= _b:
                                mx_fail(st, instance, ipath,
                                        f"{instance} above {prefix}maximum {_b}")
                    else:
                        def max_check(instance, ipath, scope, st, _b=maximum):
                            if instance > _b:
                                mx_fail(st, instance, ipath,
                                        f"{instance} above {prefix}maximum {_b}")
                    num_checks.append(max_check)

                minimum = schema.get("minimum")
                if is_json_number(minimum):
                    excl = bexcl and schema.get("exclusiveMinimum") is True
                    kw = "exclusiveMinimum" if excl else "minimum"
                    mn_fail = bind_fail(kw)
                    prefix = "exclusive " if excl else ""

                    if excl:
                        def min_check(instance, ipath, scope, st, _b=minimum):
                            if instance <= _b:
                                mn_fail(st, instance, ipath,
                                        f"{instance} below {prefix}minimum {_b}")
                    else:
                        def min_check(instance, ipath, scope, st, _b=minimum):
                            if instance < _b:
                                mn_fail(st, instance, ipath,
                                        f"{instance} below {prefix}minimum {_b}")
                    num_checks.append(min_check)

                if not bexcl:
                    exmax = schema.get("exclusiveMaximum")
                    if is_json_number(exmax):
                        exmax_fail = bind_fail("exclusiveMaximum")

                        def exmax_check(instance, ipath, scope, st, _b=exmax):
                            if instance >= _b:
                                exmax_fail(st, instance, ipath, f"{instance} not < {_b}")
                        num_checks.append(exmax_check)
                    exmin = schema.get("exclusiveMinimum")
                    if is_json_number(exmin):
                        exmin_fail = bind_fail("exclusiveMinimum")

                        def exmin_check(instance, ipath, scope, st, _b=exmin):
                            if instance <= _b:
                                exmin_fail(st, instance, ipath, f"{instance} not > {_b}")
                        num_checks.append(exmin_check)

            # --- strings --------------------------------------------------
            if v_on and "maxLength" in schema:
                ml = schema["maxLength"]
                ml_fail = bind_fail("maxLength")

                def maxlen_check(instance, ipath, scope, st, _b=ml):
                    if len(instance) > _b:
                        ml_fail(st, instance, ipath, f"length {len(instance)} > {_b}")
                str_checks.append(maxlen_check)
            if v_on and "minLength" in schema:
                mnl = schema["minLength"]
                mnl_fail = bind_fail("minLength")

                def minlen_check(instance, ipath, scope, st, _b=mnl):
                    if len(instance) < _b:
                        mnl_fail(st, instance, ipath, f"length {len(instance)} < {_b}")
                str_checks.append(minlen_check)
            if v_on and "pattern" in schema:
                pat = schema["pattern"]
                rx = self._regex(pat)
                pat_fail = bind_fail("pattern")

                def pattern_check(instance, ipath, scope, st, _rx=rx, _p=pat):
                    if not _rx.search(instance):
                        pat_fail(st, instance, ipath, f"does not match pattern {_p!r}")
                str_checks.append(pattern_check)

            if dialect.content_assertion and (
                "contentEncoding" in schema or "contentMediaType" in schema
            ):
                enc = schema.get("contentEncoding")
                mt = schema.get("contentMediaType")
                codec = (self.content_encodings.get(enc) or _BUILTIN_ENCODINGS.get(enc)) if enc is not None else None
                parser = (self.content_media_types.get(mt) or _BUILTIN_MEDIA_TYPES.get(mt)) if mt is not None else None
                ce_fail = bind_fail("contentEncoding")
                cm_fail = bind_fail("contentMediaType")

                def content_check(instance, ipath, scope, st, _enc=enc, _mt=mt):
                    decoded = instance
                    ok = True
                    if codec is not None:
                        ok, dec2 = codec(decoded)
                        if ok:
                            decoded = dec2
                        else:
                            ce_fail(st, instance, ipath, f"not valid {_enc}")
                    if ok and parser is not None:
                        ok2, _parsed = parser(decoded)
                        if not ok2:
                            cm_fail(st, instance, ipath, f"not parseable as {_mt}")
                str_checks.append(content_check)

            # --- arrays ---------------------------------------------------
            if v_on and "maxItems" in schema:
                mi = schema["maxItems"]
                mi_fail = bind_fail("maxItems")

                def maxitems_check(instance, ipath, scope, st, _b=mi):
                    if len(instance) > _b:
                        mi_fail(st, instance, ipath, f"{len(instance)} items > {_b}")
                arr_checks.append(maxitems_check)
            if v_on and "minItems" in schema:
                mni = schema["minItems"]
                mni_fail = bind_fail("minItems")

                def minitems_check(instance, ipath, scope, st, _b=mni):
                    if len(instance) < _b:
                        mni_fail(st, instance, ipath, f"{len(instance)} items < {_b}")
                arr_checks.append(minitems_check)
            if v_on and schema.get("uniqueItems") is True:
                ui_fail = bind_fail("uniqueItems")

                def unique_check(instance, ipath, scope, st):
                    if not unique_items(instance):
                        ui_fail(st, instance, ipath, "array items are not unique")
                arr_checks.append(unique_check)

            if dialect.has_prefix_items:
                prefix = schema.get("prefixItems")
                plen = len(prefix) if isinstance(prefix, list) else 0
                if plen:
                    runners = tuple(
                        self._child(sub, f"{spath}/prefixItems/{i}", dialect)
                        for i, sub in enumerate(prefix)
                    )

                    def prefix_check(instance, ipath, scope, st, _rs=runners):
                        n = len(instance)
                        items = st.items
                        if items is None:
                            items = st.items = set()
                        for i, run in enumerate(_rs):
                            if i >= n:
                                break
                            _merge_pos(st, run(instance[i], f"{ipath}/{i}", scope))
                            items.add(i)
                    arr_checks.append(prefix_check)
                it = schema.get("items")
                if it is not None:
                    it_runner = self._child(it, f"{spath}/items", dialect)

                    def items_check(instance, ipath, scope, st, _run=it_runner, _plen=plen):
                        n = len(instance)
                        if _plen >= n:
                            return
                        items = st.items
                        if items is None:
                            items = st.items = set()
                        for i in range(_plen, n):
                            _merge_pos(st, _run(instance[i], f"{ipath}/{i}", scope))
                            items.add(i)
                    arr_checks.append(items_check)
            elif dialect.array_form_items:
                it = schema.get("items")
                if isinstance(it, list):
                    runners = tuple(
                        self._child(sub, f"{spath}/items/{i}", dialect)
                        for i, sub in enumerate(it)
                    )
                    add = schema.get("additionalItems")
                    add_runner = (
                        self._child(add, f"{spath}/additionalItems", dialect)
                        if add is not None else None
                    )

                    def tuple_items_check(instance, ipath, scope, st, _rs=runners,
                                          _ar=add_runner):
                        n = len(instance)
                        items = st.items
                        if items is None:
                            items = st.items = set()
                        for i, run in enumerate(_rs):
                            if i >= n:
                                break
                            _merge_pos(st, run(instance[i], f"{ipath}/{i}", scope))
                            items.add(i)
                        if _ar is not None and n > len(_rs):
                            for i in range(len(_rs), n):
                                _merge_pos(st, _ar(instance[i], f"{ipath}/{i}", scope))
                                items.add(i)
                    arr_checks.append(tuple_items_check)
                elif it is not None:
                    it_runner = self._child(it, f"{spath}/items", dialect)

                    def list_items_check(instance, ipath, scope, st, _run=it_runner):
                        items = st.items
                        if items is None:
                            items = st.items = set()
                        for i in range(len(instance)):
                            _merge_pos(st, _run(instance[i], f"{ipath}/{i}", scope))
                            items.add(i)
                    arr_checks.append(list_items_check)

            if dialect.has_contains and "contains" in schema:
                c_runner = self._child(schema["contains"], f"{spath}/contains", dialect)
                min_c = schema.get("minContains", 1) if dialect.has_min_max_contains else 1
                max_c = schema.get("maxContains") if dialect.has_min_max_contains else None
                has_min_kw = "minContains" in schema and dialect.has_min_max_contains
                c_fail = bind_fail("contains")
                minc_fail = bind_fail("minContains") if has_min_kw else None
                maxc_fail = bind_fail("maxContains") if max_c is not None else None

                def contains_check(instance, ipath, scope, st, _run=c_runner,
                                   _min=min_c, _max=max_c):
                    matched = [
                        i for i in range(len(instance))
                        if _run(instance[i], f"{ipath}/{i}", scope).valid
                    ]
                    if len(matched) < _min:
                        # the reference emits BOTH: contains asserts the
                        # bound itself AND minContains re-asserts
                        c_fail(st, instance, ipath,
                               f"{len(matched)} items match contains, need >= {_min}")
                        if minc_fail is not None:
                            minc_fail(st, instance, ipath,
                                      f"{len(matched)} items match contains, need >= {_min}")
                    if _max is not None and len(matched) > _max:
                        maxc_fail(st, instance, ipath,
                                  f"{len(matched)} items match contains, need <= {_max}")
                    if matched:
                        if st.items is None:
                            st.items = set()
                        st.items.update(matched)
                arr_checks.append(contains_check)

            # --- objects --------------------------------------------------
            if v_on and "maxProperties" in schema:
                mp = schema["maxProperties"]
                mp_fail = bind_fail("maxProperties")

                def maxprops_check(instance, ipath, scope, st, _b=mp):
                    if len(instance) > _b:
                        mp_fail(st, instance, ipath, f"{len(instance)} properties > {_b}")
                obj_checks.append(maxprops_check)
            if v_on and "minProperties" in schema:
                mnp = schema["minProperties"]
                mnp_fail = bind_fail("minProperties")

                def minprops_check(instance, ipath, scope, st, _b=mnp):
                    if len(instance) < _b:
                        mnp_fail(st, instance, ipath, f"{len(instance)} properties < {_b}")
                obj_checks.append(minprops_check)

            req = schema.get("required") if v_on else None
            if isinstance(req, list):
                req_fail = bind_fail("required")
                props_schema = schema.get("properties")
                props_schema = props_schema if isinstance(props_schema, dict) else None

                def required_check(instance, ipath, scope, st, _req=tuple(req),
                                   _ps=props_schema):
                    req_keys = _req
                    mode = self._access_mode
                    if mode and _ps is not None:
                        # required trims keys inapplicable under the access
                        # mode (validation.rb:243-266)
                        def _inapplicable(k):
                            sub = _ps.get(k)
                            if not isinstance(sub, dict):
                                return False
                            if mode == "write" and sub.get("readOnly") is True:
                                return True
                            return mode == "read" and sub.get("writeOnly") is True

                        req_keys = [k for k in _req if not _inapplicable(k)]
                    missing = [k for k in req_keys if k not in instance]
                    if missing:
                        req_fail(st, instance, ipath,
                                 f"missing required properties: {missing}")
                obj_checks.append(required_check)

            dep_req = None
            if v_on and dialect.has_dependent_keywords:
                dep_req = schema.get("dependentRequired")
            if isinstance(dep_req, dict):
                depr_fail = bind_fail("dependentRequired")
                dep_items = tuple((k, tuple(v)) for k, v in dep_req.items())

                def depreq_check(instance, ipath, scope, st, _deps=dep_items):
                    for key, needs in _deps:
                        if key in instance:
                            missing = [k for k in needs if k not in instance]
                            if missing:
                                # error located at the TRIGGERING key's value
                                depr_fail(st, instance, ipath,
                                          f"{key!r} present but missing {missing}",
                                          at=join_pointer(ipath, key))
                obj_checks.append(depreq_check)

            properties = schema.get("properties")
            has_props = isinstance(properties, dict) and bool(properties)
            pattern_props = schema.get("patternProperties")
            has_pats = isinstance(pattern_props, dict) and bool(pattern_props)
            has_addl = "additionalProperties" in schema

            if has_props or has_pats or has_addl:
                prop_runners = ()
                if has_props:
                    prop_runners = tuple(
                        (k, sub, self._child(sub, f"{spath}/properties/{_esc(k)}", dialect))
                        for k, sub in properties.items()
                    )
                pat_runners = ()
                if has_pats:
                    pat_runners = tuple(
                        (self._regex(pattern),
                         self._child(sub, f"{spath}/patternProperties/{_esc(pattern)}", dialect))
                        for pattern, sub in pattern_props.items()
                    )
                addl_runner = (
                    self._child(schema["additionalProperties"],
                                f"{spath}/additionalProperties", dialect)
                    if has_addl else None
                )
                before_hooks = tuple(self.before_property_validation) if has_props else ()
                after_hooks = tuple(self.after_property_validation) if has_props else ()

                def props_check(instance, ipath, scope, st, _prs=prop_runners,
                                _pats=pat_runners, _ar=addl_runner,
                                _bh=before_hooks, _ah=after_hooks):
                    props = st.props
                    if props is None:
                        props = st.props = set()
                    matched: set = set()
                    if _prs:
                        # before_property_validation hooks mutate the
                        # instance around `properties` (applicator.rb:232-240)
                        for hook in _bh:
                            for k, sub, _run in _prs:
                                hook(instance, k, sub, schema)
                        if self._defaults is not None and self._not_depth == 0:
                            for k, sub, _run in _prs:
                                if k not in instance:
                                    d = self._resolve_default(sub, base_uri)
                                    if d is not None:
                                        self._defaults.add(instance, k, d[0])
                        for k, sub, run in _prs:
                            if k in instance:
                                _merge_pos(st, run(instance[k], join_pointer(ipath, k), scope))
                                matched.add(k)
                        for hook in _ah:
                            for k, sub, _run in _prs:
                                hook(instance, k, sub, schema)
                    for rx, run in _pats:
                        for k in instance:
                            if rx.search(k):
                                _merge_pos(st, run(instance[k], join_pointer(ipath, k), scope))
                                matched.add(k)
                    props.update(matched)
                    if _ar is not None:
                        for k in instance:
                            if k not in matched:
                                _merge_pos(st, _ar(instance[k], join_pointer(ipath, k), scope))
                                props.add(k)
                obj_checks.append(props_check)

            if dialect.has_property_names and "propertyNames" in schema:
                pn_runner = self._child(schema["propertyNames"],
                                        f"{spath}/propertyNames", dialect)

                def propnames_check(instance, ipath, scope, st, _run=pn_runner):
                    for k in instance:
                        # errors locate at the OBJECT (a key is not an
                        # addressable instance location)
                        _merge_pos(st, _run(k, ipath, scope))
                obj_checks.append(propnames_check)

            deps = schema.get("dependencies") if dialect.has_legacy_dependencies else None
            if isinstance(deps, dict):
                dep_fail = bind_fail("dependencies")
                dep_entries = []
                for key, dep in deps.items():
                    if isinstance(dep, list):
                        dep_entries.append((key, tuple(dep), None))
                    else:
                        dep_entries.append(
                            (key, None,
                             self._child(dep, f"{spath}/dependencies/{_esc(key)}", dialect))
                        )

                def dependencies_check(instance, ipath, scope, st, _es=tuple(dep_entries)):
                    for key, needs, run in _es:
                        if key in instance:
                            if needs is not None:
                                # unlike dependentRequired, legacy errors
                                # locate at the OBJECT (reference conv.)
                                missing = [k for k in needs if k not in instance]
                                if missing:
                                    dep_fail(st, instance, ipath,
                                             f"{key!r} present but missing {missing}")
                            else:
                                _merge(st, run(instance, ipath, scope))
                obj_checks.append(dependencies_check)

            dep_schemas = schema.get("dependentSchemas") if dialect.has_dependent_keywords else None
            if isinstance(dep_schemas, dict):
                ds_runners = tuple(
                    (key, self._child(sub, f"{spath}/dependentSchemas/{_esc(key)}", dialect))
                    for key, sub in dep_schemas.items()
                )

                def depschemas_check(instance, ipath, scope, st, _rs=ds_runners):
                    for key, run in _rs:
                        if key in instance:
                            _merge(st, run(instance, ipath, scope))
                obj_checks.append(depschemas_check)

            # --- in-place applicators (all instance types) ----------------
            all_of = schema.get("allOf")
            if isinstance(all_of, list):
                runners = tuple(
                    self._child(sub, f"{spath}/allOf/{i}", dialect)
                    for i, sub in enumerate(all_of)
                )

                def allof_check(instance, ipath, scope, st, _rs=runners):
                    for run in _rs:
                        _merge(st, run(instance, ipath, scope))
                tail.append(allof_check)

            any_of = schema.get("anyOf")
            if disc_active:
                # OpenAPI: discriminator replaces anyOf/oneOf dispatch
                any_of = None
            if isinstance(any_of, list):
                runners = tuple(
                    self._child(sub, f"{spath}/anyOf/{i}", dialect)
                    for i, sub in enumerate(any_of)
                )

                def anyof_check(instance, ipath, scope, st, _rs=runners):
                    results = [run(instance, ipath, scope) for run in _rs]
                    if any(r.valid for r in results):
                        for r in results:
                            _merge_soft(st, r)
                    else:
                        # all branches failed: propagate branch errors only
                        # (the reference emits no anyOf summary row)
                        st.valid = False
                        for r in results:
                            if r.errors:
                                if st.errors is None:
                                    st.errors = []
                                st.errors.extend(r.errors)
                tail.append(anyof_check)

            one_of = schema.get("oneOf")
            if disc_active:
                one_of = None
            if isinstance(one_of, list):
                runners = tuple(
                    self._child(sub, f"{spath}/oneOf/{i}", dialect)
                    for i, sub in enumerate(one_of)
                )

                def oneof_check(instance, ipath, scope, st, _rs=runners, _sp=spath):
                    results = [run(instance, ipath, scope) for run in _rs]
                    n_valid = sum(1 for r in results if r.valid)
                    if n_valid == 1:
                        for r in results:
                            _merge_soft(st, r)
                    else:
                        st.valid = False
                        if st.errors is None:
                            st.errors = []
                        if n_valid == 0:
                            # propagate branch errors (no summary)
                            for r in results:
                                if r.errors:
                                    st.errors.extend(r.errors)
                        else:
                            # annotations of individually-valid branches
                            # survive a multi-valid oneOf failure
                            for r in results:
                                _merge_soft(st, r)
                            st.errors.append(("oneOf", ipath, _sp,
                                              f"{n_valid} subschemas matched, need exactly 1"))
                tail.append(oneof_check)

            if "not" in schema:
                not_runner = self._child(schema["not"], f"{spath}/not", dialect)
                not_fail = bind_fail("not")

                def not_check(instance, ipath, scope, st, _run=not_runner):
                    # defaults are never collected under `not` (result.rb:186)
                    self._not_depth += 1
                    try:
                        r = _run(instance, ipath, scope)
                    finally:
                        self._not_depth -= 1
                    if r.valid:
                        not_fail(st, instance, ipath, "instance matched 'not' subschema")
                tail.append(not_check)

            if dialect.has_if_then_else and "if" in schema:
                if_runner = self._child(schema["if"], f"{spath}/if", dialect)
                then_runner = (
                    self._child(schema["then"], f"{spath}/then", dialect)
                    if "then" in schema else None
                )
                else_runner = (
                    self._child(schema["else"], f"{spath}/else", dialect)
                    if "else" in schema else None
                )

                def ite_check(instance, ipath, scope, st, _if=if_runner,
                              _then=then_runner, _else=else_runner):
                    r_if = _if(instance, ipath, scope)
                    if r_if.valid:
                        _merge_soft(st, r_if)
                        if _then is not None:
                            _merge(st, _then(instance, ipath, scope))
                    elif _else is not None:
                        _merge(st, _else(instance, ipath, scope))
                tail.append(ite_check)

            # --- custom keywords (extension surface, §2.7) ----------------
            if self.custom_keywords:
                for kw, fn in self.custom_keywords.items():
                    if kw in schema:
                        kw_fail = bind_fail(kw)
                        kw_val = schema[kw]

                        def custom_check(instance, ipath, scope, st, _fn=fn,
                                         _kw=kw, _kv=kw_val, _fail=kw_fail, _sp=spath):
                            result = _fn(instance, _kv, ipath)
                            if result is True or result is None:
                                pass
                            elif result is False:
                                _fail(st, instance, ipath,
                                      f"custom keyword {_kw!r} failed")
                            elif isinstance(result, (list, tuple)) and result:
                                st.valid = False
                                if st.errors is None:
                                    st.errors = []
                                for err_type in result:
                                    st.errors.append(
                                        (str(err_type), ipath, _sp,
                                         f"custom keyword {_kw!r}: {err_type}"))
                        tail.append(custom_check)

            # --- unevaluated* (consume annotations; must run last) --------
            if dialect.has_unevaluated:
                if "unevaluatedProperties" in schema:
                    up_runner = self._child(schema["unevaluatedProperties"],
                                            f"{spath}/unevaluatedProperties", dialect)

                    def uneval_props_check(instance, ipath, scope, st, _run=up_runner):
                        if not isinstance(instance, dict):
                            return
                        props = st.props
                        if props is None:
                            props = st.props = set()
                        for k in instance:
                            if k not in props:
                                _merge_pos(st, _run(instance[k], join_pointer(ipath, k), scope))
                                props.add(k)
                    tail.append(uneval_props_check)
                if "unevaluatedItems" in schema:
                    ui_runner = self._child(schema["unevaluatedItems"],
                                            f"{spath}/unevaluatedItems", dialect)

                    def uneval_items_check(instance, ipath, scope, st, _run=ui_runner):
                        if not isinstance(instance, list):
                            return
                        items = st.items
                        if items is None:
                            items = st.items = set()
                        for i in range(len(instance)):
                            if i not in items:
                                _merge_pos(st, _run(instance[i], f"{ipath}/{i}", scope))
                                items.add(i)
                    tail.append(uneval_items_check)

        # --- annotation producers (meta-data, annotation-mode format,
        # unknown keywords — meta_data.rb, format_annotation.rb, core.rb).
        # Skipped under exclusive $ref (drafts 4-7 ignore ref siblings).
        meta_anns = () if exclusive_ref_only else tuple(
            (kw, schema[kw], f"{spath}/{_esc(kw)}")
            for kw in ("title", "description", "default", "deprecated",
                       "readOnly", "writeOnly", "examples")
            if kw in schema
        )
        fmt_ann = (
            ("format", schema["format"], f"{spath}/format")
            if "format" in schema and not self.assert_formats
            and not exclusive_ref_only else None
        )
        unknown_anns = () if exclusive_ref_only else tuple(
            (kw, value, f"{spath}/{_esc(kw)}")
            for kw, value in schema.items()
            if kw not in _NON_ANNOTATION_KEYWORDS and kw not in (
                "title", "description", "default", "deprecated",
                "readOnly", "writeOnly", "examples", "format",
            )
        )
        has_anns = bool(meta_anns or fmt_ann or unknown_anns)

        # ---- assemble the runner ----------------------------------------
        common_t = tuple(common)
        num_t = tuple(num_checks)
        str_t = tuple(str_checks)
        arr_t = tuple(arr_checks)
        obj_t = tuple(obj_checks)
        tail_t = tuple(tail)
        # evaluator-level: any OpenAPI dialect in the document means a
        # discriminator may re-dispatch into ANY node, including branches
        # that rebind $schema to a plain draft (round-3 ADVICE)
        track_eval_stack = bool(dialect.openapi) or self._track_eval_stack
        eval_stack = self._eval_stack

        def run(instance, ipath, scope) -> _Result:
            if resource is not None and resource is not scope[-1]:
                scope.append(resource)
                pushed = True
            else:
                pushed = False
            if track_eval_stack:
                eval_stack.append(sid)
            cell = None
            if self._defaults is not None and self._not_depth == 0:
                cell = [True]
                self._defaults.stack.append(cell)
            st = _St()
            try:
                for f in common_t:
                    f(instance, ipath, scope, st)
                if num_t and is_json_number(instance):
                    for f in num_t:
                        f(instance, ipath, scope, st)
                elif str_t and isinstance(instance, str):
                    for f in str_t:
                        f(instance, ipath, scope, st)
                elif arr_t and isinstance(instance, list):
                    for f in arr_t:
                        f(instance, ipath, scope, st)
                elif obj_t and isinstance(instance, dict):
                    for f in obj_t:
                        f(instance, ipath, scope, st)
                for f in tail_t:
                    f(instance, ipath, scope, st)
                if has_anns and self._collect_anns:
                    anns = st.anns
                    if anns is None:
                        anns = st.anns = []
                    for kw, value, sp in meta_anns:
                        anns.append((kw, ipath, sp, value))
                    if fmt_ann is not None:
                        anns.append((fmt_ann[0], ipath, fmt_ann[2], fmt_ann[1]))
                    for kw, value, sp in unknown_anns:
                        anns.append((kw, ipath, sp, value))
                if cell is not None:
                    cell[0] = st.valid
                return _Result(st.valid, st.errors or None, st.props or None,
                               st.items or None, st.anns or None)
            finally:
                if cell is not None:
                    self._defaults.stack.pop()
                if track_eval_stack:
                    eval_stack.pop()
                if pushed:
                    scope.pop()

        return run


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
