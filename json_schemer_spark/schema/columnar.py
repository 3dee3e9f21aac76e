"""Columnar lowering: JSON Schema keywords → pure Column expressions.

The fast tier of the compiled-constraint plan (SURVEY.md §1.3, §2.2): for
structurally-lowerable schemas the whole validation runs JVM-side —
whole-stage codegen, zero Python in the hot path. Schemas outside the
supported subset raise :class:`Unsupported` and the compiler falls back to
the Arrow-batched interpreter tier.

Physical shape (two projections, deliberately kept apart):

1. **Extraction projection** — one struct column holding every variant
   access the plan needs (root parse, one ``variant_get`` per schema
   location, one ``schema_of_variant`` type tag + typed casts per location).
   All entries are unconditional top-level expressions, so Tungsten's
   runtime subexpression elimination collapses the shared parse/get chains;
   the struct producer is non-cheap and multiply-referenced, so Catalyst's
   CollapseProject leaves the boundary alone (this matters: predicates live
   inside lazy AND/CASE branches where subexpression elimination does NOT
   apply — inlining the parses there re-parses the document dozens of times
   per row, measured 20x slower).
2. **Predicate projection** — verdict + violation assembly over cheap
   struct-field references.

Keyword semantics mirror the reference's type-guarded vacuous-pass model
(draft202012/vocab/validation.rb — e.g. ``maximum`` ignores strings at
validation.rb:101): a missing/other-typed value yields NULL → no violation.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from json_schemer_spark.schema.dialects import Dialect

_SIMPLE_KEY = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_ANNOTATIONS = {
    "title", "description", "default", "examples", "$comment", "deprecated",
    "readOnly", "writeOnly", "$schema", "$id", "id", "format", "$defs",
    "definitions", "$anchor", "contentMediaType", "contentEncoding",
}
_SUPPORTED = {
    "type", "enum", "const", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
    "required", "properties", "items", "minItems", "maxItems",
    "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
}

_SCALARS = (str, int, float, bool, type(None))
_NUMERIC_TAGS = ("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT")


class Unsupported(Exception):
    """Schema outside the columnar subset → interpreter tier."""


# ---------------------------------------------------------------------------
# driver-side subset check (cheap, no Spark imports)
# ---------------------------------------------------------------------------

def lowerable(schema: Any, dialect: Dialect) -> bool:
    try:
        _check(schema, dialect)
        return True
    except Unsupported:
        return False


def _check(schema: Any, dialect: Dialect) -> None:
    if schema is True or schema is False:
        return
    if not isinstance(schema, dict):
        raise Unsupported("non-dict schema")
    if not dialect.vocab_enabled("validation"):
        raise Unsupported("custom vocabulary gating")
    for kw, val in schema.items():
        if kw in _ANNOTATIONS:
            continue
        if kw not in _SUPPORTED:
            raise Unsupported(f"keyword {kw!r}")
        if kw == "enum":
            if not all(isinstance(x, _SCALARS) for x in val):
                raise Unsupported("composite enum member")
        elif kw == "const":
            if not isinstance(val, _SCALARS):
                raise Unsupported("composite const")
        elif kw == "properties":
            for key, sub in val.items():
                if not _SIMPLE_KEY.match(key):
                    raise Unsupported(f"non-simple property key {key!r}")
                _check(sub, dialect)
        elif kw == "items":
            if isinstance(val, list):
                raise Unsupported("array-form items")
            _check(val, dialect)
        elif kw in ("allOf", "anyOf", "oneOf"):
            if not isinstance(val, list):
                raise Unsupported(f"{kw} not a list")
            for sub in val:
                _check(sub, dialect)
        elif kw in ("not", "if", "then", "else"):
            _check(val, dialect)
        elif kw == "multipleOf":
            if not isinstance(val, (int, float)) or val <= 0:
                raise Unsupported("non-positive multipleOf")
        elif kw == "required":
            if not isinstance(val, list) or not all(
                isinstance(k, str) and _SIMPLE_KEY.match(k) for k in val
            ):
                raise Unsupported("non-simple required key")
        elif kw == "pattern":
            _java_safe_pattern(val)


def _java_safe_pattern(pattern: str) -> str:
    """Reject regex constructs whose Java semantics diverge from ECMA/Python
    (mirrors the reject-unsupported-token stance of the reference's
    ecma_regexp.rb:38-49 translator, inverted for Java)."""
    if re.search(r"\\[AzZG]|\(\?<[=!]|\\p\{|\\c[A-Z]|\[\[", pattern):
        raise Unsupported(f"pattern {pattern!r} outside the Java-safe subset")
    try:
        re.compile(pattern)
    except re.error as exc:
        raise Unsupported(f"invalid pattern: {exc}") from exc
    return pattern


# ---------------------------------------------------------------------------
# extraction context: stage-1 struct fields
# ---------------------------------------------------------------------------

class _Ctx:
    """Allocates stage-1 struct fields. One variant slot per schema location
    plus memoized typed views (type tag / double / string / array)."""

    def __init__(self) -> None:
        self.exprs: dict[str, Any] = {}
        self._memo: dict[tuple[str, str], str] = {}
        self._n = 0

    def add_variant(self, expr) -> str:
        key = f"v{self._n}"
        self._n += 1
        self.exprs[key] = expr
        return key

    def typed(self, vkey: str, kind: str, builder: Callable) -> str:
        mk = (vkey, kind)
        got = self._memo.get(mk)
        if got is not None:
            return got
        key = f"{vkey}_{kind}"
        self.exprs[key] = builder(self.exprs[vkey])
        self._memo[mk] = key
        return key

    def ts(self, vkey: str) -> str:
        """Scalar type tag. NOTE: schema_of_variant serializes the ENTIRE
        subtree type (per row!) — only use on scalar-ish locations; object/
        array dispatch goes through the obj()/arr() try-casts instead."""
        import pyspark.sql.functions as F

        return self.typed(vkey, "ts", lambda v: F.schema_of_variant(v))

    def obj(self, vkey: str) -> str:
        import pyspark.sql.functions as F

        return self.typed(vkey, "obj", lambda v: F.try_variant_get(v, "$", "map<string,variant>"))

    def num(self, vkey: str) -> str:
        import pyspark.sql.functions as F

        return self.typed(vkey, "num", lambda v: F.try_variant_get(v, "$", "double"))

    def dec(self, vkey: str) -> str:
        import pyspark.sql.functions as F

        return self.typed(vkey, "dec", lambda v: F.try_variant_get(v, "$", "decimal(38,12)"))

    def str_(self, vkey: str) -> str:
        import pyspark.sql.functions as F

        return self.typed(vkey, "str", lambda v: F.try_variant_get(v, "$", "string"))

    def arr(self, vkey: str) -> str:
        import pyspark.sql.functions as F

        return self.typed(vkey, "arr", lambda v: F.try_variant_get(v, "$", "array<variant>"))

    def boo(self, vkey: str) -> str:
        import pyspark.sql.functions as F

        return self.typed(vkey, "boo", lambda v: F.try_variant_get(v, "$", "boolean"))


# ---------------------------------------------------------------------------
# lowering: schema node → emit(get, ipath) -> (valid, fails)
# ---------------------------------------------------------------------------

def _lower(schema: Any, dialect: Dialect, spath: str, ctx: _Ctx, vkey: str):
    """Build the stage-2 emitter for one schema node rooted at variant slot
    ``vkey``. ``emit(get, ipath)`` gets a field-resolver (key → Column) and
    the static instance pointer; returns (valid Column, [violation structs]).
    """
    import pyspark.sql.functions as F

    if schema is True or (isinstance(schema, dict) and not schema):
        return lambda get, ipath: (F.lit(True), [])
    if schema is False:
        def emit_false(get, ipath, vkey=vkey):
            present = get(vkey).isNotNull()
            return ~F.coalesce(present, F.lit(False)), [
                _viol(present, "schema", ipath, spath, "false schema disallows everything")
            ]
        return emit_false

    # --- typed-view allocation (stage-1, build time only) -----------------
    # schema_of_variant serializes the WHOLE subtree type per row, so it is
    # allocated only when scalar dispatch is genuinely needed; object/array
    # dispatch uses cheap try-casts.
    type_list = schema.get("type")
    type_list = (
        type_list if isinstance(type_list, list) else ([type_list] if type_list else [])
    )
    scalar_kws = bool(
        set(schema)
        & {
            "enum", "const", "minimum", "maximum", "exclusiveMinimum",
            "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
        }
    )
    needs_ts = scalar_kws or any(
        t in ("string", "boolean", "null", "number", "integer") for t in type_list
    )
    tskey = ctx.ts(vkey) if needs_ts else None
    needs_obj = "object" in type_list or bool(schema.get("required"))
    objkey = ctx.obj(vkey) if needs_obj else None
    needs_arr = (
        "array" in type_list
        or "maxItems" in schema
        or "minItems" in schema
        or ("items" in schema and not isinstance(schema["items"], list))
    )
    arrkey = ctx.arr(vkey) if needs_arr else None

    checks: list[Callable] = []   # (get, ipath) -> (fail_cond, keyword, msg)
    subs: list[Callable] = []     # (get, ipath) -> (valid, fails)

    def is_numeric(get):
        ts = get(tskey)
        return ts.isin(*_NUMERIC_TAGS) | ts.startswith("DECIMAL")

    def is_object(get):
        return get(objkey).isNotNull()

    # --- type ---------------------------------------------------------------
    if type_list:
        needs_num = "integer" in type_list and not dialect.strict_integer
        numkey = ctx.num(vkey) if needs_num else None

        # reference convention: single type → error type is the type name
        type_kw = type_list[0] if (len(type_list) == 1 and not isinstance(schema["type"], list)) else "type"

        def type_check(get, ipath, allowed=tuple(type_list), numkey=numkey, type_kw=type_kw):
            ok = None
            for t in allowed:
                if t == "object":
                    c = get(objkey).isNotNull()
                elif t == "array":
                    c = get(arrkey).isNotNull()
                else:
                    c = _type_pred(get, get(tskey), t, dialect, numkey, is_numeric)
                ok = c if ok is None else (ok | c)
            cond = get(vkey).isNotNull() & ~F.coalesce(ok, F.lit(False))
            return cond, type_kw, f"expected {list(allowed)}"

        checks.append(type_check)

    # --- const / enum ----------------------------------------------------------
    def scalar_eq(get, x):
        ts = get(tskey)
        if x is None:
            return ts == "VOID"
        if isinstance(x, bool):
            return (ts == "BOOLEAN") & (get(ctx.boo(vkey)) == F.lit(x))
        if isinstance(x, (int, float)):
            return is_numeric(get) & (get(ctx.num(vkey)) == F.lit(float(x)))
        if isinstance(x, str):
            return (ts == "STRING") & (get(ctx.str_(vkey)) == F.lit(x))
        raise Unsupported(f"non-scalar literal {type(x)}")

    if dialect.has_const and "const" in schema:
        cv = schema["const"]
        if isinstance(cv, bool):
            ctx.boo(vkey)
        elif isinstance(cv, (int, float)):
            ctx.num(vkey)
        elif isinstance(cv, str):
            ctx.str_(vkey)

        def const_check(get, ipath, cv=cv):
            cond = get(vkey).isNotNull() & ~F.coalesce(scalar_eq(get, cv), F.lit(False))
            return cond, "const", "value does not equal const"

        checks.append(const_check)

    if "enum" in schema:
        evs = list(schema["enum"])
        for x in evs:  # pre-allocate typed views
            if isinstance(x, bool):
                ctx.boo(vkey)
            elif isinstance(x, (int, float)):
                ctx.num(vkey)
            elif isinstance(x, str):
                ctx.str_(vkey)

        def enum_check(get, ipath, evs=tuple(evs)):
            ok = None
            for x in evs:
                c = scalar_eq(get, x)
                ok = c if ok is None else (ok | c)
            cond = get(vkey).isNotNull() & ~F.coalesce(ok, F.lit(False))
            return cond, "enum", "value not in enumeration"

        checks.append(enum_check)

    # --- numeric bounds -----------------------------------------------------------
    num_kw = []
    def _plain_num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    if _plain_num(schema.get("maximum")):
        excl = dialect.boolean_exclusive_bounds and schema.get("exclusiveMaximum") is True
        num_kw.append(("exclusiveMaximum" if excl else "maximum", schema["maximum"], "ge" if excl else "gt"))
    if _plain_num(schema.get("minimum")):
        excl = dialect.boolean_exclusive_bounds and schema.get("exclusiveMinimum") is True
        num_kw.append(("exclusiveMinimum" if excl else "minimum", schema["minimum"], "le" if excl else "lt"))
    if not dialect.boolean_exclusive_bounds:
        if _plain_num(schema.get("exclusiveMaximum")):
            num_kw.append(("exclusiveMaximum", schema["exclusiveMaximum"], "ge"))
        if _plain_num(schema.get("exclusiveMinimum")):
            num_kw.append(("exclusiveMinimum", schema["exclusiveMinimum"], "le"))

    if num_kw:
        numkey = ctx.num(vkey)
        for kw, bound, op in num_kw:
            def bound_check(get, ipath, kw=kw, bound=bound, op=op, numkey=numkey):
                num = F.when(is_numeric(get), get(numkey))
                cond = {"gt": num > bound, "ge": num >= bound,
                        "lt": num < bound, "le": num <= bound}[op]
                return F.coalesce(cond, F.lit(False)), kw, f"violates {kw} {bound}"

            checks.append(bound_check)

    if "multipleOf" in schema:
        div = schema["multipleOf"]
        deckey = ctx.dec(vkey)

        def multiple_check(get, ipath, div=div, deckey=deckey):
            dec = F.when(is_numeric(get), get(deckey))
            cond = dec % F.lit(div).cast("decimal(38,12)") != 0
            return F.coalesce(cond, F.lit(False)), "multipleOf", f"not a multiple of {div}"

        checks.append(multiple_check)

    # --- strings ----------------------------------------------------------------------
    def gated_str(get):
        return F.when(get(tskey) == "STRING", get(ctx.str_(vkey)))

    if "maxLength" in schema:
        ctx.str_(vkey)
        k = schema["maxLength"]
        checks.append(lambda get, ipath, k=k: (
            F.coalesce(F.length(gated_str(get)) > k, F.lit(False)), "maxLength", f"length > {k}"))
    if "minLength" in schema:
        ctx.str_(vkey)
        k = schema["minLength"]
        checks.append(lambda get, ipath, k=k: (
            F.coalesce(F.length(gated_str(get)) < k, F.lit(False)), "minLength", f"length < {k}"))
    if "pattern" in schema:
        ctx.str_(vkey)
        p = schema["pattern"]
        checks.append(lambda get, ipath, p=p: (
            F.coalesce(~gated_str(get).rlike(p), F.lit(False)),
            "pattern", f"does not match pattern {p!r}"))

    # --- arrays -----------------------------------------------------------------------
    def gated_arr(get):
        # arrkey is the try-cast itself: NULL for every non-array value
        return get(arrkey)

    if "maxItems" in schema:
        k = schema["maxItems"]
        checks.append(lambda get, ipath, k=k: (
            F.coalesce(F.size(gated_arr(get)) > k, F.lit(False)), "maxItems", f"more than {k} items"))
    if "minItems" in schema:
        k = schema["minItems"]
        checks.append(lambda get, ipath, k=k: (
            F.coalesce(F.size(gated_arr(get)) < k, F.lit(False)), "minItems", f"fewer than {k} items"))

    if "items" in schema and not isinstance(schema["items"], list):
        item_pred = _lower_element(schema["items"], dialect)

        def items_check(get, ipath, item_pred=item_pred):
            ok = F.forall(gated_arr(get), item_pred)
            return F.coalesce(~ok, F.lit(False)), "items", "one or more items invalid"

        checks.append(items_check)

    # --- objects --------------------------------------------------------------------------
    if "required" in schema and isinstance(schema["required"], list) and schema["required"]:
        req = list(schema["required"])
        req_keys = [
            ctx.typed(vkey, f"has_{k}",
                      lambda v, k=k: _vget(v, k).isNotNull())
            for k in req
        ]

        def required_check(get, ipath, req=tuple(req), req_keys=tuple(req_keys)):
            missing = None
            for rk in req_keys:
                c = ~get(rk)
                missing = c if missing is None else (missing | c)
            cond = is_object(get) & F.coalesce(missing, F.lit(False))
            return F.coalesce(cond, F.lit(False)), "required", f"missing one of required {list(req)}"

        checks.append(required_check)

    if "properties" in schema:
        for key, sub in schema["properties"].items():
            child_vkey = ctx.typed(vkey, f"p_{key}", lambda v, key=key: _vget(v, key))
            child = _lower(sub, dialect, f"{spath}/properties/{key}", ctx, child_vkey)

            def prop_sub(get, ipath, key=key, child=child):
                return child(get, f"{ipath}/{key}")

            subs.append(prop_sub)

    # --- in-place applicators --------------------------------------------------------------
    if isinstance(schema.get("allOf"), list):
        for i, sub in enumerate(schema["allOf"]):
            child = _lower(sub, dialect, f"{spath}/allOf/{i}", ctx, vkey)
            subs.append(lambda get, ipath, child=child: child(get, ipath))

    if isinstance(schema.get("anyOf"), list):
        branches = [_lower(s, dialect, f"{spath}/anyOf/{i}", ctx, vkey)
                    for i, s in enumerate(schema["anyOf"])]

        def any_of(get, ipath, branches=branches):
            results = [b(get, ipath) for b in branches]
            ok = None
            for bv, _ in results:
                ok = bv if ok is None else (ok | bv)
            ok = F.coalesce(ok, F.lit(False))
            # reference convention: no anyOf summary — branch errors
            # surface only when every branch failed
            fails = [
                F.when(~ok, c) for _, bf in results for c in bf
            ]
            return ok, fails

        subs.append(any_of)

    if isinstance(schema.get("oneOf"), list):
        branches = [_lower(s, dialect, f"{spath}/oneOf/{i}", ctx, vkey)
                    for i, s in enumerate(schema["oneOf"])]

        def one_of(get, ipath, branches=branches):
            results = [b(get, ipath) for b in branches]
            total = None
            for bv, _ in results:
                c = F.coalesce(bv, F.lit(False)).cast("int")
                total = c if total is None else (total + c)
            ok = total == 1
            # 0 valid → branch errors; >1 valid → single oneOf summary
            fails = [F.when(total == 0, c) for _, bf in results for c in bf]
            fails.append(
                _viol(get(vkey).isNotNull() & (total > 1), "oneOf", ipath, spath,
                      "more than one subschema matched")
            )
            return ok, fails

        subs.append(one_of)

    if "not" in schema:
        child = _lower(schema["not"], dialect, f"{spath}/not", ctx, vkey)

        def not_sub(get, ipath, child=child):
            inner_ok = F.coalesce(child(get, ipath)[0], F.lit(False))
            return ~inner_ok, [_viol(get(vkey).isNotNull() & inner_ok, "not", ipath,
                                     spath, "instance matched 'not' subschema")]

        subs.append(not_sub)

    if dialect.has_if_then_else and "if" in schema:
        if_emit = _lower(schema["if"], dialect, f"{spath}/if", ctx, vkey)
        then_emit = _lower(schema["then"], dialect, f"{spath}/then", ctx, vkey) if "then" in schema else None
        else_emit = _lower(schema["else"], dialect, f"{spath}/else", ctx, vkey) if "else" in schema else None

        def if_then_else(get, ipath):
            cond_if = F.coalesce(if_emit(get, ipath)[0], F.lit(False))
            valid = F.lit(True)
            fails: list = []
            if then_emit is not None:
                tv, tf = then_emit(get, ipath)
                valid = F.when(cond_if, F.coalesce(tv, F.lit(True))).otherwise(valid)
                fails.extend(F.when(cond_if, c) for c in tf)
            if else_emit is not None:
                ev, ef = else_emit(get, ipath)
                valid = F.when(~cond_if, F.coalesce(ev, F.lit(True))).otherwise(valid)
                fails.extend(F.when(~cond_if, c) for c in ef)
            return valid, fails

        subs.append(if_then_else)

    def emit(get, ipath):
        fail_structs = []
        any_fail = None
        for check in checks:
            cond, kw, msg = check(get, ipath)
            # classic convention: schema_pointer = the schema OBJECT's path;
            # the failing keyword rides in the keyword field
            fail_structs.append(_viol(cond, kw, ipath, spath, msg))
            any_fail = cond if any_fail is None else (any_fail | cond)
        valid = ~F.coalesce(any_fail, F.lit(False)) if any_fail is not None else F.lit(True)
        for sub in subs:
            sub_valid, sub_fails = sub(get, ipath)
            fail_structs.extend(sub_fails)
            valid = valid & F.coalesce(sub_valid, F.lit(True))
        # a value absent at this location passes vacuously (type-guard model)
        valid = F.when(get(vkey).isNull(), F.lit(True)).otherwise(valid)
        return valid, fail_structs

    return emit


def _vget(v, key: str):
    import pyspark.sql.functions as F

    return F.variant_get(v, f"$.{key}", "variant")


def _lower_element(schema: Any, dialect: Dialect):
    """Array-element predicate: variant → boolean Column (used inside
    ``forall`` lambdas, where struct materialization is impossible —
    element-level work stays inline and is naturally small)."""
    import pyspark.sql.functions as F

    if schema is True or (isinstance(schema, dict) and not schema):
        return lambda x: F.lit(True)
    if schema is False:
        return lambda x: F.lit(False)

    def pred(x):
        ctx = _Ctx()
        vkey = ctx.add_variant(x)
        emit = _lower(schema, dialect, "", ctx, vkey)
        exprs = ctx.exprs

        def get(key):  # inline resolution: no struct inside lambdas
            return exprs[key]

        # resolve typed views lazily against the element expression
        valid, _ = emit(get, "")
        return F.coalesce(valid, F.lit(True))

    return pred


def _viol(cond, keyword: str, ipath: str, spath: str, message: str):
    import pyspark.sql.functions as F

    return F.when(
        F.coalesce(cond, F.lit(False)),
        F.struct(
            F.lit(keyword).alias("keyword"),
            F.lit(ipath).alias("instance_pointer"),
            F.lit(spath).alias("schema_pointer"),
            F.lit(message).alias("message"),
        ),
    )


def _type_pred(get, ts, t: str, dialect: Dialect, numkey, is_numeric):
    import pyspark.sql.functions as F

    if t == "string":
        return ts == "STRING"
    if t == "boolean":
        return ts == "BOOLEAN"
    if t == "null":
        return ts == "VOID"
    if t == "array":
        return ts.startswith("ARRAY")
    if t == "object":
        return ts.startswith("OBJECT") | ts.startswith("STRUCT")
    if t == "number":
        return is_numeric(get)
    if t == "integer":
        if dialect.strict_integer:
            # draft4: a float literal with zero fraction is NOT an integer;
            # DECIMAL(p,0) with p>=19 can only come from a big int literal.
            return (ts == "BIGINT") | ts.rlike(r"^DECIMAL\((19|[2-9]\d|\d{3,}),0\)")
        num = get(numkey)
        return is_numeric(get) & F.coalesce(num == F.floor(num), F.lit(True))
    raise Unsupported(f"unknown type {t!r}")


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

_STRUCT_COL = "__jss_x"


def validate_json_column_lowered(df, content_col: str, schema: Any, dialect: Dialect):
    """Pure-Column validation: df + ``valid`` + ``violations`` columns.

    Two chained projections over one scan (extraction struct → predicates);
    no shuffle, no Python workers; scales linearly with partitions.
    """
    import pyspark.sql.functions as F

    content = F.col(content_col)
    # NULL content is JSON null (parity with the interpreter tier);
    # unparseable content gets a $parse violation.
    root = F.when(content.isNull(), F.parse_json(F.lit("null"))).otherwise(
        F.try_parse_json(content)
    )

    ctx = _Ctx()
    root_key = ctx.add_variant(root)
    emit = _lower(schema, dialect, "", ctx, root_key)

    staged = df.withColumn(
        _STRUCT_COL,
        F.struct(*[expr.alias(k) for k, expr in ctx.exprs.items()]),
    )

    def get(key):
        return F.col(_STRUCT_COL)[key]

    valid, fails = emit(get, "")
    parse_fail = content.isNotNull() & get(root_key).isNull()
    fails = [_viol(parse_fail, "$parse", "", "", "content is not valid JSON")] + fails
    violations = F.filter(F.array(*fails), lambda x: x.isNotNull())
    overall = F.coalesce(valid, F.lit(True)) & ~parse_fail

    return staged.select(
        *[F.col(c) for c in df.columns],
        overall.alias("valid"),
        violations.alias("violations"),
    )
