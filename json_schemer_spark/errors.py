"""Human-readable error formatting — the counterpart of the reference's
``JSONSchemer::Errors.pretty`` (errors.rb:7-30, tested by
pretty_errors_test.rb). Two surfaces:

- :func:`pretty` — driver-side, one classic error row -> one sentence.
- :func:`pretty_errors_column` — a Column expression mapping a
  ``violations`` array (validate_json_column output) to an array of the
  same sentences, all-JVM (schema details are baked in as literal maps at
  compile time; required missing-keys are recomputed from the document
  column with ``json_object_keys``).
"""

from __future__ import annotations

import json
from typing import Any, Optional

_TYPE_NAMES = ("null", "string", "boolean", "integer", "number", "array", "object")


def _inspect(value: Any) -> str:
    """Ruby ``#inspect`` for JSON-shaped values (errors.rb interpolates
    inspect output into const/enum messages)."""
    if value is None:
        return "nil"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, str):
        return json.dumps(value)
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, list):
        return "[" + ", ".join(_inspect(v) for v in value) + "]"
    if isinstance(value, dict):
        return "{" + ", ".join(f"{_inspect(k)} => {_inspect(v)}" for k, v in value.items()) + "}"
    return repr(value)


def resolve_pointer(doc: Any, pointer: str) -> Any:
    """Best-effort JSON-pointer walk (schema_pointer -> subschema)."""
    node = doc
    for token in pointer.split("/")[1:] if pointer else []:
        token = token.replace("~1", "/").replace("~0", "~")
        if isinstance(node, dict):
            node = node[token]
        elif isinstance(node, list):
            node = node[int(token)]
        else:
            raise KeyError(pointer)
    return node


def pretty(error: dict) -> str:
    """One classic error row -> a human sentence (reference errors.rb:7-30).

    Accepts either the reference's error-hash shape (``data_pointer`` /
    ``type`` / ``schema`` / ``details``) or this engine's native classic row
    (``instance_pointer`` / ``keyword``), optionally enriched with
    ``schema`` and ``details`` (see CompiledSchema.pretty_errors, which
    resolves both before calling here)."""
    dp = error.get("data_pointer", error.get("instance_pointer", "")) or ""
    typ = error.get("type", error.get("keyword"))
    schema = error.get("schema")
    location = "root" if dp == "" else f"property '{dp}'"
    if typ == "required":
        details = error.get("details") or {}
        keys = details.get("missing_keys")
        if keys is not None:
            return f"{location} is missing required keys: {', '.join(keys)}"
    elif typ in _TYPE_NAMES:
        return f"{location} is not of type: {typ}"
    elif typ == "pattern" and isinstance(schema, dict) and "pattern" in schema:
        return f"{location} does not match pattern: {schema['pattern']}"
    elif typ == "format" and isinstance(schema, dict) and "format" in schema:
        return f"{location} does not match format: {schema['format']}"
    elif typ == "const" and isinstance(schema, dict) and "const" in schema:
        return f"{location} is not: {_inspect(schema['const'])}"
    elif typ == "enum" and isinstance(schema, dict) and "enum" in schema:
        return f"{location} is not one of: {_inspect(schema['enum'])}"
    return f"{location} is invalid: error_type={typ}"


def enrich(error: dict, root_schema: Any, instance: Any = None) -> dict:
    """Attach the reference error-hash fields (``schema``, and for
    ``required`` errors ``details.missing_keys``) to a native classic row so
    :func:`pretty` can format the detailed cases."""
    out = dict(error)
    try:
        sub = resolve_pointer(root_schema, error.get("schema_pointer", ""))
    except Exception:
        sub = None
    if isinstance(sub, dict):
        out.setdefault("schema", sub)
        if error.get("keyword") == "required" and "details" not in out:
            req = sub.get("required")
            if isinstance(req, list):
                try:
                    data = resolve_pointer(instance, error.get("instance_pointer", ""))
                except Exception:
                    data = None
                if isinstance(data, dict):
                    out["details"] = {
                        "missing_keys": [k for k in req if k not in data]
                    }
    return out


# ---------------------------------------------------------------------------
# Column expression
# ---------------------------------------------------------------------------

def _schema_detail_maps(schema: Any) -> dict[str, dict[str, Any]]:
    """Walk the schema document once, collecting per-object-pointer details
    the pretty cases need. Classic rows locate by the schema OBJECT pointer
    with the keyword in its own field, so one entry per object suffices."""
    maps: dict[str, dict[str, Any]] = {
        "pattern": {}, "format": {}, "const": {}, "enum": {}, "required": {},
    }

    def walk(node: Any, ptr: str) -> None:
        if isinstance(node, dict):
            if isinstance(node.get("pattern"), str):
                maps["pattern"][ptr] = node["pattern"]
            if isinstance(node.get("format"), str):
                maps["format"][ptr] = node["format"]
            if "const" in node:
                maps["const"][ptr] = _inspect(node["const"])
            if isinstance(node.get("enum"), list):
                maps["enum"][ptr] = _inspect(node["enum"])
            if isinstance(node.get("required"), list) and node["required"]:
                maps["required"][ptr] = [str(k) for k in node["required"]]
            for k, v in node.items():
                walk(v, f"{ptr}/{k.replace('~', '~0').replace('/', '~1')}")
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{ptr}/{i}")

    walk(schema, "")
    return maps


def pretty_errors_column(schema: Any, violations, content=None):
    """``array<string>`` Column of :func:`pretty` sentences for a
    ``violations`` column produced by ``validate_json_column`` — all-JVM.

    ``schema`` is the (raw) schema document the violations came from:
    pattern/format/const/enum details are baked in as literal maps keyed by
    schema pointer. When ``content`` (the validated JSON string column) is
    given, ``required`` errors recompute the missing keys per row with
    ``json_object_keys`` (presence-correct for JSON-null values); without
    it they fall back to the generic sentence. Pointer segments containing
    ``~``-escapes fall back to the generic sentence too (JSONPath cannot
    address them dynamically)."""
    import pyspark.sql.functions as F

    maps = _schema_detail_maps(schema)

    def lit_map(d: dict[str, str]):
        pairs: list = []
        for k, v in d.items():
            pairs += [F.lit(k), F.lit(v)]
        return F.create_map(*pairs) if pairs else None

    pmap = lit_map(maps["pattern"])
    fmap = lit_map(maps["format"])
    cmap = lit_map(maps["const"])
    emap = lit_map(maps["enum"])
    rmap = None
    if content is not None and maps["required"]:
        pairs = []
        for k, v in maps["required"].items():
            pairs += [F.lit(k), F.array(*[F.lit(x) for x in v])]
        rmap = F.create_map(*pairs)
        content = F.col(content) if isinstance(content, str) else content

    def one(v):
        ip, sp, kw = v["instance_pointer"], v["schema_pointer"], v["keyword"]
        loc = F.when(ip == "", F.lit("root")).otherwise(
            F.concat(F.lit("property '"), ip, F.lit("'"))
        )
        generic = F.concat(loc, F.lit(" is invalid: error_type="), kw)
        msg = generic
        if emap is not None:
            msg = F.when(
                (kw == "enum") & F.element_at(emap, sp).isNotNull(),
                F.concat(loc, F.lit(" is not one of: "), F.element_at(emap, sp)),
            ).otherwise(msg)
        if cmap is not None:
            msg = F.when(
                (kw == "const") & F.element_at(cmap, sp).isNotNull(),
                F.concat(loc, F.lit(" is not: "), F.element_at(cmap, sp)),
            ).otherwise(msg)
        if fmap is not None:
            msg = F.when(
                (kw == "format") & F.element_at(fmap, sp).isNotNull(),
                F.concat(loc, F.lit(" does not match format: "), F.element_at(fmap, sp)),
            ).otherwise(msg)
        if pmap is not None:
            msg = F.when(
                (kw == "pattern") & F.element_at(pmap, sp).isNotNull(),
                F.concat(loc, F.lit(" does not match pattern: "), F.element_at(pmap, sp)),
            ).otherwise(msg)
        if rmap is not None:
            # JSON pointer -> JSONPath bracket form: "" -> $, /a/b -> $['a']['b'].
            # Names needing pointer-unescaping (~) or that would break the
            # bracket quoting ("'", '"', backslash) take the generic-sentence
            # fallback HONESTLY via this predicate, instead of relying on
            # get_json_object returning null for a mangled path (round-4
            # advice: a quote in a property name silently degraded).
            safe = (
                ~ip.contains("~") & ~ip.contains("'")
                & ~ip.contains('"') & ~ip.contains("\\")
            )
            path = F.when(ip == "", F.lit("$")).otherwise(
                F.concat(
                    F.lit("$['"),
                    F.regexp_replace(ip.substr(F.lit(2), F.length(ip)), "/", "']['"),
                    F.lit("']"),
                )
            )
            req = F.element_at(rmap, sp)
            # call_function: the SQL get_json_object accepts a non-literal
            # path (the PySpark wrapper doesn't)
            keys = F.json_object_keys(F.call_function("get_json_object", content, path))
            missing = F.array_join(F.array_except(req, F.coalesce(keys, F.array())), ", ")
            msg = F.when(
                (kw == "required") & safe & req.isNotNull() & keys.isNotNull(),
                F.concat(loc, F.lit(" is missing required keys: "), missing),
            ).otherwise(msg)
        msg = F.when(kw.isin(*_TYPE_NAMES),
                     F.concat(loc, F.lit(" is not of type: "), kw)).otherwise(msg)
        return msg

    return F.transform(violations, one)
