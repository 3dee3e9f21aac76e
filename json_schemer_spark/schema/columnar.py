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

Coverage (round 2 widening — see the interpreter tier for the general
case): scalar keywords, applicators (properties/patternProperties/
additionalProperties/propertyNames, prefixItems/items/additionalItems,
contains/min/maxContains, allOf/anyOf/oneOf/not/if-then-else,
dependencies/dependentRequired/dependentSchemas), uniqueItems, composite
enum/const (canonical-JSON equality), static-document ``$ref`` (compile-time
inlining), and the static-coverage cases of unevaluatedProperties/Items.

Numeric comparisons are exact beyond 2^53: compare doubles first, then
tie-break equal doubles through the decimal(38,12) view (JSON big-int
fidelity — SURVEY.md §7.3.2; reference uses BigDecimal, validation.rb:91).

Known data-dependent edge cases that stay on the columnar tier (documented
trade-offs, all outside the conformance suite's cases):
- uniqueItems equates numbers via the decimal(38,12) view → values smaller
  than 1e-12 collapse to 0; exponent-form vs plain-form numbers nested in
  composites compare by serialization.
- composite enum/const require number-free or exactly-serializable nested
  numbers (gated at compile time; others fall back to the interpreter).
"""

from __future__ import annotations

import json
import re
from decimal import Decimal
from typing import Any, Callable

from json_schemer_spark.schema.dialects import Dialect

_ANNOTATIONS = {
    "title", "description", "default", "examples", "$comment", "deprecated",
    "readOnly", "writeOnly", "$schema", "$id", "id", "format", "$defs",
    "definitions", "$anchor", "contentMediaType", "contentEncoding",
    "contentSchema", "$vocabulary",
}

# Keywords that are assertions/applicators in at least one dialect. Anything
# outside this set (and _ANNOTATIONS) is an unknown keyword → annotation,
# always valid (reference core.rb:128-156).
_MEANINGFUL = {
    "type", "enum", "const", "multipleOf", "maximum", "minimum",
    "exclusiveMaximum", "exclusiveMinimum", "maxLength", "minLength",
    "pattern", "maxItems", "minItems", "uniqueItems", "maxContains",
    "minContains", "maxProperties", "minProperties", "required",
    "dependentRequired", "contains", "items", "prefixItems",
    "additionalItems", "properties", "patternProperties",
    "additionalProperties", "propertyNames", "dependencies",
    "dependentSchemas", "allOf", "anyOf", "oneOf", "not", "if", "then",
    "else", "$ref", "$dynamicRef", "$recursiveRef", "unevaluatedItems",
    "unevaluatedProperties",
}

_SCALARS = (str, int, float, bool, type(None))
_NUMERIC_TAGS = ("BIGINT", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT")
_VIOL_DDL = (
    "struct<keyword:string,instance_pointer:string,"
    "schema_pointer:string,message:string>"
)

# asserted formats whose interpreter checker compiles the IDENTICAL regex
# that rlike runs (formats.py `_rx`) — safe to lower without tier divergence
_RLIKE_EXACT_FORMATS = frozenset(
    {"uuid", "duration", "uri-template", "json-pointer", "relative-json-pointer"}
)


class Unsupported(Exception):
    """Schema outside the columnar subset → interpreter tier."""


# The bounded-unroll sentinel for cyclic $ref (round 5): an INERT schema —
# _check ignores the unknown keyword, _lower emits no constraints — whose
# identity marks "beyond the unrolled depth". build_route_probe() finds these
# by identity and emits a Column that is true iff a row has instance data at
# any marker position; such rows ride the interpreter tier.
ROUTE_MARKER: dict = {"x-jss-route-marker": True}

# How many times one $ref target may be re-entered along a single inlining
# path before the next re-entry becomes a ROUTE_MARKER. 2 keeps unrolled
# plans small (the _cost budget still gates pathological cycle bodies);
# instances deeper than 2 cycle iterations route to the interpreter.
_UNROLL_BUDGET = 2

# Keywords whose SUBSCHEMAS apply to a DEEPER instance location — crossing
# one of these between cycle re-entries is what makes bounded unrolling
# terminate per row (in-place applicators like allOf/not recurse on the
# same instance node forever).
_INSTANCE_EDGE_KWS = frozenset({
    "properties", "patternProperties", "additionalProperties",
    "items", "prefixItems", "additionalItems", "contains",
    "propertyNames", "unevaluatedItems", "unevaluatedProperties",
})


def has_route_markers(schema: Any) -> bool:
    """True if the prepared (inlined) tree contains any ROUTE_MARKER."""
    if schema is ROUTE_MARKER:
        return True
    if isinstance(schema, dict):
        return any(has_route_markers(v) for v in schema.values())
    if isinstance(schema, list):
        return any(has_route_markers(v) for v in schema)
    return False


def _esc(token: str) -> str:
    """JSON-pointer token escape (RFC 6901)."""
    return token.replace("~", "~0").replace("/", "~1")


# ---------------------------------------------------------------------------
# $ref inlining pre-pass (driver-side, static documents only)
# ---------------------------------------------------------------------------

def _resolve_pointer(doc: Any, pointer: str) -> Any:
    node = doc
    if pointer in ("", "#"):
        return node
    for raw in pointer.lstrip("/").split("/"):
        token = raw.replace("~1", "/").replace("~0", "~")
        if isinstance(node, dict):
            if token not in node:
                raise Unsupported(f"$ref pointer {pointer!r}: missing {token!r}")
            node = node[token]
        elif isinstance(node, list):
            try:
                node = node[int(token)]
            except (ValueError, IndexError) as exc:
                raise Unsupported(f"$ref pointer {pointer!r}: {exc}") from exc
        else:
            raise Unsupported(f"$ref pointer {pointer!r} into non-container")
    return node


# Keywords the interpreter gates on the "validation" vocabulary (the exact
# ``v_on`` set in interpreter.py — note min/maxContains are NOT gated there,
# matching reference draft202012/vocab.rb's contains placement under
# applicator evaluation). When a resource's $vocabulary disables validation
# (suite vocabulary.json via metaschema-no-validation), these keywords are
# annotations; inline_refs strips them per-resource so the lowering below
# never needs to consult vocab state.
_VALIDATION_VOCAB_KWS = frozenset({
    "type", "enum", "const", "multipleOf", "maximum", "minimum",
    "exclusiveMaximum", "exclusiveMinimum", "maxLength", "minLength",
    "pattern", "maxItems", "minItems", "uniqueItems", "maxProperties",
    "minProperties", "required", "dependentRequired",
})


def _vocab_compatible(nd: Dialect, d: Dialect) -> bool:
    """Can a resource under dialect ``nd`` inline into a plan lowered under
    ``d``? Yes iff they are the same draft in every behavioral respect
    except $vocabulary-derived keyword gating (enabled_vocabs), which the
    inline walk compensates for by stripping validation keywords
    per-resource. format-assertion divergence is NOT compensable (the
    assert/annotate decision is made once for the whole plan in _check)."""
    if nd is d or nd == d:
        return True
    import dataclasses

    if dataclasses.replace(nd, enabled_vocabs=None) != dataclasses.replace(
        d, enabled_vocabs=None
    ):
        return False

    # format-assertion semantics must match _check's definition exactly:
    # formats ASSERT only when enabled_vocabs explicitly lists the vocab
    # (None = default vocabulary set = annotate-only), NOT vocab_enabled()
    # — which returns True for None and would spuriously flag a standard
    # resource nested in a custom-vocabulary document as incompatible.
    def asserts_formats(x: Dialect) -> bool:
        return (x.enabled_vocabs is not None
                and "format-assertion" in x.enabled_vocabs)

    return asserts_formats(nd) == asserts_formats(d)


def inline_refs(schema: Any, dialect: Dialect, registry: Any = None,
                unroll_budget: int | None = None) -> Any:
    """Inline ``$ref`` targets at compile time; cyclic refs unroll to a
    bounded depth with per-row routing markers (round 5).

    With a :class:`Registry` (the production path through CompiledSchema),
    resolution handles base-URI rebinding, ``$id``/``$anchor`` and remote
    refs — anything the general resolver can resolve STATICALLY inlines.
    Without one, only same-document JSON-pointer refs resolve.

    CYCLIC ``$ref`` (reference schema.rb:175-217 resolves these lazily at
    validation time): a cycle that consumes instance depth between
    re-entries (descends through properties/items/…) is unrolled
    ``_UNROLL_BUDGET`` times; the next re-entry becomes :data:`ROUTE_MARKER`
    — an inert ``true`` schema whose INSTANCE position, if a row has data
    there, means the unrolled plan cannot decide that row. The caller
    routes exactly those rows to the interpreter tier
    (:func:`build_route_probe`); rows whose instances stay shallower get
    exact pure-Column verdicts, because an applicator never applies a
    subschema to a missing instance location. A cycle that makes NO
    instance progress between re-entries (``{"$ref": "#"}`` at the same
    node) still raises :class:`Unsupported` — unrolling cannot terminate
    it. Cyclic dynamic refs also still raise (scope-dependent).

    Drafts ≤7 replace siblings (schema.rb:384-395); modern drafts keep
    siblings adjacent and hoist the target into allOf. ``$defs`` /
    ``definitions`` members are copied verbatim instead of walked:
    resolution always reads the ORIGINAL document, the lowering never
    evaluates definitions directly, and walking them used to reject whole
    schemas for cycles in UNUSED definitions.
    """
    if not isinstance(schema, (dict, bool)):
        raise Unsupported("non-dict schema")

    # Which keywords force a fallback when they appear on a NESTED node?
    # Without a registry the pointer-only resolver cannot follow base-URI
    # rebinding or anchors at all. WITH a registry, nested $id/$anchor —
    # and $dynamicAnchor/$recursiveAnchor too — resolve statically; the
    # anchors' *dynamic* behavior only materializes through
    # $dynamicRef/$recursiveRef, which _check rejects wherever they
    # survive inlining, so inert anchors are safe to inline past.
    budget = _UNROLL_BUDGET if unroll_budget is None else unroll_budget

    rebinding = set()
    if registry is None:
        rebinding.add(dialect.id_keyword)
        if dialect.has_dollar_anchor:
            rebinding.add("$anchor")
        if dialect.has_dynamic_ref:
            rebinding.add("$dynamicAnchor")
        if dialect.has_recursive_ref:
            rebinding.add("$recursiveAnchor")

    from json_schemer_spark.schema.dialects import (
        DEPENDENCIES,
        KEYWORD_SHAPES,
        SCHEMA_LIST,
        SCHEMA_MAP,
        SCHEMA_OR_LIST,
        SCHEMA_VALUE,
    )

    def resolve(node: dict, ref: str):
        if registry is not None:
            from json_schemer_spark.schema.registry import DEFAULT_BASE_URI

            info = registry.info(node)
            base_uri = info.base_uri if info is not None else DEFAULT_BASE_URI
            try:
                target, _res, _ptr = registry.resolve_ref_with_pointer(ref, base_uri)
            except (KeyError, IndexError, TypeError) as exc:
                raise Unsupported(f"unresolvable $ref {ref!r}: {exc}") from exc
            return target
        if not ref.startswith("#"):
            raise Unsupported(f"non-local $ref {ref!r}")
        return _resolve_pointer(schema, ref[1:])

    def resolve_dynamic_scoped(node: dict, kind: str, ref: str, dscope: tuple):
        """Resolve ``$dynamicRef``/``$recursiveRef`` through the STATIC
        dynamic scope (round 5, superseding round 4's conservative
        single-anchor cases).

        After inlining, every occurrence of a node has exactly ONE
        evaluation path from the root — the walk path — so the runtime
        dynamic scope at that occurrence is statically known: ``dscope`` is
        the tuple of resources entered along the walk, maintained with the
        interpreter's exact push rule (push when a node's owning resource
        differs from the scope TOP — interpreter.py run()). Resolution then
        mirrors ``Evaluator._eval_dynamic_ref`` / ``_eval_recursive_ref``
        verbatim: anchor-form fragments that are ``$dynamicAnchor``s in the
        initially-resolved resource search the scope outermost-first
        (2020-12 core §8.2.3.2, reference draft202012/vocab/core.rb:71-110);
        ``$recursiveRef: '#'`` lands on the outermost
        ``$recursiveAnchor: true`` resource when the current one opts in
        (2019-09). Genuinely scope-DEPENDENT schemas thereby lower too —
        each inlined occurrence just resolves under its own scope."""
        if registry is None:
            raise Unsupported(kind)
        from json_schemer_spark.schema.registry import (
            DEFAULT_BASE_URI,
            split_fragment,
        )

        info = registry.info(node)
        base_uri = info.base_uri if info is not None else DEFAULT_BASE_URI
        if kind == "$recursiveRef":
            if ref != "#":
                raise Unsupported("non-'#' $recursiveRef")
            if not dscope:
                raise Unsupported("$recursiveRef with no scope")
            current = dscope[-1]
            target = current.root
            if current.recursive_anchor:
                for res in dscope:  # outermost-first
                    if res.recursive_anchor:
                        target = res.root
                        break
            return target
        try:
            target, tres, _ptr = registry.resolve_ref_with_pointer(ref, base_uri)
        except (KeyError, IndexError, TypeError) as exc:
            raise Unsupported(f"unresolvable $dynamicRef {ref!r}: {exc}") from exc
        frag = split_fragment(ref)[1]
        if frag and not frag.startswith("/") and frag in tres.dynamic_anchors:
            for res in dscope:  # outermost-first
                if frag in res.dynamic_anchors:
                    target = res.dynamic_anchors[frag]
                    break
        return target

    # Mid-walk size budget (round-5 ADVICE): the 48-frame stack cap bounds
    # DEPTH but not BREADTH — ~24 mutually-referencing defs each inlined
    # from two instance-edge positions stay under the stack cap while the
    # materialized tree expands toward 2^24 nodes, stalling/OOMing the
    # driver before the post-materialization _cost backstop ever runs.
    # Count walked schema nodes and bail mid-walk well past any schema the
    # 4000-unit _cost cap could accept (each node contributes ≥0 cost
    # units, so 50× the cost cap is unreachable by a lowerable schema)
    # but ~0.3% of the adversarial blowup.
    nodes_walked = 0
    node_budget = 50 * _COST_LIMIT

    def walk(node: Any, stack: tuple, idepth: int, dscope: tuple,
             rdialect: Dialect) -> Any:
        """Walk SCHEMA positions only — enum/const/default members and
        unknown-keyword values are data, never rewritten (a `$ref` key
        inside an enum member is a literal, suite draft4 enum.json trap).

        ``stack`` holds ``(id(target), idepth_at_entry)`` per inlined ref
        along this path; ``idepth`` counts instance-consuming applicator
        edges crossed since the root (the cycle-progress measure);
        ``dscope`` is the static dynamic scope (tuple of resources entered,
        interpreter push rule); ``rdialect`` is the dialect of the node's
        owning RESOURCE — same draft as ``dialect`` (enforced below) but
        possibly with a $vocabulary-restricted keyword set (suite
        vocabulary.json custom metaschemas, reference
        draft202012/vocab/core.rb:17-33 vocabulary selection)."""
        if not isinstance(node, dict):
            return node
        nonlocal nodes_walked
        nodes_walked += 1
        if nodes_walked > node_budget:
            raise Unsupported("inlined $ref tree too large (node budget)")
        if node is not schema and any(k in node for k in rebinding):
            # base-URI rebinding without a registry → general resolver only
            raise Unsupported("nested $id/$anchor rebinding")
        if registry is not None:
            ninfo = registry.info(node)
            if ninfo is not None:
                if ninfo.dialect is not dialect:
                    if _vocab_compatible(ninfo.dialect, dialect):
                        # same draft, $vocabulary-restricted keyword set
                        # (suite vocabulary.json custom metaschemas):
                        # rdialect carries the restriction, the emit loop
                        # strips gated keywords per-resource.
                        rdialect = ninfo.dialect
                    elif isinstance(node.get("$schema"), str):
                        # a resource under a genuinely DIFFERENT draft
                        # cannot inline — the lowering runs under one
                        # draft's keyword semantics
                        raise Unsupported(
                            "cross-dialect $schema in inlined resource")
                    # no explicit $schema: the node rides the walk dialect
                    # (pre-round-6 behavior for default-dialect remotes)
                if not dscope or ninfo.resource is not dscope[-1]:
                    dscope = dscope + (ninfo.resource,)
        # dynamic refs resolve through the STATIC scope and then inline like
        # modern $ref (siblings kept, target hoisted into allOf); cyclic
        # ones unroll with route markers exactly like plain $ref
        dyn_targets = []
        for dkw, active in (("$dynamicRef", dialect.has_dynamic_ref),
                            ("$recursiveRef", dialect.has_recursive_ref)):
            if active and isinstance(node.get(dkw), str):
                if len(stack) > 48:
                    raise Unsupported("$ref nesting too deep")
                raw = resolve_dynamic_scoped(node, dkw, node[dkw], dscope)
                tkey = id(raw)
                visits = [d for k, d in stack if k == tkey]
                if visits and visits[-1] == idepth:
                    raise Unsupported(f"cyclic {dkw} without instance progress")
                if len(visits) >= budget:
                    dyn_targets.append(ROUTE_MARKER)
                else:
                    dyn_targets.append(
                        walk(raw, stack + ((tkey, idepth),), idepth, dscope,
                             rdialect)
                    )
                node = {k: v for k, v in node.items() if k != dkw}

        ref = node.get("$ref")
        target = None
        if isinstance(ref, str):
            if len(stack) > 48:
                raise Unsupported("$ref nesting too deep")
            raw_target = resolve(node, ref)
            tkey = id(raw_target)
            visits = [d for k, d in stack if k == tkey]
            if visits and visits[-1] == idepth:
                # re-entry without consuming instance depth: unrolling can
                # never terminate this per row → interpreter tier
                raise Unsupported(f"cyclic $ref {ref!r} without instance progress")
            if len(visits) >= budget:
                target = ROUTE_MARKER
            else:
                target = walk(raw_target, stack + ((tkey, idepth),), idepth,
                              dscope, rdialect)
            siblings = {k: v for k, v in node.items() if k != "$ref"}
            if not dyn_targets and (dialect.exclusive_ref or not any(
                k for k in siblings if k not in ("$defs", "definitions")
            )):
                return target
            # modern drafts: keep siblings at THIS node and hoist the target
            # into allOf — unevaluated* must still see the target's
            # annotations as adjacent (suite: "unevaluatedItems with $ref")
            node = siblings
        # $vocabulary-restricted resource: validation-vocabulary keywords
        # are annotations there (interpreter's v_on gate) — drop them here
        # so the lowering below never consults per-node vocab state. None
        # of the gated keywords is a schema position, so skipping is safe.
        strip_validation = not rdialect.vocab_enabled("validation")
        out = {}
        for kw, val in node.items():
            if strip_validation and kw in _VALIDATION_VOCAB_KWS:
                continue
            shape = KEYWORD_SHAPES.get(kw)
            kid = idepth + 1 if kw in _INSTANCE_EDGE_KWS else idepth
            if shape is None:
                out[kw] = val
            elif kw in ("$defs", "definitions"):
                # passive containers: never evaluated directly; refs into
                # them resolve against the ORIGINAL document, so walking
                # (and rejecting cycles in UNUSED definitions) is pointless
                out[kw] = val
            elif shape == SCHEMA_VALUE:
                out[kw] = walk(val, stack, kid, dscope, rdialect)
            elif shape == SCHEMA_LIST:
                out[kw] = [walk(s, stack, kid, dscope, rdialect) for s in val] if isinstance(val, list) else val
            elif shape == SCHEMA_MAP:
                out[kw] = (
                    {k: walk(s, stack, kid, dscope, rdialect) for k, s in val.items()}
                    if isinstance(val, dict) else val
                )
            elif shape == SCHEMA_OR_LIST:
                out[kw] = (
                    [walk(s, stack, kid, dscope, rdialect) for s in val] if isinstance(val, list)
                    else walk(val, stack, kid, dscope, rdialect)
                )
            elif shape == DEPENDENCIES:
                out[kw] = (
                    {k: (s if isinstance(s, list) else walk(s, stack, kid, dscope, rdialect))
                     for k, s in val.items()}
                    if isinstance(val, dict) else val
                )
        hoisted = dyn_targets + ([target] if target is not None else [])
        if hoisted:
            out["allOf"] = hoisted + list(out.get("allOf") or [])
        return out

    root_scope: tuple = ()
    if registry is not None:
        rinfo = registry.info(schema)
        if rinfo is not None:
            root_scope = (rinfo.resource,)
    return walk(schema, (), 0, root_scope, dialect)


# ---------------------------------------------------------------------------
# driver-side subset check (cheap, no Spark imports)
# ---------------------------------------------------------------------------

# complexity budget: element-context subschemas (items/contains/
# patternProperties/additionalProperties values) inline their whole
# expression tree per use, so deeply STACKED combinators multiply — a
# pathological-but-lowerable schema can otherwise blow the driver's stack
# during Catalyst tree transforms (found by scripts/differential_fuzz.py)
#
# ROUND-6 RE-MEASUREMENT (verdict ask #4, full curve in BENCH.md): the cap
# stays at 4000 — measured, not inherited. At 6.9k units (the draft4
# meta-schema self-validation, the smallest schema the cap excludes) the
# first run costs 113 s of Catalyst analysis and a REPEATED plan OOMs the
# default-heap driver JVM; the 2019-09/2020-12 metaschemas sit at ~21k.
# Lifting the cap admits nothing usable. The same measurement found the
# OPPOSITE defect: expression-heavy leaves in inline element context
# (decimal multipleOf, enum canon, pattern) were under-priced ~40× — a
# nominal-1028-unit items×anyOf×multipleOf schema OOM'd the driver while
# the cap waved it through. _EXPENSIVE_LEAF_COST below charges those
# leaves their measured weight.
_COST_LIMIT = 4000

# measured per-use expression weight of leaves whose lowering cannot share
# slots inside HOF lambdas (inline element mode duplicates per reference):
# decimal multipleOf ≈ 2.7 s/use of the 52 s n=12 curve point → ~40 units;
# enum canonical-equality ≈ 4/member; pattern/uniqueItems regex+canon ≈ 6.
_EXPENSIVE_LEAF_COST = {"multipleOf": 40, "pattern": 6, "uniqueItems": 6,
                        "const": 4}


def _cost(schema: Any, dialect: Dialect, elem_weight: int = 1) -> int:
    if not isinstance(schema, dict):
        return 1
    total = (1 + len(schema)) * elem_weight
    from json_schemer_spark.schema.dialects import (
        KEYWORD_SHAPES,
        SCHEMA_LIST,
        SCHEMA_MAP,
        SCHEMA_OR_LIST,
        SCHEMA_VALUE,
    )

    elem_kw = {"items", "contains", "additionalItems", "additionalProperties",
               "patternProperties", "unevaluatedItems", "unevaluatedProperties"}
    for kw, val in schema.items():
        shape = KEYWORD_SHAPES.get(kw)
        if shape is None:
            # expensive leaves only surcharge where duplication actually
            # happens — inline element context (elem_weight > 1); named-slot
            # column mode memoizes them, so top-level uses stay cheap
            if elem_weight > 1:
                extra = _EXPENSIVE_LEAF_COST.get(kw)
                if extra:
                    total += extra * elem_weight
                elif kw == "enum" and isinstance(val, list):
                    total += 4 * len(val) * elem_weight
            continue
        w = elem_weight * (3 if kw in elem_kw else 1)
        if shape == SCHEMA_VALUE:
            total += _cost(val, dialect, w)
        elif shape in (SCHEMA_LIST, SCHEMA_OR_LIST) and isinstance(val, list):
            total += sum(_cost(s, dialect, w) for s in val)
        elif shape == SCHEMA_OR_LIST:
            total += _cost(val, dialect, w)
        elif shape == SCHEMA_MAP and isinstance(val, dict) and kw not in ("$defs", "definitions"):
            total += sum(_cost(s, dialect, w) for s in val.values())
        if total > _COST_LIMIT:
            raise Unsupported(f"plan too complex (> {_COST_LIMIT} expression units)")
    return total


def prepare(schema: Any, dialect: Dialect, registry: Any = None,
            unroll_budget: int | None = None) -> Any:
    """Inline refs + verify lowerable; returns the inlined schema."""
    inlined = inline_refs(schema, dialect, registry=registry,
                          unroll_budget=unroll_budget)
    _check(inlined, dialect)
    _cost(inlined, dialect)
    return inlined


def _check_num_literal(x) -> None:
    """Gate numeric bound/const/enum literals on exact representability in
    the decimal(38,12) tie-break view (round-2 ADVICE): plan build calls
    ``float(x)`` — a 10**400 int literal (valid JSON!) would raise
    OverflowError mid-build — and any literal OUTSIDE the decimal view
    (|x| ≥ 1e26 or finer than 1e-12) degrades comparison to double-only,
    which false-accepts instances that share the literal's double but
    differ exactly (a 2**100 const would accept 2**100 + 1). All such
    schemas fall back to the exact interpreter tier."""
    if isinstance(x, bool) or not isinstance(x, (int, float)):
        return
    if isinstance(x, float) and (x != x or x in (float("inf"), float("-inf"))):
        raise Unsupported("non-finite numeric literal")
    if _dec_lit_or_none(x) is None:
        raise Unsupported(
            "numeric literal outside decimal(38,12): double-only compare is inexact"
        )


def _as_count(v) -> Any:
    """Count-keyword value (maxLength, minItems, …) as an int, or None if
    invalid. Draft6+ defines `integer` as any number with zero fraction,
    so ``maxLength: 2.0`` is a valid schema — the reference (and our
    interpreter) applies it numerically on every draft."""
    if isinstance(v, bool):
        return None
    if isinstance(v, float) and v.is_integer():
        v = int(v)
    if not isinstance(v, int) or v < 0:
        return None
    return v


def lowerable(schema: Any, dialect: Dialect, registry: Any = None) -> bool:
    try:
        prepare(schema, dialect, registry=registry)
        return True
    except Unsupported:
        return False


def _check(schema: Any, dialect: Dialect) -> None:
    if schema is True or schema is False:
        return
    if not isinstance(schema, dict):
        raise Unsupported("non-dict schema")
    # $vocabulary-gated keywords never reach here: inline_refs strips
    # validation-vocabulary keywords per-resource during the walk (round 6),
    # and the interpreter treats the applicator vocabulary as always-on, so
    # lowering applicator keywords unconditionally matches it.
    if dialect.openapi and isinstance(schema.get("discriminator"), dict):
        raise Unsupported("OpenAPI discriminator")
    fmt_assert = (
        dialect.enabled_vocabs is not None
        and "format-assertion" in dialect.enabled_vocabs
    )

    for kw, val in schema.items():
        if kw == "format" and fmt_assert and isinstance(val, str):
            # assertion mode: only formats whose Python checker IS the same
            # regex as the Java rlike pattern lower (tier-identical verdicts);
            # other known formats fall back; unknown formats pass vacuously
            if val in _RLIKE_EXACT_FORMATS:
                pass
            else:
                from json_schemer_spark.schema.formats import (
                    FORMAT_CHECKS,
                    openapi_formats,
                )

                if val in FORMAT_CHECKS or (
                    dialect.openapi and val in openapi_formats(dialect.openapi)
                ):
                    raise Unsupported(f"asserted format {val!r} not rlike-lowerable")
            continue
        if kw in _ANNOTATIONS:
            # draft7 asserts content keywords (draft7/vocab/validation.rb:38-65)
            if dialect.content_assertion and kw in ("contentEncoding", "contentMediaType"):
                raise Unsupported("draft7 content assertion")
            continue
        if kw not in _MEANINGFUL:
            continue  # unknown keyword → annotation
        if kw in ("$dynamicRef", "$recursiveRef"):
            if dialect.has_dynamic_ref or dialect.has_recursive_ref:
                raise Unsupported(kw)
            continue
        if kw == "$ref":
            raise Unsupported("$ref survived inlining")
        if kw == "enum":
            if not isinstance(val, list):
                raise Unsupported("enum not a list")
            for x in val:
                if not isinstance(x, _SCALARS):
                    _canonical_json(x)  # raises if not representable
                else:
                    _check_num_literal(x)
        elif kw == "const":
            if dialect.has_const:
                if not isinstance(val, _SCALARS):
                    _canonical_json(val)
                else:
                    _check_num_literal(val)
        elif kw == "properties":
            if not isinstance(val, dict):
                raise Unsupported("properties not a dict")
            for sub in val.values():
                _check(sub, dialect)
        elif kw == "patternProperties":
            if not isinstance(val, dict):
                raise Unsupported("patternProperties not a dict")
            for pattern, sub in val.items():
                _java_pattern(pattern)
                _check(sub, dialect)
        elif kw in ("additionalProperties", "not", "contains"):
            if kw == "contains" and not dialect.has_contains:
                continue
            _check(val, dialect)
        elif kw in ("if", "then", "else"):
            if dialect.has_if_then_else:
                _check(val, dialect)
        elif kw == "propertyNames":
            if dialect.has_property_names:
                _check_string_pred(val, dialect)
        elif kw == "items":
            if isinstance(val, list):
                if dialect.has_prefix_items or not dialect.array_form_items:
                    raise Unsupported("array-form items in modern draft")
                for sub in val:
                    _check(sub, dialect)
            else:
                _check(val, dialect)
        elif kw == "prefixItems":
            if dialect.has_prefix_items:
                if not isinstance(val, list):
                    raise Unsupported("prefixItems not a list")
                for sub in val:
                    _check(sub, dialect)
        elif kw == "additionalItems":
            if dialect.array_form_items and isinstance(schema.get("items"), list):
                _check(val, dialect)
        elif kw in ("allOf", "anyOf", "oneOf"):
            if not isinstance(val, list) or not val:
                raise Unsupported(f"{kw} not a non-empty list")
            for sub in val:
                _check(sub, dialect)
        elif kw == "multipleOf":
            if not isinstance(val, (int, float)) or isinstance(val, bool) or val <= 0:
                raise Unsupported("non-positive multipleOf")
            _dec_repr(val)  # must be decimal-exact for the modulo
        elif kw == "required":
            if not isinstance(val, list) or not all(isinstance(k, str) for k in val):
                raise Unsupported("bad required list")
        elif kw == "dependentRequired":
            if dialect.has_dependent_keywords:
                if not isinstance(val, dict) or not all(
                    isinstance(v, list) and all(isinstance(k, str) for k in v)
                    for v in val.values()
                ):
                    raise Unsupported("bad dependentRequired")
        elif kw == "dependentSchemas":
            if dialect.has_dependent_keywords:
                if not isinstance(val, dict):
                    raise Unsupported("bad dependentSchemas")
                for sub in val.values():
                    _check(sub, dialect)
        elif kw == "dependencies":
            if dialect.has_legacy_dependencies:
                if not isinstance(val, dict):
                    raise Unsupported("bad dependencies")
                for dep in val.values():
                    if isinstance(dep, list):
                        if not all(isinstance(k, str) for k in dep):
                            raise Unsupported("bad dependencies array")
                    else:
                        _check(dep, dialect)
        elif kw == "pattern":
            _java_pattern(val)
        elif kw == "uniqueItems":
            if val not in (True, False):
                raise Unsupported("bad uniqueItems")
        elif kw in ("maxItems", "minItems", "maxLength", "minLength",
                    "maxProperties", "minProperties", "maxContains", "minContains"):
            if _as_count(val) is None:
                raise Unsupported(f"bad {kw}")
        elif kw in ("maximum", "minimum", "exclusiveMaximum", "exclusiveMinimum"):
            # numeric-or-ignored; draft4 boolean forms handled in lowering
            _check_num_literal(val)
        elif kw == "type":
            types = val if isinstance(val, list) else [val]
            for t in types:
                if t not in ("null", "boolean", "number", "integer", "string", "array", "object"):
                    raise Unsupported(f"unknown type {t!r}")
        elif kw in ("unevaluatedProperties", "unevaluatedItems"):
            if dialect.has_unevaluated:
                _check(val, dialect)
                # run the contribution collector: raises Unsupported on
                # pathological shapes (contribution explosion); the gated
                # branch subschemas themselves are checked by the main walk
                if kw == "unevaluatedProperties":
                    for _, _, pats, _ in _prop_contribs(schema, dialect, top=True):
                        for p in pats:
                            _java_pattern(p)
                else:
                    _item_contribs(schema, dialect, top=True)
        # "then"/"else" without "if", min/maxContains without contains,
        # additionalItems without array items: ignored like the interpreter


# --- annotation-coverage contributions for unevaluated* (SURVEY.md §2.6) ----
#
# The evaluated-name/-index set is the union of annotations from every
# successfully-applied in-place subschema (reference semantics:
# draft202012/vocab/unevaluated.rb:6-100 walks dynamically-valid adjacent
# results). Contributions from the node itself and from allOf descendants
# are statically certain (gates == ()); contributions under anyOf / oneOf /
# if-then-else / dependentSchemas gate on branch VALIDITY, lowered at build
# time to the branch's own validity Column at the SAME variant slot (all
# in-place applicators share the location, so no new extraction is needed).
# Gate kinds:
#   ("valid", subschema)    — subschema valid against the instance here
#   ("notvalid", subschema) — subschema invalid (the if/else arm)
#   ("present", name)       — object property ``name`` present
#                             (dependentSchemas / schema-form dependencies)
# Gates compose by conjunction down the tree: a contribution nested two
# branches deep requires BOTH branches valid, exactly as the reference drops
# every annotation of an invalid result subtree.

_UNEVAL_MAX_CONTRIBS = 64


def _contrib_branches(schema: dict, dialect: Dialect, gates: tuple, recurse) -> list:
    """Shared gated-branch walk for the prop/item contribution collectors."""
    out: list = []
    for kw in ("anyOf", "oneOf"):
        # oneOf: every VALID branch contributes (the reference walks all
        # adjacent results; >1 valid fails the node, where coverage is moot)
        for sub in schema.get(kw) or []:
            out += recurse(sub, dialect, gates=gates + (("valid", sub),))
    if dialect.has_if_then_else and "if" in schema:
        if_s = schema["if"]
        out += recurse(if_s, dialect, gates=gates + (("valid", if_s),))
        if "then" in schema:
            out += recurse(schema["then"], dialect,
                           gates=gates + (("valid", if_s), ("valid", schema["then"])))
        if "else" in schema:
            out += recurse(schema["else"], dialect,
                           gates=gates + (("notvalid", if_s), ("valid", schema["else"])))
    dep_subs: dict = {}
    if dialect.has_dependent_keywords and isinstance(schema.get("dependentSchemas"), dict):
        dep_subs.update(schema["dependentSchemas"])
    if dialect.has_legacy_dependencies and isinstance(schema.get("dependencies"), dict):
        dep_subs.update({k: v for k, v in schema["dependencies"].items()
                         if not isinstance(v, list)})
    for key, sub in dep_subs.items():
        out += recurse(sub, dialect, gates=gates + (("present", key), ("valid", sub)))
    # `not` never contributes annotations (it is valid ⇢ its subschema FAILED)
    if len(out) > _UNEVAL_MAX_CONTRIBS:
        raise Unsupported("unevaluated* contribution explosion")
    return out


def _prop_contribs(schema: Any, dialect: Dialect, top: bool = False,
                   gates: tuple = ()) -> list:
    """Property-coverage contributions ``(gates, names, patterns, all_eval)``
    dynamically evaluated at this location."""
    if schema is True or schema is False or not isinstance(schema, dict):
        return []
    names = frozenset(schema.get("properties") or {})
    patterns = tuple(schema.get("patternProperties") or {})
    all_eval = "additionalProperties" in schema or (
        not top and "unevaluatedProperties" in schema
    )
    out = [(gates, names, patterns, all_eval)] if (names or patterns or all_eval) else []
    for sub in schema.get("allOf") or []:
        out += _prop_contribs(sub, dialect, gates=gates)
    out += _contrib_branches(schema, dialect, gates, _prop_contribs)
    if len(out) > _UNEVAL_MAX_CONTRIBS:
        raise Unsupported("unevaluated* contribution explosion")
    return out


def _item_contribs(schema: Any, dialect: Dialect, top: bool = False,
                   gates: tuple = ()) -> list:
    """Item-coverage contributions ``(gates, prefix_len, all_items,
    contains_subschemas)`` dynamically evaluated at this location."""
    if schema is True or schema is False or not isinstance(schema, dict):
        return []
    plen, allit, cpreds = 0, False, []
    it = schema.get("items")
    if dialect.has_prefix_items:
        if isinstance(schema.get("prefixItems"), list):
            plen = len(schema["prefixItems"])
        if it is not None:
            allit = True
    elif dialect.array_form_items:
        if isinstance(it, list):
            plen = len(it)
            if schema.get("additionalItems") is not None:
                allit = True
        elif it is not None:
            allit = True
    if not top and "unevaluatedItems" in schema:
        allit = True
    if dialect.has_contains and "contains" in schema:
        cpreds.append(schema["contains"])
    out = [(gates, plen, allit, tuple(cpreds))] if (plen or allit or cpreds) else []
    for sub in schema.get("allOf") or []:
        out += _item_contribs(sub, dialect, gates=gates)
    out += _contrib_branches(schema, dialect, gates, _item_contribs)
    if len(out) > _UNEVAL_MAX_CONTRIBS:
        raise Unsupported("unevaluated* contribution explosion")
    return out


# ---------------------------------------------------------------------------
# ECMA → Java pattern translation / gating
# ---------------------------------------------------------------------------

_QUANT = re.compile(r"\{\d+(,\d*)?\}")


def _java_pattern(pattern: str) -> str:
    """ECMA pattern → Java regex for ``rlike``, or raise Unsupported.

    Mirrors the reject-unsupported-token stance of the reference's
    ecma_regexp.rb:38-49 translator: constructs whose Java semantics can't
    be made ECMA-equal fall back to the interpreter tier (which uses the
    Python-flavor translation)."""
    if not isinstance(pattern, str):
        raise Unsupported("non-string pattern")
    # scan with escape/class tracking: reject Java-divergent constructs
    i, n, in_class = 0, len(pattern), False
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            if pattern[i + 1] in "AzZG":
                raise Unsupported(f"\\{pattern[i + 1]} is literal in ECMA, anchor in Java")
            i += 2
            continue
        if in_class:
            if ch == "[":
                raise Unsupported("'[' inside class: Java nested class, ECMA literal")
            if ch == "&" and pattern[i + 1 : i + 2] == "&":
                raise Unsupported("'&&' inside class: Java intersection, ECMA literal")
            if ch == "]":
                in_class = False
        else:
            if ch == "[":
                in_class = True
                if pattern[i + 1 : i + 2] == "^" and pattern[i + 2 : i + 3] == "]":
                    i += 3
                    continue
                if pattern[i + 1 : i + 2] == "]":
                    i += 2
                    continue
            elif ch == "{":
                if not _QUANT.match(pattern, i):
                    raise Unsupported("dangling '{': literal in ECMA, error in Java")
        i += 1
    if in_class:
        raise Unsupported("unterminated character class")

    from json_schemer_spark.schema.ecma_regex import EcmaRegexError, compile_ecma, translate

    try:
        compile_ecma(pattern)  # ECMA-validity witness (python flavor compiles)
        return translate(pattern, flavor="java")
    except EcmaRegexError as exc:
        raise Unsupported(f"pattern {pattern!r}: {exc}") from exc


# ---------------------------------------------------------------------------
# canonical JSON for composite enum/const (matches Spark to_json(variant):
# sorted keys, compact separators, canonical number forms)
# ---------------------------------------------------------------------------

def _canonical_json(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, int):
        if abs(v) >= 10**38:
            raise Unsupported("integer beyond decimal(38) in composite literal")
        return str(v)
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            raise Unsupported("non-finite float in composite literal")
        if v.is_integer() and abs(v) < 2**53:
            return str(int(v))
        r = repr(v)
        if "e" in r or "E" in r or len(r.replace("-", "").replace(".", "")) > 15:
            raise Unsupported(f"float {r} not canonically serializable")
        return r
    if isinstance(v, list):
        return "[" + ",".join(_canonical_json(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{json.dumps(k, ensure_ascii=False)}:{_canonical_json(x)}"
            for k, x in sorted(v.items())
        ) + "}"
    raise Unsupported(f"unsupported literal type {type(v)}")


def _dec_repr(x) -> str:
    """Exact decimal(38,12) literal text for a schema number, or raise."""
    d = Decimal(str(x))
    if not d.is_finite():
        raise Unsupported(f"{x} is not finite")
    exp = d.as_tuple().exponent
    if exp < -12:
        q = d.quantize(Decimal("1E-12"))
        if q != d:
            raise Unsupported(f"{x} not exact in decimal(38,12)")
        d = q
    if abs(d) >= Decimal(10) ** 26:
        raise Unsupported(f"{x} beyond decimal(38,12) range")
    return format(d, "f")


def _dec_lit_or_none(x):
    try:
        return _dec_repr(x)
    except Unsupported:
        return None


# ---------------------------------------------------------------------------
# extraction context: stage-1 struct fields
# ---------------------------------------------------------------------------

_COL_PREFIX = "__jss_"


class _Ctx:
    """Allocates extraction slots. Keys are counter-based (collision-free by
    construction); memoization is on the (vkey, kind) tuple, where kind may
    be any hashable (round-2 fix for the f-string aliasing bug).

    Two modes:
    - column mode (default): each slot becomes its OWN named column and
      builders receive a cheap ``F.col`` reference to the parent slot.
      Slots are emitted as chained projections by dependency depth —
      multi-referenced non-cheap columns stop CollapseProject from inlining
      them into every consumer (a struct-field layout gets re-inlined by
      SimplifyExtractValueOps: measured 5-10× per-row re-derivation).
    - inline mode (``_lower_element``): builders compose expressions
      directly — lambdas cannot reference outer columns by name.
    """

    def __init__(self, inline: bool = False) -> None:
        self.exprs: dict[str, Any] = {}
        self.depth: dict[str, int] = {}
        self.inline = inline
        self._memo: dict[tuple, str] = {}
        self._n = 0

    def ref(self, key: str):
        if self.inline:
            return self.exprs[key]
        import pyspark.sql.functions as F

        return F.col(_COL_PREFIX + key)

    def add_variant(self, expr) -> str:
        key = f"v{self._n}"
        self._n += 1
        self.exprs[key] = expr
        self.depth[key] = 0
        return key

    def typed(self, vkey: str, kind, builder: Callable) -> str:
        mk = (vkey, kind)
        got = self._memo.get(mk)
        if got is not None:
            return got
        if self._n > 2000:
            # backstop behind the _cost budget: never build plans whose
            # extraction stage alone would dwarf the optimizer
            raise Unsupported("too many extraction slots")
        key = f"t{self._n}"
        self._n += 1
        self.exprs[key] = builder(self.ref(vkey))
        self.depth[key] = self.depth[vkey] + 1
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

    def tj(self, vkey: str) -> str:
        import pyspark.sql.functions as F

        return self.typed(vkey, "tj", lambda v: F.to_json(v))

    def field(self, vkey: str, key: str) -> str:
        """Child variant slot for object property ``key`` (element_at on the
        memoized map view: path-syntax-free, works for any property name,
        and the map cast is computed once per location)."""
        import pyspark.sql.functions as F

        objkey = self.obj(vkey)
        return self.typed(objkey, ("prop", key),
                          lambda o, key=key: F.element_at(o, key))

    def item(self, vkey: str, i: int) -> str:
        """Child variant slot for array index ``i`` (null when OOB/non-array)."""
        import pyspark.sql.functions as F

        arrkey = self.arr(vkey)
        return self.typed(arrkey, ("item", i), lambda a, i=i: F.get(a, i))


class _Multi:
    """A fails-list entry that is an array<struct> Column (dynamic per-key /
    per-index violations) rather than a single nullable struct."""

    __slots__ = ("col",)

    def __init__(self, col) -> None:
        self.col = col


def _gate(cond, fails: list) -> list:
    """Wrap every fails entry in F.when(cond, ...) — nulls filter out later."""
    import pyspark.sql.functions as F

    out = []
    for f in fails:
        if isinstance(f, _Multi):
            out.append(_Multi(F.when(cond, f.col)))
        else:
            out.append(F.when(cond, f))
    return out


def _viol(cond, keyword: str, ipath, spath: str, message):
    """Violation struct under ``cond``. ipath/message may be str or Column."""
    import pyspark.sql.functions as F

    ip = F.lit(ipath) if isinstance(ipath, str) else ipath
    msg = F.lit(message) if isinstance(message, str) else message
    return F.when(
        F.coalesce(cond, F.lit(False)),
        F.struct(
            F.lit(keyword).alias("keyword"),
            ip.alias("instance_pointer"),
            F.lit(spath).alias("schema_pointer"),
            msg.alias("message"),
        ),
    )


def _ptr_col(ipath: str, key_col):
    """Dynamic JSON pointer: ipath + '/' + escape(key)."""
    import pyspark.sql.functions as F

    esc = F.regexp_replace(F.regexp_replace(key_col, "~", "~0"), "/", "~1")
    return F.concat(F.lit(ipath + "/"), esc)


# ---------------------------------------------------------------------------
# propertyNames: string-instance predicate lowering
# ---------------------------------------------------------------------------

_STRING_APPLICABLE = {"type", "enum", "const", "maxLength", "minLength",
                      "pattern", "allOf", "anyOf", "oneOf", "not", "if",
                      "then", "else"}


def _check_string_pred(schema: Any, dialect: Dialect) -> None:
    if schema is True or schema is False:
        return
    if not isinstance(schema, dict):
        raise Unsupported("non-dict propertyNames schema")
    for kw, val in schema.items():
        if kw in _ANNOTATIONS or kw not in _MEANINGFUL:
            continue
        if kw not in _STRING_APPLICABLE:
            continue  # vacuous on string instances (type-guard model)
        if kw == "pattern":
            _java_pattern(val)
        elif kw in ("maxLength", "minLength"):
            if _as_count(val) is None:
                raise Unsupported(f"bad {kw}")
        elif kw == "enum":
            if not isinstance(val, list):
                raise Unsupported("enum not a list")
        elif kw in ("allOf", "anyOf", "oneOf"):
            for sub in val:
                _check_string_pred(sub, dialect)
        elif kw == "not":
            _check_string_pred(val, dialect)
        elif kw in ("if", "then", "else"):
            if dialect.has_if_then_else:
                _check_string_pred(val, dialect)


def _string_pred(schema: Any, dialect: Dialect):
    """Subschema → predicate over a STRING column (object keys are always
    strings, so type guards resolve statically)."""
    import pyspark.sql.functions as F

    if schema is True or (isinstance(schema, dict) and not schema):
        return lambda k: F.lit(True)
    if schema is False:
        return lambda k: F.lit(False)

    parts: list[Callable] = []
    ty = schema.get("type")
    if ty is not None:
        types = ty if isinstance(ty, list) else [ty]
        ok = "string" in types
        parts.append(lambda k, ok=ok: F.lit(ok))
    if "enum" in schema:
        strs = [x for x in schema["enum"] if isinstance(x, str)]
        parts.append(lambda k, strs=tuple(strs): k.isin(*strs) if strs else F.lit(False))
    if dialect.has_const and "const" in schema:
        c = schema["const"]
        if isinstance(c, str):
            parts.append(lambda k, c=c: k == F.lit(c))
        else:
            parts.append(lambda k: F.lit(False))
    if "maxLength" in schema:
        m = _as_count(schema["maxLength"])
        parts.append(lambda k, m=m: F.length(k) <= m)
    if "minLength" in schema:
        m = _as_count(schema["minLength"])
        parts.append(lambda k, m=m: F.length(k) >= m)
    if "pattern" in schema:
        jp = _java_pattern(schema["pattern"])
        parts.append(lambda k, jp=jp: k.rlike(jp))
    for sub in schema.get("allOf") or []:
        parts.append(_string_pred(sub, dialect))
    if isinstance(schema.get("anyOf"), list):
        branches = [_string_pred(s, dialect) for s in schema["anyOf"]]

        def any_p(k, branches=branches):
            out = None
            for b in branches:
                c = b(k)
                out = c if out is None else (out | c)
            return out

        parts.append(any_p)
    if isinstance(schema.get("oneOf"), list):
        branches = [_string_pred(s, dialect) for s in schema["oneOf"]]

        def one_p(k, branches=branches):
            total = None
            for b in branches:
                c = b(k).cast("int")
                total = c if total is None else (total + c)
            return total == 1

        parts.append(one_p)
    if "not" in schema:
        inner = _string_pred(schema["not"], dialect)
        parts.append(lambda k, inner=inner: ~inner(k))
    if dialect.has_if_then_else and "if" in schema:
        ip = _string_pred(schema["if"], dialect)
        tp = _string_pred(schema["then"], dialect) if "then" in schema else (lambda k: F.lit(True))
        ep = _string_pred(schema["else"], dialect) if "else" in schema else (lambda k: F.lit(True))
        parts.append(lambda k, ip=ip, tp=tp, ep=ep: F.when(ip(k), tp(k)).otherwise(ep(k)))

    frozen = tuple(parts)

    # NOTE: exactly one parameter — pyspark infers higher-order-function
    # lambda arity from the signature (default args count!)
    def pred(k):
        out = None
        for p in frozen:
            c = p(k)
            out = c if out is None else (out & c)
        return out if out is not None else F.lit(True)

    return pred


# ---------------------------------------------------------------------------
# lowering: schema node → emit(get, ipath) -> (valid, fails)
# ---------------------------------------------------------------------------

def _lower(schema: Any, dialect: Dialect, spath: str, ctx: _Ctx, vkey: str):
    """Build the stage-2 emitter for one schema node rooted at variant slot
    ``vkey``. ``emit(get, ipath)`` gets a field-resolver (key → Column) and
    the static instance pointer; returns (valid Column, [violation entries])
    where entries are nullable structs or :class:`_Multi` arrays.

    INVARIANT: every ctx allocation happens HERE (build time); emit closures
    only read previously-allocated keys — the extraction struct is frozen
    before any emitter runs.
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

    def _is_num(get, tsk):
        ts = get(tsk)
        return ts.isin(*_NUMERIC_TAGS) | ts.startswith("DECIMAL")

    type_list = schema.get("type")
    type_list = (
        type_list if isinstance(type_list, list) else ([type_list] if type_list else [])
    )
    # OpenAPI 3.0: `nullable: true` extends `type` (openapi30/vocab/base.rb)
    if dialect.openapi == 30 and schema.get("nullable") is True and type_list:
        type_list = list(type_list) + ["null"]

    needs_obj = (
        "object" in type_list
        or bool(schema.get("required"))
        or any(
            k in schema
            for k in (
                "properties", "patternProperties", "additionalProperties",
                "maxProperties", "minProperties",
            )
        )
        or (dialect.has_property_names and "propertyNames" in schema)
        or (dialect.has_dependent_keywords and (
            "dependentRequired" in schema or "dependentSchemas" in schema))
        or (dialect.has_legacy_dependencies and isinstance(schema.get("dependencies"), dict))
        or (dialect.has_unevaluated and "unevaluatedProperties" in schema)
    )
    objkey = ctx.obj(vkey) if needs_obj else None

    needs_arr = (
        "array" in type_list
        or any(k in schema for k in ("maxItems", "minItems", "items", "uniqueItems"))
        or (dialect.has_prefix_items and "prefixItems" in schema)
        or (dialect.has_contains and "contains" in schema)
        or (dialect.has_unevaluated and "unevaluatedItems" in schema)
    )
    arrkey = ctx.arr(vkey) if needs_arr else None

    checks: list[Callable] = []   # (get, ipath) -> (fail_cond, keyword, msg)
    subs: list[Callable] = []     # (get, ipath) -> (valid, fails)

    # --- type ---------------------------------------------------------------
    if type_list:
        tskey = ctx.ts(vkey) if any(
            t in ("string", "boolean", "null", "number", "integer") for t in type_list
        ) else None
        needs_int = "integer" in type_list and not dialect.strict_integer
        numkey = ctx.num(vkey) if needs_int else None
        deckey = ctx.dec(vkey) if needs_int else None

        # reference convention: single type → error type is the type name
        type_kw = type_list[0] if (len(type_list) == 1 and not isinstance(schema["type"], list)) else "type"

        def type_check(get, ipath, allowed=tuple(type_list), type_kw=type_kw):
            ok = None
            for t in allowed:
                if t == "object":
                    c = get(objkey).isNotNull()
                elif t == "array":
                    c = get(arrkey).isNotNull()
                else:
                    c = _type_pred(get, get(tskey), t, dialect, numkey, deckey,
                                   lambda g: _is_num(g, tskey))
                ok = c if ok is None else (ok | c)
            cond = get(vkey).isNotNull() & ~F.coalesce(ok, F.lit(False))
            return cond, type_kw, f"expected {list(allowed)}"

        checks.append(type_check)

    # --- const / enum --------------------------------------------------------
    def make_scalar_eq(x):
        """Build-time: allocate views; returns emit-fn(get) -> equality Column.

        Numeric equality compares doubles then tie-breaks through the
        decimal(38,12) view — exact beyond 2^53 (ADVICE round-1 fix)."""
        tsk = ctx.ts(vkey)
        if x is None:
            return lambda get: get(tsk) == "VOID"
        if isinstance(x, bool):
            bkey = ctx.boo(vkey)
            return lambda get: (get(tsk) == "BOOLEAN") & (get(bkey) == F.lit(x))
        if isinstance(x, (int, float)):
            nk, dk = ctx.num(vkey), ctx.dec(vkey)
            dlit = _dec_lit_or_none(x)

            def num_eq(get, x=x, dlit=dlit):
                e = _is_num(get, tsk) & (get(nk) == F.lit(float(x)))
                if dlit is not None:
                    e = e & (
                        get(dk).isNull()
                        | (get(dk) == F.lit(dlit).cast("decimal(38,12)"))
                    )
                return e

            return num_eq
        if isinstance(x, str):
            skey = ctx.str_(vkey)
            return lambda get: (get(tsk) == "STRING") & (get(skey) == F.lit(x))
        # composite: canonical-JSON equality (to_json(variant) sorts keys and
        # canonicalizes decimal forms; _canonical_json mirrors it)
        tjkey = ctx.tj(vkey)
        canon = _canonical_json(x)
        return lambda get: get(tjkey) == F.lit(canon)

    if dialect.has_const and "const" in schema:
        eq = make_scalar_eq(schema["const"])

        def const_check(get, ipath, eq=eq):
            cond = get(vkey).isNotNull() & ~F.coalesce(eq(get), F.lit(False))
            return cond, "const", "value does not equal const"

        checks.append(const_check)

    if "enum" in schema:
        eqs = [make_scalar_eq(x) for x in schema["enum"]]

        def enum_check(get, ipath, eqs=tuple(eqs)):
            ok = None
            for eq in eqs:
                c = eq(get)
                ok = c if ok is None else (ok | c)
            cond = get(vkey).isNotNull() & ~F.coalesce(ok, F.lit(False))
            return cond, "enum", "value not in enumeration"

        checks.append(enum_check)

    # --- numeric bounds -------------------------------------------------------
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
        tskn = ctx.ts(vkey)
        numkey2, deckey2 = ctx.num(vkey), ctx.dec(vkey)
        for kw, bound, op in num_kw:
            dlit = _dec_lit_or_none(bound)
            bd = float(bound)

            def bound_check(get, ipath, kw=kw, bd=bd, dlit=dlit, op=op):
                # fail-condition: strict double compare, decimal tie-break on
                # double-equality (exact beyond 2^53; dec view is NULL for
                # |x| ≥ 1e26 → inclusive ops default to the double verdict)
                dbl = F.when(_is_num(get, tskn), get(numkey2))
                dec = get(deckey2)
                declit = F.lit(dlit).cast("decimal(38,12)") if dlit is not None else None
                if op == "gt":
                    strict = dbl > bd
                    tie = F.coalesce(dec > declit, F.lit(False)) if declit is not None else F.lit(False)
                elif op == "ge":
                    strict = dbl > bd
                    tie = F.coalesce(dec >= declit, F.lit(True)) if declit is not None else F.lit(True)
                elif op == "lt":
                    strict = dbl < bd
                    tie = F.coalesce(dec < declit, F.lit(False)) if declit is not None else F.lit(False)
                else:
                    strict = dbl < bd
                    tie = F.coalesce(dec <= declit, F.lit(True)) if declit is not None else F.lit(True)
                cond = strict | ((dbl == bd) & tie)
                return F.coalesce(cond, F.lit(False)), kw, f"violates {kw} {bound}"

            checks.append(bound_check)

    if "multipleOf" in schema:
        div = schema["multipleOf"]
        tskm = ctx.ts(vkey)
        deckey3, numkey3 = ctx.dec(vkey), ctx.num(vkey)
        dstr = _dec_repr(div)

        # values outside decimal(38,12) (|x| ≥ 1e26) still need the
        # reference's DECIMAL-STRING semantics (BigDecimal(x.to_s) % m,
        # validation.rb:85-93): fmod on doubles is exact binary arithmetic
        # and gives a DIFFERENT answer (fmod(1e300, 3) == 0 but
        # 10^300 mod 3 == 1 — found by scripts/differential_fuzz.py).
        # Such values print as 'D.DDDE±K', so x = D̂·10^(K-f) with D̂ the
        # ≤17 mantissa digits (fits a long): x/m integral ⟺
        # (D̂ mod M)·(10^(K-f+s) mod M) ≡ 0 (mod M) for m = M·10^(-s).
        from decimal import Decimal as _Dec

        _dm = _Dec(str(div)).normalize()
        _sign, _digits, _exp = _dm.as_tuple()
        _M = int("".join(map(str, _digits)))
        _s_m = -_exp
        if _exp > 0:
            _M *= 10 ** _exp
            _s_m = 0
        _use_strmath = _M <= 3_000_000_000  # products must fit a long
        _pow10_mod = [pow(10, i, _M) % _M for i in range(400)] if _use_strmath else None

        def multiple_check(get, ipath, div=div, dstr=dstr,
                           M=_M, s_m=_s_m, use_strmath=_use_strmath,
                           pow10_mod=_pow10_mod):
            num_guard = _is_num(get, tskm)
            dec = F.when(num_guard, get(deckey3))
            dbl = F.when(num_guard, get(numkey3))
            if use_strmath:
                s = dbl.cast("string")
                ip_ = F.regexp_extract(s, r"^-?(\d+)\.(\d+)E([+-]?\d+)$", 1)
                fp_ = F.regexp_extract(s, r"^-?(\d+)\.(\d+)E([+-]?\d+)$", 2)
                ex_ = F.regexp_extract(s, r"^-?(\d+)\.(\d+)E([+-]?\d+)$", 3)
                digits = F.concat(ip_, fp_).cast("long")
                j = ex_.cast("int") - F.length(fp_) + F.lit(s_m)
                table = F.array(*[F.lit(p) for p in pow10_mod])
                rem = F.pmod(F.pmod(digits, F.lit(M)) * F.element_at(table, j + 1), F.lit(M))
                huge_fail = F.when(
                    (j >= 0) & (j <= 398) & (digits.isNotNull()), rem != 0
                ).otherwise(dbl % F.lit(float(div)) != 0.0)
            else:
                huge_fail = dbl % F.lit(float(div)) != 0.0
            # the decimal view ROUNDS sub-1e-12 values (6e-300 → 0.000…) —
            # only trust it when it round-trips the double exactly
            dec_ok = dec.isNotNull() & (dec.cast("double") == dbl)
            cond = F.when(
                dec_ok, dec % F.lit(dstr).cast("decimal(38,12)") != 0
            ).otherwise(huge_fail)
            return F.coalesce(cond, F.lit(False)), "multipleOf", f"not a multiple of {div}"

        checks.append(multiple_check)

    # --- strings ----------------------------------------------------------------
    fmt_assert_kw = None
    if (
        dialect.enabled_vocabs is not None
        and "format-assertion" in dialect.enabled_vocabs
        and isinstance(schema.get("format"), str)
        and schema["format"] in _RLIKE_EXACT_FORMATS
    ):
        fmt_assert_kw = schema["format"]

    if fmt_assert_kw is not None or any(
        k in schema for k in ("maxLength", "minLength", "pattern")
    ):
        tsks = ctx.ts(vkey)
        strkey = ctx.str_(vkey)

        def gated_str(get):
            return F.when(get(tsks) == "STRING", get(strkey))

        if fmt_assert_kw is not None:
            from json_schemer_spark.schema.formats import FORMAT_RLIKE

            frx = FORMAT_RLIKE[fmt_assert_kw]
            checks.append(lambda get, ipath, fmt=fmt_assert_kw, frx=frx: (
                F.coalesce(~gated_str(get).rlike(frx), F.lit(False)),
                "format", f"not a valid {fmt}"))

        if "maxLength" in schema:
            k = _as_count(schema["maxLength"])
            checks.append(lambda get, ipath, k=k: (
                F.coalesce(F.length(gated_str(get)) > k, F.lit(False)), "maxLength", f"length > {k}"))
        if "minLength" in schema:
            k = _as_count(schema["minLength"])
            checks.append(lambda get, ipath, k=k: (
                F.coalesce(F.length(gated_str(get)) < k, F.lit(False)), "minLength", f"length < {k}"))
        if "pattern" in schema:
            p = schema["pattern"]
            jp = _java_pattern(p)
            checks.append(lambda get, ipath, p=p, jp=jp: (
                F.coalesce(~gated_str(get).rlike(jp), F.lit(False)),
                "pattern", f"does not match pattern {p!r}"))

    # --- arrays -----------------------------------------------------------------
    if "maxItems" in schema:
        k = _as_count(schema["maxItems"])
        checks.append(lambda get, ipath, k=k: (
            F.coalesce(F.size(get(arrkey)) > k, F.lit(False)), "maxItems", f"more than {k} items"))
    if "minItems" in schema:
        k = _as_count(schema["minItems"])
        checks.append(lambda get, ipath, k=k: (
            F.coalesce(F.size(get(arrkey)) < k, F.lit(False)), "minItems", f"fewer than {k} items"))

    if schema.get("uniqueItems") is True:
        def unique_check(get, ipath):
            # canonical element key: numbers through the decimal view
            # (equates 1, 1.0, 1e0 forms), everything else via to_json
            # (sorted keys). Documented edges: |x| < 1e-12 collapse to 0.
            def canon(x):
                return F.coalesce(
                    F.when(
                        F.to_json(x).rlike("^-?[0-9]"),
                        F.try_variant_get(x, "$", "decimal(38,12)").cast("string"),
                    ),
                    F.to_json(x),
                )
            arr = get(arrkey)
            cond = F.size(F.array_distinct(F.transform(arr, canon))) != F.size(arr)
            return F.coalesce(cond, F.lit(False)), "uniqueItems", "array items are not unique"

        checks.append(unique_check)

    # positional + rest item subschemas (2020-12 prefixItems/items split vs
    # ≤2019-09 array-form items/additionalItems — SURVEY.md §2.3)
    prefix_subs: list = []
    rest_sub = rest_spath = rest_kw = None
    if dialect.has_prefix_items:
        if isinstance(schema.get("prefixItems"), list):
            prefix_subs = [(f"{spath}/prefixItems/{i}", s) for i, s in enumerate(schema["prefixItems"])]
        if schema.get("items") is not None:
            rest_sub, rest_spath, rest_kw = schema["items"], f"{spath}/items", "items"
    elif dialect.array_form_items:
        it = schema.get("items")
        if isinstance(it, list):
            prefix_subs = [(f"{spath}/items/{i}", s) for i, s in enumerate(it)]
            if schema.get("additionalItems") is not None:
                rest_sub, rest_spath, rest_kw = (
                    schema["additionalItems"], f"{spath}/additionalItems", "additionalItems")
        elif it is not None:
            rest_sub, rest_spath, rest_kw = it, f"{spath}/items", "items"

    for i, (sp_i, sub) in enumerate(prefix_subs):
        childk = ctx.item(vkey, i)
        child = _lower(sub, dialect, sp_i, ctx, childk)
        subs.append(lambda get, ipath, i=i, child=child: child(get, f"{ipath}/{i}"))

    if rest_sub is not None:
        plen = len(prefix_subs)
        rpred = _lower_element(rest_sub, dialect)
        rkw = "schema" if rest_sub is False else rest_kw

        def rest_check(get, ipath, plen=plen, rpred=rpred, rkw=rkw, sp=rest_spath):
            arr = get(arrkey)
            rest = F.slice(arr, F.lit(plen + 1), F.greatest(F.size(arr) - F.lit(plen), F.lit(0)))
            ok = F.coalesce(F.forall(rest, rpred), F.lit(True))
            fails = [_Multi(F.transform(rest, lambda x, i: F.when(
                ~F.coalesce(rpred(x), F.lit(True)),
                F.struct(
                    F.lit(rkw).alias("keyword"),
                    F.concat(F.lit(ipath + "/"), (i + F.lit(plen)).cast("string")).alias("instance_pointer"),
                    F.lit(sp).alias("schema_pointer"),
                    F.lit("item does not match schema").alias("message"),
                ),
            )))]
            return ok, fails

        subs.append(rest_check)

    if dialect.has_contains and "contains" in schema:
        cpred = _lower_element(schema["contains"], dialect)
        min_c = _as_count(schema.get("minContains", 1)) if dialect.has_min_max_contains else 1
        if not isinstance(min_c, int) or isinstance(min_c, bool):
            min_c = 1
        max_c = (_as_count(schema["maxContains"]) if "maxContains" in schema else None) if dialect.has_min_max_contains else None
        has_min_kw = dialect.has_min_max_contains and "minContains" in schema

        def contains_sub(get, ipath, cpred=cpred, min_c=min_c, max_c=max_c, has_min_kw=has_min_kw):
            nmatch = F.size(F.filter(get(arrkey), cpred))
            msg_min = F.concat(nmatch.cast("string"), F.lit(f" items match contains, need >= {min_c}"))
            fail_min = F.coalesce(nmatch < F.lit(min_c), F.lit(False))
            fails = [_viol(fail_min, "contains", ipath, spath, msg_min)]
            valid = ~fail_min
            if has_min_kw:
                fails.append(_viol(fail_min, "minContains", ipath, spath, msg_min))
            if max_c is not None and isinstance(max_c, int) and not isinstance(max_c, bool):
                fail_max = F.coalesce(nmatch > F.lit(max_c), F.lit(False))
                msg_max = F.concat(nmatch.cast("string"), F.lit(f" items match contains, need <= {max_c}"))
                fails.append(_viol(fail_max, "maxContains", ipath, spath, msg_max))
                valid = valid & ~fail_max
            return valid, fails

        subs.append(contains_sub)

    # --- objects --------------------------------------------------------------------
    if "maxProperties" in schema:
        k = _as_count(schema["maxProperties"])
        checks.append(lambda get, ipath, k=k: (
            F.coalesce(F.size(get(objkey)) > k, F.lit(False)),
            "maxProperties", f"more than {k} properties"))
    if "minProperties" in schema:
        k = _as_count(schema["minProperties"])
        checks.append(lambda get, ipath, k=k: (
            F.coalesce(F.size(get(objkey)) < k, F.lit(False)),
            "minProperties", f"fewer than {k} properties"))

    if isinstance(schema.get("required"), list) and schema["required"]:
        req = list(schema["required"])
        req_fields = [ctx.field(vkey, k) for k in req]

        def required_check(get, ipath, req=tuple(req), req_fields=tuple(req_fields)):
            missing = None
            for rf in req_fields:
                c = get(rf).isNull()
                missing = c if missing is None else (missing | c)
            cond = get(objkey).isNotNull() & F.coalesce(missing, F.lit(False))
            return F.coalesce(cond, F.lit(False)), "required", f"missing one of required {list(req)}"

        checks.append(required_check)

    if isinstance(schema.get("properties"), dict):
        for key, sub in schema["properties"].items():
            child_vkey = ctx.field(vkey, key)
            child = _lower(sub, dialect, f"{spath}/properties/{_esc(key)}", ctx, child_vkey)

            def prop_sub(get, ipath, key=key, child=child):
                return child(get, f"{ipath}/{_esc(key)}")

            subs.append(prop_sub)

    if isinstance(schema.get("patternProperties"), dict):
        for pattern, sub in schema["patternProperties"].items():
            jp = _java_pattern(pattern)
            ppred = _lower_element(sub, dialect)
            sp = f"{spath}/patternProperties/{_esc(pattern)}"
            pkw = "schema" if sub is False else "patternProperties"

            def pp_sub(get, ipath, jp=jp, ppred=ppred, sp=sp, pkw=pkw):
                matched = F.map_filter(get(objkey), lambda k, v: k.rlike(jp))
                ok = F.coalesce(F.forall(F.map_values(matched), ppred), F.lit(True))
                bad = F.map_keys(F.map_filter(matched, lambda k, v: ~F.coalesce(ppred(v), F.lit(True))))
                fails = [_Multi(F.transform(bad, lambda k: F.struct(
                    F.lit(pkw).alias("keyword"),
                    _ptr_col(ipath, k).alias("instance_pointer"),
                    F.lit(sp).alias("schema_pointer"),
                    F.lit("false schema disallows everything" if pkw == "schema"
                          else "value does not match patternProperties schema").alias("message"),
                )))]
                return ok, fails

            subs.append(pp_sub)

    _uneval_gate_memo: dict = {}

    def _gate_cond(gates: tuple):
        """Lower a contribution's gate tuple (SURVEY.md §2.6) to a closure
        ``(get, ipath) -> Column`` — the conjunction of branch-validity /
        property-presence columns, all at this node's variant slot."""
        fns = []
        for kind, arg in gates:
            if kind == "present":
                fld = ctx.field(vkey, arg)
                fns.append(lambda get, ipath, fld=fld:
                           F.coalesce(get(fld).isNotNull(), F.lit(False)))
            else:
                mk = id(arg)
                if mk not in _uneval_gate_memo:
                    _uneval_gate_memo[mk] = _lower(
                        arg, dialect, f"{spath}/(uneval-gate)", ctx, vkey)
                em = _uneval_gate_memo[mk]
                neg = kind == "notvalid"

                def gfn(get, ipath, em=em, neg=neg):
                    v = F.coalesce(em(get, ipath)[0], F.lit(False))
                    return ~v if neg else v

                fns.append(gfn)

        def cond(get, ipath, fns=tuple(fns)):
            col = None
            for f in fns:
                g = f(get, ipath)
                col = g if col is None else (col & g)
            return col if col is not None else F.lit(True)

        return cond

    def _complement_sub(kw_display: str, sub, sp: str, names: list, pats: list,
                        dyn_contribs: tuple = ()):
        """additionalProperties / unevaluatedProperties: apply ``sub`` to
        values whose key is NOT covered. Static coverage (``names``/``pats``)
        is the compile-time complement; ``dyn_contribs`` are data-dependent
        contributions ``(cond_fn, names, java_pats, all_eval)`` whose
        coverage only counts on rows where the gating branch is valid
        (SURVEY.md §2.6 general path)."""
        apred = _lower_element(sub, dialect)
        is_false = sub is False
        kwname = "schema" if is_false else kw_display
        msg = ("false schema disallows everything" if is_false
               else f"value does not match {kw_display} schema")

        def comp_sub(get, ipath, names=tuple(names), pats=tuple(pats)):
            dyn = [(fn(get, ipath), dn, dp, ae) for fn, dn, dp, ae in dyn_contribs]
            any_all = None
            for gcol, _, _, ae in dyn:
                if ae:
                    any_all = gcol if any_all is None else (any_all | gcol)

            def covered(k):
                c = F.lit(False)
                if names:
                    c = c | k.isin(*names)
                for p in pats:
                    c = c | k.rlike(p)
                for gcol, dn, dp, _ in dyn:
                    bc = None
                    if dn:
                        bc = k.isin(*sorted(dn))
                    for p in dp:
                        pc = k.rlike(p)
                        bc = pc if bc is None else (bc | pc)
                    if bc is not None:
                        c = c | (gcol & bc)
                return c

            extra = F.map_filter(get(objkey), lambda k, v: ~covered(k))
            if is_false:
                ok = F.coalesce(F.size(extra) == 0, F.lit(True))
                bad = F.map_keys(extra)
            else:
                ok = F.coalesce(F.forall(F.map_values(extra), apred), F.lit(True))
                bad = F.map_keys(F.map_filter(extra, lambda k, v: ~F.coalesce(apred(v), F.lit(True))))
            fails = [_Multi(F.transform(bad, lambda k: F.struct(
                F.lit(kwname).alias("keyword"),
                _ptr_col(ipath, k).alias("instance_pointer"),
                F.lit(sp).alias("schema_pointer"),
                F.lit(msg).alias("message"),
            )))]
            if any_all is not None:
                ok = F.when(any_all, F.lit(True)).otherwise(ok)
                fails = _gate(~F.coalesce(any_all, F.lit(False)), fails)
            return ok, fails

        return comp_sub

    if "additionalProperties" in schema:
        names = list(schema.get("properties") or {})
        pats = [_java_pattern(p) for p in (schema.get("patternProperties") or {})]
        subs.append(_complement_sub(
            "additionalProperties", schema["additionalProperties"],
            f"{spath}/additionalProperties", names, pats))

    if dialect.has_unevaluated and "unevaluatedProperties" in schema:
        unames: set = set()
        upats: list = []
        all_eval = False
        pdyn = []
        for g, nms, pats, ae in _prop_contribs(schema, dialect, top=True):
            if not g:
                unames |= nms
                upats += list(pats)
                all_eval = all_eval or ae
            else:
                pdyn.append((_gate_cond(g), frozenset(nms),
                             tuple(_java_pattern(p) for p in pats), ae))
        if not all_eval:
            subs.append(_complement_sub(
                "unevaluatedProperties", schema["unevaluatedProperties"],
                f"{spath}/unevaluatedProperties",
                sorted(unames), [_java_pattern(p) for p in upats],
                dyn_contribs=tuple(pdyn)))

    if dialect.has_unevaluated and "unevaluatedItems" in schema:
        uplen, allit = 0, False
        cpreds: list = []
        idyn_raw = []
        for g, plen, ai, cps in _item_contribs(schema, dialect, top=True):
            if not g:
                uplen = max(uplen, plen)
                allit = allit or ai
                cpreds += list(cps)
            else:
                idyn_raw.append((g, plen, ai, cps))
        if not allit:
            upred = _lower_element(schema["unevaluatedItems"], dialect)
            cfns = [_lower_element(c, dialect) for c in cpreds]
            # gated contributions: relative prefix beyond the static slice,
            # row-level all-items gates, gated contains predicates
            idyn = []
            for g, plen, ai, cps in idyn_raw:
                rplen = max(plen - uplen, 0)
                if not rplen and not ai and not cps:
                    continue
                idyn.append((_gate_cond(g), rplen, ai,
                             tuple(_lower_element(c, dialect) for c in cps)))
            ukw = "schema" if schema["unevaluatedItems"] is False else "unevaluatedItems"
            usp = f"{spath}/unevaluatedItems"

            def ui_sub(get, ipath, uplen=uplen, upred=upred, cfns=tuple(cfns),
                       idyn=tuple(idyn), ukw=ukw, usp=usp):
                arr = get(arrkey)
                rest = F.slice(arr, F.lit(uplen + 1), F.greatest(F.size(arr) - F.lit(uplen), F.lit(0)))
                dyn = [(fn(get, ipath), rplen, ai, cfs) for fn, rplen, ai, cfs in idyn]
                any_allit = None
                for gcol, _, ai, _ in dyn:
                    if ai:
                        any_allit = gcol if any_allit is None else (any_allit | gcol)

                def elem_ok(x, i):
                    c = F.coalesce(upred(x), F.lit(True))
                    for cf in cfns:  # items matched by `contains` are evaluated
                        c = c | F.coalesce(cf(x), F.lit(False))
                    for gcol, rplen, ai, cfs in dyn:
                        cov = None
                        if rplen:  # i is 0-based within the static-sliced rest
                            cov = i < F.lit(rplen)
                        for cf in cfs:
                            cc = F.coalesce(cf(x), F.lit(False))
                            cov = cc if cov is None else (cov | cc)
                        if cov is not None:
                            c = c | (gcol & cov)
                    return c

                if dyn:
                    ok_inner = F.size(F.filter(rest, lambda x, i: ~elem_ok(x, i))) == 0
                else:  # static-only: keep the cheaper arity-1 forall plan
                    ok_inner = F.forall(rest, lambda x: elem_ok(x, None))
                ok = F.coalesce(ok_inner, F.lit(True))
                fails = [_Multi(F.transform(rest, lambda x, i: F.when(
                    ~elem_ok(x, i),
                    F.struct(
                        F.lit(ukw).alias("keyword"),
                        F.concat(F.lit(ipath + "/"), (i + F.lit(uplen)).cast("string")).alias("instance_pointer"),
                        F.lit(usp).alias("schema_pointer"),
                        F.lit("unevaluated item does not match schema").alias("message"),
                    ),
                )))]
                if any_allit is not None:
                    ok = F.when(any_allit, F.lit(True)).otherwise(ok)
                    fails = _gate(~F.coalesce(any_allit, F.lit(False)), fails)
                return ok, fails

            subs.append(ui_sub)

    if dialect.has_property_names and "propertyNames" in schema:
        pnsub = schema["propertyNames"]
        spred = _string_pred(pnsub, dialect)
        pnkw = "schema" if pnsub is False else "propertyNames"
        pnsp = f"{spath}/propertyNames"

        def pn_sub(get, ipath, spred=spred, pnkw=pnkw, pnsp=pnsp):
            keys = F.map_keys(get(objkey))
            ok = F.coalesce(F.forall(keys, spred), F.lit(True))
            bad = F.filter(keys, lambda k: ~F.coalesce(spred(k), F.lit(True)))
            # errors locate at the OBJECT (a key is not an addressable
            # instance location — reference convention)
            fails = [_Multi(F.transform(bad, lambda k: F.struct(
                F.lit(pnkw).alias("keyword"),
                F.lit(ipath).alias("instance_pointer"),
                F.lit(pnsp).alias("schema_pointer"),
                F.concat(F.lit("property name "), k, F.lit(" invalid")).alias("message"),
            )))]
            return ok, fails

        subs.append(pn_sub)

    # dependentRequired / legacy array-form dependencies
    dep_reqs = []
    if dialect.has_dependent_keywords and isinstance(schema.get("dependentRequired"), dict):
        dep_reqs += [("dependentRequired", k, v, True) for k, v in schema["dependentRequired"].items()]
    dep_schemas = []
    if dialect.has_legacy_dependencies and isinstance(schema.get("dependencies"), dict):
        for k, dep in schema["dependencies"].items():
            if isinstance(dep, list):
                # unlike dependentRequired, legacy dependencies errors locate
                # at the OBJECT (reference convention)
                dep_reqs.append(("dependencies", k, dep, False))
            else:
                dep_schemas.append(("dependencies", k, dep))
    if dialect.has_dependent_keywords and isinstance(schema.get("dependentSchemas"), dict):
        dep_schemas += [("dependentSchemas", k, v) for k, v in schema["dependentSchemas"].items()]

    for dkw, key, needs, at_key in dep_reqs:
        trig = ctx.field(vkey, key)
        need_fields = [ctx.field(vkey, n) for n in needs]

        def dep_sub(get, ipath, dkw=dkw, key=key, needs=tuple(needs),
                    trig=trig, need_fields=tuple(need_fields), at_key=at_key):
            missing = F.lit(False)
            for nf in need_fields:
                missing = missing | get(nf).isNull()
            cond = F.coalesce(get(trig).isNotNull() & missing, F.lit(False))
            at = f"{ipath}/{_esc(key)}" if at_key else ipath
            return ~cond, [_viol(cond, dkw, at, spath,
                                 f"{key!r} present but missing one of {list(needs)}")]

        subs.append(dep_sub)

    for dkw, key, dsub in dep_schemas:
        trig = ctx.field(vkey, key)
        child = _lower(dsub, dialect, f"{spath}/{dkw}/{_esc(key)}", ctx, vkey)

        def ds_sub(get, ipath, trig=trig, child=child):
            present = get(trig).isNotNull()
            cv, cf = child(get, ipath)
            valid = F.when(F.coalesce(present, F.lit(False)), F.coalesce(cv, F.lit(True))).otherwise(F.lit(True))
            return valid, _gate(present, cf)

        subs.append(ds_sub)

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
            fails = []
            for _, bf in results:
                fails.extend(_gate(~ok, bf))
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
            fails = []
            for _, bf in results:
                fails.extend(_gate(total == 0, bf))
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
                fails.extend(_gate(cond_if, tf))
            if else_emit is not None:
                ev, ef = else_emit(get, ipath)
                valid = F.when(~cond_if, F.coalesce(ev, F.lit(True))).otherwise(valid)
                fails.extend(_gate(~cond_if, ef))
            return valid, fails

        subs.append(if_then_else)

    def emit(get, ipath):
        fail_structs: list = []
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


def _lower_element(schema: Any, dialect: Dialect):
    """Array-element / map-value predicate: variant → boolean Column (used
    inside ``forall``/``filter``/``transform`` lambdas, where struct
    materialization is impossible — element-level work stays inline and is
    naturally small)."""
    import pyspark.sql.functions as F

    if schema is True or (isinstance(schema, dict) and not schema):
        return lambda x: F.lit(True)
    if schema is False:
        return lambda x: F.lit(False)

    def pred(x):
        ctx = _Ctx(inline=True)
        vkey = ctx.add_variant(x)
        emit = _lower(schema, dialect, "", ctx, vkey)
        exprs = ctx.exprs

        def get(key):  # inline resolution: no struct inside lambdas
            return exprs[key]

        valid, _ = emit(get, "")
        return F.coalesce(valid, F.lit(True))

    return pred


def _type_pred(get, ts, t: str, dialect: Dialect, numkey, deckey, is_numeric):
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
        # integral check through the decimal view first (exact beyond 2^53);
        # double fallback uses `% 1.0` — F.floor(double) returns LONG and
        # CLAMPS at 2^63, so huge doubles (1e300) would wrongly fail
        # (found by scripts/differential_fuzz.py)
        num, dec = get(numkey), get(deckey)
        integral = F.when(dec.isNotNull(), dec == F.floor(dec)).otherwise(
            num % F.lit(1.0) == 0.0
        )
        return is_numeric(get) & F.coalesce(integral, F.lit(True))
    raise Unsupported(f"unknown type {t!r}")


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def build_route_probe(schema: Any, dialect: Dialect):
    """Per-row tier-routing probe for a prepared tree containing
    :data:`ROUTE_MARKER` sentinels (bounded cyclic-$ref unroll, round 5).

    Returns ``None`` when the tree has no markers; otherwise a function
    mapping the JSON-string content Column to a boolean Column that is TRUE
    iff the row's instance has data at (an over-approximation of) any
    marker's instance position — exactly the rows the unrolled pure-Column
    plan cannot decide, because a marker's verdict only matters when its
    instance location exists. The over-approximation ignores branch gating
    (anyOf/oneOf/not/if all recurse unconditionally) and pattern matching
    (patternProperties probes every property value), which can only route
    MORE rows to the interpreter — never fewer — so the split stays sound.

    The probe is a pure Column expression (nested ``exists`` HOFs over
    variant casts along marker paths only), so it rides the same scan as
    the fast tier.
    """
    import pyspark.sql.functions as F

    def obj(v):
        return F.try_variant_get(v, "$", "map<string,variant>")

    def arr(v):
        return F.try_variant_get(v, "$", "array<variant>")

    def build(node):
        """fn(variant Column) -> boolean Column, or None if the subtree has
        no markers (schema positions only — markers are inserted by
        inline_refs at schema positions exclusively, so identity search
        cannot hit data members)."""
        if node is ROUTE_MARKER:
            return lambda v: v.isNotNull()
        if not isinstance(node, dict) or not has_route_markers(node):
            return None
        fns = []

        def same_node(sub):
            p = build(sub)
            if p is not None:
                fns.append(p)

        for kw in ("allOf", "anyOf", "oneOf"):
            val = node.get(kw)
            if isinstance(val, list):
                for s in val:
                    same_node(s)
        for kw in ("not", "if", "then", "else"):
            same_node(node.get(kw))
        for kw in ("dependentSchemas", "dependencies"):
            val = node.get(kw)
            if isinstance(val, dict):
                for s in val.values():
                    if not isinstance(s, list):
                        same_node(s)

        props = node.get("properties")
        if isinstance(props, dict):
            for k, s in props.items():
                p = build(s)
                if p is not None:
                    fns.append(
                        lambda v, k=k, p=p: p(F.element_at(obj(v), k))
                    )
        for kw in ("patternProperties",):
            val = node.get(kw)
            if isinstance(val, dict):
                for s in val.values():
                    p = build(s)
                    if p is not None:
                        fns.append(
                            # NB: wrap p in a unary lambda — PySpark calls
                            # multi-arg callables with (x, i) (HOF arity trap)
                            lambda v, p=p: F.exists(
                                F.map_values(obj(v)), lambda x: p(x)
                            )
                        )
        for kw in ("additionalProperties", "unevaluatedProperties"):
            p = build(node.get(kw))
            if p is not None:
                fns.append(
                    lambda v, p=p: F.exists(F.map_values(obj(v)), lambda x: p(x))
                )
        if build(node.get("propertyNames")) is not None:
            fns.append(lambda v: F.size(F.map_keys(obj(v))) > 0)

        for kw in ("additionalItems", "unevaluatedItems", "contains"):
            p = build(node.get(kw))
            if p is not None:
                fns.append(lambda v, p=p: F.exists(arr(v), lambda x: p(x)))
        items = node.get("items")
        if isinstance(items, list):
            for i, s in enumerate(items):
                p = build(s)
                if p is not None:
                    fns.append(lambda v, i=i, p=p: p(F.get(arr(v), i)))
        else:
            p = build(items)
            if p is not None:
                fns.append(lambda v, p=p: F.exists(arr(v), lambda x: p(x)))
        prefix = node.get("prefixItems")
        if isinstance(prefix, list):
            for i, s in enumerate(prefix):
                p = build(s)
                if p is not None:
                    fns.append(lambda v, i=i, p=p: p(F.get(arr(v), i)))

        if not fns:
            # markers only under passive positions ($defs/annotations):
            # never evaluated, never routed
            return None

        def combined(v, fns=tuple(fns)):
            out = None
            for f in fns:
                c = f(v)
                out = c if out is None else (out | c)
            return out

        return combined

    root_fn = build(schema)
    if root_fn is None:
        return None

    def probe(content_col):
        v = F.when(
            content_col.isNull(), F.parse_json(F.lit("null"))
        ).otherwise(F.try_parse_json(content_col))
        return F.coalesce(root_fn(v), F.lit(False))

    return probe


def validate_json_column_lowered(df, content_col: str, schema: Any, dialect: Dialect,
                                 registry: Any = None, prepared: bool = False,
                                 allow_markers: bool = False):
    """Pure-Column validation: df + ``valid`` + ``violations`` columns.

    Chained projections over one scan (parse → typed views by dependency
    depth → predicates); no shuffle, no Python workers; scales linearly
    with partitions. Every extraction slot is its OWN named column so that
    (a) the parse/cast work is computed once per row regardless of how many
    predicates consume it (CollapseProject keeps multi-referenced non-cheap
    aliases materialized), and (b) a fat upstream ``content`` expression is
    never multiplied into the validator (measured: struct-field layouts get
    re-inlined by SimplifyExtractValueOps → 5-10× per-row re-derivation and
    OOM on generated-content inputs).
    """
    import pyspark.sql.functions as F

    if not prepared:  # callers holding a prepare() result skip the re-walk
        schema = prepare(schema, dialect, registry=registry)
    if not allow_markers and has_route_markers(schema):
        # a bounded-unroll tree treats beyond-depth sites as `true`; running
        # it WITHOUT per-row routing would silently accept deep rows — the
        # caller must split on build_route_probe() first and say so
        raise Unsupported(
            "prepared tree contains route markers; use the hybrid path "
            "(CompiledSchema.validate_json_column) or pass allow_markers=True "
            "after routing deep rows to the interpreter"
        )

    content = F.col(content_col)
    # NULL content is JSON null (parity with the interpreter tier);
    # unparseable content gets a $parse violation.
    root = F.when(content.isNull(), F.parse_json(F.lit("null"))).otherwise(
        F.try_parse_json(content)
    )

    ctx = _Ctx()
    root_key = ctx.add_variant(root)
    emit = _lower(schema, dialect, "", ctx, root_key)

    staged = df
    by_depth: dict[int, list[str]] = {}
    for k in ctx.exprs:
        by_depth.setdefault(ctx.depth[k], []).append(k)
    for d in sorted(by_depth):
        staged = staged.select(
            "*", *[ctx.exprs[k].alias(_COL_PREFIX + k) for k in by_depth[d]]
        )

    def get(key):
        return F.col(_COL_PREFIX + key)

    valid, fails = emit(get, "")
    parse_fail = content.isNotNull() & get(root_key).isNull()
    fails = [_viol(parse_fail, "$parse", "", "", "content is not valid JSON")] + fails

    parts = []
    for f in fails:
        if isinstance(f, _Multi):
            parts.append(F.coalesce(f.col, F.array(F.lit(None).cast(_VIOL_DDL))))
        else:
            parts.append(F.array(f))
    built = F.filter(
        parts[0] if len(parts) == 1 else F.concat(*parts),
        lambda x: x.isNotNull(),
    )
    overall = F.coalesce(valid, F.lit(True)) & ~parse_fail
    # valid ⟺ zero violations (classic-output invariant, asserted by the
    # fixture-parity suite), so the array concat + struct construction only
    # needs to run on failing rows: CASE WHEN evaluates branches lazily in
    # codegen, and on mostly-valid corpora this removes most of the
    # violations-materialization cost (measured ~2.5x on the tier fixture).
    violations = F.when(overall, F.array().cast(f"array<{_VIOL_DDL}>")).otherwise(built)

    # Pushdown/collapse barrier: a non-deterministic no-op guard keeps
    # Catalyst from substituting `valid`/`violations` through the extraction
    # projections — predicate pushdown on `.filter("valid")` otherwise
    # inlines parse_json per alias reference into the Filter AND the scan's
    # DataFilters (measured 15× per-row re-parsing, a 20× slowdown). The
    # guard is always true — spark_partition_id() is non-negative by
    # contract — but the function is flagged non-deterministic, which is
    # what blocks the substitution (NOTE: F.rand(seed) >= -1 does NOT work;
    # the optimizer constant-folds it away). Downstream operators see plain
    # materialized attributes, so grouping/joining on the outputs is
    # unaffected. Pre-filters on source columns belong BEFORE validation —
    # use validate_json_column(prefilter=...) to land them in the scan.
    nd_guard = F.spark_partition_id() >= F.lit(0)
    overall = F.when(nd_guard, overall)
    violations = F.when(nd_guard, violations)

    return staged.select(
        *[F.col(c) for c in df.columns],
        overall.alias("valid"),
        violations.alias("violations"),
    )
