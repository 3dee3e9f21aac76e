"""JSON Schema INFERENCE — the inverse of validation.

The reference engine (json_schemer.rb) only consumes schemas; a
data-engine that validates 10^12 JSON documents also needs to *produce*
the schema a corpus implies (bootstrap validation for an un-documented
feed, drift-detect a feed against last week's inferred shape, generate
the draft a human then tightens). This module does it Spark-first:

- ``json_pointer_profile`` walks every JSON value in the corpus to a
  bounded depth ENTIRELY with JVM variant machinery: ``try_parse_json``
  once per document, then per level ONE ``explode`` whose input merges
  object children (``try_variant_get($, 'map<string,variant>')`` →
  ``map_entries`` → (token, child) structs) and array elements
  (``try_variant_get($, 'array<variant>')`` → ('*', elem) structs)
  via ``coalesce`` — the try_ forms return NULL on kind mismatch, so
  scalars emit nothing and there is no per-row branching and no Python
  anywhere. Array positions collapse to a single ``/*`` pointer token
  because JSON Schema ``items`` applies uniformly. Each level frontier
  is ``localCheckpoint``-ed so it is computed exactly ONCE (it feeds
  both the final union and the next level's explode — without the
  checkpoint the plan re-derives level k from the raw scan for every
  deeper level, O(depth²) passes; measured 300 s → 40 s on the test
  suite). The union of all levels feeds ONE partial-aggregated shuffle
  keyed by (pointer, jtype) — per-document work is linear in the
  document's value count, the materialized frontiers total one copy of
  the corpus's value tree (MEMORY_AND_DISK, spills), and the exchange
  carries only the aggregated profile, never the values.

- ``infer_schema`` assembles a draft 2020-12 schema document from the
  collected profile: per-pointer type sets, ``required`` from exact
  presence counts (child occurrences == parent object occurrences),
  optional numeric/string bounds. The collect is bounded by the number
  of DISTINCT pointers (guarded by ``max_pointers``), not by corpus
  rows, so it stays driver-safe at any data scale short of adversarial
  key explosion — which the guard turns into a loud error.

The round-trip invariant — ``compile_schema(infer_schema(df)).
validate_json_column(df)`` marks every source document valid — is
pinned in tests; it exercises inference and the validator against each
other.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_OBJ_CAST = "map<string, variant>"
_ARR_CAST = "array<variant>"


def _escape_pointer_token(key: Column) -> Column:
    """RFC 6901 token escaping (``~`` -> ``~0`` first, then ``/`` ->
    ``~1``) plus one private extension: a literal object key ``*`` ->
    ``~2``, so it can never collide with the profile's array-element
    sentinel ``*`` (without this, ``{"m":{"*":5}}`` and ``{"m":[5]}``
    would both profile as pointer ``/m/*`` and infer_schema would merge
    an object key into ``items``). Round-trip safe: a literal ``~2``
    key escapes to ``~02``, which unescapes (``~2`` first, then ``~1``,
    then ``~0``) back to ``~2``."""
    return F.replace(
        F.replace(
            F.replace(key, F.lit("~"), F.lit("~0")),
            F.lit("/"), F.lit("~1"),
        ),
        F.lit("*"), F.lit("~2"),
    )


def _jtype(v: Column) -> Column:
    """Map a variant value to its JSON Schema type name via
    ``schema_of_variant`` (a per-row JVM expression). DECIMALs with
    scale 0 and the integral SQL types are JSON ``integer``; every
    other numeric is ``number``."""
    sv = F.schema_of_variant(v)
    return (
        F.when(F.startswith(sv, F.lit("OBJECT")), F.lit("object"))
        .when(F.startswith(sv, F.lit("ARRAY")), F.lit("array"))
        .when(sv == "VOID", F.lit("null"))
        .when(sv == "BOOLEAN", F.lit("boolean"))
        .when(sv == "STRING", F.lit("string"))
        .when(
            sv.isin("TINYINT", "SMALLINT", "INT", "BIGINT")
            | sv.rlike(r"^DECIMAL\(\d+,0\)$"),
            F.lit("integer"),
        )
        .otherwise(F.lit("number"))
    )


def json_pointer_profile(
    df: DataFrame,
    json_col: str,
    *,
    max_depth: int = 6,
) -> DataFrame:
    """Per-(JSON-pointer, type) profile of a JSON string column.

    Returns ``(pointer, jtype, n, min_num, max_num, min_len, max_len)``
    — one row per pointer/type pair seen anywhere in the corpus down to
    ``max_depth`` levels (deeper values are still *counted* as their
    container's children but not descended into). ``pointer`` is an
    RFC 6901 pointer with array positions collapsed to ``*``; ``n`` is
    the number of value instances (not documents — one document
    contributes once per array element). ``min_num``/``max_num`` cover
    integer+number values; ``min_len``/``max_len`` are codepoint
    lengths of string values. Documents that fail to parse are skipped
    (``try_parse_json``), matching the validator's ``$parse`` row
    semantics — profile what IS JSON.
    """
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    root = df.select(
        F.lit("").alias("ptr"),
        F.try_parse_json(F.col(json_col)).alias("v"),
    ).where(F.col("v").isNotNull())

    if max_depth > 0:
        root = root.localCheckpoint(eager=False)
    levels = [root]
    cur = root
    m = F.try_variant_get("v", "$", _OBJ_CAST)
    a = F.try_variant_get("v", "$", _ARR_CAST)
    kids = F.coalesce(
        F.when(
            m.isNotNull(),
            F.transform(
                F.map_entries(m),
                lambda e: F.struct(
                    _escape_pointer_token(e["key"]).alias("t"),
                    e["value"].alias("cv"),
                ),
            ),
        ),
        F.when(
            a.isNotNull(),
            F.transform(
                a,
                lambda x: F.struct(F.lit("*").alias("t"), x.alias("cv")),
            ),
        ),
    )
    for d in range(max_depth):
        cur = (
            cur.select("ptr", F.explode(kids).alias("kid"))
            .select(
                F.concat("ptr", F.lit("/"), F.col("kid.t")).alias("ptr"),
                F.col("kid.cv").alias("v"),
            )
        )
        if d + 1 < max_depth:
            cur = cur.localCheckpoint(eager=False)
        levels.append(cur)

    nodes = levels[0]
    for lv in levels[1:]:
        nodes = nodes.unionByName(lv)

    jtype = _jtype(F.col("v"))
    num = F.try_variant_get("v", "$", "double")
    # try_variant_get stringifies scalars, so gate on the classified type
    s = F.when(
        jtype == "string", F.try_variant_get("v", "$", "string")
    )
    return (
        nodes.select(
            "ptr",
            jtype.alias("jtype"),
            F.when(jtype.isin("integer", "number"), num).alias("__num"),
            F.length(s).alias("__len"),
        )
        .groupBy(F.col("ptr").alias("pointer"), "jtype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__num").alias("min_num"),
            F.max("__num").alias("max_num"),
            F.min("__len").alias("min_len"),
            F.max("__len").alias("max_len"),
        )
    )


def _parent_of(pointer: str) -> str:
    return pointer.rsplit("/", 1)[0]


def _unescape_token(token: str) -> str:
    return token.replace("~2", "*").replace("~1", "/").replace("~0", "~")


def infer_schema(
    df: DataFrame,
    json_col: str,
    *,
    max_depth: int = 6,
    include_bounds: bool = False,
    max_pointers: int = 100_000,
) -> dict[str, Any]:
    """Infer a draft 2020-12 JSON Schema from a corpus of JSON strings.

    Aggregates ``json_pointer_profile`` driver-side (bounded by the
    DISTINCT pointer count — ``max_pointers`` fails loudly on
    key-explosion corpora rather than OOMing the driver) and assembles:

    - ``type``: the set of types observed at each pointer (single
      string when unique, sorted list otherwise);
    - ``properties``/``required`` for objects — a key is required iff
      its occurrence count equals its parent's object count (exact, no
      sampling);
    - ``items`` for arrays (from the collapsed ``/*`` pointer; arrays
      observed only empty get no ``items``);
    - with ``include_bounds=True``: ``minimum``/``maximum`` over
      numeric values and ``minLength``/``maxLength`` over strings —
      tight to the observed corpus by construction.

    The result always validates the corpus it was inferred from
    (round-trip invariant, pinned in tests).
    """
    prof = json_pointer_profile(df, json_col, max_depth=max_depth)
    rows = prof.limit(max_pointers + 1).collect()
    if len(rows) > max_pointers:
        raise ValueError(
            f"corpus implies more than max_pointers={max_pointers} distinct "
            "(pointer, type) pairs; raise max_pointers explicitly if the "
            "driver can hold the profile"
        )
    if not rows:
        return {"$schema": "https://json-schema.org/draft/2020-12/schema"}

    by_ptr: dict[str, list] = {}
    for r in rows:
        by_ptr.setdefault(r["pointer"], []).append(r)

    def node_count(ptr: str, jtype: str) -> int:
        return sum(r["n"] for r in by_ptr.get(ptr, []) if r["jtype"] == jtype)

    def build(ptr: str) -> dict[str, Any]:
        entries = by_ptr[ptr]
        types = sorted({r["jtype"] for r in entries})
        out: dict[str, Any] = {
            "type": types[0] if len(types) == 1 else types
        }
        if "object" in types:
            obj_n = node_count(ptr, "object")
            props: dict[str, Any] = {}
            required: list[str] = []
            prefix = ptr + "/"
            for child in sorted(by_ptr):
                if not child.startswith(prefix) or "/" in child[len(prefix):]:
                    continue
                token = child[len(prefix):]
                if token == "*":
                    continue
                key = _unescape_token(token)
                props[key] = build(child)
                if sum(r["n"] for r in by_ptr[child]) == obj_n:
                    required.append(key)
            if props:
                out["properties"] = props
            if required:
                out["required"] = required
        if "array" in types:
            item_ptr = ptr + "/*"
            if item_ptr in by_ptr:
                out["items"] = build(item_ptr)
        if include_bounds:
            nums = [r for r in entries if r["jtype"] in ("integer", "number")]
            if nums and all(r["min_num"] is not None for r in nums):
                out["minimum"] = min(r["min_num"] for r in nums)
                out["maximum"] = max(r["max_num"] for r in nums)
            strs = [r for r in entries if r["jtype"] == "string"]
            if strs and all(r["min_len"] is not None for r in strs):
                out["minLength"] = min(r["min_len"] for r in strs)
                out["maxLength"] = max(r["max_len"] for r in strs)
        return out

    schema = build("")
    schema["$schema"] = "https://json-schema.org/draft/2020-12/schema"
    return schema


def profile_drift(
    old_df: DataFrame,
    new_df: DataFrame,
    json_col: str,
    *,
    max_depth: int = 6,
    include_stable: bool = False,
) -> DataFrame:
    """Schema DRIFT between two corpus snapshots — the operational reason
    to infer schemas at all: an upstream feed changed shape and the
    validation schema is now wrong, or about to be.

    Profiles both snapshots with ``json_pointer_profile`` and
    full-outer-joins the two (pointer, jtype) tables:

    - ``added``     — the pointer/type pair exists only in the new corpus
                      (a new key, or a new type at an existing pointer —
                      the classic int→string regression shows up as one
                      ``added`` + one ``removed`` row at the same pointer);
    - ``removed``   — only in the old corpus;
    - ``count_changed`` — both, different instance counts (a key becoming
                      optional/required drifts here before it
                      adds/removes);
    - ``stable``    — both, same count (emitted only with
                      ``include_stable=True``).

    Scale shape: the corpus-sized work is the two profile walks; the
    join runs over the two AGGREGATED profiles (rows = distinct
    pointer/type pairs), so the exchange after the heavy stage is
    negligible and AQE will broadcast one side.
    """
    po = json_pointer_profile(old_df, json_col, max_depth=max_depth).select(
        "pointer", "jtype", F.col("n").alias("old_n")
    )
    pn = json_pointer_profile(new_df, json_col, max_depth=max_depth).select(
        "pointer", "jtype", F.col("n").alias("new_n")
    )
    j = po.join(pn, ["pointer", "jtype"], "full_outer")
    change = (
        F.when(F.col("old_n").isNull(), F.lit("added"))
        .when(F.col("new_n").isNull(), F.lit("removed"))
        .when(F.col("old_n") != F.col("new_n"), F.lit("count_changed"))
        .otherwise(F.lit("stable"))
    )
    out = j.select("pointer", "jtype", change.alias("change"),
                   "old_n", "new_n")
    if not include_stable:
        out = out.where(F.col("change") != "stable")
    return out
