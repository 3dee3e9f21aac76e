"""Differential fuzz: random schemas × random instances, columnar tier vs
interpreter tier. The conformance suite fixes the schema corpus; this
explores the long tail (deep nesting, odd key names, numeric edges,
combinator stacking). Deterministic seed → reproducible.

Usage: python scripts/differential_fuzz.py [n_schemas] [seed]
"""

import json
import random
import sys
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from json_schemer_spark.schema.columnar import (
    Unsupported,
    build_route_probe,
    prepare,
    validate_json_column_lowered,
)
from json_schemer_spark.schema.dialects import DIALECTS_BY_NAME
from json_schemer_spark.schema.interpreter import Evaluator

def _int_arg(i: int, default: int) -> int:
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default  # imported as a library (tests) or no arg given


N_SCHEMAS = _int_arg(1, 400)
SEED = _int_arg(2, 20260816)
N_INSTANCES = 24
BATCH = 40

KEYS = ["a", "b", "k1", "a b", "x/y", "~t", "É", "id", "$ref", "0"]
STRINGS = ["", "a", "foo", "foo\n", "FOO", "éé", "abc", "1", "true", "P1DT2H",
           "123e4567-e89b-12d3-a456-426614174000"]
NUMBERS = [0, 1, -1, 2, 1.0, 1.5, -0.5, 100, 9007199254740993, 9007199254740992,
           0.0001, 1e300, 3, 5, 10]
PATTERNS = ["^a", "b$", "^[a-z]+$", "o+", "^$", "\\d+", "^foo$"]


def rand_value(rng: random.Random, depth: int = 0):
    r = rng.random()
    if depth > 2:
        r = min(r, 0.69)
    if r < 0.18:
        return rng.choice(NUMBERS)
    if r < 0.36:
        return rng.choice(STRINGS)
    if r < 0.44:
        return rng.choice([True, False, None])
    if r < 0.70:
        return None if rng.random() < 0.1 else rng.choice(NUMBERS + STRINGS)
    if r < 0.85:
        return [rand_value(rng, depth + 1) for _ in range(rng.randrange(0, 4))]
    return {rng.choice(KEYS): rand_value(rng, depth + 1)
            for _ in range(rng.randrange(0, 4))}


def rand_schema(rng: random.Random, depth: int = 0) -> dict:
    s: dict = {}
    n_kw = rng.randrange(1, 4 if depth else 5)
    pool = ["type", "enum", "const", "bounds", "length", "pattern", "items",
            "prefixItems", "contains", "uniqueItems", "properties", "required",
            "additionalProperties", "patternProperties", "propertyNames",
            "dependentRequired", "allOf", "anyOf", "oneOf", "not", "ifthen",
            "minmaxItems", "minmaxProps", "multipleOf", "ref",
            "dependentSchemas", "unevaluated", "recref"]
    if depth >= 2:
        pool = pool[:10]
    for kw in rng.sample(pool, min(n_kw, len(pool))):
        if kw == "type":
            ts = rng.sample(["null", "boolean", "number", "integer", "string",
                             "array", "object"], rng.randrange(1, 3))
            s["type"] = ts[0] if len(ts) == 1 else ts
        elif kw == "enum":
            s["enum"] = [rand_value(rng, 2) for _ in range(rng.randrange(1, 4))]
        elif kw == "const":
            s["const"] = rand_value(rng, 2)
        elif kw == "bounds":
            s[rng.choice(["minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum"])] = rng.choice(NUMBERS)
        elif kw == "length":
            s[rng.choice(["minLength", "maxLength"])] = rng.randrange(0, 5)
        elif kw == "pattern":
            s["pattern"] = rng.choice(PATTERNS)
        elif kw == "items":
            s["items"] = rand_schema(rng, depth + 1)
        elif kw == "prefixItems":
            s["prefixItems"] = [rand_schema(rng, depth + 1)
                                for _ in range(rng.randrange(1, 3))]
        elif kw == "contains":
            s["contains"] = rand_schema(rng, depth + 1)
            if rng.random() < 0.5:
                s["minContains"] = rng.randrange(0, 3)
            if rng.random() < 0.3:
                s["maxContains"] = rng.randrange(0, 4)
        elif kw == "uniqueItems":
            s["uniqueItems"] = True
        elif kw == "properties":
            s["properties"] = {rng.choice(KEYS): rand_schema(rng, depth + 1)
                               for _ in range(rng.randrange(1, 3))}
        elif kw == "required":
            s["required"] = rng.sample(KEYS, rng.randrange(1, 3))
        elif kw == "additionalProperties":
            s["additionalProperties"] = (
                False if rng.random() < 0.5 else rand_schema(rng, depth + 1))
        elif kw == "patternProperties":
            s["patternProperties"] = {rng.choice(PATTERNS): rand_schema(rng, depth + 1)}
        elif kw == "propertyNames":
            s["propertyNames"] = rng.choice(
                [{"maxLength": rng.randrange(0, 4)}, {"pattern": rng.choice(PATTERNS)},
                 {"enum": rng.sample(KEYS, 2)}])
        elif kw == "dependentRequired":
            s["dependentRequired"] = {rng.choice(KEYS): rng.sample(KEYS, rng.randrange(1, 3))}
        elif kw in ("allOf", "anyOf", "oneOf"):
            s[kw] = [rand_schema(rng, depth + 1) for _ in range(rng.randrange(1, 3))]
        elif kw == "not":
            s["not"] = rand_schema(rng, depth + 1)
        elif kw == "ifthen":
            s["if"] = rand_schema(rng, depth + 1)
            if rng.random() < 0.7:
                s["then"] = rand_schema(rng, depth + 1)
            if rng.random() < 0.5:
                s["else"] = rand_schema(rng, depth + 1)
        elif kw == "minmaxItems":
            s[rng.choice(["minItems", "maxItems"])] = rng.randrange(0, 4)
        elif kw == "minmaxProps":
            s[rng.choice(["minProperties", "maxProperties"])] = rng.randrange(0, 4)
        elif kw == "multipleOf":
            s["multipleOf"] = rng.choice([1, 2, 5, 0.5, 0.0001, 3])
        elif kw == "dependentSchemas":
            s["dependentSchemas"] = {rng.choice(KEYS): rand_schema(rng, depth + 1)}
        elif kw == "unevaluated":
            # round-4: data-dependent unevaluated* — combined with the
            # anyOf/oneOf/if/dependentSchemas draws above, this exercises the
            # gated-contribution columnar path (columnar._prop_contribs)
            target = rng.choice(["unevaluatedProperties", "unevaluatedItems"])
            s[target] = False if rng.random() < 0.5 else rand_schema(rng, depth + 1)
        elif kw == "ref" and depth == 0:
            s.setdefault("$defs", {})["d"] = rand_schema(rng, depth + 1)
            s.setdefault("properties", {})["r"] = {"$ref": "#/$defs/d"}
        elif kw == "recref" and depth == 0:
            # round-5: CYCLIC refs — bounded unroll + per-row routing.
            # The cycle re-enters through an instance-consuming edge
            # (properties or items), which is the lowerable shape; the
            # routing probe sends instances deeper than the unroll budget
            # to the interpreter, so deep rand/chain instances exercise
            # BOTH sides of the hybrid split.
            body = rand_schema(rng, 1)
            if rng.random() < 0.5:
                body.setdefault("properties", {})["a"] = {"$ref": "#/$defs/rec"}
            else:
                body["items"] = {"$ref": "#/$defs/rec"}
            s.setdefault("$defs", {})["rec"] = body
            s.setdefault("properties", {})["a"] = {"$ref": "#/$defs/rec"}
    return s


def deep_value(rng: random.Random):
    """A deliberately DEEP instance (chains of 'a' objects / arrays) so the
    recursive-schema draws route some rows past the unroll budget."""
    v = rand_value(rng, 2)
    for _ in range(rng.randrange(3, 7)):
        v = {"a": v} if rng.random() < 0.7 else [v]
    return v


def main() -> int:
    rng = random.Random(SEED)
    dialect = DIALECTS_BY_NAME[rng.choice(["draft2020-12", "draft2019-09", "draft7"])]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("differential-fuzz")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cases, n_hybrid = [], 0
    while len(cases) < N_SCHEMAS:
        schema = rand_schema(rng)
        try:
            prepped = prepare(schema, dialect)
        except (Unsupported, OverflowError):
            continue
        probe = build_route_probe(prepped, dialect)
        if probe is not None:
            n_hybrid += 1
        instances = [rand_value(rng) for _ in range(N_INSTANCES - 4)]
        instances += [deep_value(rng) for _ in range(4)]
        ev = Evaluator(schema, dialect=dialect)
        expected = [bool(ev.valid(v)) for v in instances]
        cases.append((schema, prepped, probe, instances, expected))

    mismatches = []
    n_routed = 0
    for start in range(0, len(cases), BATCH):
        outs = []
        for idx, (schema, prepped, probe, instances, expected) in enumerate(
            cases[start:start + BATCH]
        ):
            df = spark.createDataFrame(
                [(start + idx, i, expected[i], json.dumps(v))
                 for i, v in enumerate(instances)],
                "sidx int, cidx int, expected boolean, content string",
            )
            if probe is not None:
                # hybrid: rows the probe routes ride the interpreter in
                # production (whose verdicts ARE `expected` here) — compare
                # the lowered plan on the fast-path rows only
                df = df.withColumn("__r", probe(F.col("content")))
                n_routed += df.filter("__r").count()
                df = df.filter(~F.col("__r")).drop("__r")
            out = validate_json_column_lowered(
                df, "content", prepped, dialect, prepared=True,
                allow_markers=True,
            )
            outs.append(out.select("sidx", "cidx", "expected", "valid"))
        allout = reduce(lambda a, b: a.unionByName(b), outs)
        for r in allout.filter(F.col("valid") != F.col("expected")).collect():
            schema, _, _, instances, _ = cases[r.sidx]
            mismatches.append((json.dumps(schema)[:160],
                               json.dumps(instances[r.cidx])[:80],
                               r.expected, r.valid))

    print(f"dialect={dialect.name} schemas={len(cases)} instances_each={N_INSTANCES} "
          f"hybrid={n_hybrid} routed_rows={n_routed} "
          f"mismatches={len(mismatches)}")
    for m in mismatches[:15]:
        print("MISMATCH schema:", m[0])
        print("  data:", m[1], "interp:", m[2], "columnar:", m[3])
    spark.stop()
    return 0 if not mismatches else 1


if __name__ == "__main__":
    sys.exit(main())
