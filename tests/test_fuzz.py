"""Tier-differential fuzz (small fixed-seed slice of
scripts/differential_fuzz.py — the full campaign runs per-round)."""

import json
import random
import sys

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo/scripts")


def test_columnar_interpreter_fuzz_slice(spark):
    from differential_fuzz import N_INSTANCES, deep_value, rand_schema, rand_value

    from json_schemer_spark.schema.columnar import (
        Unsupported,
        build_route_probe,
        prepare,
        validate_json_column_lowered,
    )
    from json_schemer_spark.schema.dialects import DRAFT202012
    from json_schemer_spark.schema.interpreter import Evaluator

    rng = random.Random(20260816)
    n = 0
    while n < 25:
        schema = rand_schema(rng)
        try:
            prepped = prepare(schema, DRAFT202012)
        except Unsupported:
            continue
        n += 1
        probe = build_route_probe(prepped, DRAFT202012)
        instances = [rand_value(rng) for _ in range(N_INSTANCES - 4)]
        instances += [deep_value(rng) for _ in range(4)]
        ev = Evaluator(schema, dialect=DRAFT202012)
        expected = [bool(ev.valid(v)) for v in instances]
        df = spark.createDataFrame(
            [(i, expected[i], json.dumps(v)) for i, v in enumerate(instances)],
            "cidx int, expected boolean, content string",
        )
        if probe is not None:
            # hybrid: routed rows ride the interpreter in production, whose
            # verdicts ARE `expected` — compare the fast path only
            df = df.withColumn("__r", probe(F.col("content"))).filter(
                ~F.col("__r")).drop("__r")
        out = validate_json_column_lowered(
            df, "content", prepped, DRAFT202012, prepared=True,
            allow_markers=True)
        bad = out.filter(F.col("valid") != F.col("expected")).collect()
        assert not bad, (
            f"tier mismatch: schema={json.dumps(schema)[:200]} "
            f"data={[json.dumps(instances[r.cidx]) for r in bad[:2]]}"
        )
