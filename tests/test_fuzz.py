"""Tier-differential fuzz (small fixed-seed slice of
scripts/differential_fuzz.py — the full campaign runs per-round)."""

import json
import random
import sys

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo/scripts")


def test_columnar_interpreter_fuzz_slice(spark):
    from differential_fuzz import N_INSTANCES, rand_schema, rand_value

    from json_schemer_spark.schema.columnar import (
        lowerable,
        validate_json_column_lowered,
    )
    from json_schemer_spark.schema.dialects import DRAFT202012
    from json_schemer_spark.schema.interpreter import Evaluator

    rng = random.Random(20260816)
    n = 0
    while n < 25:
        schema = rand_schema(rng)
        if not lowerable(schema, DRAFT202012):
            continue
        n += 1
        instances = [rand_value(rng) for _ in range(N_INSTANCES)]
        ev = Evaluator(schema, dialect=DRAFT202012)
        expected = [bool(ev.valid(v)) for v in instances]
        df = spark.createDataFrame(
            [(i, expected[i], json.dumps(v)) for i, v in enumerate(instances)],
            "cidx int, expected boolean, content string",
        )
        out = validate_json_column_lowered(df, "content", schema, DRAFT202012)
        bad = out.filter(F.col("valid") != F.col("expected")).collect()
        assert not bad, (
            f"tier mismatch: schema={json.dumps(schema)[:200]} "
            f"data={[json.dumps(instances[r.cidx]) for r in bad[:2]]}"
        )
