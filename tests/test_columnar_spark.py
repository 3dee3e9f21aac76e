"""Columnar (pure-Column) tier: agreement with suite verdicts and with the
interpreter tier, end-to-end on Spark."""

import json

import pytest
import pyspark.sql.functions as F

from json_schemer_spark import compile_schema
from json_schemer_spark.schema.columnar import lowerable, validate_json_column_lowered
from json_schemer_spark.schema.suite import iter_cases, make_evaluator


def _lowerable_schemas(draft, limit):
    by_schema = {}
    for c in iter_cases(draft):
        by_schema.setdefault(id(c.schema), (c.schema, []))[1].append(c)
    out = []
    for _, (schema, cases) in by_schema.items():
        dialect = make_evaluator(schema, draft).root_resource.dialect
        if lowerable(schema, dialect):
            out.append((schema, dialect, cases))
    # deterministic spread over the whole list
    step = max(1, len(out) // limit)
    return out[::step][:limit]


@pytest.mark.parametrize("draft", ["draft4", "draft7", "draft2020-12"])
def test_columnar_matches_suite_sample(spark, draft):
    sample = _lowerable_schemas(draft, limit=12)
    assert sample, "no lowerable schemas found"
    for schema, dialect, cases in sample:
        df = spark.createDataFrame(
            [(c.valid, json.dumps(c.data)) for c in cases],
            "expected boolean, content string",
        )
        out = validate_json_column_lowered(df, "content", schema, dialect)
        bad = out.filter(F.col("valid") != F.col("expected")).collect()
        assert not bad, f"{draft} {json.dumps(schema)[:80]}: {bad[:3]}"


def test_tiers_agree_on_corpus(spark):
    from json_schemer_spark.sources.corpus import FLAGSHIP_SCHEMA, generate_corpus

    plan = compile_schema(FLAGSHIP_SCHEMA)
    assert plan.is_lowerable()
    corpus = generate_corpus(spark, 5_000)
    low = plan.validate_json_column(corpus, "content")
    interp = plan.validate_json_column(corpus, "content", force_interpreter=True)
    n_low = low.filter("valid").count()
    n_int = interp.filter("valid").count()
    assert n_low == n_int
    # violation keyword histograms match too
    hist = lambda df: {
        (r.keyword, r.instance_pointer): r["count"]
        for r in df.select(F.explode("violations").alias("v"))
        .select("v.keyword", "v.instance_pointer")
        .groupBy("keyword", "instance_pointer")
        .count()
        .collect()
    }
    assert hist(low) == hist(interp)


def test_violation_pointers(spark):
    plan = compile_schema(
        {
            "type": "object",
            "required": ["a"],
            "properties": {"a": {"type": "integer", "minimum": 3}},
        }
    )
    df = spark.createDataFrame([('{"a": 1}',), ('{}',), ('{"a": "x"}',)], "content string")
    rows = plan.validate_json_column(df, "content").select("violations").collect()
    flat = [(v.keyword, v.instance_pointer) for r in rows for v in r.violations]
    assert ("minimum", "/a") in flat
    assert ("required", "") in flat
    # single-type failures carry the expected type name (classic convention)
    assert ("integer", "/a") in flat
