"""Synthetic corpus generator: determinism, skew, referential defects."""

import pyspark.sql.functions as F

from json_schemer_spark.sources.corpus import (
    FLAGSHIP_SCHEMA,
    generate_commits_dim,
    generate_corpus,
)


def _value_hash(df):
    return df.agg(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)"))
    ).collect()[0][0]


def test_deterministic(spark):
    a = generate_corpus(spark, 20_000)
    b = generate_corpus(spark, 20_000)
    assert _value_hash(a) == _value_hash(b)


def test_schema_and_skew(spark):
    df = generate_corpus(spark, 20_000)
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    top = df.groupBy("repo").count().orderBy(F.desc("count")).limit(2).collect()
    top_share = sum(r["count"] for r in top) / 20_000
    assert 0.2 < top_share < 0.4, f"expected ~30% skew into 2 repos, got {top_share}"


def test_referential_defect_rate(spark):
    df = generate_corpus(spark, 20_000)
    dim = generate_commits_dim(spark)
    dangling = df.join(dim, ["repo", "commit"], "left_anti").count()
    assert 0.01 < dangling / 20_000 < 0.06


def test_flagship_defect_rate(spark):
    from json_schemer_spark import compile_schema

    plan = compile_schema(FLAGSHIP_SCHEMA)
    out = plan.validate_json_column(generate_corpus(spark, 20_000), "content")
    bad = out.filter(~F.col("valid")).count()
    assert 0.10 < bad / 20_000 < 0.25
