#!/usr/bin/env python
"""spark-submit entrypoint — the engine's CLI (reference: exe/json_schemer).

    spark-submit --py-files json_schemer_spark.zip validate.py \
        --table /path/to/corpus_parquet --schema spec.json \
        --content-col content --out /path/to/violations \
        [--ledger /path/to/ledger --resume] [--errors MAX]

Compiles the schema once on the driver, validates the corpus (columnar
tier when lowerable, Arrow-batched interpreter otherwise), writes verdicts
+ violations, prints a summary, exits non-zero when violations exist
(matching exe/json_schemer:52-62 semantics).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="parquet path (or Iceberg table on a real cluster)")
    ap.add_argument("--schema", required=True, help="JSON Schema file")
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--out", required=True, help="output path for verdicts+violations parquet")
    ap.add_argument("--errors", type=int, default=None, help="print at most N violations (CLI --errors MAX)")
    ap.add_argument("--ledger", default=None, help="checkpoint ledger path (enables resume)")
    ap.add_argument("--units", type=int, default=16, help="checkpoint work units")
    ap.add_argument("--flag-only", action="store_true", help="verdicts only (skip violation assembly)")
    ap.add_argument("--assert-formats", action="store_true",
                    help="assert the `format` keyword (reference `format` option)")
    ap.add_argument("--pretty", action="store_true",
                    help="add a human-readable `pretty` message column "
                         "(Errors.pretty sentences, all-JVM) and print "
                         "--errors rows as sentences")
    ap.add_argument("--dialect", default=None,
                    help="force a dialect: draft4|draft6|draft7|draft2019-09|"
                         "draft2020-12|openapi30|openapi31 (default: $schema dispatch)")
    args = ap.parse_args(argv)

    from json_schemer_spark import compile_schema
    from json_schemer_spark.config import build_session

    spark = build_session("json-schemer-validate")
    with open(args.schema) as f:
        schema = json.load(f)
    dialect = None
    if args.dialect:
        from json_schemer_spark.schema.dialects import DIALECTS_BY_NAME

        dialect = DIALECTS_BY_NAME[args.dialect]
    plan = compile_schema(schema, dialect=dialect, assert_formats=args.assert_formats)
    df = spark.read.parquet(args.table)

    if args.ledger:
        from json_schemer_spark.plans.checkpoint import CheckpointedRun

        runner = CheckpointedRun(spark, args.ledger, args.out, n_units=args.units)
        summary = runner.run(df, lambda part: plan.validate_json_column(part, args.content_col))
        print(json.dumps(summary))
        n_failed = summary["failed"]
    else:
        out = plan.validate_json_column(df, args.content_col)
        if args.pretty:
            from json_schemer_spark import pretty_errors_column

            out = out.withColumn("pretty", pretty_errors_column(
                plan.schema, out["violations"], content=args.content_col))
        out.write.mode("overwrite").parquet(args.out)
        import pyspark.sql.functions as F

        written = spark.read.parquet(args.out)
        agg = written.agg(
            F.count(F.lit(1)).alias("n"), F.sum((~F.col("valid")).cast("long")).alias("nf")
        ).collect()[0]
        print(json.dumps({"rows": int(agg.n), "failed": int(agg.nf or 0)}))
        n_failed = int(agg.nf or 0)
        if args.errors:
            if args.pretty:
                for row in (
                    written.filter(~F.col("valid"))
                    .select(F.explode("pretty").alias("m"))
                    .limit(args.errors)
                    .collect()
                ):
                    print(row.m)
            else:
                for row in (
                    written.filter(~F.col("valid"))
                    .select(F.explode("violations").alias("v"))
                    .limit(args.errors)
                    .collect()
                ):
                    print(json.dumps(row.v.asDict()))

    spark.stop()
    return 1 if n_failed else 0


if __name__ == "__main__":
    sys.exit(main())
