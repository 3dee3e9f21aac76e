"""Full-suite columnar-tier sweep: for EVERY lowerable schema in the
vendored JSON-Schema-Test-Suite, run the pure-Column plan and compare
verdicts against the suite's expectations. Prints per-draft coverage
(lowerable schemas / total) and any mismatches.

Since round 5, schemas whose cyclic $refs unroll to ROUTE_MARKERs are
lowerable too (hybrid per-row routing): non-routed cases run the lowered
plan, routed cases (instance data beyond the unrolled depth) are verified
against the interpreter — the same split CompiledSchema.validate_json_column
performs. Routed-case counts are reported so the hybrid share is visible.

Usage: python scripts/columnar_sweep.py [draft ...]
"""

import json
import sys
from functools import reduce

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from json_schemer_spark.schema.columnar import (
    Unsupported,
    build_route_probe,
    prepare,
    validate_json_column_lowered,
)
from json_schemer_spark.schema.suite import iter_cases, make_evaluator

DRAFTS = sys.argv[1:] or ["draft4", "draft6", "draft7", "draft2019-09", "draft2020-12"]
BATCH = 40


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("columnar-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    grand_bad = 0

    for draft in DRAFTS:
        by_schema = {}
        for c in iter_cases(draft):
            by_schema.setdefault(id(c.schema), (c.schema, []))[1].append(c)
        lowered, total, n_hybrid, n_routed_cases = [], 0, 0, 0
        n_lowerable = 0
        mism = []
        for _, (schema, cases) in by_schema.items():
            total += 1
            ev = make_evaluator(schema, draft)
            dialect = ev.root_resource.dialect
            # registry-based inlining: the production path through
            # CompiledSchema — anchors, $id rebinding and (suite-remote)
            # refs all resolve statically
            try:
                prepped = prepare(schema, dialect, registry=ev.registry)
            except (Unsupported, OverflowError):
                continue
            n_lowerable += 1
            probe = build_route_probe(prepped, dialect)
            if probe is None:
                lowered.append((schema, prepped, dialect, ev.registry, cases))
                continue
            # hybrid schema: split cases by the probe, verify routed cases
            # against the interpreter (the production slow branch), keep the
            # rest for the batched lowered comparison
            n_hybrid += 1
            pdf = spark.createDataFrame(
                [(i, json.dumps(c.data)) for i, c in enumerate(cases)],
                "cidx int, content string",
            ).withColumn("r", probe(F.col("content")))
            routed_idx = {r.cidx for r in pdf.filter("r").collect()}
            n_routed_cases += len(routed_idx)
            fast_cases = []
            for i, c in enumerate(cases):
                if i in routed_idx:
                    got = ev.validate(c.data)["valid"]
                    if got != c.valid:
                        mism.append(("routed", json.dumps(schema)[:100],
                                     json.dumps(c.data)[:60], c.valid, got))
                else:
                    fast_cases.append(c)
            if fast_cases:
                lowered.append((schema, prepped, dialect, ev.registry, fast_cases))

        for start in range(0, len(lowered), BATCH):
            outs = []
            for idx, (schema, prepped, dialect, reg, cases) in enumerate(
                lowered[start : start + BATCH]
            ):
                df = spark.createDataFrame(
                    [(start + idx, i, c.valid, json.dumps(c.data)) for i, c in enumerate(cases)],
                    "sidx int, cidx int, expected boolean, content string",
                )
                out = validate_json_column_lowered(
                    df, "content", prepped, dialect, registry=reg,
                    prepared=True, allow_markers=True,
                )
                outs.append(out.select("sidx", "cidx", "expected", "valid"))
            allout = reduce(lambda a, b: a.unionByName(b), outs)
            for r in allout.filter(F.col("valid") != F.col("expected")).collect():
                schema, _, _, _, cases = lowered[r.sidx]
                mism.append((r.sidx, r.cidx, json.dumps(schema)[:100],
                             json.dumps(cases[r.cidx].data)[:60], r.expected, r.valid))

        print(f"{draft}: {n_lowerable}/{total} schemas lowerable "
              f"({n_hybrid} hybrid-routed, {n_routed_cases} routed cases), "
              f"{len(mism)} verdict mismatches")
        for m in mism[:20]:
            print("  MISMATCH", m)
        grand_bad += len(mism)

    spark.stop()
    print("SWEEP", "CLEAN" if grand_bad == 0 else f"FAILED ({grand_bad})")
    return 0 if grand_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
