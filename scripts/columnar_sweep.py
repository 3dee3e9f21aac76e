"""Full-suite columnar-tier sweep: for EVERY lowerable schema in the
vendored JSON-Schema-Test-Suite, run the pure-Column plan and compare
verdicts against the suite's expectations. Prints per-draft coverage
(lowerable schemas / total) and any mismatches.

Usage: python scripts/columnar_sweep.py [draft ...]
"""

import json
import sys
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from json_schemer_spark.schema.columnar import lowerable, validate_json_column_lowered
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
        lowered, total = [], 0
        for _, (schema, cases) in by_schema.items():
            total += 1
            ev = make_evaluator(schema, draft)
            dialect = ev.root_resource.dialect
            # registry-based inlining: the production path through
            # CompiledSchema — anchors, $id rebinding and (suite-remote)
            # refs all resolve statically
            if lowerable(schema, dialect, registry=ev.registry):
                lowered.append((schema, dialect, ev.registry, cases))

        mism = []
        for start in range(0, len(lowered), BATCH):
            outs = []
            for idx, (schema, dialect, reg, cases) in enumerate(lowered[start : start + BATCH]):
                df = spark.createDataFrame(
                    [(start + idx, i, c.valid, json.dumps(c.data)) for i, c in enumerate(cases)],
                    "sidx int, cidx int, expected boolean, content string",
                )
                out = validate_json_column_lowered(df, "content", schema, dialect, registry=reg)
                outs.append(out.select("sidx", "cidx", "expected", "valid"))
            allout = reduce(lambda a, b: a.unionByName(b), outs)
            for r in allout.filter(F.col("valid") != F.col("expected")).collect():
                schema, _, _, cases = lowered[r.sidx]
                mism.append((r.sidx, r.cidx, json.dumps(schema)[:100],
                             json.dumps(cases[r.cidx].data)[:60], r.expected, r.valid))

        print(f"{draft}: {len(lowered)}/{total} schemas lowerable, "
              f"{len(mism)} verdict mismatches")
        for m in mism[:20]:
            print("  MISMATCH", m)
        grand_bad += len(mism)

    spark.stop()
    print("SWEEP", "CLEAN" if grand_bad == 0 else f"FAILED ({grand_bad})")
    return 0 if grand_bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
