"""Hybrid-router scale datapoint (round-6 verdict ask #5): run the q39
cyclic-$ref workload at 8M rows and decompose where the wall time goes, so
the compiler docstring's "the routed branch evaluates only the probe … the
overhead is ≈ one extra parse pass" claim carries a measurement instead of
an argument.

Two depth distributions:
- ``uniform``: depth = id % 6 (q39's own distribution — an adversarial
  ~2/3-routed workload; the hybrid's worst case);
- ``shallow``: depth = 5 when id % 1000 == 0 else id % 2 (the production
  shape the docstring claims: cyclic schema, but real instances rarely
  exceed the unrolled depth — 0.1% routed).

Per workload (input materialized as parquet so the two-branch split pays a
REAL second scan, 1 warmup + min-of-2 per timing):
- t_hybrid:   CompiledSchema.validate_json_column end-to-end
- t_probe:    the probe pass alone (parse + marker-position test + count)
- t_fast:     the lowered branch alone (~probe rows)
- t_interp:   force_interpreter=True over ALL rows (what the hybrid avoids)

Prints ONE JSON document; redirect/extract to ROUTED_r6.json.

Usage: python scripts/routed_scale_run.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000

CHAIN_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["v"],
    "properties": {
        "v": {"type": "integer", "minimum": 0, "maximum": 99},
        "next": {"$ref": "#"},
    },
    "additionalProperties": False,
}

CHAIN_SQL = """
    aggregate(
      sequence({depth}, 0L, -1L), cast('' as string),
      (acc, i) -> concat(
        '{{"v":', cast((id * 7 + i * 13) % 120 - 10 as string),
        if(acc = '', '', concat(',"next":', acc)),
        if(i = 0 and id % 17 = 0, ',"x":1', ''),
        '}}'))
"""


def mintime(fn, reps: int = 2) -> float:
    fn()  # warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("routed-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from json_schemer_spark import compile_schema

    plan = compile_schema(CHAIN_SCHEMA)
    probe = plan._route_probe()
    assert probe is not None, "CHAIN_SCHEMA must be hybrid-routed"
    prepared = plan._prepared_schema()

    out: dict = {"metric": "hybrid_router_scale", "rows": N, "workloads": {}}

    for name, depth_expr in (
        ("uniform", "id % 6"),
        ("shallow", "if(id % 1000 = 0, 5L, id % 2)"),
    ):
        path = f"/tmp/jss_routed_{name}_{N}"
        import os

        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            spark.range(N).select(
                F.expr(CHAIN_SQL.format(depth=depth_expr)).alias("doc")
            ).write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)

        routed = df.filter(probe(F.col("doc"))).count()

        def probe_pass():
            df.filter(probe(F.col("doc"))).count()

        def hybrid():
            plan.validate_json_column(df, "doc").agg(
                F.sum(F.col("valid").cast("long"))).collect()

        def fast_branch():
            from json_schemer_spark.schema.columnar import (
                validate_json_column_lowered,
            )

            validate_json_column_lowered(
                df.filter(~probe(F.col("doc"))), "doc", prepared,
                plan._lowering_dialect(),
                registry=plan._evaluator.registry, prepared=True,
                allow_markers=True,
            ).agg(F.sum(F.col("valid").cast("long"))).collect()

        def interp_all():
            plan.validate_json_column(
                df, "doc", force_interpreter=True
            ).agg(F.sum(F.col("valid").cast("long"))).collect()

        t_probe = mintime(probe_pass)
        t_hybrid = mintime(hybrid)
        t_fast = mintime(fast_branch)
        t_interp = mintime(interp_all)
        out["workloads"][name] = {
            "routed_fraction": round(routed / N, 6),
            "t_hybrid_s": round(t_hybrid, 3),
            "t_probe_pass_s": round(t_probe, 3),
            "probe_share_of_hybrid": round(t_probe / t_hybrid, 3),
            "t_fast_branch_s": round(t_fast, 3),
            "t_interpreter_all_s": round(t_interp, 3),
            "hybrid_vs_interpreter_x": round(t_interp / t_hybrid, 2),
        }
        print(json.dumps({name: out["workloads"][name]}), flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
