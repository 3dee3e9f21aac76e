"""Two-parallelism scaling run (BASELINE.json north rule, sandbox form).

Runs the identical corpus-validation job at local[N] and local[4N] on the
same materialized parquet input and reports throughput at both plus
scaling efficiency = throughput(4N) / (4 x throughput(N)).

Each parallelism level runs in a FRESH JVM (subprocess) so executor-thread
pools, codegen caches, and memory managers don't leak between measurements.

Usage: python scripts/scaling_run.py [rows] [n_low] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
N_HIGH = N_LOW * 4
CORPUS = f"/tmp/jss_scaling_corpus_{ROWS}"

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); rows = int(sys.argv[2]); path = sys.argv[3]; repeats = int(sys.argv[4])
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
from json_schemer_spark import compile_schema
from json_schemer_spark.sources.corpus import FLAGSHIP_SCHEMA, generate_corpus
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    generate_corpus(spark, rows, partitions=128).write.mode("overwrite").parquet(path)
corpus = spark.read.parquet(path)
plan = compile_schema(FLAGSHIP_SCHEMA)
def run_once():
    t0 = time.time()
    out = plan.validate_json_column(corpus, "content")
    (out.groupBy("repo")
        .agg(F.count(F.lit(1)).alias("files"), F.sum((~F.col("valid")).cast("long")).alias("failed"))
        .write.format("noop").mode("overwrite").save())
    return time.time() - t0
run_once()  # JVM/codegen warmup
times = [run_once() for _ in range(repeats)]
best = min(times)
print(json.dumps({"cpus": cpus, "rows": rows, "times": [round(t,3) for t in times],
                  "best_sec": round(best,3), "rows_per_sec": round(rows/best,1)}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(ROWS), CORPUS, str(REPEATS)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cpus={cpus}: {out.stderr[-2000:]}")


def main():
    low = run_level(N_LOW)
    high = run_level(N_HIGH)
    eff = high["rows_per_sec"] / (4 * low["rows_per_sec"])
    result = {
        "job": "corpus flagship validation (columnar tier) + per-repo verdict rollup",
        "rows": ROWS,
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
