"""Round-7 optimization harness (guide §1.4): time individual declared
queries in isolation with the noop sink, optionally dumping
``.explain("formatted")`` to plans/r07/.

This file is NOT the driver bench — bench.py stays frozen. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        q51_ngram_contamination q17_minhash_lsh_candidates [--repeats 3] \
        [--explain before|after]

Prints one JSON line per query: {"query": ..., "runs": [...], "min": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    repeats = 3
    explain_tag = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1]); i += 2
        elif args[i] == "--explain":
            explain_tag = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from bench import build_spark

    spark = build_spark(CPUS)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        fn = qs[name]
        if explain_tag:
            os.makedirs("plans/r07", exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(f"plans/r07/{name}_{explain_tag}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        runs = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"query": name, "runs": runs, "min": min(runs)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
