"""Two-cluster-size scaling run (BASELINE.json north rule, sandbox form).

The rule requires >= 0.8 throughput scaling efficiency between N and 4N
**executors**. The faithful sandbox realization is Spark's
``local-cluster[N, cores, mem]`` master: real executor JVMs (fixed heap,
own GC, own codegen) — adding executors reproduces cluster scale-out,
unlike ``local[8] -> local[32]`` which just multiplies threads inside one
shared JVM heap (that measures allocator contention, not cluster scaling;
both numbers are reported in BENCH.md for transparency).

Methodology (variance control on a shared sandbox):
- one fresh session per measurement, levels interleaved (L,H,L,H,...),
- per-level MIN across rounds: external interference is one-sided (it only
  slows runs down), so min is the least-interfered observation,
- identical-job warmup so codegen compile stays out of measured time,
- per-executor resources pinned (8 cores, 7g, ParallelGC) at both sizes.

Round 5: TWO jobs are measured and recorded in one artifact — the flagship
validation AND the MinHash-LSH dedup candidate pipeline (shuffle-heavy:
signature projection → (band, hash) exchange → windowed in-bucket pairing),
because the dedup operators are the scale story the brief grades and the
scaling evidence previously covered only validation (round-4 review
ask #8). Top-level keys stay the flagship's (doc-gate compatible);
``jobs`` carries both.

Usage: python scripts/scaling_run.py [rows] [n_exec_low] [repeats] [cores] [lsh_rows]
"""

from __future__ import annotations

import json
import subprocess
import sys

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_LOW = int(sys.argv[2]) if len(sys.argv) > 2 else 1
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
N_HIGH = N_LOW * 4
CORES_EACH = int(sys.argv[4]) if len(sys.argv) > 4 else 8
LSH_ROWS = (
    int(sys.argv[5])
    if len(sys.argv) > 5 and sys.argv[5].lstrip("-").isdigit()
    and not sys.argv[5].startswith("--")
    else 500_000
)
CORPUS = f"/tmp/jss_scaling_corpus_{ROWS}"

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
n_exec = int(sys.argv[1]); cores = int(sys.argv[2]); rows = int(sys.argv[3]); path = sys.argv[4]
job = sys.argv[5] if len(sys.argv) > 5 else "flagship"
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master(f"local-cluster[{n_exec},{cores},8192]")
         .config("spark.sql.shuffle.partitions", str(max(4 * n_exec * cores, 16)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.files.maxPartitionBytes", str(6 * 1024 * 1024))
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.executor.memory", "7g")
         .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
         .config("spark.driver.memory", "4g")
         .getOrCreate())
from json_schemer_spark import compile_schema
from json_schemer_spark.sources.corpus import FLAGSHIP_SCHEMA, generate_corpus
if not os.path.exists(os.path.join(path, "_SUCCESS")):
    generate_corpus(spark, rows, partitions=128).write.mode("overwrite").parquet(path)
corpus = spark.read.parquet(path)
plan = compile_schema(FLAGSHIP_SCHEMA)
if job == "flagship":
    def run_once():
        t0 = time.time()
        out = plan.validate_json_column(corpus, "content")
        (out.groupBy("repo")
            .agg(F.count(F.lit(1)).alias("files"), F.sum((~F.col("valid")).cast("long")).alias("failed"))
            .write.format("noop").mode("overwrite").save())
        return time.time() - t0
elif job == "minhash_lsh":
    # the MinHash-LSH dedup candidate pipeline over real corpus text:
    # token-shingle signatures (one-pass fold, JVM) -> posexplode to band
    # rows -> ONE (band, hash) shuffle -> windowed in-bucket pairing
    # (skew-safe) -> pair distinct. Shuffle-heavy where the flagship is
    # shuffle-free, so this evidences scale-out of the exchange path.
    # The DataFrame is built ONCE outside the timed loop: plan construction
    # is constant driver-side py4j work independent of cluster size, and
    # the scaling criterion concerns EXECUTION throughput.
    from json_schemer_spark.operators.dedup import minhash_lsh_candidates
    docs = corpus.select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"), "content")
    out_df = minhash_lsh_candidates(docs, "content", "doc_id")
    def run_once():
        t0 = time.time()
        out_df.write.format("noop").mode("overwrite").save()
        return time.time() - t0
elif job == "packing":
    # the sequence-packing plan class (round 6): one hash exchange on
    # pack_group + an in-partition sort + running-sum window. A third
    # shuffle shape the other two jobs don't cover (window-sort vs
    # shuffle-free scan vs band-bucket pairing). n_groups is FIXED at
    # 256 (identical job at both cluster sizes; 256 >> 32 cores so the
    # window parallelism is never the bottleneck at either level).
    from json_schemer_spark.operators.packing import pack_sequences
    docs = corpus.select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"),
        F.col("content").alias("text"))
    out_df = pack_sequences(docs, "doc_id", "text",
                            ctx_len=2048, n_groups=256, seed="scale")
    def run_once():
        t0 = time.time()
        out_df.write.format("noop").mode("overwrite").save()
        return time.time() - t0
elif job == "diff":
    # the snapshot-diff plan class (round 6): the JOIN exchange shape the
    # other three jobs don't cover — md5 content projections inside both
    # scans, then a key-partitioned FULL OUTER sort-merge join (both
    # sides shuffle on (repo, path, commit)) and the O(delta) filter.
    # The "new" snapshot derives in-plan from the same corpus (narrow
    # hash-keyed deletes/edits), so the timed work is dominated by the
    # two scans + the join, identical at both cluster sizes.
    from json_schemer_spark.operators.diff import snapshot_diff
    keys = ["repo", "path", "commit"]
    old_snap = corpus.select(*keys, "content")
    new_snap = (
        old_snap.where(F.pmod(F.xxhash64("path"), F.lit(7)) != 0)
        .select(*keys,
                F.when(F.pmod(F.xxhash64("path"), F.lit(5)) == 0,
                       F.concat(F.col("content"), F.lit(" edited")))
                 .otherwise(F.col("content")).alias("content")))
    out_df = snapshot_diff(old_snap, new_snap, keys, ["content"])
    def run_once():
        t0 = time.time()
        out_df.write.format("noop").mode("overwrite").save()
        return time.time() - t0
elif job == "semdedup":
    # the Python-worker exchange class (round 6 session 6): k-means cell
    # assignment (Arrow-batched numpy matmul map) -> ONE groupBy(centroid)
    # exchange -> per-cell pairwise matmuls in applyInPandas. No other
    # scaling job touches the Arrow<->Python worker path, and at real
    # scale this is SemDeDup's entire cost profile. Embeddings derive
    # in-plan from the corpus (16 hash-seeded dims per row, uniform-ish
    # so cells stay balanced); centroid training (driver-side sample)
    # happens ONCE at DataFrame build, outside the timed loop, like the
    # other jobs' plan construction.
    from json_schemer_spark.operators.dedup import semdedup_pairs
    dim = 16
    vec = F.array(*[
        (F.pmod(F.xxhash64(F.lit(i), F.col("path")), F.lit(1000))
         .cast("double") / 500.0 - 1.0)
        for i in range(dim)])
    emb = corpus.select(
        F.xxhash64("repo", "path", "commit").alias("vec_id"),
        vec.alias("embedding"))
    out_df = semdedup_pairs(
        emb, dim=dim, threshold=0.95, id_col="vec_id",
        vec_col="embedding", n_centroids=256, sample_n=2048,
        max_cluster_rows=20_000)
    def run_once():
        t0 = time.time()
        out_df.write.format("noop").mode("overwrite").save()
        return time.time() - t0
elif job == "pagerank":
    # the iterative checkpointed-join class (round 6 session 7): each of
    # 6 PageRank iterations is ONE ranks-onto-edges equi-join + ONE
    # partial-aggregated dst shuffle over a localCheckpoint-ed
    # (src, dst, outdeg) projection. No other job covers repeated reuse
    # of a materialized dataset across shuffle rounds — the pattern every
    # iterative algorithm (k-means, label propagation, connected
    # components) rides. The frontier checkpoints CACHE across actions,
    # so the DataFrame is rebuilt per run; construction is constant
    # driver-side py4j work (~0.5 s), a disclosed slice of the timing.
    from json_schemer_spark.operators.graph import pagerank
    # Measured honestly and recorded below target (0.619 @8M edges):
    # iterative jobs carry a cluster-size-independent iteration-barrier
    # floor (sequential stage latency + per-iteration broadcast builds,
    # ~9 s for 6 iterations here). The round's real win is the
    # found-and-fixed AQE-coalescing bug in graph.pagerank (projection
    # inherited ~4 advisory-sized partitions, eff 0.35 -> 0.62 after the
    # explicit repartition). Amplifying to 32M edges did NOT lift
    # efficiency in this sandbox (0.44 measured): all executor JVMs
    # share ONE host disk, so once shuffle+checkpoint I/O dominates,
    # executor count is not the bottleneck resource — a single-host
    # artifact a real cluster (per-node disks) does not have. Kept at
    # 8M so the recorded artifact matches this script.
    K = 200_000
    edges = corpus.select(
        F.pmod(F.xxhash64("repo"), F.lit(K)).alias("src"),
        F.pmod(F.xxhash64("path"), F.lit(K)).alias("dst"))
    def run_once():
        t0 = time.time()
        (pagerank(edges, n_iter=6)
         .write.format("noop").mode("overwrite").save())
        return time.time() - t0
else:
    raise SystemExit(f"unknown job {job}")
run_once(); run_once()  # 2 warmups: C2 needs several full passes over the
# large generated method before the hot loops are compiled (measured: runs
# 1-3 of a fresh JVM are 2-5x slower; see bench.py docstring)
sec = min(run_once() for _ in range(3))
print(json.dumps({"n_exec": n_exec, "sec": round(sec, 3)}))
spark.stop()
"""


def measure(n_exec: int, rows: int, corpus: str, job: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(n_exec), str(CORES_EACH), str(rows),
         corpus, job],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["sec"]
    raise RuntimeError(f"no result from n_exec={n_exec}: {out.stderr[-2000:]}")


def run_job(job: str, rows: int, corpus: str, label: str) -> dict:
    measure(N_LOW, rows, corpus, job)  # ensure corpus materialized before timing
    low_times, high_times = [], []
    for i in range(REPEATS):
        low_times.append(measure(N_LOW, rows, corpus, job))
        high_times.append(measure(N_HIGH, rows, corpus, job))
        print(f"{job} round {i + 1}: low={low_times[-1]}s high={high_times[-1]}s",
              file=sys.stderr)
    low_best, high_best = min(low_times), min(high_times)
    low_tp, high_tp = rows / low_best, rows / high_best
    eff = high_tp / (4 * low_tp)
    return {
        "job": label,
        "mode": f"local-cluster: {N_LOW}x{CORES_EACH} vs {N_HIGH}x{CORES_EACH} executor JVMs",
        "rows": rows,
        "low": {"executors": N_LOW, "cores_each": CORES_EACH, "times": low_times,
                "min_sec": round(low_best, 3), "rows_per_sec": round(low_tp, 1)},
        "high": {"executors": N_HIGH, "cores_each": CORES_EACH, "times": high_times,
                 "min_sec": round(high_best, 3), "rows_per_sec": round(high_tp, 1)},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }


_APPEND_JOBS = {
    "--append-packing": (
        "packing",
        "sequence packing (pack_group hash exchange + in-partition "
        "sort + running-sum window, 256 groups)",
        "sequence packing",
    ),
    "--append-diff": (
        "diff",
        "snapshot diff (md5 content projections in both scans, "
        "key-partitioned FULL OUTER sort-merge join, O(delta) filter)",
        "snapshot diff",
    ),
    "--append-pagerank": (
        "pagerank",
        "PageRank 6 iterations (checkpointed (src,dst,outdeg) projection, "
        "per-iteration equi-join + partial-agg dst shuffle — the "
        "iterative-reuse class)",
        "PageRank",
    ),
    "--append-semdedup": (
        "semdedup",
        "SemDeDup cell pairwise (k-means assignment map, groupBy(centroid) "
        "exchange into per-cell applyInPandas numpy matmuls — the "
        "Arrow/Python-worker path)",
        "SemDeDup",
    ),
}


def main():
    # `--append-<job> <artifact>`: measure ONLY that job (at ROWS rows)
    # and append it to an existing artifact's jobs list — the
    # flagship/LSH numbers in that artifact stay authoritative.
    for flag, (jobname, label, prefix) in _APPEND_JOBS.items():
        if flag not in sys.argv:
            continue
        target = sys.argv[sys.argv.index(flag) + 1]
        result = run_job(jobname, ROWS, f"/tmp/jss_scaling_corpus_{ROWS}",
                         label)
        art = json.load(open(target))
        art["jobs"] = [j for j in art.get("jobs", [])
                       if not j["job"].startswith(prefix)]
        art["jobs"].append(result)
        with open(target, "w") as f:
            json.dump(art, f, indent=2)
            f.write("\n")
        print(json.dumps(result, indent=2))
        return

    flagship = run_job(
        "flagship", ROWS, CORPUS,
        "corpus flagship validation (columnar tier) + per-repo verdict rollup")
    lsh = run_job(
        "minhash_lsh", LSH_ROWS, f"/tmp/jss_scaling_corpus_{LSH_ROWS}",
        "MinHash-LSH dedup candidates (shingle signatures, (band,hash) "
        "shuffle, windowed in-bucket pairing)")
    out = dict(flagship)  # top-level view stays the flagship (doc gate)
    out["jobs"] = [flagship, lsh]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
