"""Table-level operators against the driver testdata (sf0.001)."""

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return {
        name: spark.read.parquet(f"{SF}/{name}.parquet")
        for name in ["orders", "customer", "lineitem", "part", "documents", "embeddings"]
    }


def test_table_constraints_violations(tables):
    from json_schemer_spark.operators.table_constraints import TableConstraints

    tc = TableConstraints(
        {
            "required": ["l_orderkey"],
            "properties": {
                "l_discount": {"minimum": 0.02},
                "l_returnflag": {"enum": ["A", "N"]},
            },
        }
    )
    out = tc.validate(tables["lineitem"])
    flat = tc.violations_flat(tables["lineitem"], ["l_orderkey", "l_linenumber"])
    n_bad = out.filter(~F.col("valid")).count()
    assert n_bad > 0
    assert flat.count() >= n_bad  # rows can carry >1 violation
    kws = {r.keyword for r in flat.select("keyword").distinct().collect()}
    assert "minimum" in kws and "enum" in kws


def test_column_profile(tables):
    from json_schemer_spark.operators.stats import column_profile

    prof = column_profile(tables["orders"], ["o_orderkey", "o_orderstatus"], exact_distinct=True)
    rows = {r.column: r for r in prof.collect()}
    assert rows["o_orderkey"].n_distinct == rows["o_orderkey"].n_rows
    assert rows["o_orderstatus"].n_distinct == 3
    assert rows["o_orderkey"].null_rate == 0.0


def test_referential_anti_join_strategies(tables, spark):
    from json_schemer_spark.operators.referential import dangling_references

    orders, customer = tables["orders"], tables["customer"]
    thin = customer.filter(F.col("c_custkey") % 7 != 0)
    broadcast_n = dangling_references(orders, thin, {"o_custkey": "c_custkey"}).count()
    shuffle_n = dangling_references(
        orders, thin, {"o_custkey": "c_custkey"}, broadcast_dim=False
    ).count()
    salted_n = dangling_references(orders, thin, {"o_custkey": "c_custkey"}, salt=4).count()
    assert broadcast_n == shuffle_n == salted_n > 0


def test_psi_zero_against_self(tables):
    from json_schemer_spark.operators.drift import psi

    li = tables["lineitem"]
    whole = psi(li.withColumn("g", F.lit("all")), "l_quantity", ["g"], n_buckets=10)
    row = whole.collect()[0]
    assert abs(row.psi) < 1e-9  # identical distribution → PSI == 0


def test_ks_detects_shift(spark, tables):
    from json_schemer_spark.operators.drift import ks_per_group

    li = tables["lineitem"]
    out = ks_per_group(
        li, "l_quantity", ["l_returnflag"],
        [0.0, 0.5, 1.0], [1.0, 25.0, 50.0],
    ).collect()
    assert all(0.0 <= r.ks <= 1.0 for r in out)


def test_minhash_finds_known_neardups(spark):
    from json_schemer_spark.operators.dedup import jaccard_pairs, minhash_lsh_candidates

    # varied vocabulary → a real shingle set (repeated text collapses to
    # a handful of distinct shingles and is not representative)
    base = " ".join(f"token{i} word{i * 7 % 211}" for i in range(150))
    rows = [
        (1, base),
        (2, base + " plus a tiny tail difference"),  # near-dup of 1
        (3, " ".join(f"other{i} thing{i * 13 % 97}" for i in range(140))),
        (4, base),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = minhash_lsh_candidates(df, "text", "doc_id")
    verified = jaccard_pairs(df, cand, "text", "doc_id").filter(F.col("jaccard") >= 0.8)
    pairs = {(r.id_a, r.id_b) for r in verified.collect()}
    assert (1, 4) in pairs
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_hamming(spark):
    from json_schemer_spark.operators.dedup import simhash_candidates

    base = " ".join(f"alpha{i} beta{i * 11 % 303}" for i in range(200))
    rows = [(1, base), (2, base + " iota"), (3, " ".join(f"gamma{i}" for i in range(300)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_candidates(df, "text", "doc_id", 5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 5


def test_brute_force_topk_selfmatch(spark, tables):
    from json_schemer_spark.operators.similarity import brute_force_topk

    emb = tables["embeddings"]
    # duplicate vec 0 as id 9999 → must be each other's top neighbour (cos=1)
    clone = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(9999).cast("long"))
    df = emb.unionByName(clone)
    top = brute_force_topk(df, df.filter(F.col("vec_id") == 9999), k=1).collect()[0]
    assert top.neighbor_id == 0 and abs(top.cosine - 1.0) < 1e-6


def test_checkpoint_resume(spark, tables, tmp_path):
    from json_schemer_spark.plans.checkpoint import CheckpointedRun
    from json_schemer_spark.operators.table_constraints import TableConstraints

    tc = TableConstraints({"properties": {"o_totalprice": {"maximum": 300000}}})
    run = CheckpointedRun(
        spark, str(tmp_path / "ledger"), str(tmp_path / "out"), n_units=4, unit_col="o_orderpriority"
    )
    s1 = run.run(tables["orders"], tc.validate)
    assert s1["units_run"] == 4 and s1["skipped_units"] == 0
    # resume: everything checkpointed → nothing re-runs
    s2 = run.run(tables["orders"], tc.validate)
    assert s2["units_run"] == 0 and s2["skipped_units"] == 4
    assert run.metrics().count() == 4
    total = spark.read.parquet(str(tmp_path / "out")).count()
    assert total == tables["orders"].count()


def test_checkpoint_max_units_and_custom_unit_expr(spark, tables, tmp_path):
    """Round-6 (q43's machinery): max_units bounds one invocation's work
    (crash/budget stand-in) and a custom deterministic unit expression
    replaces the xxhash64 default; a second run resumes EXACTLY the
    remainder and totals match an un-checkpointed pass."""
    from json_schemer_spark.operators.table_constraints import TableConstraints
    from json_schemer_spark.plans.checkpoint import CheckpointedRun

    tc = TableConstraints({"properties": {"o_totalprice": {"maximum": 300000}}})
    unit = F.pmod(F.col("o_orderkey"), F.lit(6))

    def mk():
        return CheckpointedRun(
            spark, str(tmp_path / "ledger"), str(tmp_path / "out"),
            n_units=6, unit_expr=unit,
        )

    s1 = mk().run(tables["orders"], tc.validate, run_id="a", max_units=2)
    assert s1["units_run"] == 2 and s1["skipped_units"] == 0
    assert sorted(mk().pending_units()) == [2, 3, 4, 5]
    s2 = mk().run(tables["orders"], tc.validate, run_id="b")
    assert s2["units_run"] == 4 and s2["skipped_units"] == 2
    led = mk().metrics()
    assert led.count() == 6
    by_run = {r.run_id: r.n for r in
              led.groupBy("run_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_run == {"a": 2, "b": 4}
    assert led.agg(F.sum("n_rows")).collect()[0][0] == tables["orders"].count()


def test_multimodal_plumbing(spark):
    from json_schemer_spark.operators.multimodal import extract_features, synth_media

    media = synth_media(spark, 100)
    feats = extract_features(media, dim=4)
    rows = feats.collect()
    assert len(rows) == 100
    assert all(len(r.features) == 4 and r.decode_ok for r in rows)
    # deterministic: same media → same features
    again = {r.media_id: r.features for r in extract_features(media, dim=4).collect()}
    assert all(again[r.media_id] == r.features for r in rows)


# --- round-2 additions: LSH ANN recall, dedup bucket handling, PSI plan ----

def test_lsh_topk_clustered_recall(spark):
    """Multi-table SRP-LSH achieves high recall where locality exists:
    clustered synthetic embeddings (20 centers, small noise)."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        lsh_topk,
    )

    def h(seed, i, d):
        v = 2166136261
        for ch in f"{seed}:{i}:{d}".encode():
            v = ((v ^ ch) * 16777619) & 0xFFFFFFFF
        return (v / 0xFFFFFFFF) * 2.0 - 1.0

    dim, n_centers, per_center = 16, 20, 20
    rows = []
    for c in range(n_centers):
        center = [h("c", c, d) for d in range(dim)]
        for j in range(per_center):
            vec = [center[d] + 0.05 * h("n", c * 100 + j, d) for d in range(dim)]
            rows.append((c * per_center + j, [float(x) for x in vec]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") % per_center == 0).limit(5)
    exact = brute_force_topk(emb, q, k=10)
    approx = lsh_topk(emb, q, dim, k=10, n_planes=6, probes=1, n_tables=8)
    rec = ann_recall(approx, exact, k=10).agg(F.avg("recall").alias("r")).collect()[0].r
    assert rec >= 0.95, f"clustered recall {rec}"


def test_lsh_topk_hostile_recall_target(spark):
    """Documented target on the near-isotropic sf embeddings: ≥ 0.9 avg."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=10)
    approx = lsh_topk(emb, q, dim=64, k=10, n_planes=4, probes=1, n_tables=16)
    rec = ann_recall(approx, exact, k=10).agg(F.avg("recall").alias("r")).collect()[0].r
    assert rec >= 0.85, f"hostile recall {rec}"


def test_embedding_neardup_lsh_recall(spark):
    """neardup_pairs_lsh recovers the exact-threshold pair set with high
    recall on data that HAS near-dups (clustered, cosine >= 0.95), and
    never emits a false positive (every candidate is exact-verified)."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.similarity import (
        neardup_pairs_exact,
        neardup_pairs_lsh,
    )

    def h(seed, i, d):
        v = 2166136261
        for ch in f"{seed}:{i}:{d}".encode():
            v = ((v ^ ch) * 16777619) & 0xFFFFFFFF
        return (v / 0xFFFFFFFF) * 2.0 - 1.0

    # 30 clusters of 6 near-identical vectors (tiny noise) + 120 isotropic
    # singletons: near-dup pairs exist only inside clusters
    dim, rows = 16, []
    for c in range(30):
        center = [h("c", c, d) for d in range(dim)]
        for j in range(6):
            vec = [center[d] + 0.01 * h("n", c * 10 + j, d) for d in range(dim)]
            rows.append((c * 6 + j, [float(x) for x in vec]))
    for i in range(120):
        rows.append((1000 + i, [float(h("iso", i, d)) for d in range(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r.id_a, r.id_b) for r in neardup_pairs_exact(emb, 0.95).collect()}
    approx = {
        (r.id_a, r.id_b)
        for r in neardup_pairs_lsh(emb, dim, 0.95, n_planes=12, n_tables=8).collect()
    }
    assert exact, "fixture must contain true near-dup pairs"
    assert approx <= exact, "LSH path emitted a non-verified pair"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"near-dup pair recall {recall}"


def test_neardup_exact_arrow_identical_to_jvm(spark):
    """neardup_pairs_exact_arrow (BLAS matmul per Arrow batch — what q29/q33
    ship since r5) returns EXACTLY the JVM nested-loop baseline's pair set
    on the real sf0.001 embeddings at the shipped threshold, and the data
    keeps a wide margin around that threshold so the documented last-ulp
    accumulation-order caveat cannot flip a pair."""
    import numpy as np

    from json_schemer_spark.operators.similarity import (
        neardup_pairs_exact,
        neardup_pairs_exact_arrow,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    jvm = {(r.id_a, r.id_b) for r in neardup_pairs_exact(emb, 0.42).collect()}
    arw = {(r.id_a, r.id_b)
           for r in neardup_pairs_exact_arrow(emb, 0.42).collect()}
    assert jvm, "fixture must contain pairs at the shipped threshold"
    assert arw == jvm

    # threshold-margin guard: nearest cosine to 0.42 on either side
    rows = emb.select("vec_id", "embedding").collect()
    M = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    iu = np.triu_indices(len(rows), k=1)
    margin = np.abs(S[iu] - 0.42).min()
    assert margin > 1e-6, f"threshold margin {margin} too tight for BLAS ulp"


def test_embedding_neardup_identical_vectors_always_found(spark):
    """Identical vectors collide in every SRP table — recall 1.0 by
    construction, even at one table."""
    from json_schemer_spark.operators.similarity import neardup_pairs_lsh

    vec = [float(i % 7 - 3) for i in range(8)]
    other = [float((i * 3) % 5 - 2) for i in range(8)]
    emb = spark.createDataFrame(
        [(1, vec), (2, vec), (3, vec), (4, other)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.id_a, r.id_b)
        for r in neardup_pairs_lsh(emb, 8, 0.999, n_planes=8, n_tables=1).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_dedup_bucket_star_pairs_preserve_connectivity(spark):
    """Oversize buckets emit star pairs instead of silently dropping ids:
    a 120-identical-doc cluster stays fully connected through the head."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.dedup import (
        MAX_BUCKET,
        minhash_lsh_bucket_stats,
        minhash_lsh_candidates,
    )

    n = 120
    docs = spark.createDataFrame(
        [(i, "the same exact document body repeated for spam cluster testing") for i in range(n)]
        + [(1000, "a completely different document about unrelated topics entirely")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(docs, "text", "doc_id").cache()
    ids_in_pairs = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # every spam doc appears in at least one pair — nothing dropped
    assert ids_in_pairs.filter(F.col("id") < 1000).count() == n
    # pair count stays O(cap^2 + n), far below n^2/2 = 7140
    assert pairs.count() <= (MAX_BUCKET * (MAX_BUCKET - 1)) // 2 + n
    stats = minhash_lsh_bucket_stats(docs, "text", "doc_id").collect()[0]
    assert stats.oversize_buckets >= 1
    assert stats.max_bucket == n


def test_psi_plan_has_no_single_partition_window(spark):
    from json_schemer_spark.operators.drift import psi

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = psi(li, "l_extendedprice", ["l_returnflag"], n_buckets=10, lo=0.0, hi=120000.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan or "PartitionBy [1]" not in plan
    assert out.count() > 0


def test_degenerate_bucket_100k_bounded_memory(spark):
    """Round-2 review 'What's wrong #2': a 100k-member degenerate bucket
    (all-identical docs — the boilerplate/empty-doc case in a web crawl)
    must complete WITHOUT materializing the bucket as one array value.
    The pairing runs as a window (spill-safe partition buffer, bounded
    per-row state) — the plan must contain a Window and no whole-bucket
    collect_list aggregation (ObjectHashAggregate)."""
    from json_schemer_spark.operators.dedup import MAX_BUCKET, minhash_lsh_candidates

    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate page body served by every mirror").alias("text"),
    )
    pairs = minhash_lsh_candidates(docs, "text", "doc_id").cache()
    try:
        cap = MAX_BUCKET
        # identical docs → identical signatures → ONE bucket per band:
        # C(cap,2) dense pairs + (n-cap) star pairs, seen in all 16 bands
        expected = cap * (cap - 1) // 2 + (n - cap)
        assert pairs.count() == expected
        assert pairs.agg(F.min("n_bands")).collect()[0][0] == 16
        # connectivity: every doc id appears in at least one pair
        covered = (
            pairs.select(F.col("id_a").alias("id"))
            .unionByName(pairs.select(F.col("id_b").alias("id")))
            .distinct()
            .count()
        )
        assert covered == n
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        assert "ObjectHashAggregate" not in plan, "whole-bucket collect_list is back"
    finally:
        pairs.unpersist()


def test_brute_force_topk_arrow_matches_jvm(spark):
    """The Arrow/numpy exact top-k is the vectorized twin of the JVM HOF
    path: identical (query, neighbor, rank) output on the test embeddings
    (BLAS sum order can flip exact ties at the k-boundary — none exist in
    this data). Cosines agree to single-float precision: the JVM path
    multiplies the float32 inputs BEFORE widening to double, numpy widens
    first."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_arrow,
        sample_queries,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = sample_queries(emb, 10, seed=3)
    jvm = {(r.query_id, r.neighbor_id, r.rank): r.cosine
           for r in brute_force_topk(emb, q, k=8).collect()}
    arw = {(r.query_id, r.neighbor_id, r.rank): r.cosine
           for r in brute_force_topk_arrow(emb, q, k=8).collect()}
    assert jvm.keys() == arw.keys()
    assert all(abs(jvm[k] - arw[k]) < 1e-5 for k in jvm)


def test_dup_clusters_and_keep_representatives(spark):
    """Connected components via iterative min-label propagation: chains,
    pairs and path graphs resolve to min-id clusters; keep-representatives
    drops exactly the non-head members."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.dedup import (
        dedup_keep_representatives,
        dup_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)], "a long, b long")
    got = sorted((r.id, r.cluster_id) for r in dup_clusters(pairs).collect())
    assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20), (23, 20)]

    df = spark.range(30).select(F.col("id").alias("doc_id"))
    kept = sorted(r.doc_id for r in dedup_keep_representatives(df, pairs, "doc_id").collect())
    dropped = {2, 3, 11, 21, 22, 23}
    assert kept == [i for i in range(30) if i not in dropped]


def test_ivf_topk_clustered_recall(spark):
    """IVF (k-means inverted lists + n_probe) achieves high recall where
    locality exists — the partition-based alternative to SRP-LSH. Same
    clustered synthetic data as the LSH test; centroids are deterministic
    (seeded hash-ordered sample, fixed Lloyd iterations)."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_centroids,
        ivf_topk,
    )

    def h(seed, i, d):
        v = 2166136261
        for ch in f"{seed}:{i}:{d}".encode():
            v = ((v ^ ch) * 16777619) & 0xFFFFFFFF
        return (v / 0xFFFFFFFF) * 2.0 - 1.0

    dim, n_centers, per_center = 16, 20, 20
    rows = []
    for c in range(n_centers):
        center = [h("c", c, d) for d in range(dim)]
        for j in range(per_center):
            vec = [center[d] + 0.05 * h("n", c * 100 + j, d) for d in range(dim)]
            rows.append((c * per_center + j, [float(x) for x in vec]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") % per_center == 0).limit(5)
    cents = ivf_centroids(emb, dim, n_centroids=20, sample_n=400, iters=5)
    assert cents == ivf_centroids(emb, dim, n_centroids=20, sample_n=400, iters=5)
    exact = brute_force_topk(emb, q, k=10)
    approx = ivf_topk(emb, q, cents, k=10, n_probe=3)
    rec = ann_recall(approx, exact, k=10).agg(F.avg("recall").alias("r")).collect()[0].r
    assert rec >= 0.95, f"clustered IVF recall {rec}"
    # the probed-list join must stay an equi-join (no cross product)
    p = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_dup_clusters_long_path_pointer_jumping(spark):
    """A diameter-120 path converges in O(log D) rounds via pointer
    jumping (label-of-label adoption) — plain 1-hop propagation would
    exhaust max_iter and the guard would raise rather than return wrong
    clusters silently."""
    from json_schemer_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([(i, i + 1) for i in range(120)], "a long, b long")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs, max_iter=12).collect()}
    assert len(got) == 121 and set(got.values()) == {0}


def test_js_divergence_bounds(spark):
    """JS divergence: 0 for identical distributions, ln 2 for disjoint
    ones (the bounded, symmetric member of the drift family)."""
    import math

    import pyspark.sql.functions as F

    from json_schemer_spark.operators.drift import js_divergence

    same = spark.createDataFrame([("a", float(i % 10)) for i in range(1000)],
                                 "g string, x double")
    out = {r.g: r.js_divergence for r in js_divergence(
        same, "x", ["g"], n_buckets=10, lo=0.0, hi=10.0).collect()}
    assert abs(out["a"]) < 1e-12

    # group "b" disjoint from the reference (= global) — near ln 2 but not
    # exactly: the reference includes b's own mass
    two = spark.createDataFrame(
        [("a", float(i % 5)) for i in range(500)]
        + [("b", 5.0 + float(i % 5)) for i in range(500)],
        "g string, x double")
    out2 = {r.g: r.js_divergence for r in js_divergence(
        two, "x", ["g"], n_buckets=10, lo=0.0, hi=10.0).collect()}
    ref_vs_half = 0.5 * math.log(2) + 0.5 * 0.5 * math.log(0.5 / 0.75) + 0.5 * 0.5 * math.log(1 / 0.75) + 0.5 * 0.5 * math.log(0.5 / 0.75)
    # exact closed form for p=uniform(5)/r=uniform(10): JS = 0.5*ln2 + ... — just
    # assert symmetry and the documented bound instead of re-deriving
    assert abs(out2["a"] - out2["b"]) < 1e-12  # symmetric split
    assert 0 < out2["a"] <= math.log(2) + 1e-12


def test_real_wav_bmp_decode_roundtrip(spark):
    """Rounds 4-5: the multimodal decode path is REAL for pure-stdlib
    formats. Synthesized RIFF/WAVE PCM16, 24-bit BMP and non-interlaced
    8-bit PNG bytes round-trip through their decoders; the Spark
    pipeline's features match a driver-side reference decode exactly;
    non-decodable payloads degrade to decode_ok=False instead of failing
    the batch."""
    from json_schemer_spark.operators.multimodal import (
        bmp_features,
        decode_bmp,
        decode_png,
        decode_wav,
        extract_features_real,
        synth_bmp_bytes,
        synth_media_real,
        synth_png_bytes,
        synth_wav_bytes,
        wav_features,
    )

    rate, samples = decode_wav(synth_wav_bytes(7))
    assert rate == 8000 and len(samples) == 800
    w, h, px = decode_bmp(synth_bmp_bytes(8))
    assert (w, h) == (16, 16) and len(px) == 256
    # PNG carries the SAME hash-gradient pixels as BMP for the same
    # (id, seed) — so the png decode (inflate + all-5-filter unfilter,
    # the synthesizer cycles filter types per scanline) must reproduce
    # the bmp decode exactly
    wp, hp, pxp = decode_png(synth_png_bytes(8, seed="jss-bmp-v1"))
    assert (wp, hp) == (w, h)
    # BMP stores rows bottom-up, so its decode is the generator grid
    # flipped vertically relative to PNG's top-down scanlines — row-flip
    # one side and the pixel payloads must match exactly
    flipped = [px[y * w:(y + 1) * w] for y in range(h)][::-1]
    assert pxp == [p_ for row in flipped for p_ in row]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_wav(b"not audio at all................................")
    with _pytest.raises(ValueError):
        decode_bmp(b"BMgarbage")
    good = synth_png_bytes(3)
    for mutant in [good[:40], b"\x89PNG\r\n\x1a\nXXXXXXXXXXXXXXXXXXXXXXXXXXX",
                   good[:50] + bytes([good[50] ^ 0xFF]) + good[51:]]:
        with _pytest.raises(ValueError):
            decode_png(mutant)
    # round-5 ADVICE: garbage AFTER a complete zlib stream inside IDAT
    # lands in decompressobj.unused_data (not unconsumed_tail) and used to
    # be silently accepted — strict per-row degradation must reject it
    import struct as _struct
    import zlib as _zlib
    pos, trailing = 8, good[:8]
    while pos < len(good):
        (size,) = _struct.unpack_from(">I", good, pos)
        typ = good[pos + 4:pos + 8]
        if typ == b"IDAT":
            body = good[pos + 8:pos + 8 + size] + b"GARBAGE!"
            trailing += (_struct.pack(">I", len(body)) + typ + body
                         + _struct.pack(">I", _zlib.crc32(typ + body) & 0xFFFFFFFF))
        else:
            trailing += good[pos:pos + 12 + size]
        pos += 12 + size
    with _pytest.raises(ValueError):
        decode_png(trailing)

    media = synth_media_real(spark, 21)
    out = {r.media_id: r for r in extract_features_real(media, dim=8).collect()}
    assert len(out) == 21 and all(r.decode_ok for r in out.values())
    # features match a driver-side reference decode bit-for-bit
    from json_schemer_spark.operators.jpeg import decode_jpeg
    from json_schemer_spark.operators.multimodal import synth_jpeg_bytes

    for mid in (0, 1, 2, 3, 6, 13, 19, 20):
        if mid % 4 == 0:
            _, s = decode_wav(synth_wav_bytes(mid, seed="jss-media-real-v1"))
            want = wav_features(s, 8)
        elif mid % 4 == 1:
            ww, hh, pp = decode_bmp(synth_bmp_bytes(mid, seed="jss-media-real-v1"))
            want = bmp_features(ww, hh, pp, 8)
        elif mid % 4 == 2:
            ww, hh, pp = decode_png(synth_png_bytes(mid, seed="jss-media-real-v1"))
            want = bmp_features(ww, hh, pp, 8)
        else:
            ww, hh, pp = decode_jpeg(synth_jpeg_bytes(mid, seed="jss-media-real-v1"))
            want = bmp_features(ww, hh, pp, 8)
        got = list(out[mid].features)
        assert all(abs(a - b) < 1e-6 for a, b in zip(got, want)), mid

    # an unsupported mime in the same batch degrades, not fails
    from json_schemer_spark.operators.multimodal import synth_media
    fake = synth_media(spark, 6)  # payloads are hashes with png/mp4 mimes
    res = extract_features_real(fake, dim=8).collect()
    _assert_degrades(res)


def test_jpeg_codec_roundtrip():
    """Round 5: baseline JPEG is pure-stdlib too (the round-4 'JPEG needs
    PIL' claim was wrong — T.81 SOF0 is just struct + integer math). The
    codec contract is BOUNDED error, not equality (JPEG is lossy):
    flat-color images (DC-only blocks) round-trip within ±2 per channel,
    gradients within 30 dB PSNR; the encoder is deterministic; garbage,
    truncation and unsupported coding modes raise ValueError."""
    import math

    import pytest as _pytest

    from json_schemer_spark.operators.jpeg import decode_jpeg, encode_jpeg

    w = h = 16
    flat = [(200, 100, 50)] * (w * h)
    data = encode_jpeg(w, h, flat)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w2, h2, out = decode_jpeg(data)
    assert (w2, h2) == (w, h)
    assert max(abs(a - b) for p, q in zip(flat, out) for a, b in zip(p, q)) <= 2

    grad = [(x * 255 // 15, y * 255 // 15, (x + y) * 255 // 30)
            for y in range(h) for x in range(w)]
    data = encode_jpeg(w, h, grad)
    assert encode_jpeg(w, h, grad) == data  # deterministic
    _, _, out = decode_jpeg(data)
    errs = [a - b for p, q in zip(grad, out) for a, b in zip(p, q)]
    psnr = 10 * math.log10(255 * 255 / (sum(e * e for e in errs) / len(errs)))
    assert psnr > 30, psnr

    # odd dimensions exercise edge replication on both axes
    px = [(i % 256, (i * 7) % 256, (i * 13) % 256) for i in range(13 * 11)]
    w2, h2, out = decode_jpeg(encode_jpeg(13, 11, px))
    assert (w2, h2, len(out)) == (13, 11, 13 * 11)

    # 4:2:0 — the real-world-dominant layout: 16x16 interleaved MCUs
    # (4 Y + downsampled Cb + Cr), decoder upsamples chroma. Bounds are
    # looser (chroma carries half the resolution): flat stays +-2, the
    # gradient loses ~5 dB to subsampling but stays > 28 dB.
    d420 = encode_jpeg(w, h, flat, subsample="420")
    _, _, out = decode_jpeg(d420)
    assert max(abs(a - b) for p, q in zip(flat, out) for a, b in zip(p, q)) <= 2
    _, _, out = decode_jpeg(encode_jpeg(w, h, grad, subsample="420"))
    errs = [a - b for p, q in zip(grad, out) for a, b in zip(p, q)]
    psnr420 = 10 * math.log10(255 * 255 / (sum(e * e for e in errs) / len(errs)))
    assert psnr420 > 28, psnr420
    # odd dims at 420: MCU (16x16) padding on both axes
    px2 = [(i % 256, (i * 7) % 256, (i * 13) % 256) for i in range(21 * 13)]
    w2, h2, out = decode_jpeg(encode_jpeg(21, 13, px2, subsample="420"))
    assert (w2, h2, len(out)) == (21, 13, 21 * 13)

    # grayscale: single-component SOF + non-interleaved scan; decode
    # replicates luma into (g, g, g), tight bound (no chroma to lose)
    gpx = [(v, v, v) for v in (x * 255 // 15 for y in range(h) for x in range(w))]
    _, _, out = decode_jpeg(encode_jpeg(w, h, gpx, subsample="gray"))
    assert all(r == g == b for r, g, b in out)
    assert max(abs(a - b) for p, q in zip(gpx, out) for a, b in zip(p, q)) <= 2

    # NOTE: JPEG carries no integrity check (unlike PNG's CRC) — a payload
    # bit-flip legally decodes to different pixels, so corruption tests
    # mutate STRUCTURE: missing SOI, truncation mid-headers, a DHT marker
    # rewritten to an unsupported SOF.
    for bad in (b"", b"\x89PNG", data[:30],
                data.replace(b"\xff\xc4", b"\xff\xc5", 1)):
        with _pytest.raises((ValueError, IndexError, KeyError)):
            decode_jpeg(bad)
    # progressive (SOF2) explicitly refused, not mis-decoded
    sof2 = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError):
        decode_jpeg(sof2)


def _assert_degrades(res):
    assert res and all(not r.decode_ok for r in res)


def test_resize_images_stage(spark):
    """The brief's resize op: decode → box-filter resample → lossless PNG
    re-encode in one mapInPandas stage. Downscale means are exact block
    averages (checked against a driver-side reference), the emitted PNGs
    decode back bit-for-bit, and non-image rows degrade instead of
    failing the batch."""
    from json_schemer_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        encode_png,
        resize_images,
        resize_pixels,
        synth_bmp_bytes,
        synth_media_real,
    )

    media = synth_media_real(spark, 16)  # ids %4: wav,bmp,png,jpeg
    out = {r.media_id: r for r in resize_images(media, 8, 8).collect()}
    assert len(out) == 16
    for mid, r in out.items():
        if mid % 4 == 0:  # audio → degraded
            assert not r.resize_ok and r.data is None
        else:
            assert r.resize_ok and (r.width, r.height) == (8, 8)
            w, h, px = decode_png(bytes(r.data))
            assert (w, h, len(px)) == (8, 8, 64)
    # bmp rows: resized pixels equal the driver-side reference resample
    for mid in (1, 5, 13):
        w, h, px = decode_bmp(synth_bmp_bytes(mid, seed="jss-media-real-v1"))
        want = resize_pixels(px, w, h, 8, 8)
        _, _, got = decode_png(bytes(out[mid].data))
        assert got == want, mid
    # round-trip sanity of the general PNG encoder
    assert decode_png(encode_png(2, 1, [(1, 2, 3), (4, 5, 6)]))[2] == \
        [(1, 2, 3), (4, 5, 6)]


def test_mp4_probe_and_media_metadata(spark):
    """Round 5: the MP4 *container* is pure struct — synth_mp4_bytes emits
    genuine ISO BMFF (ftyp/moov/mvhd/tkhd/mdat) and probe_mp4 recovers
    duration/dims/brand exactly; only frame decode remains the declared
    codec stub. probe_media_metadata probes every format in one
    mapInPandas stage, and frame_sample_plan consumes the REAL probed
    durations."""
    import pytest as _pytest

    from json_schemer_spark.operators.multimodal import (
        frame_sample_plan,
        probe_media_metadata,
        probe_mp4,
        synth_media_real,
        synth_mp4_bytes,
    )

    dur, w, h, brand = probe_mp4(synth_mp4_bytes(5))
    assert brand == "isom" and 500 <= dur < 60500 and w >= 16 and h >= 16
    for bad in (b"", b"RIFFnope", synth_mp4_bytes(1)[:40]):
        with _pytest.raises(ValueError):
            probe_mp4(bad)

    media = synth_media_real(spark, 12)

    def vids(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame({
                "media_id": [100 + i for i in ids], "kind": ["video"] * len(ids),
                "mime": ["video/mp4"] * len(ids), "width": [None] * len(ids),
                "height": [None] * len(ids), "duration_ms": [None] * len(ids),
                "data": [synth_mp4_bytes(i) for i in ids]})

    from json_schemer_spark.operators.multimodal import MEDIA_SCHEMA
    allmedia = media.unionByName(spark.range(4).mapInPandas(vids, MEDIA_SCHEMA))
    probed = probe_media_metadata(allmedia)
    rows = {r.media_id: r for r in probed.collect()}
    assert all(r.probe_ok for r in rows.values())
    # images got dims, audio/video got durations — from the actual bytes
    assert all(rows[i].width == 16 for i in range(12) if i % 4 in (1, 2, 3))
    assert all(rows[i].duration_ms == 100 for i in range(12) if i % 4 == 0)
    for i in range(4):
        want, _, _, _ = probe_mp4(synth_mp4_bytes(i))
        assert rows[100 + i].duration_ms == want

    # frame_sample_plan over REAL probed durations: one row per sampled ts
    plan = frame_sample_plan(probed.withColumnRenamed("probe_ok", "ok"),
                             every_ms=10_000)
    got = plan.groupBy("media_id").count().collect()
    for r in got:
        assert r["count"] == rows[r.media_id].duration_ms // 10_000 + 1


def test_hll_sketch_profile_mergeable(spark):
    """Sketches are the artifact: half-profiles union to the whole-table
    answer without rescanning, and dense-regime accuracy stays within the
    documented few-percent band at lg_config_k=12 (1σ ≈ 1.6%)."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.stats import (
        hll_merge_profiles,
        hll_sketch_profile,
    )

    df = spark.range(100_000).select(
        (F.col("id") % 137).alias("low"), F.col("id").alias("high"))
    whole = {r.column: r.estimate for r in hll_sketch_profile(df, ["low", "high"]).collect()}
    assert whole["low"] == 137  # sparse regime: exact
    assert abs(whole["high"] - 100_000) / 100_000 < 0.05

    h1 = hll_sketch_profile(df.filter(F.col("high") < 50_000), ["low", "high"])
    h2 = hll_sketch_profile(df.filter(F.col("high") >= 50_000), ["low", "high"])
    merged = {r.column: r.estimate for r in hll_merge_profiles(h1, h2).collect()}
    assert merged == whole  # union of half-sketches == whole-table sketch

def test_dup_clusters_string_ids(spark):
    """String ids (URLs, content hashes) must cluster correctly: the
    fixpoint signal is xxhash64-based, not sum(cluster_id) — summing raw
    string ids crashes under ANSI mode and silently mis-converges with
    ANSI off for paths of diameter > ~2 (round-4 advice)."""
    from json_schemer_spark.operators.dedup import dup_clusters

    # a diameter-8 path of string ids: only correct iteration converges it
    pairs = spark.createDataFrame(
        [(f"doc{i:02d}", f"doc{i + 1:02d}") for i in range(8)],
        "a string, b string",
    )
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert len(got) == 9 and set(got.values()) == {"doc00"}


def test_srp_signature_nonidentifier_column_name(spark):
    """The SQL-rendered fast path must backtick-quote column names that are
    not plain identifiers (dots, spaces, hyphens) — round-4 advice: they
    previously failed to parse or resolved to the wrong thing."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.similarity import srp_signature

    dim = 8
    rows = [(i, [float((i * 7 + d) % 5) - 2.0 for d in range(dim)]) for i in range(20)]
    base = spark.createDataFrame(rows, ["id", "v"])
    want = sorted(
        (r.id, r.sig)
        for r in base.select(
            "id", srp_signature("v", dim, n_planes=12).alias("sig")
        ).collect()
    )
    for name in ["my col", "emb-vec", "a.b"]:
        df = base.withColumnRenamed("v", name)
        got = sorted(
            (r.id, r.sig)
            for r in df.select(
                "id", srp_signature(name, dim, n_planes=12).alias("sig")
            ).collect()
        )
        assert got == want, name


def test_repetition_features_hand_computed(spark):
    from json_schemer_spark.operators.text import (
        repetition_features,
        repetition_filter,
    )

    docs = [
        # 4 lines, "a b" repeated: dup_line 1/4; the tokenizer crosses
        # newlines, so toks = a,b,a,b,b,c,c,d (8, 4 distinct) dup_word 4/8;
        # 7 bigrams, top "a b" x2 -> 2/7
        (0, "a b\na b\nb c\nc d"),
        # no repeated lines/words; bigrams bridge the newline ("two three")
        (1, "one two\nthree four"),
        # blank/whitespace lines are dropped before the line stats
        (2, "x y\n\n   \nx y"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, ["i", "t"])
    got = {
        r.i: (
            round(r.dup_line_frac, 6),
            round(r.dup_word_frac, 6),
            round(r.top_bigram_frac, 6),
        )
        for r in repetition_features(df, "t").collect()
    }
    assert got[0] == (0.25, 0.5, round(2 / 7, 6))
    assert got[1] == (0.0, 0.0, round(1 / 3, 6))  # each bigram once -> 1/3
    assert got[2] == (0.5, 0.5, round(2 / 3, 6))  # "x y","y x","x y"
    assert got[3] == (0.0, 0.0, 0.0)

    kept = {
        r.i: r.kept
        for r in repetition_filter(
            df, "t", max_dup_line_frac=0.3, max_dup_word_frac=0.4,
            max_top_bigram_frac=0.35,
        ).collect()
    }
    assert kept == {0: False, 1: True, 2: False, 3: True}


def test_decoders_raise_only_valueerror_on_structural_corruption(spark):
    """Review findings (r5): structurally corrupt payloads must degrade the
    ROW, never kill the Spark task. decode_jpeg converts its internal
    KeyError/StopIteration cases to ValueError (missing DHT, SOS naming an
    unknown component, sequential multi-scan files), decode_wav rejects a
    declared zero sample rate (was ZeroDivisionError downstream), and the
    mapInPandas stages degrade all of them."""
    import struct

    import pytest as _pytest

    from json_schemer_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from json_schemer_spark.operators.multimodal import (
        decode_wav,
        extract_features_real,
        probe_media_metadata,
        synth_wav_bytes,
    )

    good = encode_jpeg(16, 16, [(1, 2, 3)] * 256)

    def strip_seg(data, marker):
        out, pos = bytearray(), 0
        while pos < len(data) - 1:
            if data[pos] == 0xFF and data[pos + 1] == marker:
                (ln,) = struct.unpack_from(">H", data, pos + 2)
                pos += 2 + ln
            else:
                out.append(data[pos]); pos += 1
        return bytes(out + data[pos:])

    no_dht = strip_seg(good, 0xC4)
    bad_comp = bytearray(good)
    bad_comp[bad_comp.index(b"\xff\xda") + 5] = 9
    multi = bytearray(good)
    s = multi.index(b"\xff\xda")
    multi[s:s + 14] = b"\xff\xda" + struct.pack(">H", 8) + bytes(
        [1, 1, 0x00, 0, 63, 0])
    for bad in (no_dht, bytes(bad_comp), bytes(multi)):
        with _pytest.raises(ValueError):
            decode_jpeg(bad)

    wav0 = bytearray(synth_wav_bytes(1))
    wav0[24:28] = struct.pack("<I", 0)
    with _pytest.raises(ValueError):
        decode_wav(bytes(wav0))

    # end to end: one batch mixing every corrupt payload degrades per-row
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            payloads = [no_dht, bytes(bad_comp), bytes(multi), bytes(wav0)]
            mimes = ["image/jpeg"] * 3 + ["audio/wav"]
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "kind": ["image"] * 3 + ["audio"],
                "mime": mimes[:n], "width": [None] * n, "height": [None] * n,
                "duration_ms": [None] * n, "data": payloads[:n]})

    from json_schemer_spark.operators.multimodal import MEDIA_SCHEMA
    media = spark.range(4).coalesce(1).mapInPandas(gen, MEDIA_SCHEMA)
    feats = extract_features_real(media, dim=4).collect()
    assert len(feats) == 4 and all(not r.decode_ok for r in feats)
    probed = probe_media_metadata(media).collect()
    assert len(probed) == 4 and all(not r.probe_ok for r in probed)


def test_neardup_exact_arrow_empty_input(spark):
    """Review finding (r5): an empty input table returns an empty pair
    frame (like the JVM twin) instead of a numpy AxisError at plan time."""
    from json_schemer_spark.operators.similarity import neardup_pairs_exact_arrow

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = neardup_pairs_exact_arrow(empty, 0.9)
    assert out.columns == ["id_a", "id_b"] and out.count() == 0


def test_exact_baseline_row_cap_refuses(spark):
    """Round-6 (verdict ask #6): the declared driver-collect baselines
    refuse oversized inputs with a pointer at the bucketed scale paths,
    instead of quietly making the driver the bottleneck at 100x."""
    import pytest as _pytest

    from json_schemer_spark.operators.similarity import (
        brute_force_topk_arrow,
        neardup_pairs_exact_arrow,
    )

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i)) for i in range(4)]).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="neardup_pairs_lsh"):
        neardup_pairs_exact_arrow(emb, 0.9, row_cap=10)
    with _pytest.raises(ValueError, match="bucketed probes"):
        brute_force_topk_arrow(emb, emb, k=3, row_cap=10)
    # at or below the cap both run fine (the guard's limit-scan stops early)
    assert neardup_pairs_exact_arrow(emb, 0.9, row_cap=50).count() >= 0
    assert brute_force_topk_arrow(emb, emb.limit(5), k=3, row_cap=5).count() > 0


def test_mp3_frame_probe_roundtrip(spark):
    """Round-6 (verdict stretch #8): MPEG-1 Layer III frame-header probe —
    synth emits genuine framing (ID3v2 tag + valid headers + exact frame
    lengths), probe recovers duration/rate/bitrate/frame-count, corrupt
    streams raise per the strict degradation contract."""
    import struct as _struct

    import pytest as _pytest

    from json_schemer_spark.operators.multimodal import (
        _MP3_BITRATES_V1L3,
        _MP3_RATES,
        probe_media_metadata,
        probe_mp3,
        synth_mp3_bytes,
    )

    for i in (0, 5, 77):
        data = synth_mp3_bytes(i)
        dur, rate, kbps, n = probe_mp3(data)
        h = 2166136261
        for ch in f"jss-mp3-v1:{i}".encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        assert rate == _MP3_RATES[3][(h >> 4) % 3]
        assert kbps == _MP3_BITRATES_V1L3[1 + h % 14]
        assert n == 4 + (h >> 8) % 40
        assert abs(dur - int(n * 1152 * 1000.0 / rate)) <= 1

    good = synth_mp3_bytes(3)
    for mutant in (b"junk", good[:-3], good[len(good) // 2:]):
        with _pytest.raises(ValueError):
            probe_mp3(mutant)
    free = _struct.pack(">I", 0x7FF << 21 | 3 << 19 | 1 << 17 | 1 << 16)
    with _pytest.raises(ValueError):
        probe_mp3(free + b"\x00" * 100)

    # one-stage probe dispatches audio/mpeg alongside the other containers
    import pandas as pd
    rows = [(int(i), "audio", "audio/mpeg", None, None, None,
             bytearray(synth_mp3_bytes(i))) for i in range(4)]
    rows.append((99, "audio", "audio/mpeg", None, None, None,
                 bytearray(b"definitely not mp3")))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms int, data binary",
    )
    out = {r.media_id: r for r in probe_media_metadata(media).collect()}
    assert all(out[i].probe_ok and out[i].duration_ms > 0 for i in range(4))
    assert out[99].probe_ok is False

def test_aac_adts_probe_roundtrip(spark):
    """Round-6: AAC ADTS frame-header probe — synth emits genuine ADTS
    framing (valid syncwords, 13-bit frame lengths covering their own
    headers, VBR fullness), probe recovers duration/rate/channels/frame
    count, corrupt streams raise per the strict degradation contract."""
    import pytest as _pytest

    from json_schemer_spark.operators.multimodal import (
        _AAC_RATES,
        probe_aac,
        probe_media_metadata,
        synth_aac_bytes,
    )

    for i in (0, 5, 77):
        data = synth_aac_bytes(i)
        dur, rate, channels, n = probe_aac(data)
        h = 2166136261
        for ch in f"jss-aac-v1:{i}".encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        assert rate == _AAC_RATES[3 + h % 6]
        assert channels == 1 + (h >> 4) % 2
        assert n == 4 + (h >> 8) % 40
        assert abs(dur - int(n * 1024 * 1000.0 / rate)) <= 1

    good = synth_aac_bytes(3)
    for mutant in (b"junk", good[:-3], good[len(good) // 2 + 1:]):
        with _pytest.raises(ValueError):
            probe_aac(mutant)
    # reserved sampling-frequency index rejects
    bad = bytearray(good)
    bad[2] = (bad[2] & 0xC3) | (14 << 2)
    with _pytest.raises(ValueError):
        probe_aac(bytes(bad))
    # frame length shorter than its own header rejects
    short = bytearray(good[:7])
    short[3] = short[3] & 0xC0
    short[4] = 0
    short[5] = (3 << 5) | 0x1F
    with _pytest.raises(ValueError):
        probe_aac(bytes(short))

    # one-stage probe dispatches audio/aac alongside the other containers
    rows = [(int(i), "audio", "audio/aac", None, None, None,
             bytearray(synth_aac_bytes(i))) for i in range(4)]
    rows.append((99, "audio", "audio/aac", None, None, None,
                 bytearray(b"definitely not aac")))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms int, data binary",
    )
    out = {r.media_id: r for r in probe_media_metadata(media).collect()}
    assert all(out[i].probe_ok and out[i].duration_ms > 0 for i in range(4))
    assert out[99].probe_ok is False

def test_pii_scrub(spark):
    """Round 6: PII redaction — counts on original text, redaction order
    (emails before IPs before phones), and no Python stage in the plan."""
    from json_schemer_spark.operators.text import pii_scrub

    rows = [
        (1, "write to jane.doe+spam@corp.example.com or bob@x.io today"),
        (2, "server 192.168.1.100 and 10.0.0.1 port 80"),
        (3, "call 555-013-4567 or 555 222 1234 now"),
        (4, "mixed: a@b.co from 8.8.8.8 dials 555-111-2222"),
        (5, "clean text with no identifiers at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in pii_scrub(df, "text").collect()}
    assert (out[1].n_emails, out[1].n_ipv4, out[1].n_phones) == (2, 0, 0)
    assert "<EMAIL>" in out[1].scrubbed and "@" not in out[1].scrubbed
    assert (out[2].n_emails, out[2].n_ipv4, out[2].n_phones) == (0, 2, 0)
    assert out[2].scrubbed == "server <IP> and <IP> port 80"
    assert (out[3].n_emails, out[3].n_ipv4, out[3].n_phones) == (0, 0, 2)
    assert out[3].scrubbed == "call <PHONE> or <PHONE> now"
    assert (out[4].n_emails, out[4].n_ipv4, out[4].n_phones) == (1, 1, 1)
    assert out[4].scrubbed == "mixed: <EMAIL> from <IP> dials <PHONE>"
    assert out[5].scrubbed == rows[4][1]
    assert out[6].scrubbed is None
    plan = pii_scrub(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan


def test_c4_line_features(spark):
    """Round 6: C4 line filters — terminal punctuation + min-words line
    keep, page-level lorem/brace rejection, kept_text projection."""
    from json_schemer_spark.operators.text import c4_line_features

    good = ("the first sentence here has plenty of words inside it.\n"
            "unterminated fragment of text\n"
            "tiny one.\n"
            'a quoted closing line with enough words to survive easily "\n'
            "and one final sentence that also clears the word threshold!")
    lorem = good + "\nsome Lorem Ipsum filler that should reject the page."
    brace = good + "\nvar config = { nested: true };"
    sparse = "only one surviving sentence with enough words right here.\n\nshort."
    df = spark.createDataFrame(
        [(1, good), (2, lorem), (3, brace), (4, sparse), (5, ""), (6, None)],
        "id long, text string")
    out = {r.id: r for r in c4_line_features(df, "text").collect()}
    assert (out[1].n_lines, out[1].n_kept_lines) == (5, 3)
    assert out[1].kept and not out[1].has_lorem_ipsum
    assert out[1].kept_text.count("\n") == 2
    assert "unterminated" not in out[1].kept_text
    assert "tiny one." not in out[1].kept_text
    assert out[2].has_lorem_ipsum and not out[2].kept  # case-insensitive
    assert out[3].has_curly_brace and not out[3].kept
    assert (out[4].n_lines, out[4].n_kept_lines, out[4].kept) == (2, 1, False)
    assert (out[5].n_lines, out[5].kept_line_frac, out[5].kept) == (0, 0.0, False)
    assert out[6].kept is None or out[6].kept is False  # null text degrades
    plan = c4_line_features(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan

def test_vocab_stats(spark):
    """Round 6: vocabulary/IDF table — tf totals, per-document df, and the
    deterministic (tf desc, token) top-k boundary under ties."""
    from json_schemer_spark.operators.text import vocab_stats

    df = spark.createDataFrame(
        [(1, "alpha beta beta gamma"),
         (2, "Alpha  beta\ndelta"),
         (3, "epsilon alpha epsilon zeta"),
         (4, "")],
        "id long, text string")
    rows = vocab_stats(df, "text", "id", k=3).collect()
    assert [(r.token, r.tf, r.df) for r in rows] == [
        ("alpha", 3, 3),   # case-folded across docs
        ("beta", 3, 2),    # tf tie with alpha -> token tie-break
        ("epsilon", 2, 1),
    ]
    # k larger than the vocabulary returns everything
    assert vocab_stats(df, "text", "id", k=100).count() == 6


def test_url_features_normalization(spark):
    """Round 6: URL parse — userinfo/port/trailing-dot/case stripping and
    registered-domain derivation incl. multi-label public suffixes."""
    from json_schemer_spark.operators.web import url_features

    df = spark.createDataFrame(
        [(1, "HTTPS://user:pw@SRC3.Example.COM.:8443/p/2?q=1#f"),
         (2, "http://a.b.docs.example.co.uk/x"),
         (3, "ftp://host"),
         (4, "not a url")],
        "id long, url string")
    rows = {r.id: r for r in url_features(df, "url").collect()}
    assert (rows[1].scheme, rows[1].host, rows[1].registered_domain,
            rows[1].path) == ("https", "src3.example.com", "example.com",
                              "/p/2")
    assert (rows[2].host, rows[2].registered_domain) == (
        "a.b.docs.example.co.uk", "example.co.uk")
    assert (rows[3].host, rows[3].registered_domain) == ("host", "host")
    assert rows[4].scheme is None and rows[4].host == ""


def test_domain_blocklist_filter_and_join_agree(spark):
    """Round 6: the literal-array path and the DataFrame-join path must
    produce identical (blocked, matched_entry); the most specific
    (longest) entry wins; keep_blocked=False filters and drops the
    annotation columns."""
    from json_schemer_spark.operators.web import (
        domain_blocklist_filter, domain_blocklist_join)

    bl = ["src3.example.com", "example.co.uk", "cdn.src5.example.com"]
    df = spark.createDataFrame(
        [(1, "https://cdn.src5.example.com/a"),      # exact host
         (2, "https://x.src3.example.com/b"),        # subdomain
         (3, "https://a.b.docs.example.co.uk/c"),    # multi-label suffix
         (4, "https://example.com/d"),               # unblocked
         (5, "https://notcdn.src5.example.com/e")],  # NOT a suffix match
        "id long, url string")
    lit = {r.id: (r.blocked, r.matched_entry)
           for r in domain_blocklist_filter(df, "url", bl).collect()}
    assert lit == {1: (True, "cdn.src5.example.com"),
                   2: (True, "src3.example.com"),
                   3: (True, "example.co.uk"),
                   4: (False, None),
                   5: (False, None)}
    bl_df = spark.createDataFrame([(e,) for e in bl], ["entry"])
    joined = {r.id: (r.blocked, r.matched_entry)
              for r in domain_blocklist_join(df, "url", bl_df, "id").collect()}
    assert joined == lit
    kept = domain_blocklist_filter(df, "url", bl, keep_blocked=False)
    assert sorted(r.id for r in kept.collect()) == [4, 5]
    assert "blocked" not in kept.columns

    import pytest as _pytest
    with _pytest.raises(ValueError):
        domain_blocklist_filter(df, "url", [" ", ""])


def test_boilerplate_line_filter(spark):
    """Round 6: cross-document line dedup — normalized (lower/trim) match,
    original line order preserved, empty/blank documents survive with
    kept_text=''."""
    from json_schemer_spark.operators.text import boilerplate_line_filter

    df = spark.createDataFrame(
        [(1, "unique one\nSubscribe To Our Newsletter\nbody a"),
         (2, "unique two\nsubscribe to our newsletter \ncookie policy"),
         (3, "cookie policy\nonly here"),
         (4, "subscribe to our newsletter"),
         (5, ""),
         (6, "   \n  ")],
        "doc_id long, page string")
    rows = {r.doc_id: r for r in
            boilerplate_line_filter(df, "page", "doc_id").collect()}
    assert len(rows) == 6
    assert (rows[1].n_lines, rows[1].n_removed,
            rows[1].kept_text) == (3, 1, "unique one\nbody a")
    assert (rows[2].n_lines, rows[2].n_removed,
            rows[2].kept_text) == (3, 2, "unique two")
    assert rows[3].kept_text == "only here"
    assert (rows[4].n_lines, rows[4].n_removed, rows[4].kept_text) == (1, 1, "")
    assert (rows[5].n_lines, rows[5].kept_text) == (0, "")
    assert (rows[6].n_lines, rows[6].kept_text) == (0, "")
    # min_docs=3: only the newsletter line reaches 3 distinct docs (1,2,4);
    # "cookie policy" (2 docs) now survives
    strict = {r.doc_id: r for r in
              boilerplate_line_filter(df, "page", "doc_id",
                                      min_docs=3).collect()}
    assert strict[2].kept_text == "unique two\ncookie policy"
    assert strict[3].n_removed == 0
    assert strict[4].n_removed == 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        boilerplate_line_filter(df, "page", "doc_id", min_docs=0)


def test_word_ngrams(spark):
    """Round 6: sliding word n-grams as a pure Column — lowercased,
    whitespace-tokenized, fewer than n tokens -> empty array."""
    from json_schemer_spark.operators.text import word_ngrams

    df = spark.createDataFrame(
        [(1, "The quick  Brown fox"), (2, "one two"), (3, ""), (4, None)],
        "id long, text string")
    out = {r.id: r.g for r in
           df.select("id", word_ngrams(F.col("text"), 3).alias("g")).collect()}
    assert out[1] == ["the quick brown", "quick brown fox"]
    assert out[2] == []          # shorter than n
    assert out[3] == []
    assert out[4] == []          # null text degrades to empty (when->otherwise)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        word_ngrams(F.col("text"), 0)


def test_ngram_contamination(spark):
    """Round 6: GPT-3-style benchmark decontamination — distinct-gram
    overlap per training doc, short docs survive with zero grams, and
    the benchmark side is a broadcast hash join."""
    from json_schemer_spark.operators.text import ngram_contamination

    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string")
    train = spark.createDataFrame(
        [(1, "alpha beta gamma end"),          # 1 of 2 grams contaminated
         (2, "alpha beta gamma delta"),        # both grams contaminated
         (3, "zeta eta theta iota kappa"),     # clean
         (4, "alpha beta"),                    # < n tokens -> 0 grams
         (5, "beta gamma delta beta gamma delta x")],  # dup grams dedup'd
        "doc_id long, text string")
    res = ngram_contamination(train, bench, "text", "doc_id", n=3)
    rows = {r.doc_id: r for r in res.collect()}
    assert (rows[1].n_grams, rows[1].n_contaminated,
            rows[1].contaminated) == (2, 1, True)
    assert rows[1].contamination_frac == 0.5
    assert (rows[2].n_grams, rows[2].n_contaminated) == (2, 2)
    assert (rows[3].n_grams, rows[3].n_contaminated,
            rows[3].contaminated) == (3, 0, False)
    assert (rows[4].n_grams, rows[4].contamination_frac,
            rows[4].contaminated) == (0, 0.0, False)
    # doc 5: distinct grams = {beta gamma delta, gamma delta beta,
    # delta beta gamma, gamma delta x, delta x? no -- 7 tokens -> 5 grams,
    # distinct 5: bgd, gdb, dbg, bgd(dup), gdx -> 4 distinct; only bgd hits
    assert (rows[5].n_grams, rows[5].n_contaminated) == (4, 1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_hash_sample_deterministic_and_nested(spark):
    """Round 6: md5-threshold sampling — reproducible across runs, nests
    across fractions for the same seed, tracks the target fraction, and
    different seeds select different rows."""
    from json_schemer_spark.operators.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s1 = {r.k for r in hash_sample(df, "k", 0.2, seed="s").collect()}
    s2 = {r.k for r in hash_sample(df, "k", 0.2, seed="s").collect()}
    assert s1 == s2                                   # deterministic
    big = {r.k for r in hash_sample(df, "k", 0.6, seed="s").collect()}
    assert s1 <= big                                  # nested
    assert abs(len(s1) / 2000 - 0.2) < 0.05           # tracks fraction
    assert abs(len(big) / 2000 - 0.6) < 0.05
    other = {r.k for r in hash_sample(df, "k", 0.2, seed="t").collect()}
    assert other != s1                                # seed matters
    assert hash_sample(df, "k", 0.0).count() == 0
    assert hash_sample(df, "k", 1.0).count() == 2000
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_sample(df, "k", 1.5)


def test_stratified_hash_sample(spark):
    """Round 6: per-stratum thresholds fold into one narrow filter — no
    shuffle, no Python; 1.0 keeps the stratum, 0.0 via default drops
    unlisted strata; the kept set is the per-stratum hash_sample."""
    from json_schemer_spark.operators.sampling import (
        hash_sample, stratified_hash_sample)

    df = spark.range(0, 900).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("g"))
    out = stratified_hash_sample(
        df, "k", "g", {"g0": 1.0, "g1": 0.3}, default_fraction=0.0,
        seed="z")
    rows = out.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, set()).add(r.k)
    assert len(by_g.get("g0", ())) == 300             # fraction 1.0
    assert "g2" not in by_g                           # default 0.0
    expect_g1 = {r.k for r in hash_sample(
        df.filter(F.col("g") == "g1"), "k", 0.3, seed="z").collect()}
    assert by_g.get("g1", set()) == expect_g1         # == per-stratum sample
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan                     # one narrow filter
    assert "Python" not in plan and "MapInPandas" not in plan


def test_pack_sequences(spark):
    """Round 6: concat-and-chunk packing — per-group running offsets are
    gap-free, window math matches the token stream, empty docs occupy no
    window, and the plan is one pack_group shuffle with no Python."""
    from json_schemer_spark.operators.packing import pack_sequences

    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 17 == 0, F.lit(""))   # empty docs survive
         .otherwise(F.concat(F.lit("w"), F.repeat(
             F.lit(" tok"), (F.col("id") % 9).cast("int")))).alias("text"))
    out = pack_sequences(docs, "doc_id", "text",
                         ctx_len=16, n_groups=4, seed="p")
    # ties on start_offset are zero-token docs; order them first so the
    # gap-free walk below sees offsets before they advance
    key = lambda r: (r.pack_group, r.start_offset, r.n_tokens, r.doc_id)
    rows = sorted(out.collect(), key=key)
    assert len(rows) == 300
    assert {r.pack_group for r in rows} == {0, 1, 2, 3}
    import itertools
    for _, grp in itertools.groupby(rows, key=lambda r: r.pack_group):
        off = 0
        for r in grp:
            assert r.start_offset == off              # gap-free concat
            off += r.n_tokens
            if r.n_tokens == 0:
                assert (r.seq_first, r.seq_last, r.n_seqs,
                        r.crosses_boundary) == (None, None, 0, False)
            else:
                assert r.seq_first == r.start_offset // 16
                assert r.seq_last == (r.start_offset + r.n_tokens - 1) // 16
                assert r.n_seqs == r.seq_last - r.seq_first + 1
                assert r.crosses_boundary == (r.n_seqs > 1)
    # deterministic: a second run packs identically
    again = sorted(pack_sequences(docs, "doc_id", "text", ctx_len=16,
                                  n_groups=4, seed="p").collect(), key=key)
    assert rows == again
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange") <= 2                # pack_group shuffle only
    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", ctx_len=0)
    with _pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", ctx_len=16, n_groups=0)


def test_budget_mixture_sample(spark):
    """Round 6: token-budget mixture sampling — in-plan fractions hit the
    weighted targets, oversubscribed sources cap at keep-everything, the
    kept set is the per-source hash_sample, and the small side broadcasts."""
    from json_schemer_spark.operators.sampling import (
        budget_mixture_sample, hash_sample)

    df = spark.range(0, 3000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"),
        (F.col("id") % 7 + 1).alias("sz"))
    # totals ~3998/source; W = 2+1+1; budget 6000 -> targets 3000/1500/1500
    out = budget_mixture_sample(df, "k", "src", "sz", 6000.0,
                                weights={"s0": 2.0, "s1": 1.0}, seed="x")
    got = {r.src: r for r in out.groupBy("src").agg(
        F.sum("sz").alias("kept"),
        F.first("keep_fraction").alias("f")).collect()}
    assert abs(got["s0"].f - 6000.0 * 2 / 4 / 3999) < 1e-12
    assert abs(got["s1"].f - 6000.0 * 1 / 4 / 3998) < 1e-12
    for s, target in (("s0", 3000), ("s1", 1500), ("s2", 1500)):
        assert abs(got[s].kept - target) / target < 0.15   # tracks target
    # kept set == per-source hash_sample at the same fraction
    kept_s1 = {r.k for r in out.filter(F.col("src") == "s1").collect()}
    expect_s1 = {r.k for r in hash_sample(
        df.filter(F.col("src") == "s1"), "k", got["s1"].f,
        seed="x").collect()}
    assert kept_s1 == expect_s1
    # oversubscribed: budget >= corpus keeps everything at fraction 1.0
    full = budget_mixture_sample(df, "k", "src", "sz", 1e12, seed="x")
    assert full.count() == 3000
    assert {r.keep_fraction for r in
            full.select("keep_fraction").distinct().collect()} == {1.0}
    assert budget_mixture_sample(df, "k", "src", "sz", 0.0).count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan and "MapInPandas" not in plan
    import pytest as _pytest
    with _pytest.raises(ValueError):
        budget_mixture_sample(df, "k", "src", "sz", -1.0)
    with _pytest.raises(ValueError):
        budget_mixture_sample(df, "k", "src", "sz", 1.0,
                              weights={"s0": -0.5})


def test_dup_span_features(spark):
    """Round 6: ExactSubstr span dedup — hand-computed dup/cross-doc
    counts, short docs emit no row, same-doc repeats are dup but NOT
    cross-doc, and the plan stays all-JVM."""
    from json_schemer_spark.operators.dedup import dup_span_features

    docs = spark.createDataFrame(
        [
            (1, "abcdefgh"),   # spans @1,3,5: abcd cdef efgh
            (2, "abcdxyzw"),   # spans: abcd cdxy xyzw — shares abcd with 1
            (3, "ababab"),     # spans @1,3: abab abab — same-doc dup only
            (4, "zz"),         # too short: no spans, no output row
        ],
        "doc_id int, text string",
    )
    out = dup_span_features(
        docs, "text", "doc_id", span_len=4, stride=2, max_dup_fraction=0.5
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    for d in (1, 2):
        r = rows[d]
        assert (r.n_spans, r.dup_spans, r.cross_doc_dup_spans) == (3, 1, 1)
        assert r.dup_fraction == 0.333333 and r.keep is True
    r3 = rows[3]
    assert (r3.n_spans, r3.dup_spans, r3.cross_doc_dup_spans) == (2, 2, 0)
    assert r3.dup_fraction == 1.0 and r3.keep is False
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan


def test_bm25_topk(spark):
    """Round 6: BM25 retrieval — scores match the Okapi formula computed
    by hand-written Python math, no-match docs are unranked, the top-k
    cut + tie-break are deterministic, and the plan broadcasts the
    df/stats sides with no Python."""
    import math

    from json_schemer_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "durian")],
        "doc_id int, text string",
    )
    out = bm25_topk(docs, "text", "doc_id", ["apple", "banana"], k=2)
    rows = out.collect()
    assert [r.doc_id for r in rows] == [1, 2]

    def idf(n, df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def term(n, df, tf, dl, avgdl, k1=1.2, b=0.75):
        return idf(n, df) * tf * (k1 + 1.0) / (
            tf + k1 * ((1.0 - b) + b * dl / avgdl)
        )

    exp1 = term(3, 1, 2, 3, 2.0) + term(3, 2, 1, 3, 2.0)
    exp2 = term(3, 2, 1, 2, 2.0)
    assert rows[0].n_terms == 2 and abs(rows[0].score - exp1) < 2e-6
    assert rows[1].n_terms == 1 and abs(rows[1].score - exp2) < 2e-6

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
    assert "Broadcast" in plan          # df + stats sides never shuffle
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort

    with pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", [])
    with pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", ["apple"], k=0)


def test_bpe_train(spark):
    """Round 6: BPE merge training — the classic Sennrich walkthrough
    hand-computed (ties break lexicographically, merged symbols re-pair
    in later iterations), early exhaustion returns fewer rows, and
    training is deterministic."""
    from json_schemer_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [("low low low",), ("lower lower",), ("newest",)], "text string"
    )
    out = bpe_train(docs, "text", n_merges=4)
    got = [(r.rank, r.left_sym, r.right_sym, r.pair_count)
           for r in out.orderBy("rank").collect()]
    assert got == [
        (1, "l", "o", 5),      # (l,o) and (o,w) tie at 5: lexicographic
        (2, "lo", "w", 5),     # the merged symbol re-pairs
        (3, "e", "r", 2),      # (e,r) vs (low,e) tie at 2
        (4, "low", "er", 2),
    ]
    again = [(r.rank, r.left_sym, r.right_sym, r.pair_count)
             for r in bpe_train(docs, "text", n_merges=4)
             .orderBy("rank").collect()]
    assert got == again
    # pair exhaustion: single-char words stop training at 0 merges
    single = spark.createDataFrame([("a a b",)], "text string")
    assert bpe_train(single, "text", n_merges=3).count() == 0
    with pytest.raises(ValueError):
        bpe_train(docs, "text", n_merges=0)


def test_numeric_quantiles_matches_percentile(spark):
    """Round 7: numeric_quantiles was rebuilt from a single-reducer
    F.percentile aggregation into parallel order statistics (groupBy
    value + cumulative counts + Spark's own interpolation formula).
    Results must stay BIT-identical to F.percentile — including null
    handling, duplicate-heavy columns, integral-rank positions and the
    empty-input null row."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.stats import numeric_quantiles

    rows = [(float(i % 7), float(i) * 1.37, None if i % 3 == 0 else float(i % 2))
            for i in range(101)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    probs = (0.25, 0.5, 0.75, 0.95)
    got = {r["column"]: tuple(r)[1:]
           for r in numeric_quantiles(df, ["a", "b", "c"], probs).collect()}
    for col in ["a", "b", "c"]:
        exp = tuple(df.agg(*[
            F.percentile(F.col(col), F.lit(p)).alias(f"p{int(p * 100)}")
            for p in probs
        ]).collect()[0])
        assert got[col] == exp, (col, got[col], exp)
    # empty input: one row per column, all-null quantiles (old behavior)
    empty = numeric_quantiles(df.limit(0), ["a", "b"], probs).collect()
    assert len(empty) == 2
    assert all(v is None for r in empty for v in tuple(r)[1:])


def test_bpe_train_batched_matches_sequential(spark):
    """Round 7: bpe_train learns a BATCH of symbol-disjoint merges per
    pair-count pass (one Spark job per batch instead of per merge). The
    learned table must be bit-identical to the one-merge-at-a-time
    recurrence — verified here against a pure-Python sequential
    reference on corpora with tie-breaks, dependent merges (compound
    re-pairing, which forces the batch to stop), and a compound/original
    symbol spelling collision ('ab' exists as a word while (a, b) is
    also a top pair)."""
    import re
    from collections import Counter

    from json_schemer_spark.operators.bpe import bpe_train

    def reference(texts, n_merges):
        words = Counter()
        for t in texts:
            for w in re.split(r"\s+", t.lower()):
                if w:
                    words[w] += 1
        seqs = {w: tuple(w) for w in words}
        merges = []
        for rank in range(1, n_merges + 1):
            counts = Counter()
            for w, syms in seqs.items():
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] += words[w]
            if not counts:
                break
            (l, r), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            merges.append((rank, l, r, cnt))
            for w, syms in seqs.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                seqs[w] = tuple(out)
        return merges

    corpora = [
        ["low low low", "lower lower", "newest"],          # dependent merges
        ["ab ab ab", "a b a b a b a b", "abc"],            # compound collision
        ["xy xy yz yz zx zx", "xyz zyx"],                  # three-way ties
        ["aaaa aa a", "bbbb bb"],                          # self-pairs (runs)
    ]
    for texts in corpora:
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [(r.rank, r.left_sym, r.right_sym, r.pair_count)
               for r in bpe_train(docs, "text", n_merges=6)
               .orderBy("rank").collect()]
        assert got == reference(texts, 6), texts


def test_asof_join(spark):
    """Round 6: backward as-of join — <= tie matching, per-key isolation,
    null for no prior right row, atomic matched-row semantics (a null
    field in the matched row must NOT fall back to an older row), and a
    single-exchange no-Python plan."""
    from json_schemer_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "d")],
        "user int, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 25, None), (3, 1, 999.0)],
        "user int, ts long, value double",
    )
    out = asof_join(left, right, ["user"], "ts", ["value"])
    rows = {(r.user, r.ts): r for r in out.collect()}
    assert len(rows) == 4
    assert (rows[(1, 10)].ts_asof, rows[(1, 10)].value_asof) == (10, 100.0)
    assert (rows[(1, 20)].ts_asof, rows[(1, 20)].value_asof) == (10, 100.0)
    # matched row (ts=25) has a NULL value: must stay NULL, never fall
    # back to ts=10's 100.0
    assert (rows[(1, 30)].ts_asof, rows[(1, 30)].value_asof) == (25, None)
    assert (rows[(2, 5)].ts_asof, rows[(2, 5)].value_asof) == (None, None)
    assert rows[(1, 30)].tag == "c"  # left columns survive intact
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
    # one shuffle on the key (count the AQE final plan only — the
    # toString repeats the exchange in the "Initial Plan" section)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") <= 1


def test_sessionize(spark):
    """Round 6: gap sessionization — hand-built gaps split exactly at
    > gap_seconds, indexes are 0-based per key, and timestamps work in
    both NTZ and tz flavors via interval arithmetic."""
    import datetime as dt

    from json_schemer_spark.operators.temporal import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [("a", at(0)), ("a", at(10)), ("a", at(130)), ("b", at(5))],
        "user string, ts timestamp",
    )
    out = sessionize(df, "user", "ts", gap_seconds=3600)
    got = {(r.user, r.ts.minute + 60 * r.ts.hour): r.session_index
           for r in out.collect()}
    assert got == {("a", 0): 0, ("a", 10): 0, ("a", 130): 1, ("b", 5): 0}
    # exactly-at-gap does NOT split (strict >)
    df2 = spark.createDataFrame(
        [("a", at(0)), ("a", at(60))], "user string, ts timestamp"
    )
    idx = sorted(r.session_index
                 for r in sessionize(df2, "user", "ts", 3600).collect())
    assert idx == [0, 0]
    with pytest.raises(ValueError):
        sessionize(df, "user", "ts", 0)


def test_bpe_encode(spark):
    """Round 6: BPE apply — hand-computed segmentation under a given
    merge list, word boundaries never merge across, and the plan is a
    shuffle-free narrow projection."""
    from json_schemer_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "  "), (3, "olo olo")],
        "doc_id int, text string",
    )
    out = bpe_encode(docs, "text", [("l", "o"), ("lo", "w")])
    rows = {r.doc_id: r for r in out.collect()}
    # low -> [low]; lower -> [low,e,r]; newest -> 6 chars
    assert rows[1].n_symbols == 10
    assert rows[1].segmented == "low low e r n e w e s t"
    assert rows[2].n_symbols == 0 and rows[2].segmented == ""
    # (l,o) inside "olo": leftmost scan hits o,l first (no match), then
    # l,o -> merged; the trailing o of one word never merges with the
    # leading l of the next
    assert rows[3].segmented == "o lo o lo"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_snapshot_diff(spark):
    """Round 6: snapshot diff — added/removed/changed classification,
    unchanged rows dropped, multi-column content hashing with null
    handling, no Python in the plan."""
    from json_schemer_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "id int, txt string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),          # unchanged -> absent from output
         (2, "B", 2.0),          # changed
         (3, "c", 3.0),          # changed (null -> value)
         (5, "e", 5.0)],         # added; 4 removed
        "id int, txt string, v double",
    )
    out = snapshot_diff(old, new, ["id"], ["txt", "v"])
    got = {r.id: r.status for r in out.collect()}
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}
    rows = {r.id: r for r in out.collect()}
    assert rows[5].old_md5 is None and rows[4].new_md5 is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_top_k_per_group(spark):
    """Round 6: per-group top-k — correct cut + deterministic tie-break,
    and the executed plan carries Spark's WindowGroupLimit (the map-side
    partial top-k that keeps shuffle bytes O(groups x k))."""
    from json_schemer_spark.operators.stats import top_k_per_group

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("a", 3, 30), ("a", 4, 20),
         ("b", 5, 1)],
        "grp string, id int, score int",
    )
    out = top_k_per_group(df, ["grp"], "score", 2, tie_col="id")
    got = sorted((r.grp, r.id, r.rank) for r in out.collect())
    # score ties (30, 30) break on id: 2 then 3; 20 misses the cut
    assert got == [("a", 2, 1), ("a", 3, 2), ("b", 5, 1)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan
    with pytest.raises(ValueError):
        top_k_per_group(df, ["grp"], "score", 0)


def test_incremental_revalidate_equals_full_recompute(spark):
    """Round 6 session 6: the ledger-merge algebra — removed keys retired,
    changed keys replaced, unchanged keys NEVER re-validated (the
    validator sees only the delta), and the merged ledger equals a full
    recompute row for row."""
    from json_schemer_spark.operators.diff import incremental_revalidate

    old = spark.createDataFrame(
        [("r1", "a", "good"), ("r1", "b", "bad"), ("r2", "c", "good"),
         ("r2", "d", "good")],
        "repo string, path string, content string",
    )
    new = spark.createDataFrame(
        [("r1", "a", "good"),   # unchanged
         ("r1", "b", "good"),   # changed (bad -> good)
         ("r2", "d", "bad"),    # changed (good -> bad); c removed
         ("r3", "e", "bad")],   # added
        "repo string, path string, content string",
    )
    calls = []

    def validate(df):
        import pyspark.sql.functions as F

        calls.append(sorted(r.path for r in df.select("path").collect()))
        return df.select(
            "repo", "path", (F.col("content") == "good").alias("valid"))

    merged = incremental_revalidate(
        validate(old), old, new, ["repo", "path"], ["content"], validate)
    got = {(r.repo, r.path): r.valid for r in merged.collect()}
    assert got == {("r1", "a"): True, ("r1", "b"): True,
                   ("r2", "d"): False, ("r3", "e"): False}
    # full recompute agrees row for row (the q65 oracle invariant)
    full = {(r.repo, r.path): r.valid for r in validate(new).collect()}
    assert got == full
    # the delta validate() saw ONLY added/changed keys — never unchanged a
    assert calls[1] == ["b", "d", "e"]


def _semdedup_vectors(spark, n_groups=6, n_singles=8, dim=8):
    """Deterministic members with EXACT separation: group g's base is the
    one-hot axis e_g (pairwise cosine 0), each group has 2 scalar
    multiples (within-group cosine exactly 1); singleton s is all-ones
    with -3 at axis s, so singleton-singleton and singleton-group cosines
    are 0 and ≤ 0.25 — far below any sane threshold."""
    rows = []
    for g in range(n_groups):
        base = [1.0 if i == g else 0.0 for i in range(dim)]
        rows.append((g * 10, base))
        rows.append((g * 10 + 1, [x * 1.3 for x in base]))
    for s in range(n_singles):
        v = [1.0] * dim
        v[s] = -3.0
        rows.append((1000 + s, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_keeps_one_per_semantic_cluster(spark):
    """Round 6 session 6: SemDeDup — scalar multiples land in the same
    k-means cell by construction, so every group collapses to its head;
    singletons survive with cluster_size 1."""
    from json_schemer_spark.operators.dedup import semdedup

    df = _semdedup_vectors(spark)
    out = semdedup(df, dim=8, threshold=0.95, id_col="vec_id",
                   vec_col="embedding", n_centroids=4, sample_n=100)
    got = {r.vec_id: r.cluster_size for r in out.collect()}
    assert {k for k in got if k < 1000} == {0, 10, 20, 30, 40, 50}
    assert all(got[k] == 2 for k in got if k < 1000)
    assert all(got[k] == 1 for k in got if k >= 1000)


def test_semdedup_oversized_cell_subdivision_bounds_pairwise(spark):
    """A degenerate cell (every vector identical direction) larger than
    max_cluster_rows subdivides by id hash: the pipeline still returns a
    deterministic keep set, and no emitted pair crosses a sub-cell (the
    documented bounded-memory recall tradeoff)."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.dedup import semdedup, semdedup_pairs

    base = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, [x * (1.0 + 0.01 * i) for x in base]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semdedup_pairs(df, dim=4, threshold=0.99, id_col="vec_id",
                           vec_col="embedding", n_centroids=1, sample_n=50,
                           max_cluster_rows=4)
    # 12 rows in ceil(12/4)=3 sub-cells: every pair stays inside one
    # sub-cell, so pair count is far below the all-pairs 66
    n_pairs = pairs.count()
    assert 0 < n_pairs < 66
    sub = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(3))
    subs = {r.vec_id: r.s for r in df.select(
        "vec_id", sub.alias("s")).collect()}
    for r in pairs.collect():
        assert subs[r.id_a] == subs[r.id_b]
    # composed pipeline stays deterministic end to end
    out1 = sorted(r.vec_id for r in semdedup(
        df, dim=4, threshold=0.99, id_col="vec_id", vec_col="embedding",
        n_centroids=1, sample_n=50, max_cluster_rows=4).collect())
    out2 = sorted(r.vec_id for r in semdedup(
        df, dim=4, threshold=0.99, id_col="vec_id", vec_col="embedding",
        n_centroids=1, sample_n=50, max_cluster_rows=4).collect())
    assert out1 == out2


def test_semdedup_pairs_plan_single_exchange(spark):
    """Plan regression for the round-6 anti-scale fix: cell sizes must
    come from a window riding the ONE groupBy(centroid) exchange, not a
    separate aggregate broadcast-joined back (which re-executed the whole
    Python assignment subtree as the broadcast build side). Executed plan
    must show exactly one shuffle exchange, one MapInPandas assignment
    pass, and no BroadcastExchange — hash(centroid_id) satisfies the
    (centroid_id, __sub) clustering, so FlatMapGroupsInPandas reuses it."""
    import re

    import random

    from json_schemer_spark.operators.dedup import semdedup_pairs

    rng = random.Random(7)
    rows = [(i, [rng.random() for _ in range(8)]) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup_pairs(df, dim=8, threshold=0.9, n_centroids=4,
                         sample_n=128)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"MapInPandas", plan)) == 1
    assert len(re.findall(r"FlatMapGroupsInPandas", plan)) == 1


def test_group_jaccard_pairs_fork_detection_and_df_cap(spark):
    """Round 6 session 6: repo-level set Jaccard — exact score, a<b
    ordering, and the df-cap: an item shared by every group is dropped
    from pairing but still counts in the denominators (so the cap can
    only lower scores, never fabricate a near-dup)."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.dedup import group_jaccard_pairs

    rows = []
    for i in range(10):
        rows.append(("orig", f"h{i}"))
        if i < 9:
            rows.append(("fork", f"h{i}"))  # 9 shared
    rows.append(("fork", "hX"))             # 1 own -> J = 9/11
    for g in ("orig", "fork", "g3", "g4", "g5"):
        rows.append((g, "COMMON"))           # in every group
    df = spark.createDataFrame(rows, "g string, it string")
    out = group_jaccard_pairs(df, "g", "it", threshold=0.5,
                              max_item_groups=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group_a, r.group_b) == ("fork", "orig")
    assert r.shared == 9  # COMMON dropped by the cap (5 groups > 4)
    assert (r.size_a, r.size_b) == (11, 11)  # denominators keep COMMON
    assert r.jaccard == round(9 / 13, 6)
    # without the cap, COMMON pairs all 5 groups and scores change
    uncapped = group_jaccard_pairs(df, "g", "it", threshold=0.0,
                                   max_item_groups=100)
    assert uncapped.count() == 10  # all C(5,2) pairs now share >= 1 item


def test_interval_join_boundaries_no_dups_and_plan(spark):
    """Bucketed range join: half-open [start, end) semantics, an interval
    spanning several buckets matches an event exactly once, and the
    executed plan is an EQUI-join — never BroadcastNestedLoopJoin or a
    cartesian (the whole point of the bucketing rewrite)."""
    import pyspark.sql.functions as F

    from json_schemer_spark.operators.temporal import interval_join

    events = spark.createDataFrame(
        [(1, 100.0), (2, 150.0), (3, 250.0), (4, 0.0), (5, 99.9)],
        "event_id long, t double")
    ivs = spark.createDataFrame(
        [("a", 100.0, 250.0),   # spans buckets 1..2 at width 100
         ("b", 0.0, 100.0),
         ("c", 240.0, 260.0)],
        "name string, s double, e double")
    out = interval_join(events, ivs, "t", "s", "e", bucket_width=100.0)
    got = sorted((r.event_id, r.name) for r in out.collect())
    # t=100 in a (start inclusive) but NOT b (end exclusive); t=250 in c
    # but NOT a; no event matched twice by the multi-bucket interval a
    assert got == [(1, "a"), (2, "a"), (3, "c"), (4, "b"), (5, "b")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_timestamps_and_keys(spark):
    import datetime as dt

    from json_schemer_spark.operators.temporal import interval_join

    T = dt.datetime
    events = spark.createDataFrame(
        [("u1", T(2024, 1, 1, 2, 30), 1), ("u2", T(2024, 1, 1, 2, 30), 2),
         ("u1", T(2024, 1, 1, 5, 0), 3)],
        "user string, ts timestamp, event_id long")
    ivs = spark.createDataFrame(
        [("u1", T(2024, 1, 1, 2, 0), T(2024, 1, 1, 4, 30), "w1"),
         ("u2", T(2024, 1, 1, 3, 0), T(2024, 1, 1, 4, 0), "w2")],
        "user string, ws timestamp, we timestamp, wname string")
    out = interval_join(events, ivs, "ts", "ws", "we",
                        key_cols=["user"], bucket_width=3600.0)
    got = sorted((r.event_id, r.wname) for r in out.collect())
    # u2's 02:30 event is outside w2; the key prevents cross-user matches
    assert got == [(1, "w1")]


def test_interval_join_oversized_span_fails_fast(spark):
    import pytest

    from json_schemer_spark.operators.temporal import interval_join

    events = spark.createDataFrame([(1, 5.0)], "event_id long, t double")
    ivs = spark.createDataFrame([(0.0, 1e9, "huge")],
                                "s double, e double, name string")
    out = interval_join(events, ivs, "t", "s", "e", bucket_width=1.0,
                        max_buckets_per_interval=100)
    with pytest.raises(Exception, match="raise bucket_width"):
        out.collect()


def test_interval_join_rejects_mixed_time_kinds(spark):
    import datetime as dt

    import pytest

    from json_schemer_spark.operators.temporal import interval_join

    events = spark.createDataFrame([(1, 5.0)], "event_id long, t double")
    ivs = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2), "x")],
        "s timestamp, e timestamp, name string")
    with pytest.raises(ValueError, match="all be timestamps or all numeric"):
        interval_join(events, ivs, "t", "s", "e")


def test_pagerank_cycle_fixpoint(spark):
    # On a directed cycle every node has outdeg 1 and one in-edge, so
    # rank = (1-d) + d*rank has the exact fixpoint 1.0 at every
    # iteration count — any deviation means mass is leaking.
    from json_schemer_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iter=7).collect()}
    assert set(got) == {0, 1, 2}
    for v in got.values():
        assert abs(v - 1.0) < 1e-12


def test_pagerank_matches_numpy_reference(spark):
    import numpy as np

    from json_schemer_spark.operators.graph import pagerank

    # deterministic irregular digraph incl. a dangling node (4) and a
    # duplicate edge that must collapse to one dependency
    raw = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (0, 1)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, n_iter=12, damping=0.85).collect()}

    uniq = sorted(set(raw))
    nodes = sorted({u for e in uniq for u in e})
    outdeg = {n: sum(1 for s, _ in uniq if s == n) for n in nodes}
    r = {n: 1.0 for n in nodes}
    for _ in range(12):
        nxt = {}
        for n in nodes:
            m = sum(r[s] / outdeg[s] for s, d in uniq if d == n)
            nxt[n] = 0.15 + 0.85 * m
        r = nxt
    assert set(got) == set(nodes)
    for n in nodes:
        assert got[n] == np.float64(r[n]) or abs(got[n] - r[n]) < 1e-9


def test_pagerank_validates_n_iter(spark):
    import pytest

    from json_schemer_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(edges, n_iter=0)


def test_sliding_window_agg_membership_and_tumbling(spark):
    import datetime as dt

    from json_schemer_spark.operators.temporal import sliding_window_agg

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 0, 10, 0), 10.0),
         (2, dt.datetime(2024, 1, 2, 0, 40, 0), 30.0)],
        "id long, ts timestamp, value double")
    out = sliding_window_agg(
        ev, "ts",
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")],
        window="1 hour", slide="15 minutes").collect()
    got = {(r["window_start"].strftime("%H:%M"), r["n"], r["s"])
           for r in out}
    # row1 (00:10) -> starts 23:15..00:00; row2 (00:40) -> 23:45..00:30;
    # overlap at 23:45 and 00:00 holds both
    assert ("23:45", 2, 40.0) in got and ("00:00", 2, 40.0) in got
    assert ("23:15", 1, 10.0) in got and ("00:30", 1, 30.0) in got
    assert len(out) == 6  # 4 + 4 windows, 2 shared

    # tumbling (window == slide): every row in exactly one window
    t = sliding_window_agg(
        ev, "ts", [F.count(F.lit(1)).alias("n")],
        window="15 minutes", slide="15 minutes").collect()
    assert [(r["window_start"].strftime("%H:%M"), r["n"]) for r in
            sorted(t, key=lambda r: r["window_start"])] == [
        ("00:00", 1), ("00:30", 1)]


def test_sliding_window_agg_keys_plan_and_validation(spark):
    import datetime as dt

    import pytest

    from json_schemer_spark.operators.temporal import sliding_window_agg

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 2, 0, 1, 0), "a", 1.0),
         (dt.datetime(2024, 1, 2, 0, 2, 0), "b", 2.0)],
        "ts timestamp, k string, value double")
    out = sliding_window_agg(
        ev, "ts", [F.count(F.lit(1)).alias("n")],
        window="30 minutes", slide="15 minutes", key_cols=["k"])
    rows = out.collect()
    assert {(r["k"], r["n"]) for r in rows} == {("a", 1), ("b", 1)}
    assert out.columns == ["window_start", "window_end", "k", "n"]
    # window assignment must be the JVM Expand generator, no Python stage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan

    with pytest.raises(ValueError, match="whole multiple"):
        sliding_window_agg(ev, "ts", [F.count(F.lit(1)).alias("n")],
                           window="40 minutes", slide="15 minutes")
    with pytest.raises(ValueError, match="duration"):
        sliding_window_agg(ev, "ts", [F.count(F.lit(1)).alias("n")],
                           window="1h", slide="15 minutes")


def test_weighted_sample_proportional_and_deterministic(spark):
    from json_schemer_spark.operators.sampling import weighted_sample

    # 300 independent groups, each {light: w=1, heavy: w=9}, k=1: the
    # heavy item should win ~90% of groups (exact draw is deterministic
    # for the fixed seed, so this never flakes)
    rows = [(g, g * 2, 1.0) for g in range(300)] + \
           [(g, g * 2 + 1, 9.0) for g in range(300)]
    df = spark.createDataFrame(rows, "grp long, id long, w double")
    out = weighted_sample(df, "id", "w", 1, group_cols=["grp"], seed="t")
    got = out.collect()
    assert len(got) == 300
    heavy_wins = sum(1 for r in got if r["id"] % 2 == 1)
    assert 240 <= heavy_wins <= 295

    again = {(r["grp"], r["id"])
             for r in weighted_sample(df, "id", "w", 1,
                                      group_cols=["grp"], seed="t").collect()}
    assert again == {(r["grp"], r["id"]) for r in got}
    other = {(r["grp"], r["id"])
             for r in weighted_sample(df, "id", "w", 1,
                                      group_cols=["grp"], seed="u").collect()}
    assert other != again


def test_weighted_sample_without_replacement_and_zero_weights(spark):
    from json_schemer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 1.0), (3, 0.0), (4, -2.0)], "id long, w double")
    got = weighted_sample(df, "id", "w", 10).collect()
    ids = sorted(r["id"] for r in got)
    assert ids == [1, 2]  # k > eligible rows -> all eligible, no dups
    assert "__es_key" not in weighted_sample(df, "id", "w", 1).columns


def test_strip_html_blocks_entities_and_whitespace(spark):
    from json_schemer_spark.operators.web import strip_html

    html = ('<HTML><SCRIPT lang="js">var a = "<p>not text</p>";\n'
            'more</SCRIPT><style>p { x: 1 }</style><!-- note\n-->'
            '<h1>A&amp;B</h1>  <p>x &amp;lt; y &nbsp;&quot;z&quot;</p>')
    df = spark.createDataFrame([(html,), ("<p>keep</p><p",)], "h string")
    got = [r["text"] for r in strip_html(df, "h").collect()]
    # script contents (incl. the embedded "<p>" string) are gone entirely;
    # &amp;lt; single-decodes to the literal &lt; (never to "<")
    assert got[0] == 'A&B x &lt; y "z"'
    # malformed trailing "<p" degrades to whitespace, never eats text
    assert got[1] == "keep"


def test_canonicalize_urls_normalizations(spark):
    from json_schemer_spark.operators.web import canonicalize_urls

    urls = [
        "HTTP://User:pw@WWW.Ex.COM.:80/a?z=1&utm_source=t&a=2#frag",
        "https://ex.com:443",
        "https://ex.com:8443/a",
        "http://ex.com:443/a",           # non-default for http: kept
        "https://ex.com/?utm_source=o",  # all params dropped -> no '?'
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["canonical_url"]
           for r in canonicalize_urls(df, "url").collect()]
    assert got[0] == "http://www.ex.com/a?a=2&z=1"
    assert got[1] == "https://ex.com/"
    assert got[2] == "https://ex.com:8443/a"
    assert got[3] == "http://ex.com:443/a"
    assert got[4] == "https://ex.com/"
    assert got[5] is None


def test_write_partitioned_sink_manifest_and_idempotence(spark, tmp_path):
    import os

    from json_schemer_spark.sources.sinks import bucket_of, write_partitioned

    df = spark.createDataFrame(
        [(i, "v%d" % i) for i in range(100)], "k long, v string")
    path = os.path.join(str(tmp_path), "sink")
    m1 = write_partitioned(df, path, "k", 8, seed="t").collect()
    assert sum(r["n_rows"] for r in m1) == 100
    assert all(r["n_files"] >= 1 for r in m1)
    # placement is engine-independent: recompute each row's bucket and
    # compare against the manifest's per-bucket extremes
    placed = df.select("k", bucket_of("k", 8, "t").alias("b")).collect()
    import collections
    per = collections.defaultdict(list)
    for r in placed:
        per[r["b"]].append(r["k"])
    for r in m1:
        assert r["min_key"] == min(per[r["bucket"]])
        assert r["max_key"] == max(per[r["bucket"]])
        assert r["n_rows"] == len(per[r["bucket"]])
    # bucket directories on disk
    dirs = {d for d in os.listdir(path) if d.startswith("bucket=")}
    assert dirs == {"bucket=%d" % b for b in per}
    # idempotent overwrite: second run, identical manifest
    m2 = write_partitioned(df, path, "k", 8, seed="t").collect()
    key = lambda rs: sorted((r["bucket"], r["n_rows"], r["min_key"],
                             r["max_key"]) for r in rs)
    assert key(m1) == key(m2)

    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        write_partitioned(df, path, "k", 0)


def test_key_skew_profile_values_and_salt(spark):
    from json_schemer_spark.operators.stats import key_skew_profile

    # key "hot" carries 60 of 100 rows; fair share at 10 partitions is
    # 10 rows, so hot needs salt 6; "warm" 30 -> salt 3; tail 10x1 -> 1
    rows = ([("hot",)] * 60 + [("warm",)] * 30 +
            [("t%d" % i,) for i in range(10)])
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_profile(df, ["k"], top_k=3, target_partitions=10).collect()
    by_rank = {r["rank"]: r for r in got}
    assert (by_rank[1]["k"], by_rank[1]["n"], by_rank[1]["share_ppm"],
            by_rank[1]["salt"]) == ("hot", 60, 600000, 6)
    assert (by_rank[2]["k"], by_rank[2]["n"], by_rank[2]["salt"]) == (
        "warm", 30, 3)
    assert by_rank[3]["n"] == 1 and by_rank[3]["salt"] == 1
    assert all(r["distinct_keys"] == 12 for r in got)
    # deterministic tie-break among the 10 singleton keys
    assert by_rank[3]["k"] == "t0"

    import pytest

    with pytest.raises(ValueError, match="top_k"):
        key_skew_profile(df, ["k"], top_k=0)
    with pytest.raises(ValueError, match="target_partitions"):
        key_skew_profile(df, ["k"], target_partitions=0)


def test_incremental_dedup_ledger_semantics(spark):
    from json_schemer_spark.operators.dedup import incremental_dedup

    b1 = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa")], "id long, text string")
    k1, led1 = incremental_dedup(b1, None, "text", "id")
    assert sorted(r["id"] for r in k1.collect()) == [1, 2]  # in-batch cut
    assert led1.count() == 2

    # batch 2: "bb" is a ledger dup (dropped without touching batch 1's
    # rows), "cc" appears twice in-batch (lower id kept), "dd" is new
    b2 = spark.createDataFrame(
        [(10, "bb"), (11, "cc"), (12, "cc"), (13, "dd")],
        "id long, text string")
    k2, led2 = incremental_dedup(b2, led1, "text", "id")
    assert sorted(r["id"] for r in k2.collect()) == [11, 13]
    assert led2.count() == 4  # aa bb cc dd

    # retry-idempotence: re-running batch 2 against the PRE-batch ledger
    # reproduces the same kept set
    k2b, _ = incremental_dedup(b2, led1, "text", "id")
    assert sorted(r["id"] for r in k2b.collect()) == [11, 13]
    # and running it against the POST-batch ledger keeps nothing
    k3, _ = incremental_dedup(b2, led2, "text", "id")
    assert k3.count() == 0


def test_write_partitioned_empty_batch_returns_empty_manifest(spark, tmp_path):
    import os

    from json_schemer_spark.sources.sinks import write_partitioned

    df = spark.createDataFrame([], "k long, v string")
    path = os.path.join(str(tmp_path), "empty_sink")
    m = write_partitioned(df, path, "k", 4)
    assert m.count() == 0
    assert m.columns == ["bucket", "n_rows", "min_key", "max_key", "n_files"]


def test_strip_html_unterminated_script_does_not_leak(spark):
    from json_schemer_spark.operators.web import strip_html

    df = spark.createDataFrame(
        [("<p>hi</p><script>var secret = fetch('x'",),
         ("<p>a</p><style>p{color:red",),
         ("<p>b</p><!-- cut off",)],
        "h string")
    got = [r["text"] for r in strip_html(df, "h").collect()]
    assert got == ["hi", "a", "b"]


def test_weighted_sample_preserves_user_rank_column(spark):
    from json_schemer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 2.0, 99), (2, 1.0, 98)], "id long, w double, rank long")
    got = weighted_sample(df, "id", "w", 2).collect()
    assert sorted((r["id"], r["rank"]) for r in got) == [(1, 99), (2, 98)]
