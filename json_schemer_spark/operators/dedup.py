"""Deduplication operators for large-scale training-data pipelines.

All-JVM implementations (Column expressions only — no Python in any hot
path): exact hash dedup, MinHash+LSH banding, SimHash, n-gram Jaccard.

Scale notes (10^12 rows):
- exact: one shuffle on the content hash; AQE-coalesced.
- minhash: signatures are computed in a single projection (shingle →
  hash-array → K affine permutations); banding explodes to B rows/doc
  before one shuffle on (band, band_hash) — candidate pairs only ever
  materialize within a bucket, never the cross product.
- simhash: one projection to a 64-bit signature; near-dup candidates by
  16-bit chunk equality (4 shuffles of doc-id sized rows max).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MERSENNE = (1 << 31) - 1  # 2^31-1, prime; affine-permutation modulus

# pathological-bucket cap: all-pairs are emitted for the first MAX_BUCKET
# members; beyond that, members pair with the bucket head only ("star"
# pairs). Pair count stays O(cap² + n) while every member remains connected
# to the cluster — no silent recall loss (round-1 review: the old
# slice(…, 50) dropped ids unlogged; spam clusters are exactly where dedup
# matters at 100 TB).
MAX_BUCKET = 50


def _salted_rank(banded: DataFrame, keys, cap: int, salt_n: int) -> DataFrame:
    """Pre-rank bucket members in PARALLEL: partition the window by
    (bucket, salt) so a 10^7-member degenerate bucket sorts as ``salt_n``
    independent chunks instead of one task (round-3 review, "What's wrong
    #3"). The salted rank ``__srn`` lower-bounds the global rank (a salt
    group is a subset of its bucket), so:

    - ``__srn > cap``  proves global rank > cap (tail member: star pair);
    - every member with global rank <= cap has ``__srn <= cap`` — the
      survivor set provably contains the true cap smallest.
    """
    from pyspark.sql import Window

    ws = Window.partitionBy(*keys, "__salt").orderBy("__m")
    return (
        banded.withColumn("__salt", F.pmod(F.hash("__m"), F.lit(salt_n)))
        # explicit repartition (not the window's implicit ENSURE_REQUIREMENTS
        # exchange): the tail and survivor branches must hang off ONE
        # exchange subtree. Left implicit, InsertWindowGroupLimit rewrites
        # only the survivor branches' exchange input (partial top-cap), the
        # subtrees stop being identical, and ReuseExchange re-scans — and
        # re-computes the expensive signature projection — for the tail.
        .repartition(*keys, "__salt")
        .select(*keys, "__m", F.row_number().over(ws).alias("__srn"))
    )


def _bucket_pair_rows(banded: DataFrame, keys: Sequence[str], cap: int = MAX_BUCKET,
                      salt_n: int = 64) -> DataFrame:
    """Skew-safe bucket pairing: all-pairs over the ``cap`` smallest members
    of each bucket + star pairs (bucket head, member) for the tail — WITHOUT
    ever materializing a whole bucket, and (round 4) WITHOUT ever sorting a
    whole oversize bucket in one task.

    ``banded`` must carry the bucket key columns ``keys`` plus a ``__m``
    member column (scalar or struct; ordering and pairing are by its value,
    which must be unique within a bucket). Returns (a, b) pairs with a < b
    within dense pairs and a = bucket min for star pairs — identical output
    to collecting each bucket sorted and pairing.

    Plan shape (round-3 review "What's wrong #3" — the round-2/3 version
    windowed EVERY bucket by key, so one degenerate bucket was one task:
    memory-safe via WindowExec's spilling ExternalAppendOnlyUnsafeRowArray,
    but wall-clock-serial at crawl scale):

    1. SALTED pre-rank (:func:`_salted_rank`): one (keys, salt) shuffle;
       every window partition is bounded by ~bucket/salt_n rows. Members
       with ``__srn > cap`` are provably tail members.
    2. Global re-rank of the survivors (<= salt_n x cap rows PER BUCKET, so
       the (keys) window partitions are bounded regardless of bucket size).
       For a small bucket every member survives, so this step alone
       reproduces the round-2/3 semantics exactly. Dense pairs come from
       the bounded next-members frame; survivors ranked past ``cap`` emit
       star pairs with the running-first head.
    3. Tail members join the rank-1 heads (one row per bucket; AQE
       broadcasts when small) and emit star pairs — no window, no sort:
       embarrassingly parallel.

    The union\'s three branches all hang off the SAME two exchange subtrees
    ((keys, salt) pre-rank and (keys) re-rank), so ReuseExchange computes
    the expensive upstream (signature projection + both shuffles) once —
    asserted in tests/test_plans.py.
    """
    from pyspark.sql import Window

    keys = list(keys)
    ranked1 = _salted_rank(banded, keys, cap, salt_n)
    deep = ranked1.filter(F.col("__srn") > cap).select(*keys, "__m")
    cand = ranked1.filter(F.col("__srn") <= cap).select(*keys, "__m")

    w = Window.partitionBy(*keys).orderBy("__m")
    ranked2 = cand.select(
        *keys, "__m",
        F.row_number().over(w).alias("__rn"),
        # running first over ascending order == the bucket head (O(1) state)
        F.first("__m").over(w).alias("__head"),
        # the next cap-1 members: bounded frame, never the whole bucket
        F.collect_list("__m").over(w.rowsBetween(1, cap - 1)).alias("__nxt"),
    )
    rn = F.col("__rn")
    # rows rn < cap emit dense pairs with members rn+1..cap (slice of the
    # bounded frame); rn == cap emits nothing (its pairs were emitted by
    # earlier rows). NULL slices explode to zero rows.
    dense = F.transform(
        F.slice("__nxt", F.lit(1), F.lit(cap) - rn),
        lambda x: F.struct(F.col("__m").alias("a"), x.alias("b")),
    )
    dense_pairs = (
        ranked2.filter(rn < cap)
        .select(F.explode(dense).alias("p"))
        .select("p.a", "p.b")
    )
    stars_edge = ranked2.filter(rn > cap).select(
        F.col("__head").alias("a"), F.col("__m").alias("b")
    )
    heads = ranked2.filter(rn == 1).select(*keys, F.col("__m").alias("__head"))
    # merge-join hint (round 5): the static optimizer estimates the rn==1
    # filter as tiny and BROADCASTS heads — but heads is one row per
    # BUCKET (~one per input row when buckets are mostly singletons), so
    # every run paid a driver collect + build + ship of the whole bucket
    # census (measured: a constant ~5 s driver stall per run at 500 k docs,
    # and an OOM below 4 g driver memory — pure anti-scale, the driver does
    # not grow with the cluster). SMJ is the plan that scales: heads leaves
    # the rank-window already hash-partitioned AND sorted by the bucket
    # keys (no new exchange, no sort), and deep re-shuffles only the
    # oversize-bucket tail (normally ~empty, bounded by the skew the design
    # already handles).
    stars_deep = deep.join(heads.hint("merge"), keys).select(
        F.col("__head").alias("a"), F.col("__m").alias("b")
    )
    return dense_pairs.unionByName(stars_edge).unionByName(stars_deep)


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical documents → (content_hash, dup_count, ids).

    md5 over the raw text; one partial-agg shuffle.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (lowest id) per distinct text. One shuffle."""
    h = F.md5(F.col(text_col)).alias("__h")
    keep = (
        df.select(F.col(id_col).alias("__keep_id"), h)
        .groupBy("__h")
        .agg(F.min("__keep_id").alias("__keep_id"))
    )
    return (
        df.withColumn("__h", F.md5(F.col(text_col)))
        .join(keep, "__h", "inner")
        .filter(F.col(id_col) == F.col("__keep_id"))
        .drop("__h", "__keep_id")
    )


# ---------------------------------------------------------------------------
# character shingles + MinHash
# ---------------------------------------------------------------------------

def _tokens(text):
    """Lowercased whitespace tokens with empties dropped."""
    return F.filter(F.split(F.trim(F.lower(text)), r"\s+"), lambda t: t != "")


def _shingle_hashes_from_tokens(toks, k: int):
    """Distinct xxhash64 values of the k-token shingles of a TOKENS column.

    ``toks`` must be a plain column reference (stage it with a select
    first): the slice inside the per-shingle lambda reads it once per
    shingle, and interpreted HOF evaluation has no CSE — passing the
    tokenizer expression here re-runs split+filter per shingle (measured
    3.5 s of a 4.7 s signature projection on sf0.1 documents)."""
    n_sh = F.greatest(F.size(toks) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n_sh)
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice(toks, i, k))),
        )
    )


def _shingle_hashes(text, k: int):
    """Distinct xxhash64 values of the k-token (word) shingles of ``text``
    (all Column expressions; lowercased, whitespace-tokenized). Word
    shingles keep the set ~5x smaller than character shingles at equal
    dedup quality for natural text. Prefer staging tokens as a column and
    calling :func:`_shingle_hashes_from_tokens` in hot paths."""
    return _shingle_hashes_from_tokens(_tokens(text), k)


def minhash_signature(text, k: int = 5, num_hashes: int = 64):
    """MinHash signature as array<bigint> of length ``num_hashes``.

    One base hash per shingle, then K affine permutations
    h_i(x) = (a_i·x + b_i) mod 2^31-1 — products stay < 2^62, ANSI-safe.
    Seeds are fixed constants → deterministic across runs/partitions.
    Hot paths should stage tokens as a column and use
    :func:`minhash_signature_from_tokens` (see _shingle_hashes_from_tokens
    for why).
    """
    return minhash_signature_from_tokens(_tokens(text), k=k, num_hashes=num_hashes)


def minhash_signature_from_tokens(toks, k: int = 5, num_hashes: int = 64):
    """:func:`minhash_signature` over a staged TOKENS column reference."""
    base = _shingle_hashes_from_tokens(toks, k)
    positive = F.transform(base, lambda h: F.pmod(h, F.lit(_MERSENNE)))

    # ONE pass over the shingle set: per shingle, produce all K permuted
    # hashes at once (zip_with over the coefficient arrays), fold with
    # element-wise least. 64 separate array_min(transform(...)) passes were
    # measured ~15x slower (each re-walks the shingle array interpreted).
    # The coefficient arrays ride INSIDE the accumulator struct: HOF
    # evaluation has no CSE, so referencing the array-literal expressions
    # from the lambda would rebuild them (128 literal casts + 2 allocs) per
    # shingle — as bound accumulator fields they are built once and carried
    # by reference (measured ~2x on the signature projection).
    a_arr = F.array(
        *[F.lit((2 * _stable_int(f"a{i}") + 1) % _MERSENNE).cast("long") for i in range(num_hashes)]
    )
    b_arr = F.array(
        *[F.lit(_stable_int(f"b{i}") % _MERSENNE).cast("long") for i in range(num_hashes)]
    )
    init = F.struct(
        F.array_repeat(F.lit(_MERSENNE).cast("long"), num_hashes).alias("m"),
        a_arr.alias("a"),
        b_arr.alias("b"),
    )

    def fold(acc, h):
        permuted = F.zip_with(
            acc["a"], acc["b"], lambda a, b: F.pmod(h * a + b, F.lit(_MERSENNE))
        )
        return F.struct(
            F.zip_with(acc["m"], permuted, lambda x, y: F.least(x, y)).alias("m"),
            acc["a"].alias("a"),
            acc["b"].alias("b"),
        )

    return F.aggregate(positive, init, fold, lambda acc: acc["m"])


def _stable_int(seed: str) -> int:
    """Deterministic 31-bit int from a string seed (FNV-1a, driver-side)."""
    h = 2166136261
    for ch in seed.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h & 0x7FFFFFFF


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding → (id_a, id_b, n_bands).

    rows/band = num_hashes/bands. Pipeline: signature projection →
    posexplode to B band rows → one shuffle+sort on (band, hash(band
    slice)) → windowed in-bucket pairing (:func:`_bucket_pair_rows`,
    spill-safe even for degenerate mega-buckets). Jaccard-verify with
    :func:`jaccard_pairs`.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signature_from_tokens(F.col("__toks"), k=k, num_hashes=num_hashes)
    banded = (
        df.select(F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__toks"))
        .select("id", sig.alias("sig"))
        .select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.xxhash64(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band).cast("string")
                    ),
                )
            ).alias("band", "band_hash"),
        )
    )
    pairs = _bucket_pair_rows(
        banded.select("band", "band_hash", F.col("id").alias("__m")),
        ["band", "band_hash"],
    ).select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    return pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_bands"))


def minhash_lsh_bucket_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Bucket-size accounting for the LSH shuffle (round-1 review action):
    (n_buckets, oversize_buckets, max_bucket, rows_in_oversize). An
    oversize bucket (> MAX_BUCKET members) switches from all-pairs to
    star-pairs — this metric makes that visible instead of silent."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signature_from_tokens(F.col("__toks"), k=k, num_hashes=num_hashes)
    banded = df.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__toks")
    ).select("id", sig.alias("sig")).select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band).cast("string")
                ),
            )
        ).alias("band", "band_hash"),
    )
    sizes = banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("n") > MAX_BUCKET).cast("long")).alias("oversize_buckets"),
        F.max("n").alias("max_bucket"),
        F.sum(F.when(F.col("n") > MAX_BUCKET, F.col("n")).otherwise(0)).alias("rows_in_oversize"),
    )


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str, id_col: str, k: int = 5
) -> DataFrame:
    """Exact k-shingle Jaccard for candidate pairs → (id_a, id_b, jaccard).

    Two broadcast-or-shuffle joins to attach shingle sets, then pure array
    algebra. Run on LSH candidates only — never on the cross product.
    """
    sh = df.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__toks")
    ).select("id", _shingle_hashes_from_tokens(F.col("__toks"), k).alias("sh"))
    a = sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a")
    b = sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b")
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return joined.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text):
    """64-bit SimHash over whitespace tokens — all JVM, SWAR accumulator.
    (Round-3 ADVICE: the former ``n_bits`` parameter is gone — the packed
    accumulator is specialized to 64 bits and a non-64 argument could only
    assert; width is now part of the contract.)

    Measured 2.2x faster than the naive 64-long counter fold (sf0.1
    documents, min-of-4: 1.5 s vs 3.3 s) and the generated code shrinks
    the multi-MiB task binaries the unrolled form produced. Three ideas:

    1. SWAR bit-spread: per token, byte i of the hash expands to 8
       one-valued 8-bit lanes in ~7 integer ops (broadcast multiply +
       diagonal mask + byte-nonzero normalization) instead of 8 separate
       shift/mask/or chains — HOF lambdas evaluate interpreted, so
       expression count per token matters.
    2. Blocked lanes: tokens fold in blocks of 127 so an 8-bit lane can
       never overflow (max count 127 < 256, no cross-lane carry); block
       counters unpack-add into full-width per-bit totals — NO
       document-length cap.
    3. Bound reassembly: the final 64 threshold tests run inside an
       aggregate over a single-element array binding (counters, n) —
       expression-tree references have no CSE outside codegen, so naming
       the values once avoids re-evaluating pipeline chunks per bit
       (this alone was the bulk of the win).

    Output is bit-identical to the naive form: bit b is set iff
    2*count_b(set) > n_tokens, i.e. the +-1 counter is strictly positive.
    """
    tokens = F.split(F.trim(F.lower(text)), r"\s+")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    blk = 127  # max tokens per block: 8-bit lane holds counts <= 127

    zero8 = F.array_repeat(F.lit(0).cast("long"), 8)

    # SWAR bit-spread: byte i of h → 8 one-valued 8-bit lanes in 5 int ops
    # (vs 8 shift+AND+OR per bit): broadcast the byte to all 8 byte lanes
    # with a 0x0101..01 multiply (no carries — operands are byte-disjoint),
    # keep bit k in byte k via the diagonal mask, then normalize each byte
    # to 0/1 with the no-carry byte-nonzero trick (y_k ≤ 0x80, so +0x7F
    # never carries across a byte; arithmetic sign-extension from the >>7
    # is erased by the final & 0x0101..01).
    BCAST = 0x0101010101010101
    # broadcast multiplier for byte lanes 0-6 only: b * 0x0101..01 would
    # need wrapping 64-bit semantics, but ANSI long multiply THROWS on
    # overflow (b ≥ 0x80 puts b<<56 past 2^63); lane 7 goes via shiftleft,
    # which wraps silently by contract
    BCAST7 = 0x0001010101010101
    DIAG = 0x8040201008040201 - (1 << 64)  # signed-long bit pattern
    SEVENF = 0x7F7F7F7F7F7F7F7F

    def fold8(acc, h):
        longs = []
        for i in range(8):
            b = (F.shiftright(h, 8 * i) if i else h).bitwiseAND(F.lit(0xFF).cast("long"))
            m = (b * F.lit(BCAST7)).bitwiseOR(F.shiftleft(b, 56))
            y = m.bitwiseAND(F.lit(DIAG))
            ones = (
                F.shiftright(y.bitwiseOR(y + F.lit(SEVENF)), 7)
                .bitwiseAND(F.lit(BCAST))
            )
            longs.append(ones)
        return F.zip_with(acc, F.array(*longs), lambda x, y: x + y)

    # count via `tokens`, NOT `hashes`: interpreted HOF evaluation has no
    # common-subexpression reuse, so each reference to `hashes` re-runs the
    # whole per-token xxhash64 transform (measured +~1s/5k docs per ref)
    n_tokens = F.size(tokens)
    n_blocks = F.greatest(F.ceil(n_tokens / F.lit(blk)).cast("int"), F.lit(1))
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda b: F.aggregate(F.slice(hashes, b * blk + 1, blk), zero8, fold8),
    )

    zero64 = F.array_repeat(F.lit(0).cast("long"), 64)

    def unpack_add(acc, packed):
        per_bit = F.array(
            *[
                F.shiftright(F.element_at(packed, b // 8 + 1), 8 * (b % 8))
                .bitwiseAND(F.lit(0xFF))
                for b in range(64)
            ]
        )
        return F.zip_with(acc, per_bit, lambda x, y: x + y)

    counters = F.aggregate(blocks, zero64, unpack_add)  # per-bit set counts

    # Reassembly referencing `counters` 64 times re-evaluates chunks of the
    # whole pipeline per reference (no CSE outside codegen — measured 2.2x
    # slower). Binding (counters, n) once as a single array element makes
    # every lambda-variable access O(1) on the materialized values.
    from functools import reduce

    pows = [(1 << b) if b < 63 else (1 << 63) - (1 << 64) for b in range(64)]
    bound = F.array(
        F.struct(counters.alias("c"), n_tokens.cast("long").alias("n"))
    )
    return F.aggregate(
        bound,
        F.lit(0).cast("long"),
        lambda acc, s: acc.bitwiseOR(
            reduce(
                lambda a, b2: a.bitwiseOR(b2),
                [
                    F.when(
                        F.element_at(s["c"], b + 1) * 2 > s["n"],
                        F.lit(pows[b]).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                    for b in range(64)
                ],
            )
        ),
    )


def simhash_candidates(df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on each of 4 16-bit chunks (any
    pair within Hamming<=3 shares at least one chunk), then verify with
    ``bit_count(xor) <= max_hamming``.
    """
    sigs = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sig"))
    chunks = sigs.select(
        "id", "sig",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("sig"), 16 * c).bitwiseAND(F.lit(0xFFFF)) for c in range(4)
            ])
        ).alias("chunk", "chunk_val"),
    )
    pairs = _bucket_pair_rows(
        chunks.select("chunk", "chunk_val", F.struct("id", "sig").alias("__m")),
        ["chunk", "chunk_val"],
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
    )
    return (
        pairs.filter(F.col("hamming") <= max_hamming)
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over duplicate/near-duplicate pairs →
    ``(id, cluster_id)`` with ``cluster_id`` = the smallest id reachable —
    the step between pairwise candidates and keep-one-per-cluster dedup.

    Iterative min-label propagation WITH pointer jumping: each round every
    vertex takes the min of (its own label, its neighbours' labels, the
    label OF its label) — the self-join jump doubles the propagation radius
    per round, so a diameter-D component converges in O(log D) rounds (cf.
    the hash-to-min family in Kiveris et al., "Connected Components in
    MapReduce and Beyond"). The pair graphs :func:`_bucket_pair_rows` emits
    are diameter ≤ ~2 (dense core + head-centred stars) and converge in
    2-3 rounds; arbitrary pair sources (a 120-edge path in the tests) stay
    correct because of the jump, and a genuinely non-converged run RAISES
    instead of returning wrong clusters. Each round is two equi-joins + one
    partial-aggregated groupBy; lineage is truncated per round with
    ``localCheckpoint`` so the plan does not grow with iterations. The
    fixpoint signal is TYPE-AGNOSTIC (round-4 advice: summing raw ids
    crashes under ANSI for string ids and silently mis-converges with ANSI
    off): per round one scalar action sums ``xxhash64(id, cluster_id)``
    over the label table — any label change changes the sum with
    overwhelming probability — and an unchanged sum is then CONFIRMED by a
    changed-row count join against the previous round's labels before
    declaring convergence, so a hash collision can delay detection by a
    round but can never produce wrong clusters.
    """
    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = (
        edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Round 7: seed labels with min(self, direct neighbours) — exactly
    # what the old identity-seeded loop computed in its FIRST round, for
    # the cost of the same one aggregation over the symmetrized edge
    # list (every node appears as u) and none of the round's checkpoint +
    # fixpoint-probe driver latency. The fixpoint (min reachable id) is
    # unchanged; components of diameter ≤ 2 — the _bucket_pair_rows
    # shape — now converge one blocking round earlier.
    labels = (
        edges.groupBy(F.col("u").alias("id"))
        .agg(F.min("v").alias("__mn"))
        .select("id", F.least(F.col("id"), F.col("__mn")).alias("cluster_id"))
    )
    prev_sum = None
    prev_labels = None
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["v"] == labels["id"])
            .select(edges["u"].alias("id"), "cluster_id")
        )
        # pointer jumping: also adopt the label OF my label (self-join) —
        # turns the per-round propagation radius from +1 hop into doubling,
        # so a diameter-D component converges in O(log D) rounds instead of
        # O(D) (a 60-node path would otherwise exhaust max_iter and return
        # wrong clusters SILENTLY)
        l2 = labels.select(F.col("id").alias("__lid"), F.col("cluster_id").alias("__l2"))
        jump = (
            labels.join(l2, labels["cluster_id"] == l2["__lid"])
            .select("id", F.col("__l2").alias("cluster_id"))
        )
        labels = (
            labels.unionByName(nbr).unionByName(jump)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        # type-agnostic fixpoint signal: works for string/struct ids where
        # sum(cluster_id) would crash (ANSI) or be NULL==NULL-"converged"
        # decimal(38,0) sum: a long sum of 64-bit hashes overflows (ANSI
        # raises); decimal headroom covers ~1e19 rows
        cur = labels.agg(
            F.sum(F.xxhash64("id", "cluster_id").cast("decimal(38,0)")).alias("s")
        ).collect()[0].s
        if cur == prev_sum and prev_labels is not None:
            # confirm: a hash-sum collision must not declare convergence —
            # count rows whose label actually changed since last round
            changed = (
                labels.alias("n")
                .join(prev_labels.alias("p"), F.col("n.id") == F.col("p.id"))
                .filter(F.col("n.cluster_id") != F.col("p.cluster_id"))
                .limit(1)
                .count()
            )
            if changed == 0:
                converged = True
                break
        prev_sum = cur
        prev_labels = labels
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds — "
            "raise max_iter (components of diameter up to 2^max_iter converge)"
        )
    return labels


def dedup_keep_representatives(
    df: DataFrame,
    pairs: DataFrame = None,
    id_col: str = None,
    a_col: str = "a",
    b_col: str = "b",
    clusters: DataFrame = None,
) -> DataFrame:
    """Keep ONE row per near-duplicate cluster (the cluster head = smallest
    id) plus every row that appears in no pair — the end-to-end "dedup this
    corpus" operation over any candidate-pair source (exact, MinHash LSH,
    SimHash, embedding near-dup). Pass ``clusters`` (a precomputed
    ``dup_clusters`` result) to reuse an existing clustering pass —
    :func:`neardup_dedup_lsh` composes this way so the keep-one rule lives
    in exactly one place."""
    if clusters is None:
        clusters = dup_clusters(pairs, a_col=a_col, b_col=b_col)
    drop = clusters.filter(F.col("id") != F.col("cluster_id")).select("id")
    return df.join(drop, df[id_col] == drop["id"], "left_anti")


def neardup_dedup_lsh(
    df: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 8,
) -> DataFrame:
    """The composed SCALE-path dedup pipeline (round-4 review ask #3):
    SRP-LSH candidate pairs → exact cosine verify → connected-component
    clustering → keep one representative per cluster, in ONE clustering
    pass (the single ``dup_clusters`` result feeds both the keep-one rule
    — via ``dedup_keep_representatives(clusters=...)`` — and the
    cluster-size annotation).

    Returns the kept rows of ``df`` (cluster heads = smallest id, plus all
    singletons) with an appended ``cluster_size`` column (1 for
    singletons). This — not the O(n²) exact baseline
    :func:`~json_schemer_spark.operators.similarity.neardup_pairs_exact` —
    is what runs at corpus scale: candidate generation is bucketed
    (equi-join shuffles on (table, signature) keys only), verification
    touches candidates only, clustering is O(log D) rounds of equi-joins,
    and the final keep-one is a pair of joins against the (small) non-head
    and head-size sides.
    """
    from json_schemer_spark.operators.similarity import neardup_pairs_lsh

    pairs = neardup_pairs_lsh(
        df, dim, threshold, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables,
    )
    clusters = dup_clusters(pairs, a_col="id_a", b_col="id_b")
    return _keep_with_cluster_size(df, id_col, clusters)


def dup_span_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span_len: int = 64,
    stride: int = 16,
    max_dup_fraction: float = 0.5,
) -> DataFrame:
    """Exact duplicated-SPAN detection — the substring-level dedup signal
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", the ExactSubstr pass), re-expressed for Spark: instead of a
    global suffix array (inherently sequential to build), every document
    emits its fixed-length character spans at ``stride`` offsets, a span
    is *duplicated* when its content occurs >= 2 times anywhere in the
    corpus, and each document is scored by the fraction of its spans that
    are duplicated. Complements the document-level family above (exact /
    MinHash / SimHash): a doc that is 40% copy-pasted license header +
    60% unique code is untouched by whole-doc dedup but lights up here.

    Returns one row per document with >= 1 span (``length(text) >=
    span_len``; shorter docs have no span signal by contract):
    ``(id, n_spans, dup_spans, cross_doc_dup_spans, dup_fraction, keep)``
    where ``cross_doc_dup_spans`` counts spans seen in >= 2 *distinct*
    documents (a stricter signal: same-doc repetition is the
    repetition-filter family's job) and ``keep = dup_fraction <=
    max_dup_fraction`` on the un-rounded ratio.

    Plan shape (all-JVM, no Python anywhere):
      1. one projection: ``sequence(1, len-L+1, stride)`` -> explode ->
         ``xxhash64(substr(text, pos, L))`` — spans leave the scan as
         (id, 8-byte hash) rows, ~len/stride per doc; ``stride`` is the
         knob that bounds the blow-up (stride = L/4 here; stride = 1
         recovers the full suffix-array signal at L x the shuffle).
      2. ONE partial-aggregated shuffle on the span hash: groupBy(h) ->
         (count, distinct docs), then ``HAVING count > 1`` — map-side
         combine collapses hot spans (the boilerplate header that appears
         10^7 times ships once per map task, not 10^7 times), and the
         filter means only *duplicated* hashes flow into the join, a far
         smaller side than the span stream.
      3. one shuffle join spans-vs-duplicated-hashes (left), AQE
         skew-split if one hash still dominates, then one partial-agged
         hash aggregation back to a row per document.
    At 10^12 docs nothing here is driver-side or all-pairs; collisions in
    the 64-bit span hash are the standard, quantifiable trade (~n^2/2^65).
    """
    text = F.col(text_col)
    spans = (
        df.where(F.length(text) >= span_len)
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.length(text) - F.lit(span_len - 1),
                    F.lit(stride),
                )
            ).alias("__pos"),
            text.alias("__t"),
        )
        .select(
            F.col(id_col),
            F.xxhash64(
                F.col("__t").substr(F.col("__pos"), F.lit(span_len))
            ).alias("__h"),
        )
    )
    dup_hashes = (
        spans.groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.count_distinct(F.col(id_col)).alias("__docs"),
        )
        .where(F.col("__c") > 1)
    )
    flagged = spans.join(dup_hashes, "__h", "left")
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("__c") > 1, 1).otherwise(0)).alias("dup_spans"),
        F.sum(F.when(F.col("__docs") > 1, 1).otherwise(0)).alias(
            "cross_doc_dup_spans"
        ),
    )
    ratio = F.col("dup_spans") / F.col("n_spans")
    return per_doc.select(
        F.col(id_col),
        F.col("n_spans"),
        F.col("dup_spans"),
        F.col("cross_doc_dup_spans"),
        F.round(ratio, 6).alias("dup_fraction"),
        (ratio <= F.lit(max_dup_fraction)).alias("keep"),
    )


def semdedup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_n: int = 2048,
    max_cluster_rows: int = 200_000,
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al. 2023, "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication"):
    k-means-cluster the embeddings, then compare pairwise ONLY within each
    cluster — the published recipe that prunes the O(n²) all-pairs matrix
    to O(Σ m_c²) per-cell work (≈ n²/k for balanced cells), which is what
    makes embedding dedup feasible at 10^12 files.

    Plan shape: centroid training reads a seeded ``sample_n`` sample once
    (driver-side Lloyd, deterministic — same contract as
    :func:`~json_schemer_spark.operators.similarity.ivf_centroids`);
    assignment is one Arrow-batched matmul map; the pairwise stage is ONE
    groupBy(centroid) exchange into per-cell ``applyInPandas`` numpy
    matmuls. Cell sizes come from a ``count() OVER (PARTITION BY
    centroid_id)`` window riding that same exchange — NOT a separate
    aggregate + broadcast join, which would re-execute the whole
    scan→assignment subtree as the broadcast build side (the Python
    assignment pass would run twice per action); the window buffer is
    spillable, and the follow-on groupBy(centroid_id, __sub) reuses the
    centroid_id hash partitioning (a subset of the clustering keys), so
    the full plan is exactly one exchange and one Python assignment pass.
    A degenerate cell larger than ``max_cluster_rows`` is
    subdivided by id hash into ⌈m/cap⌉ sub-cells (pairs only within a
    sub-cell — bounded task memory at a documented recall cost on cells
    that big; the paper's ε-ball extraction has the same locality
    tradeoff). Emits ``(id_a, id_b, cosine)`` with id_a < id_b and
    cosine >= threshold — exact cosine, so within-cell results carry no
    approximation at all.
    """
    import numpy as np
    from pyspark.sql import Window

    from .similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(
        df, dim=dim, n_centroids=n_centroids, sample_n=sample_n,
        id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(df, cents, id_col=id_col, vec_col=vec_col, n_probe=1)
    csz = F.count(F.lit(1)).over(Window.partitionBy("centroid_id"))
    n_sub = F.ceil(csz / F.lit(max_cluster_rows)).cast("long")
    assigned = assigned.withColumn(
        "__sub", F.pmod(F.xxhash64(F.col(id_col)), n_sub))

    def cell_pairs(pdf):
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"})
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        V = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = Vn @ Vn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = S[iu, ju] >= threshold
        return pd.DataFrame({
            "id_a": ids[iu[keep]],
            "id_b": ids[ju[keep]],
            "cosine": np.round(S[iu[keep], ju[keep]], 6),
        })

    return assigned.groupBy("centroid_id", "__sub").applyInPandas(
        cell_pairs, "id_a long, id_b long, cosine double")


def _keep_with_cluster_size(
    df: DataFrame, id_col: str, clusters: DataFrame
) -> DataFrame:
    """Shared tail of the composed dedup pipelines: keep heads+singletons
    (smallest id per component) and annotate the kept rows with their
    cluster size (1 for singletons). ONE clustering pass feeds both."""
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    kept = dedup_keep_representatives(df, id_col=id_col, clusters=clusters)
    heads = sizes.withColumnRenamed("cluster_id", "__head")
    return (
        kept.join(heads, kept[id_col] == heads["__head"], "left")
        .withColumn(
            "cluster_size",
            F.coalesce(F.col("cluster_size"), F.lit(1).cast("long")))
        .drop("__head")
    )


def semdedup(
    df: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_n: int = 2048,
    max_cluster_rows: int = 200_000,
) -> DataFrame:
    """The composed SemDeDup pipeline: k-means cells → within-cell exact
    cosine pairs (:func:`semdedup_pairs`) → connected components
    (:func:`dup_clusters`) → keep one representative per cluster with
    cluster-size accounting — the cluster-partitioned alternative to the
    SRP-LSH scale path (:func:`neardup_dedup_lsh`); prefer it when an
    embedding model already encodes the similarity you want and LSH's
    signature tuning is the risk."""
    pairs = semdedup_pairs(
        df, dim, threshold, id_col=id_col, vec_col=vec_col,
        n_centroids=n_centroids, sample_n=sample_n,
        max_cluster_rows=max_cluster_rows)
    clusters = dup_clusters(pairs, a_col="id_a", b_col="id_b")
    return _keep_with_cluster_size(df, id_col, clusters)


def group_jaccard_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    threshold: float = 0.7,
    max_item_groups: int = 100,
) -> DataFrame:
    """Set-similarity pairs between GROUPS of items — the repo-level dedup
    primitive (fork detection over file-content hashes, The Stack's
    repository dedup): Jaccard(A, B) = |A∩B| / |A∪B| over each group's
    distinct item set, computed by one self-equi-join on the item.

    Scale contract: distinct (group, item) projection (partial-agg
    map-side), then items appearing in more than ``max_item_groups``
    groups are DROPPED before pairing — the df-cap trick: a file hash
    shared by thousands of repos (empty __init__.py, LICENSE) would both
    explode the join fan-out quadratically and carry no fork signal.
    Dropping it bounds per-item join work at max_item_groups² while
    leaving real fork pairs intact (forks share mostly LOW-frequency
    hashes). The intersect counts then come from ONE item-keyed shuffle,
    group sizes from another partial agg, and the final Jaccard filter is
    a broadcast-friendly join of the (small) pair-count table against the
    size table. Emits (group_a, group_b, shared, size_a, size_b, jaccard)
    with group_a < group_b and jaccard >= threshold.

    Note the denominator uses the FULL group sizes (including dropped
    common items), so capping can only lower a score, never fabricate a
    near-duplicate.
    """
    pairs_in = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("it"))
        .distinct()
    )
    sizes = pairs_in.groupBy("g").agg(F.count(F.lit(1)).alias("sz"))
    freq = pairs_in.groupBy("it").agg(F.count(F.lit(1)).alias("__nf"))
    rare = pairs_in.join(
        freq.where(F.col("__nf") <= max_item_groups).select("it"), "it")
    a = rare.select(F.col("g").alias("group_a"), "it")
    b = rare.select(F.col("g").alias("group_b"), "it")
    shared = (
        a.join(b, "it")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("g").alias("group_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("g").alias("group_b"), F.col("sz").alias("size_b"))
    out = (
        shared.join(sa, "group_a").join(sb, "group_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("shared")), 6))
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("group_a", "group_b", "shared", "size_a", "size_b", "jaccard")


def incremental_dedup(
    new_df: DataFrame,
    ledger: DataFrame | None,
    text_col: str,
    id_col: str,
):
    """Continuous-ingestion exact dedup against a persisted hash LEDGER —
    the production shape: yesterday's corpus is already deduped and
    fingerprinted; today's batch must be deduped against BOTH itself and
    everything ever kept, without ever re-reading the historical corpus
    (at 100 TB the ledger — one md5 per kept doc — is ~3 orders of
    magnitude smaller than the data it summarizes).

    Returns ``(kept, new_ledger)``:

    - ``kept`` — rows of ``new_df`` that survive: first (lowest id) per
      content hash within the batch, minus any hash already in the
      ledger. One groupBy exchange for the in-batch cut, one left-anti
      join against the ledger (broadcast when the ledger is small, SMJ
      at scale — Catalyst/AQE choose);
    - ``new_ledger`` — ``ledger ∪ kept-hashes``, the input to tomorrow's
      batch. Persist it with ``sinks.write_partitioned`` keyed on ``h``
      so the anti-join co-locates run over run.

    ``ledger`` is a DataFrame with a single ``h`` (md5 hex) column, or
    None for the first batch. Deterministic: re-running a batch against
    the PRE-batch ledger yields the same kept set (retry-idempotent).
    """
    h = F.md5(F.col(text_col))
    in_batch = dedup_exact(new_df, text_col, id_col)
    if ledger is None:
        kept = in_batch
    else:
        kept = (
            in_batch.withColumn("__h", h)
            .join(ledger.select(F.col("h").alias("__h")), "__h", "left_anti")
            .drop("__h")
        )
    # both returns derive from `kept`; without truncation the caller's
    # natural "write kept, then write new_ledger" loop re-executes the
    # groupBy + anti-join over the whole batch a second time
    kept = kept.localCheckpoint(eager=False)
    new_hashes = kept.select(h.alias("h"))
    new_ledger = new_hashes if ledger is None else (
        ledger.select("h").unionByName(new_hashes)
    )
    return kept, new_ledger
