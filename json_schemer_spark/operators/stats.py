"""Per-column statistics (north_star: null rate, distinct counts via HLL,
length/value histograms). Single-pass aggregations — Catalyst partial+final
hash agg, no extra shuffles beyond the one final exchange.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def column_profile(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One output row per column: null_rate, distinct count, min/max.

    ``exact_distinct=False`` uses HLL++ (``approx_count_distinct``) — the
    scale path for 10^12-row tables; exact mode exists for oracle parity.
    One aggregation pass for ALL columns (not one job per column).
    """
    cols = list(columns or df.columns)
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__max"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (
            c,
            dtypes[c],
            int(row["__n"]),
            int(row[f"{c}__nulls"]),
            float(row[f"{c}__nulls"]) / row["__n"] if row["__n"] else 0.0,
            int(row[f"{c}__distinct"]),
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in cols
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows bigint, n_nulls bigint, "
        "null_rate double, n_distinct bigint, min_value string, max_value string",
    )


def length_histogram(df: DataFrame, column: str) -> DataFrame:
    """Distribution of string lengths → (length, count). One shuffle."""
    return (
        df.select(F.length(F.col(column)).alias("length"))
        .groupBy("length")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def value_histogram(
    df: DataFrame, column: str, n_buckets: int = 20,
    lo: Optional[float] = None, hi: Optional[float] = None,
) -> DataFrame:
    """Fixed-width numeric histogram → (bucket, lo, hi, count).

    Bounds are either given (single pass) or taken from a cheap min/max
    pre-pass. ``width_bucket`` keeps everything JVM-side.
    """
    col = F.col(column).cast("double")
    if lo is None or hi is None:
        r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo, hi = float(r.lo), float(r.hi)
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets), F.greatest(F.lit(1), F.width_bucket(col, F.lit(lo), F.lit(hi), F.lit(n_buckets)))
    )
    return (
        df.where(col.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bucket",
            (F.lit(lo) + (F.col("bucket") - 1) * F.lit(width)).alias("lo"),
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("hi"),
            "count",
        )
    )


def numeric_quantiles(df, cols, probs=(0.25, 0.5, 0.75, 0.95)):
    """Exact per-column quantiles → (column, p25, p50, ...) rows.

    Round 7 (guide §1.2 "the distributed algorithm"): the previous form
    was one ``F.percentile`` aggregation over all columns — Spark's
    exact percentile buffers a value→count map PER PARTIAL and merges
    every map in ONE final reduce task, then sorts it there; on a
    4.6M-distinct double column that single-threaded merge+sort was
    ~45 s while 31 cores idled, and repartitioning the input did not
    move it (measured — the final merge, not the partial update, is the
    wall). Same numbers now come from parallel order statistics:

    1. per column, ``groupBy(value).count()`` — an ordinary partial-agg
       shuffle, fully parallel, output bounded by the column's DISTINCT
       cardinality (not the corpus);
    2. one running-sum window over the distinct values (bounded by
       cardinality — for truly unbounded-cardinality columns at extreme
       scale use ``approx_percentile`` instead, as before);
    3. one tiny aggregation picks the bracketing order statistics for
       every requested rank, and the interpolation applies Spark's own
       ``Percentile`` formula — ``(higher-pos)*lower + (pos-lower)*
       higher`` with ``pos = p*(n-1)`` — literally, so results are
       bit-identical to ``F.percentile`` (verified by direct comparison
       on the sf tables; nulls ignored, empty input → null row, exactly
       as before).

    The per-column count that sizes the ranks is the only driver scalar
    (one number per column — the same contract as the corpus char total
    in budget_mixture_sample)."""
    import functools
    import math

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    spark = df.sparkSession
    pnames = [f"p{int(p * 100)}" for p in probs]
    parts = []
    for c in cols:
        nn = df.where(F.col(c).isNotNull())
        n = nn.count()
        if n == 0:
            parts.append(spark.range(1).select(
                F.lit(c).alias("column"),
                *[F.lit(None).cast("double").alias(pn) for pn in pnames],
            ))
            continue
        counts = nn.groupBy(F.col(c).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        cum = counts.select("v", F.sum("cnt").over(w).alias("cum"))
        ranks = sorted({
            r for p in probs
            for r in (math.floor(p * (n - 1)), math.ceil(p * (n - 1)))
        })
        # value at 0-based rank k of the expanded sorted column =
        # smallest distinct value whose cumulative count is > k
        stats = cum.agg(*[
            F.min(F.when(F.col("cum") > k, F.col("v"))).alias(f"__k{k}")
            for k in ranks
        ])
        fields = [F.lit(c).alias("column")]
        for p, pn in zip(probs, pnames):
            pos = p * (n - 1)
            lo, hi = math.floor(pos), math.ceil(pos)
            if lo == hi:
                e = F.col(f"__k{lo}").cast("double")
            else:
                e = (F.lit(float(hi) - pos) * F.col(f"__k{lo}").cast("double")
                     + F.lit(pos - float(lo)) * F.col(f"__k{hi}").cast("double"))
            fields.append(e.alias(pn))
        parts.append(stats.select(*fields))
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


def hll_sketch_profile(df, cols, lg_config_k: int = 12):
    """Per-column MERGEABLE distinct-count sketches in one pass →
    (column, sketch binary, estimate) — the north rule's "distinct-count
    via HLL sketches" as a first-class artifact, not just a number:
    profile each partition/day separately, persist the binary sketches,
    and :func:`hll_merge_profiles` unions them later WITHOUT rescanning
    (Datasketches HLL via Spark's hll_sketch_agg; exact in the sparse
    regime; dense-regime relative error ~1.6% at 1σ for lg_config_k=12)."""
    import pyspark.sql.functions as F

    aggs = [
        F.struct(
            F.lit(c).alias("column"),
            F.hll_sketch_agg(F.col(c), F.lit(lg_config_k)).alias("sketch"),
        )
        for c in cols
    ]
    return (
        df.agg(F.array(*aggs).alias("a"))
        .select(F.explode("a").alias("s"))
        .select(
            F.col("s.column").alias("column"),
            F.col("s.sketch").alias("sketch"),
            F.hll_sketch_estimate("s.sketch").alias("estimate"),
        )
    )


def hll_merge_profiles(*profiles):
    """Union any number of per-column sketch profiles → one merged profile
    with re-estimated counts. Input rows are (column, sketch, ...); merge
    is a partial-aggregated groupBy on the column name (bytes shuffled =
    #profiles × #columns × sketch size — scan-free incremental stats)."""
    from functools import reduce

    import pyspark.sql.functions as F

    allp = reduce(
        lambda a, b: a.unionByName(b),
        [p.select("column", "sketch") for p in profiles],
    )
    return (
        allp.groupBy("column")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .select("column", "sketch", F.hll_sketch_estimate("sketch").alias("estimate"))
    )


def top_k_per_group(df, group_cols, order_col, k, *, descending=True,
                    tie_col=None, rank_col="rank"):
    """Top-``k`` rows per group — the "best N documents per source /
    per domain / per language" selection every curation pipeline ends
    with. Window ``row_number`` + filter, written so Spark's
    WindowGroupLimit optimization applies: a PARTIAL top-k runs on the
    map side before the exchange (each task keeps only k rows per group
    it sees), so bytes shuffled are O(groups x k x tasks), never the
    corpus — the distributed form of a per-group heap. ``tie_col``
    makes the cut deterministic (required for oracle-exact results when
    ``order_col`` has duplicates)."""
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def key_skew_profile(df, key_cols, *, top_k=20, target_partitions=200):
    """Pre-shuffle skew diagnostics: the heaviest join/groupBy keys, each
    key's traffic share, and the salt factor that would level it.

    Every 100-TB shuffle plan starts with this question — "is there a
    mega-key?" — because one key holding 10% of rows serializes 10% of
    the stage into one task no matter how many executors exist. The
    profile answers it BEFORE the expensive shuffle: one partial-
    aggregated count per key (map-side combine absorbs the skew this
    operator exists to find), a WindowGroupLimit top-k cut over the
    aggregated counts, and a broadcast of the two scalar totals.

    Returns ``(rank, *key_cols, n, share_ppm, salt, distinct_keys)``:
    ``share_ppm`` = parts-per-million of all rows carried by the key;
    ``salt`` = how many sub-splits bring the key's partitions down to
    the fair share at ``target_partitions`` (1 = no salting needed) —
    both computed in pure BIGINT arithmetic (``floor``-division forms)
    so an external engine reproduces them bit-for-bit.
    """
    if top_k <= 0:
        raise ValueError("top_k must be positive")
    if target_partitions <= 0:
        raise ValueError("target_partitions must be positive")
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__total"),
        F.count(F.lit(1)).alias("distinct_keys"),
    )
    top = top_k_per_group(
        counts, [], "n", top_k,
        tie_col=keys[0], rank_col="rank",
    )
    out = top.crossJoin(F.broadcast(totals))
    # true BIGINT division (SQL `div`), NOT floor(double /): double
    # quotients can differ by 1 ulp from an external engine's integer
    # division once n * 1e6 passes 2^53. The long product itself is
    # exact for n <= ~9.2e12 rows per key — beyond any real corpus.
    return out.select(
        "rank", *keys, "n",
        F.expr("n * CAST(1000000 AS BIGINT) div __total")
        .alias("share_ppm"),
        F.expr(
            f"(n * CAST({int(target_partitions)} AS BIGINT) + __total - 1)"
            " div __total"
        ).alias("salt"),
        "distinct_keys",
    )
