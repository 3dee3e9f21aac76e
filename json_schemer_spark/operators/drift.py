"""Distribution-drift checks per partition/group: KS statistic and PSI
(north_star requirement; no analogue in the reference, which is row-local).

Design for scale:
- **PSI** is pure aggregation algebra: bucket counts per group vs a
  reference histogram → one shuffle, no Python. Preferred at 10^12 rows.
- **KS** needs the empirical CDF → per-group sort. Implemented with
  ``applyInPandas`` (Arrow-batched, one shuffle on the group key); each
  group must fit one executor's memory — use for per-partition monitoring
  (bounded groups), not whole-table comparisons.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def psi(
    df: DataFrame,
    column: str,
    group_cols: Sequence[str],
    reference: Optional[DataFrame] = None,
    n_buckets: int = 20,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index of ``column`` per group vs the global
    (or supplied) distribution → (group_cols..., psi).

    PSI = Σ_buckets (p_g - p_ref) * ln(p_g / p_ref). Two aggregations
    (bucket×group counts; reference bucket counts) + one broadcast join.
    """
    col = F.col(column).cast("double")
    if lo is None or hi is None:
        r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo, hi = float(r.lo), float(r.hi)
    if hi <= lo:
        hi = lo + 1.0
    bucket = F.least(
        F.lit(n_buckets),
        F.greatest(F.lit(1), F.width_bucket(col, F.lit(lo), F.lit(hi), F.lit(n_buckets))),
    ).alias("__bucket")

    ref_src = reference if reference is not None else df
    ref_col = F.col(column).cast("double")
    ref_bucket = F.least(
        F.lit(n_buckets),
        F.greatest(F.lit(1), F.width_bucket(ref_col, F.lit(lo), F.lit(hi), F.lit(n_buckets))),
    ).alias("__bucket")

    ref_hist = (
        ref_src.where(ref_col.isNotNull())
        .select(ref_bucket)
        .groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__ref_n"))
    )
    # scalar-agg cross join, NOT Window.partitionBy(lit(1)) — the single-
    # partition window triggered "No Partition Defined" plan warnings and
    # would serialize the (tiny) histogram through one task (round-1 review)
    ref_total = ref_hist.agg(F.sum("__ref_n").alias("__ref_total"))
    ref_hist = ref_hist.crossJoin(F.broadcast(ref_total)).withColumn(
        "__ref_p", F.col("__ref_n") / F.col("__ref_total")
    )

    grp = (
        df.where(col.isNotNull())
        .select(*group_cols, bucket)
        .groupBy(*group_cols, "__bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols)
    grp = grp.withColumn("__p", F.col("__n") / F.sum("__n").over(w))

    joined = grp.join(F.broadcast(ref_hist), "__bucket", "left").fillna({"__ref_p": 0.0})
    term = (F.col("__p") - F.col("__ref_p")) * F.log(
        (F.col("__p") + eps) / (F.col("__ref_p") + eps)
    )
    return (
        joined.groupBy(*group_cols)
        .agg(F.sum(term).alias("psi"))
    )


def ks_per_group(
    df: DataFrame,
    column: str,
    group_cols: Sequence[str],
    reference_quantiles: Sequence[float],
    reference_values: Sequence[float],
) -> DataFrame:
    """KS statistic of each group's empirical CDF vs a reference CDF given
    as (quantile, value) knots. applyInPandas per group (SNIPPETS.md
    pattern [2]); groups must fit in executor memory.
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(list(reference_quantiles), dtype="float64")
    v = np.asarray(list(reference_values), dtype="float64")
    group_cols = list(group_cols)
    out_schema = ", ".join(f"{c} string" for c in group_cols) + ", ks double, n bigint"

    def ks_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[column].dropna().to_numpy(dtype="float64")
        if len(x) == 0:
            stat = float("nan")
        else:
            x = np.sort(x)
            # reference CDF at each sample point (linear interp on knots)
            ref_cdf = np.interp(x, v, q, left=0.0, right=1.0)
            emp_hi = np.arange(1, len(x) + 1) / len(x)
            emp_lo = np.arange(0, len(x)) / len(x)
            stat = float(np.max(np.maximum(np.abs(emp_hi - ref_cdf), np.abs(ref_cdf - emp_lo))))
        return pd.DataFrame(
            [[*(str(k) for k in key), stat, len(x)]],
            columns=group_cols + ["ks", "n"],
        )

    return (
        df.select(*group_cols, column)
        .groupBy(*group_cols)
        .applyInPandas(ks_fn, schema=out_schema)
    )


def js_divergence(
    df: DataFrame,
    column: str,
    group_cols: Sequence[str],
    reference: Optional[DataFrame] = None,
    n_buckets: int = 20,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> DataFrame:
    """Jensen–Shannon divergence of ``column``'s per-group histogram vs the
    global (or supplied) reference → (group_cols..., js_divergence).

    JS(P‖R) = ½·KL(P‖M) + ½·KL(R‖M) with M = ½(P+R): symmetric, bounded in
    [0, ln 2], and — unlike PSI — needs no epsilon smoothing (a bucket
    empty on one side contributes a finite p·ln 2). Same plan shape as
    :func:`psi`: two partial-aggregated bucket counts + one broadcast join;
    scales exactly like a groupBy at 10^12 rows.
    """
    col = F.col(column).cast("double")
    if lo is None or hi is None:
        r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
        lo, hi = float(r.lo), float(r.hi)
    if hi <= lo:
        hi = lo + 1.0

    def bucketed(src, c):
        b = F.least(
            F.lit(n_buckets),
            F.greatest(F.lit(1), F.width_bucket(c, F.lit(lo), F.lit(hi), F.lit(n_buckets))),
        ).alias("__bucket")
        return src.where(c.isNotNull()), b

    ref_src, ref_b = bucketed(reference if reference is not None else df,
                              F.col(column).cast("double"))
    ref_hist = ref_src.select(ref_b).groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__ref_n"))
    ref_total = ref_hist.agg(F.sum("__ref_n").alias("__ref_total"))
    ref_hist = ref_hist.crossJoin(F.broadcast(ref_total)).withColumn(
        "__ref_p", F.col("__ref_n") / F.col("__ref_total"))

    src, b = bucketed(df, col)
    grp = src.select(*group_cols, b).groupBy(*group_cols, "__bucket").agg(
        F.count(F.lit(1)).alias("__n"))
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols)
    grp = grp.withColumn("__p", F.col("__n") / F.sum("__n").over(w))

    # (group × reference-bucket) grid, full-joined with the group's own
    # buckets: every bucket present on EITHER side contributes its term for
    # EVERY group (a per-group-missing reference bucket still charges that
    # group ½·r·ln 2). The grid is tiny — n_groups × n_buckets — and
    # broadcast.
    groups = grp.select(*group_cols).distinct()
    grid = groups.crossJoin(F.broadcast(ref_hist.select("__bucket", "__ref_p")))
    joined = grid.join(grp.select(*group_cols, "__bucket", "__p"),
                       [*group_cols, "__bucket"], "full")
    p = F.coalesce(F.col("__p"), F.lit(0.0))
    r = F.coalesce(F.col("__ref_p"), F.lit(0.0))
    m = (p + r) / 2
    term = (
        F.when(p > 0, 0.5 * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(r > 0, 0.5 * r * F.log(r / m)).otherwise(F.lit(0.0))
    )
    return joined.groupBy(*group_cols).agg(F.sum(term).alias("js_divergence"))
