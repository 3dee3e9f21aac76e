"""Deterministic hash-based sampling for corpus curation.

The reference engine (json_schemer) has no sampling surface; these ops
extend the engine for the training-data pipeline: reproducible
sub-sampling and per-stratum balancing of a 100 TB corpus cannot use
``rand()`` (not stable across retries/re-runs, and a task retry under
speculative execution would change the sample). Everything here keys on
``md5`` of a caller-chosen key column, so:

- the sample is a pure function of (key, seed) — re-runs, retries, and
  different cluster sizes all select the same rows;
- samples NEST: the fraction-0.1 sample is a strict subset of the
  fraction-0.5 sample for the same seed (threshold sampling), which is
  what staged experiments (1% → 10% → full) need;
- it's one narrow JVM projection — no shuffle, no Python, and the
  filter sits directly above the scan for Catalyst to work with.

The hash value is the first 8 hex digits of ``md5(key || seed)`` read as
a uint32; a row is kept when ``hash < floor(fraction * 2^32)``. md5 (not
xxhash64) so a DuckDB oracle can recompute the selection bit-for-bit.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_sample",
    "stratified_hash_sample",
    "budget_mixture_sample",
    "weighted_sample",
]

_HASH_SPACE = 1 << 32


def hash_bucket(key: Column, seed: str = "") -> Column:
    """uint32 bucket of ``md5(key || seed)`` (first 8 hex digits) as a
    long Column in [0, 2^32)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(seed)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _HASH_SPACE)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, *, seed: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by hash threshold on
    ``key_col``. Stable across runs/retries/cluster sizes; samples for
    the same seed nest (0.1 ⊂ 0.5). One narrow filter, no shuffle."""
    return df.filter(
        hash_bucket(F.col(key_col), seed) < F.lit(_threshold(fraction))
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    *,
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-balancing op
    (e.g. downweight low-quality sources, keep all of a rare one).
    ``fractions`` maps stratum value → keep fraction; strata not listed
    use ``default_fraction``. The per-stratum thresholds are folded into
    one in-plan CASE expression: still a single narrow filter over the
    scan, no shuffle, no join (strata counts are contractually small —
    they're distinct values of a partitioning-ish column, not data).
    """
    thr: Optional[Column] = None
    expr = None
    for value, fraction in sorted(fractions.items()):
        t = F.lit(_threshold(fraction)).cast("long")
        expr = (F.when(F.col(strata_col) == value, t) if expr is None
                else expr.when(F.col(strata_col) == value, t))
    default_t = F.lit(_threshold(default_fraction)).cast("long")
    thr = default_t if expr is None else expr.otherwise(default_t)
    return df.filter(hash_bucket(F.col(key_col), seed) < thr)


def budget_mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    size_col: str,
    budget: float,
    *,
    weights: Optional[Mapping[str, float]] = None,
    seed: str = "",
) -> DataFrame:
    """Sample each source toward a total ``budget`` of ``size_col`` units
    (tokens, bytes) split by mixture ``weights`` — the epoch-mixture op:
    "2 parts wiki to 1 part web, 50 B tokens total". ``weights`` maps
    source value → relative weight (unlisted sources weigh 1; weights are
    normalized over the sources actually present). Each source keeps the
    deterministic hash-threshold fraction
    ``min(1, budget * w_s / W / T_s)`` where ``T_s`` is the source's
    total size, so undersized sources are kept whole rather than
    upsampled (their shortfall is NOT redistributed — the result is the
    budget's lower bound, which is the honest contract; rerun with a
    higher budget to compensate).

    Plan shape: one partial-aggregated groupBy over the source column
    (distinct sources are dimension-sized), the per-source weight sum via
    an unpartitioned window over that tiny aggregate, then a broadcast
    hash join back and the same single narrow hash filter as
    :func:`hash_sample` — no driver collect, fractions computed in-plan.
    Returns the input rows that survive, plus ``keep_fraction``.

    Scale note: the totals aggregate is a second pass over ``df``. Key
    the budget on a MATERIALIZED size column (token/char counts stored
    at ingest) so that pass prunes to two skinny columns in the scan; a
    ``size_col`` derived in-plan from a wide text column would re-scan
    the wide column twice — persist ``df`` first in that case.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    weights = dict(weights or {})
    for value, wt in weights.items():
        if wt < 0:
            raise ValueError(f"weight for {value!r} must be >= 0, got {wt}")
    src = F.col(source_col)
    totals = df.groupBy(src.alias("__bm_src")).agg(
        F.sum(F.col(size_col).cast("double")).alias("__bm_total"))
    w_src = None
    for value, wt in sorted(weights.items()):
        lit = F.lit(float(wt))
        w_src = (F.when(F.col("__bm_src") == value, lit) if w_src is None
                 else w_src.when(F.col("__bm_src") == value, lit))
    w_src = F.lit(1.0) if w_src is None else w_src.otherwise(F.lit(1.0))
    totals = totals.withColumn("__bm_w", w_src)
    # The aggregate has one row per distinct source — an unpartitioned
    # window over it is a handful of rows, not an anti-scale construct.
    wsum = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    totals = totals.withColumn("__bm_wsum", F.sum("__bm_w").over(wsum))
    frac = F.least(
        F.lit(1.0),
        F.lit(float(budget)) * F.col("__bm_w") / F.col("__bm_wsum")
        / F.col("__bm_total"),
    )
    totals = totals.select(
        "__bm_src",
        frac.alias("keep_fraction"),
        F.floor(frac * F.lit(float(_HASH_SPACE))).cast("long")
         .alias("__bm_thr"),
    )
    joined = df.join(F.broadcast(totals), src == F.col("__bm_src"))
    kept = joined.filter(
        hash_bucket(F.col(key_col), seed) < F.col("__bm_thr"))
    return kept.drop("__bm_src", "__bm_thr")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    group_cols=(),
    seed: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows (per group):
    Efraimidis-Spirakis priority sampling, the standard one-pass
    distributed algorithm — each row gets key ``u^(1/w)`` for a uniform
    ``u`` and is selected iff its key is among the k largest. Inclusion
    probability is proportional to weight, exactly what quality-weighted
    corpus subsetting wants ("keep 100k docs per language, favoring high
    quality score").

    Determinism discipline matches the rest of this module: ``u``
    derives from ``md5(id || seed)`` (not ``rand()``), so retries,
    re-runs and cluster sizes all pick the same sample, and an external
    engine can replay the draw bit-for-bit. We order by the equivalent
    ``ln(u)/w`` (monotone in ``u^(1/w)``, avoids pow underflow for tiny
    weights) through ``stats.top_k_per_group``, so Spark's
    WindowGroupLimit keeps a partial top-k map-side and the exchange
    carries O(groups x k x tasks) rows, never the corpus. Rows with
    non-positive weight are excluded (weight 0 = never sampled). With
    empty ``group_cols`` the final cut runs in one task over the k-per-
    task survivors — grouped sampling is the scale path.
    """
    from json_schemer_spark.operators.stats import top_k_per_group

    w = F.col(weight_col).cast("double")
    # the SAME md5-prefix uint32 convention as every sampler here
    u = (hash_bucket(F.col(id_col), seed) + 1) / F.lit(
        float(_HASH_SPACE + 1))
    scored = df.where(w > 0).withColumn("__es_key", F.log(u) / w)
    return (
        top_k_per_group(
            scored, list(group_cols), "__es_key", k,
            tie_col=id_col, rank_col="__es_rank",
        )
        .drop("__es_key", "__es_rank")
    )
