"""Temporal / event-stream operators: as-of join and sessionization.

The as-of join is the canonical "operator Spark lacks" (explicitly named
in the build brief): for every left event, the most recent right event
at-or-before it per key. The naive formulation — range join + per-left
argmax — explodes to O(|L|·|R|) per key under Catalyst (BroadcastNLJ or
a cartesian per key). This implementation is the union-window form:
tag both sides, union, ONE shuffle on the key, in-partition sort by
(time, side), and a running ``last(right_row, ignorenulls=True)``
window — O((|L|+|R|) log(|L|+|R|)) per key, no join explosion, exactly
the plan a hand-written merge-asof would pick. Sessionization is the
same single-exchange shape: lag-gap detection + running sum inside one
keyed window; the per-session aggregation afterwards needs NO second
exchange (HashPartitioning(key) already satisfies the clustered
distribution of (key, session)).

Skew note: both operators sort within the key partition, so one
mega-key serializes into one task — inherent to per-key ordered
semantics (same trade every merge-asof makes). At 10^12 rows the
mitigations are upstream: time-bucket the key (key, date) when the
downstream consumer tolerates per-bucket sessions, or pre-filter to the
keys under study.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    right_cols: Sequence[str],
    *,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``right`` row
    with the greatest ``time_col`` <= the left row's (per ``key_cols``);
    unmatched left rows keep nulls. Matched right columns come from ONE
    right row atomically (they ride a single struct through the window,
    so a null field in the matched row never falls back to an older
    row). Ties at equal timestamps match (<=, DuckDB/pandas
    ``merge_asof`` convention); for deterministic output the right side
    should be unique per (key, time) — duplicate right timestamps pick
    an arbitrary one of the duplicates, exactly like ``ASOF JOIN``.

    Returns all left columns plus ``time_col + suffix`` and
    ``c + suffix`` for each requested right column.
    """
    keys = list(key_cols)
    rpayload = F.struct(
        F.col(time_col).alias(time_col),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r2 = right.select(
        *keys,
        F.col(time_col).alias("__t"),
        F.lit(0).alias("__side"),
        rpayload.alias("__rrow"),
    )
    rtype = r2.schema["__rrow"].dataType
    l2 = left.select(
        *keys,
        F.col(time_col).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtype).alias("__rrow"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    u = l2.unionByName(
        r2.withColumn(
            "__lrow", F.lit(None).cast(l2.schema["__lrow"].dataType)
        )
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__rrow", ignorenulls=True).over(w)
    return (
        u.select("__side", matched.alias("__m"), "__lrow")
        .where(F.col("__side") == 1)
        .select(
            *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
            F.col(f"__m.{time_col}").alias(time_col + suffix),
            *[F.col(f"__m.{c}").alias(c + suffix) for c in right_cols],
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign gap-based session indexes: within each ``key_col``, events
    ordered by ``time_col`` start a new session when the gap from the
    previous event exceeds ``gap_seconds``. Adds ``session_index``
    (0-based per key, long). One exchange on the key; the lag and the
    running sum share the same window sort. Timestamps must be unique
    per key for a total order (true of event logs with microsecond
    stamps; pass a pre-deduplicated frame otherwise)."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    w = Window.partitionBy(key_col).orderBy(time_col)
    prev = F.lag(F.col(time_col)).over(w)
    # timestamp subtraction -> day-time interval: works for TIMESTAMP
    # and TIMESTAMP_NTZ alike (unix_micros rejects NTZ columns, which
    # is what parquet event logs carry)
    gap = F.expr(f"INTERVAL '{int(gap_seconds)}' SECOND")
    brk = F.when(
        prev.isNull() | ((F.col(time_col) - prev) > gap), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "session_index", (F.sum(brk).over(run) - F.lit(1)).cast("long")
    )


def _bucket_micros(c: F.Column, type_name: str) -> tuple[F.Column, bool]:
    """A monotone numeric view of a time column for BUCKETING only (the
    exact range predicate always compares the original columns, so the
    mapping just has to be order-preserving): epoch micros for
    timestamps (NTZ via a session-zone cast — monotone either way),
    the raw value for numerics."""
    if type_name == "timestamp":
        return F.unix_micros(c), True
    if type_name == "timestamp_ntz":
        return F.unix_micros(c.cast("timestamp")), True
    return c.cast("double"), False


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    *,
    key_cols: Sequence[str] = (),
    bucket_width: float = 3600.0,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Bucketed range join — the brief's other named "operator Spark
    lacks": every ``events`` row joined to the ``intervals`` rows whose
    half-open window contains it (``start <= t < end``), optionally per
    equality key.

    Catalyst plans a bare range predicate (no equality key, or one with
    few distinct values) as BroadcastNestedLoopJoin / cartesian —
    O(|E|·|I|) row comparisons, the classic scale cliff. This is the
    standard chunking rewrite instead: time is cut into fixed
    ``bucket_width`` buckets, each interval is exploded to the buckets
    it spans (``sequence(bucket(start), bucket(end))``), events carry
    their single bucket, and the join becomes an EQUI-join on
    ``(bucket, *key_cols)`` with the exact range predicate re-applied
    afterwards. Cost: O(|I| · span/width) exploded rows + one keyed
    exchange that AQE can re-plan (broadcast when the exploded interval
    side is small, skew-split on hot buckets). No duplicates by
    construction: an interval appears once per bucket and an event joins
    only within its own bucket.

    ``bucket_width`` is in SECONDS for timestamp columns (micros
    internally; the bucket mapping is monotone so truncation can't lose
    matches) and in the column's own units for numeric time columns.
    Pick it near the typical interval span: much smaller explodes the
    interval side, much larger degrades bucket selectivity toward the
    naive join. Intervals spanning more than ``max_buckets_per_interval``
    buckets fail fast with a task error (a misconfigured width at 10^12
    rows should fail loudly, not OOM an exchange). Column names other
    than ``key_cols`` must be disjoint between the two sides.
    """
    keys = list(key_cols)
    ev_t = events.schema[time_col].dataType.typeName()
    iv_s = intervals.schema[start_col].dataType.typeName()
    iv_e = intervals.schema[end_col].dataType.typeName()
    ts_like = {"timestamp", "timestamp_ntz"}
    if (ev_t in ts_like) != (iv_s in ts_like) or (iv_s in ts_like) != (iv_e in ts_like):
        raise ValueError(
            f"time columns must all be timestamps or all numeric; got "
            f"{time_col}:{ev_t}, {start_col}:{iv_s}, {end_col}:{iv_e}")
    t_num, is_ts = _bucket_micros(F.col(time_col), ev_t)
    s_num, _ = _bucket_micros(F.col(start_col), iv_s)
    e_num, _ = _bucket_micros(F.col(end_col), iv_e)
    width = float(bucket_width) * (1_000_000.0 if is_ts else 1.0)
    sb = F.floor(s_num / width).cast("long")
    eb = F.floor(e_num / width).cast("long")
    n_buckets = eb - sb + F.lit(1)
    guarded = F.when(
        n_buckets <= F.lit(max_buckets_per_interval),
        F.sequence(sb, eb),
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"interval_join: interval spans more than "
              f"{max_buckets_per_interval} buckets of width "
              f"{bucket_width}; raise bucket_width "),
        F.lit("(span buckets: "), n_buckets.cast("string"), F.lit(")"))))
    iv = (
        intervals.where(F.col(start_col) < F.col(end_col))
        .withColumn("__bucket", F.explode(guarded))
    )
    ev = events.withColumn(
        "__bucket", F.floor(t_num / width).cast("long"))
    joined = ev.join(iv, ["__bucket", *keys], "inner").where(
        (F.col(time_col) >= F.col(start_col))
        & (F.col(time_col) < F.col(end_col)))
    return joined.drop("__bucket")


def sliding_window_agg(
    events: DataFrame,
    time_col: str,
    aggs: Sequence,
    *,
    window: str,
    slide: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Event-time sliding-window rollup: aggregate ``events`` into
    overlapping windows of ``window`` duration advancing every ``slide``
    (tumbling when equal), optionally keyed by ``key_cols``.

    This is the batch twin of the streaming windowed aggregation
    (streaming/windowed.py) expressed the way Spark wants it: the
    built-in ``F.window`` generator assigns each row its
    window/slide overlapping windows JVM-side in ONE Expand node — no
    self-join against a window table, no Python — and the groupBy on
    (window, keys) partial-aggregates map-side before the single
    exchange. Epoch-aligned window starts (Spark's default startTime=0)
    keep the assignment pure arithmetic, so an external engine can
    re-derive membership exactly: row t belongs to starts
    ``floor(t/slide)*slide - k*slide`` for k in 0..window/slide-1.

    ``window`` must be a whole multiple of ``slide`` (Spark itself
    allows ragged ratios, but they make the overlap count vary per row
    — a silent output-size footgun at scale, and unreplayable by the
    arithmetic above, so we reject them loudly).

    ``aggs`` are ready-made aggregate Columns (e.g.
    ``F.count(F.lit(1)).alias("n")``). Returns one row per
    (window_start, window_end, *key_cols) with the aggregates applied.
    """

    def _secs(d: str) -> int:
        # Integer-seconds parsing (round-7 ADVICE): float parsing
        # accepted fractional durations ("1.5 hours") that F.window may
        # reject or round differently, and did the whole-multiple check
        # in float modulo. The accepted grammar here is a strict subset
        # of what F.window parses: '<positive int> <unit>'.
        parts = d.strip().split()
        if len(parts) != 2 or not parts[0].isdigit():
            raise ValueError(
                f"duration must be '<integer n> <unit>', got {d!r}")
        n = int(parts[0])
        unit = parts[1].rstrip("s")
        mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
        if unit not in mult:
            raise ValueError(f"unsupported duration unit in {d!r}")
        return n * mult[unit]

    w_s, s_s = _secs(window), _secs(slide)
    if s_s <= 0 or w_s <= 0:
        raise ValueError("window and slide must be positive")
    if w_s % s_s != 0:
        raise ValueError(
            f"window ({window}) must be a whole multiple of slide "
            f"({slide}); ragged ratios give per-row-varying overlap "
            "counts and are not replayable")
    keys = list(key_cols)
    # alias-collision guard (round-7 ADVICE): an aggregate aliased as
    # "window"/"window_start"/"window_end" or shadowing a key column
    # used to be silently dropped from the result.
    reserved = {"window", "window_start", "window_end", *keys}
    out = events.groupBy(
        F.window(F.col(time_col), window, slide), *keys
    ).agg(*aggs)
    agg_names = [c for c in out.columns if c != "window" and c not in keys]
    if len(agg_names) != len(aggs) or any(
        a in ("window_start", "window_end") for a in agg_names
    ):
        raise ValueError(
            "aggregate aliases must not collide with "
            f"{sorted(reserved)}")
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        *agg_names,
    )
