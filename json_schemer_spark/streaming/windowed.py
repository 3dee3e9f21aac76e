"""Event-time streaming analytics over validation verdicts.

The reference (json_schemer) is strictly batch; these are engine
extensions for continuous corpora (SURVEY.md §2.10 direction):

- :func:`windowed_violation_rate` — tumbling/sliding event-time windows
  over the per-row verdict with a watermark: late rows beyond the
  watermark are dropped and each window's result is finalized exactly
  once (append mode), which is what a monitoring sink wants.
- :func:`running_verdict_counts` — custom stateful operator via
  ``applyInPandasWithState``: per-key running (files, failed) totals that
  survive across micro-batches AND across restarts through the
  checkpoint.

Both consume the validator's output stream, so the whole pipeline stays
one readStream → validate (stateless projection) → stateful aggregation.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_violation_rate(
    stream_df: DataFrame,
    compiled_plan: Any,
    content_col: str,
    event_time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
    slide: Optional[str] = None,
) -> DataFrame:
    """Watermarked windowed violation rate → (window_start, window_end,
    files, failed, violation_rate).

    Write with ``outputMode("append")``: a window emits once, when the
    watermark (max observed event time − ``watermark_delay``) passes its
    end; rows arriving later than that are dropped by contract. Scales as
    a normal streaming agg — partial aggregation map-side, state keyed by
    window, bounded by the watermark horizon.
    """
    out = compiled_plan.validate_json_column(stream_df, content_col)
    win = (
        F.window(event_time_col, window_duration, slide)
        if slide
        else F.window(event_time_col, window_duration)
    )
    return (
        out.withWatermark(event_time_col, watermark_delay)
        .groupBy(win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("files"),
            F.sum((~F.col("valid")).cast("long")).alias("failed"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "files",
            "failed",
            F.round(F.col("failed") / F.col("files"), 6).alias("violation_rate"),
        )
    )


def running_verdict_counts(
    validated_stream: DataFrame, key_col: str = "repo"
) -> DataFrame:
    """Per-key running verdict totals via ``applyInPandasWithState`` →
    (key, files, failed), emitted in update mode whenever a key sees rows.

    The GroupState holds one (files, failed) tuple per key — O(#keys)
    state, no timeout (corpus partitions are long-lived). Totals continue
    across micro-batches and across query restarts from the same
    checkpoint, which foreachBatch-style recomputation cannot do without
    an external store.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterable["pd.DataFrame"]:
        files = 0
        failed = 0
        for pdf in pdfs:
            files += len(pdf)
            failed += int((~pdf["valid"].astype(bool)).sum())
        if state.exists:
            prev_files, prev_failed = state.get
            files += prev_files
            failed += prev_failed
        state.update((files, failed))
        yield pd.DataFrame({key_col: [key[0]], "files": [files], "failed": [failed]})

    return (
        validated_stream.select(key_col, "valid")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=f"{key_col} string, files long, failed long",
            stateStructType="files long, failed long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str,
    event_time_col: str,
    watermark_delay: str = "10 minutes",
    id_cols: Optional[list] = None,
) -> DataFrame:
    """Exact streaming deduplication: keep the FIRST occurrence of each
    content hash within the watermark horizon — the streaming counterpart
    of :func:`~json_schemer_spark.operators.dedup.dedup_exact` for a
    continuously-ingested corpus.

    ``dropDuplicatesWithinWatermark`` keys the dedup state on the md5 of
    ``text_col`` (plus ``id_cols``, when given — e.g. per-tenant or
    per-language scoping, so identical content in different scopes is NOT
    collapsed); state for a hash is dropped once the watermark passes its
    last-seen event time + delay, so state size is bounded by the ingest
    rate × horizon instead of growing with the corpus (the property that
    matters at crawl scale — exact global dedup over an unbounded stream
    is impossible with finite state, and near-horizon re-crawls are
    precisely the duplicates worth suppressing online; historical dups are
    the batch job's business).

    Returns the deduplicated stream with a ``content_hash`` column; write
    with ``outputMode("append")``.
    """
    hashed = stream_df.withColumn("content_hash", F.md5(F.col(text_col)))
    return (
        hashed.withWatermark(event_time_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["content_hash", *(id_cols or [])])
    )
