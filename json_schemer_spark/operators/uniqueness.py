"""Table-level uniqueness — the table analogue of ``uniqueItems``
(reference validation.rb:189-197 is row-local; this is the corpus-wide
version the north rule adds).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key tuples appearing more than once → (keys..., dup_count).

    groupBy-count-filter: partial aggregation map-side, one shuffle on the
    key; AQE coalesces/splits post-shuffle partitions (skew-safe).
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_violations(df: DataFrame, keys: Sequence[str], id_cols: Sequence[str]) -> DataFrame:
    """Every row participating in a duplicate key → violation rows.

    Join-back against the (small) duplicate-key set; Catalyst/AQE pick a
    broadcast join when the duplicate set is small, which it is when
    uniqueness mostly holds.
    """
    dups = duplicate_keys(df, keys)
    return (
        df.join(dups, list(keys), "inner")
        .select(
            *id_cols,
            *keys,
            F.col("dup_count"),
            F.lit("uniqueness").alias("keyword"),
            F.concat_ws(",", *[F.lit(k) for k in keys]).alias("key_columns"),
        )
    )


def assert_unique_ratio(df: DataFrame, keys: Sequence[str]) -> dict:
    """Summary dict: total rows, distinct keys, duplicate rows."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.concat_ws("\x00", *[F.col(k).cast("string") for k in keys])).alias("d"),
    ).collect()[0]
    return {"rows": int(agg.n), "approx_distinct_keys": int(agg.d)}
