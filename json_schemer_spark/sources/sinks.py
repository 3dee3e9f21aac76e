"""Partitioned parquet sink with a read-back audit manifest.

The reference engine's output surface is validation results; a 100-TB
pipeline also has to LAND data safely, and the operational contract for
a big write is (a) deterministic placement — the same row lands in the
same partition on every re-run, so a partially-failed job can be
re-executed idempotently — and (b) an audit manifest derived from WHAT
WAS ACTUALLY WRITTEN, not from the plan that was supposed to write it
(the classic silent failure is a task that commits an empty file).

``write_partitioned`` buckets rows by ``md5(key || seed) % n_buckets``
(md5, not Spark's internal hash, so placement is engine-independent and
an external system — or the DuckDB oracle — can compute which bucket
any key lives in without running Spark), writes one directory per
bucket via ``partitionBy``, then re-reads the committed files to build
the manifest: per-bucket row count, key min/max, and file count. The
re-read is the point — the manifest verifies the sink, it doesn't trust
it. Bucket counts/min/max are pure functions of the input keys; the
file count depends on task layout and is excluded from oracle-checked
outputs (kept in the manifest for ops use).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from json_schemer_spark.operators.sampling import hash_bucket


def bucket_of(key_col: str, n_buckets: int, seed: str = "") -> F.Column:
    """Engine-independent bucket id: first 8 md5 hex digits of
    ``key || seed`` as a uint32 (the ONE hash convention shared with
    ``operators.sampling.hash_bucket``), mod ``n_buckets``. Replayable
    anywhere md5 exists (DuckDB:
    ``CAST('0x' || substr(md5(..),1,8) AS UBIGINT)``)."""
    return hash_bucket(F.col(key_col), seed) % n_buckets


def write_partitioned(
    df: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int = 16,
    *,
    seed: str = "",
    sort_within: bool = True,
) -> DataFrame:
    """Write ``df`` as parquet partitioned into ``n_buckets`` md5-keyed
    bucket directories and return the read-back audit manifest.

    The write repartitions on the bucket column (one exchange — each
    bucket's rows co-locate, so each bucket directory gets few, large
    files instead of one sliver per upstream task) and sorts within
    partitions by the key (``sort_within``) so parquet min/max page
    stats make downstream key lookups prunable. ``mode("overwrite")``:
    re-running the sink is idempotent by construction (same key → same
    bucket → same directory replaced).

    Returns the manifest DataFrame ``(bucket, n_rows, min_key, max_key,
    n_files)`` computed from the files actually committed.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    # reserved working columns (round-7 ADVICE): a pre-existing `bucket`
    # column would be silently overwritten (its data lost from the
    # written files — partitionBy consumes the synthetic one), and a
    # pre-existing `__file` would corrupt the read-back's file count.
    for reserved in ("bucket", "__file"):
        if reserved in df.columns:
            raise ValueError(
                f"write_partitioned reserves the column name {reserved!r}; "
                "rename it before writing"
            )
    out = df.withColumn("bucket", bucket_of(key_col, n_buckets, seed))
    out = out.repartition(n_buckets, "bucket")
    if sort_within:
        out = out.sortWithinPartitions("bucket", key_col)
    (out.write.mode("overwrite").partitionBy("bucket").parquet(path))

    # Read back with an EXPLICIT schema (round-7 ADVICE): schema
    # inference on a zero-row commit (no data files) raises, and the old
    # bare `except Exception` around it also swallowed GENUINE read
    # failures after a non-empty write — corrupt footer, permissions,
    # listing lag — reporting them as an empty batch, the exact anomaly
    # class a verify-don't-trust manifest exists to surface. With the
    # schema supplied, an empty commit is just an empty DataFrame and
    # every real read error propagates.
    read_schema = out.schema
    back = df.sparkSession.read.schema(read_schema).parquet(path)

    back = back.withColumn(
        "__file", F.input_file_name()  # projected pre-agg: non-deterministic
    )                                  # exprs are invalid inside agg()
    return (
        back.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(key_col).alias("min_key"),
            F.max(key_col).alias("max_key"),
            F.countDistinct("__file").alias("n_files"),
        )
    )
