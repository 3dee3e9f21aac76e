"""Session construction with scale-appropriate defaults.

Tuning rationale (100 TB / 1000-executor design point, SURVEY.md §4.2):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast demotion for the referential anti-joins.
- shuffle.partitions sized to cores locally; on a cluster set it (or let
  AQE coalesce from a high initial count).
- Arrow batch size bounds Python-worker memory for the interpreter tier
  and multimodal mapInPandas stages.
- files.maxPartitionBytes 128m keeps scan partitions executor-friendly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def build_session(
    app_name: str = "json_schemer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        cpus = os.cpu_count() or 8
        builder = builder.master(f"local[{cpus}]")
        shuffle_partitions = shuffle_partitions or cpus
    for k, v in {**DEFAULTS, **(extra or {})}.items():
        builder = builder.config(k, v)
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return builder.getOrCreate()
