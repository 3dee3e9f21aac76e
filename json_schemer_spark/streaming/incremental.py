"""Incremental validation via Structured Streaming ``foreachBatch``.

The reference (json_schemer) is strictly batch — one instance per
``validate`` call (SURVEY.md §2.10). The engine's incremental path reuses
the SAME compiled plan per micro-batch: new corpus files land in a
directory (or Iceberg table with incremental reads on a real cluster),
each micro-batch is validated with the columnar/interpreter tier and
appended to the verdict sink. No watermarks/stateful ops are needed —
validation is stateless per row, so this is embarrassingly incremental.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import SparkSession


def validate_stream(
    spark: SparkSession,
    source_path: str,
    schema_ddl: str,
    compiled_plan,
    content_col: str,
    sink_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
):
    """readStream(parquet dir) → validate per micro-batch → append parquet.

    ``trigger_once=True`` runs available data then stops (the batch-job
    shaped incremental refresh); False = continuous micro-batches.
    """
    stream = (
        spark.readStream.schema(schema_ddl)
        .format("parquet")
        .load(source_path)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        out = compiled_plan.validate_json_column(batch_df, content_col)
        out.write.mode("append").parquet(sink_path)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
