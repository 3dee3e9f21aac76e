"""Event-time streaming: watermarked windowed aggregation (late-data drop
+ exactly-once window emission) and applyInPandasWithState running totals
(state across micro-batches and across query restarts)."""

import os
import time
from datetime import datetime

import pytest


SCHEMA_DDL = "repo string, content string, event_time timestamp"
VALID_DOC = '{"repo": "r", "path": "p", "size": 1}'
INVALID_DOC = '{"repo": "r", "path": "p", "size": -1}'

PLAN_SCHEMA = {
    "type": "object",
    "required": ["repo"],
    "properties": {"size": {"type": "integer", "minimum": 0}},
}


def _write_batch(spark, path, name, rows):
    """One flat parquet FILE per batch (the file stream source does not
    recurse into non-partition subdirectories)."""
    import glob
    import shutil

    df = spark.createDataFrame(rows, SCHEMA_DDL)
    staging = os.path.join(path, f"__staging_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(path, f"{name}.parquet"))
    shutil.rmtree(staging)
    time.sleep(1.1)  # distinct mtimes → deterministic file order per trigger


def _ts(minute, second=0):
    return datetime(2026, 1, 1, 10, minute, second)


def test_windowed_violation_rate_watermark(spark, tmp_path):
    """Single-file micro-batches: the 10:00 window closes when the
    watermark passes its end, emits exactly once, and a later-arriving
    row for it is dropped (append-mode contract). Watermark updates take
    effect one batch after the advancing data (computed from batches
    ≤ N-1), so the late row needs one separating batch after the
    advancer to observe the drop — probed empirically on Spark 4.1."""
    from json_schemer_spark import compile_schema
    from json_schemer_spark.streaming.windowed import windowed_violation_rate

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: 10:00 window — 3 rows, 1 invalid
    _write_batch(spark, src, "b1", [
        ("r1", VALID_DOC, _ts(0, 10)),
        ("r1", INVALID_DOC, _ts(0, 20)),
        ("r1", VALID_DOC, _ts(0, 50)),
    ])
    # batch 2: event time 10:20 → watermark advances to 10:15 > 10:01
    _write_batch(spark, src, "b2", [("r2", VALID_DOC, _ts(20, 0))])
    # batch 3: the 10:15 watermark is now in effect; the 10:00 window
    # evicts+emits during this batch
    _write_batch(spark, src, "b3", [("r2", VALID_DOC, _ts(21, 0))])
    # batch 4: LATE row for the already-closed 10:00 window → dropped
    _write_batch(spark, src, "b4", [("r1", INVALID_DOC, _ts(0, 40))])

    plan = compile_schema(PLAN_SCHEMA)
    stream = (
        spark.readStream.schema(SCHEMA_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    rates = windowed_violation_rate(
        stream, plan, "content", "event_time",
        window_duration="1 minute", watermark_delay="5 minutes",
    )
    q = (
        rates.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_rates")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_rates order by window_start").collect()
    # only the 10:00 window closed (10:20's window is still open at end)
    assert len(rows) == 1, rows
    r = rows[0]
    assert r.window_start == _ts(0, 0) and r.window_end == _ts(1, 0)
    # batch 3's late invalid row was dropped: 3 files, 1 failed — not 4/2
    assert r.files == 3 and r.failed == 1
    assert abs(r.violation_rate - 0.333333) < 1e-6


def test_running_verdict_counts_state_across_restarts(spark, tmp_path):
    """applyInPandasWithState totals continue across micro-batches AND
    across a second availableNow run from the same checkpoint."""
    from json_schemer_spark import compile_schema
    from json_schemer_spark.streaming.windowed import running_verdict_counts

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    plan = compile_schema(PLAN_SCHEMA)

    def run_once():
        # memory sink cannot recover from a checkpoint; foreachBatch can
        stream = (
            spark.readStream.schema(SCHEMA_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        validated = plan.validate_json_column(stream, "content")
        counts = running_verdict_counts(validated, key_col="repo")
        q = (
            counts.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # update mode re-emits a key's totals whenever it sees rows;
        # totals are monotone, so the max per key is the latest
        return {
            r.repo: (r.files, r.failed)
            for r in spark.read.parquet(out)
            .groupBy("repo")
            .agg({"files": "max", "failed": "max"})
            .withColumnRenamed("max(files)", "files")
            .withColumnRenamed("max(failed)", "failed")
            .collect()
        }

    _write_batch(spark, src, "b1", [
        ("alpha", VALID_DOC, _ts(0)),
        ("alpha", INVALID_DOC, _ts(1)),
        ("beta", VALID_DOC, _ts(2)),
    ])
    first = run_once()
    assert first["alpha"] == (2, 1) and first["beta"] == (1, 0)

    # second RUN (fresh query, same checkpoint): only the new file is
    # processed, but totals include the checkpointed state
    _write_batch(spark, src, "b2", [
        ("alpha", INVALID_DOC, _ts(3)),
        ("gamma", VALID_DOC, _ts(4)),
    ])
    second = run_once()
    assert second["alpha"] == (3, 2), second
    assert second["gamma"] == (1, 0)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


def test_streaming_dedup_exact(spark, tmp_path):
    """Streaming exact dedup: first occurrence passes, in-horizon repeats
    are suppressed, and once the watermark passes a hash's horizon its
    state is DROPPED — a far-later recrawl re-emits (bounded state is the
    contract; historical dedup belongs to the batch job)."""
    from json_schemer_spark.streaming.windowed import streaming_dedup_exact

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    _write_batch(spark, src, "b0", [("r", "dup-doc", _ts(0))])

    stream = spark.readStream.schema(SCHEMA_DDL).parquet(src)
    deduped = streaming_dedup_exact(
        stream, "content", "event_time", watermark_delay="10 minutes")
    q = (
        deduped.select("repo", "content", "event_time")
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second").start()
    )
    try:
        def _settle():
            deadline = time.time() + 30
            while time.time() < deadline:
                q.processAllAvailable()
                time.sleep(0.3)
                if not q.status["isDataAvailable"]:
                    break

        _settle()
        # in-horizon duplicate + one distinct doc
        _write_batch(spark, src, "b1", [("r", "dup-doc", _ts(2)),
                                        ("r", "other-doc", _ts(2))])
        _settle()
        rows = spark.sql("select content from dedup_out").collect()
        contents = sorted(r.content for r in rows)
        assert contents == ["dup-doc", "other-doc"], contents

        # advance the watermark far past dup-doc's horizon (0:00 + 10 min),
        # with a separating batch so the new watermark takes effect
        _write_batch(spark, src, "b2", [("r", "advancer", _ts(40))])
        _settle()
        _write_batch(spark, src, "b3", [("r", "separator", _ts(41))])
        _settle()
        # state expired -> the recrawl of dup-doc re-emits
        _write_batch(spark, src, "b4", [("r", "dup-doc", _ts(42))])
        _settle()
        n_dup = spark.sql(
            "select count(*) n from dedup_out where content = 'dup-doc'"
        ).collect()[0].n
        assert n_dup == 2, f"expected horizon-expired recrawl to re-emit, got {n_dup}"
    finally:
        q.stop()


def test_streaming_dedup_exact_scoped_id_cols(spark, tmp_path):
    """``id_cols`` scopes the dedup key (round-4 advice: the parameter was
    accepted but ignored): identical content in DIFFERENT repos passes,
    the in-repo duplicate is suppressed."""
    from json_schemer_spark.streaming.windowed import streaming_dedup_exact

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    _write_batch(spark, src, "b0", [("repo-a", "same-doc", _ts(0)),
                                    ("repo-b", "same-doc", _ts(0)),
                                    ("repo-a", "same-doc", _ts(1))])

    stream = spark.readStream.schema(SCHEMA_DDL).parquet(src)
    deduped = streaming_dedup_exact(
        stream, "content", "event_time",
        watermark_delay="10 minutes", id_cols=["repo"])
    q = (
        deduped.select("repo", "content")
        .writeStream.format("memory").queryName("dedup_scoped_out")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
        rows = spark.sql("select repo from dedup_scoped_out").collect()
        assert sorted(r.repo for r in rows) == ["repo-a", "repo-b"]
    finally:
        q.stop()
