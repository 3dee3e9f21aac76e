"""spark-submit CLI end-to-end (validate.py): exit codes, summary line,
--errors MAX, and the round-4 --pretty human-readable output."""

import json
import os
import subprocess
import sys


def test_cli_pretty_and_exit_code(tmp_path, spark):
    table = str(tmp_path / "corpus")
    schema_path = str(tmp_path / "schema.json")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [('{"name": "ok"}',), ('{"name": "x"}',), ('{}',)], "content string"
    ).write.parquet(table)
    with open(schema_path, "w") as f:
        json.dump({"type": "object", "required": ["name"],
                   "properties": {"name": {"type": "string", "minLength": 2}}}, f)

    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/validate.py", "--table", table,
         "--schema", schema_path, "--out", out, "--errors", "5", "--pretty"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 1, r.stderr[-1500:]  # violations exist → non-zero
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    summary = json.loads(next(l for l in lines if l.startswith("{")))
    assert summary == {"rows": 3, "failed": 2}
    pretty = [l for l in lines if l.startswith(("root ", "property "))]
    assert sorted(pretty) == [
        "property '/name' is invalid: error_type=minLength",
        "root is missing required keys: name",
    ], pretty
    # the pretty column landed in the parquet output too
    cols = spark.read.parquet(out).columns
    assert "pretty" in cols
