"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + order-insensitive values. Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def normalize(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, round floats."""
    idx = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            if isinstance(v, bool):
                v = bool(v)
            vals.append(str(v))
        out.append("\x00".join(vals))
    return sorted(out)


def main():
    # --json <path>: also write a machine-readable artifact (round-7
    # verdict ask #2 — the driver's CORRECTNESS file stops at ~50
    # queries, so the full local sweep is committed each round).
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL {name}: spark error {type(exc).__name__}: {str(exc)[:200]}")
            results[name] = {"status": "fail", "reason": f"spark error {type(exc).__name__}"}
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            results[name] = {"status": "rows_only", "rows": len(srows)}
            n_rowsonly += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error {type(exc).__name__}: {str(exc)[:200]}")
            results[name] = {"status": "fail", "reason": f"duckdb error {type(exc).__name__}"}
            n_fail += 1
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            print(f"FAIL {name}: column mismatch spark={sorted(scols)} duck={sorted(ocols)}")
            results[name] = {"status": "fail", "reason": "column mismatch"}
            n_fail += 1
            continue
        a = normalize(srows, [c.lower() for c in scols])
        b = normalize(orows, [c.lower() for c in ocols])
        if len(a) != len(b):
            print(f"FAIL {name}: row count spark={len(a)} duck={len(b)}")
            results[name] = {"status": "fail", "reason": "row count mismatch"}
            n_fail += 1
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            results[name] = {"status": "fail", "reason": "value mismatch"}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(a)} rows")
            results[name] = {"status": "pass", "rows": len(a)}
            n_pass += 1
    print(f"\nRESULT: {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_path:
        import json as _json

        with open(json_path, "w") as fh:
            _json.dump({
                "sf_dir": sf_dir,
                "n_pass": n_pass, "n_fail": n_fail, "n_rows_only": n_rowsonly,
                "queries": results,
            }, fh, indent=1)
            fh.write("\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
