"""Golden-dump writer — the WRITE_FIXTURES analogue of the reference's
suite runner (test/json_schema_test_suite_test.rb:112-119): dumps OUR
classic-error output for every suite test into fixtures/<draft>.json in the
same shape as /root/reference/test/fixtures, so future rounds can diff
regressions without re-deriving expectations.

Usage: python scripts/write_fixtures.py [draft ...]
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
from json_schemer_spark.schema.suite import SUITE_ROOT, make_evaluator

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
DRAFTS = sys.argv[1:] or ["draft4", "draft6", "draft7", "draft2019-09", "draft2020-12"]


def dump(draft: str) -> str:
    base = os.path.join(SUITE_ROOT, "tests", draft)
    out: dict[str, list] = {}
    for root, _dirs, files in os.walk(base):
        for fn in sorted(files):
            if not fn.endswith(".json"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, os.path.dirname(SUITE_ROOT))
            assert_fmt = "optional/format/" in rel.replace(os.sep, "/")
            suite = json.load(open(path))
            groups_out = []
            for group in suite:
                tests_out = []
                try:
                    ev = make_evaluator(group["schema"], draft)
                    if assert_fmt:
                        ev.assert_formats = True
                except Exception as exc:
                    groups_out.append([[{"compile_error": str(exc)}]
                                       for _ in group["tests"]])
                    continue
                for test in group["tests"]:
                    try:
                        res = ev.validate(test["data"])
                        tests_out.append([
                            {"data_pointer": e["instance_pointer"],
                             "schema_pointer": e["schema_pointer"],
                             "type": e["keyword"],
                             "error": e["message"]}
                            for e in res["errors"]
                        ])
                    except Exception as exc:
                        tests_out.append([{"validate_error": str(exc)}])
                groups_out.append(tests_out)
            out[rel.replace(os.sep, "/")] = groups_out
    os.makedirs(OUT_DIR, exist_ok=True)
    dest = os.path.join(OUT_DIR, f"{draft}.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    return dest


if __name__ == "__main__":
    for d in DRAFTS:
        dest = dump(d)
        print(f"{d}: wrote {dest} ({os.path.getsize(dest)} bytes)")
