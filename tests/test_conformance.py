"""JSON-Schema-Test-Suite conformance — the reference's backbone test
strategy (SURVEY.md §5; reference runner test/json_schema_test_suite_test.rb).

The interpreter tier must pass 100% of non-optional cases on every draft,
exactly like the reference does.
"""

import pytest

from json_schemer_spark.schema.suite import run_draft

DRAFTS = ["draft4", "draft6", "draft7", "draft2019-09", "draft2020-12"]


@pytest.mark.parametrize("draft", DRAFTS)
def test_full_conformance(draft):
    passed, total, failures = run_draft(draft)
    detail = "; ".join(
        f"{c.file}|{c.group}|{c.description}|{err}" for c, err in failures[:5]
    )
    assert passed == total, f"{draft}: {passed}/{total} — first failures: {detail}"


@pytest.mark.parametrize("draft", DRAFTS)
def test_optional_conformance(draft):
    """Optional (non-format) suite: bignum, ecmascript-regex, non-bmp-regex,
    float-overflow, dependencies-compatibility, ... — also 100%."""
    import json
    import os

    from json_schemer_spark.schema.suite import (
        DRAFT_DIRS,
        SUITE_ROOT,
        _remotes_resolver,
        make_evaluator,
    )

    d = os.path.join(SUITE_ROOT, "tests", DRAFT_DIRS[draft], "optional")
    total = passed = 0
    first_fail = None
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            groups = json.load(f)
        for g in groups:
            ev = make_evaluator(g["schema"], draft)
            for t in g["tests"]:
                total += 1
                try:
                    ok = ev.valid(t["data"]) == t["valid"]
                except Exception:
                    ok = False
                if ok:
                    passed += 1
                elif first_fail is None:
                    first_fail = f"{name}|{g['description']}|{t['description']}"
    assert passed == total, f"{draft} optional: {passed}/{total} — {first_fail}"
