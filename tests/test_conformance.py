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
