"""Optional-suite format conformance (assert_formats=True): 100% on every
draft, including idn-hostname's IDNA-2008 context rules."""

import json
import os

import pytest

from json_schemer_spark.schema.dialects import DIALECTS_BY_NAME
from json_schemer_spark.schema.interpreter import Evaluator
from json_schemer_spark.schema.registry import Registry
from json_schemer_spark.schema.suite import DRAFT_DIRS, SUITE_ROOT, _remotes_resolver

FLOORS = {
    "draft4": 1.0,
    "draft6": 1.0,
    "draft7": 1.0,
    "draft2019-09": 1.0,
    "draft2020-12": 1.0,
}


@pytest.mark.parametrize("draft", list(FLOORS))
def test_optional_format_conformance(draft):
    d = os.path.join(SUITE_ROOT, "tests", DRAFT_DIRS[draft], "optional", "format")
    total = passed = 0
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            groups = json.load(f)
        for g in groups:
            dialect = DIALECTS_BY_NAME[draft]
            reg = Registry(ref_resolver=_remotes_resolver(), default_dialect=dialect)
            ev = Evaluator(g["schema"], registry=reg, dialect=dialect, assert_formats=True)
            for t in g["tests"]:
                total += 1
                try:
                    if ev.valid(t["data"]) == t["valid"]:
                        passed += 1
                except Exception:
                    pass
    rate = passed / total
    assert rate >= FLOORS[draft], f"{draft}: {passed}/{total} = {rate:.3f}"
