"""JSON-Schema-Test-Suite replay harness (driver-side).

Loads the vendored suite (reference: /root/reference/JSON-Schema-Test-Suite,
the same corpus the reference's runner consumes at
test/json_schema_test_suite_test.rb:37-121) and replays every case through
our Evaluator. Used by pytest and by the Spark conformance tests, which
stuff each case's ``data`` into a corpus-shaped DataFrame row.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Iterator, Optional

from json_schemer_spark.schema.dialects import DIALECTS_BY_NAME, Dialect
from json_schemer_spark.schema.interpreter import Evaluator
from json_schemer_spark.schema.registry import Registry, file_ref_resolver

SUITE_ROOT = "/root/reference/JSON-Schema-Test-Suite"
REMOTES_PREFIX = "http://localhost:1234"

DRAFT_DIRS = {
    "draft4": "draft4",
    "draft6": "draft6",
    "draft7": "draft7",
    "draft2019-09": "draft2019-09",
    "draft2020-12": "draft2020-12",
}


@dataclass
class SuiteCase:
    draft: str
    file: str
    group: str  # group description
    description: str
    schema: Any
    data: Any
    valid: bool


def _remotes_resolver():
    base = file_ref_resolver(os.path.join(SUITE_ROOT, "remotes"), REMOTES_PREFIX)
    meta = _metaschema_resolver()

    def resolve(uri: str) -> Any:
        doc = base(uri)
        if doc is None:
            doc = meta(uri)
        return doc

    return resolve


def _metaschema_resolver():
    from json_schemer_spark.schema.metaschemas import METASCHEMAS

    def resolve(uri: str) -> Any:
        return METASCHEMAS.get(uri) or METASCHEMAS.get(uri.rstrip("#"))

    return resolve


def iter_cases(
    draft: str,
    include_optional: bool = False,
    suite_root: str = SUITE_ROOT,
) -> Iterator[SuiteCase]:
    d = os.path.join(suite_root, "tests", DRAFT_DIRS[draft])
    names = sorted(f for f in os.listdir(d) if f.endswith(".json"))
    for name in names:
        with open(os.path.join(d, name)) as f:
            groups = json.load(f)
        for group in groups:
            for test in group["tests"]:
                yield SuiteCase(
                    draft=draft,
                    file=name,
                    group=group["description"],
                    description=test["description"],
                    schema=group["schema"],
                    data=test["data"],
                    valid=test["valid"],
                )
    if include_optional:
        opt = os.path.join(d, "optional")
        if os.path.isdir(opt):
            for name in sorted(f for f in os.listdir(opt) if f.endswith(".json")):
                with open(os.path.join(opt, name)) as f:
                    groups = json.load(f)
                for group in groups:
                    for test in group["tests"]:
                        yield SuiteCase(
                            draft=draft, file=f"optional/{name}", group=group["description"],
                            description=test["description"], schema=group["schema"],
                            data=test["data"], valid=test["valid"],
                        )


def make_evaluator(schema: Any, draft: str) -> Evaluator:
    dialect: Dialect = DIALECTS_BY_NAME[draft]
    registry = Registry(ref_resolver=_remotes_resolver(), default_dialect=dialect)
    return Evaluator(schema, registry=registry, dialect=dialect)


def run_draft(
    draft: str, include_optional: bool = False
) -> tuple[int, int, list[tuple[SuiteCase, Optional[str]]]]:
    """Replay one draft → (passed, total, failures[(case, error)])."""
    passed = 0
    total = 0
    failures: list[tuple[SuiteCase, Optional[str]]] = []
    eval_cache: dict[int, Evaluator] = {}
    for case in iter_cases(draft, include_optional=include_optional):
        total += 1
        try:
            ev = eval_cache.get(id(case.schema))
            if ev is None:
                ev = make_evaluator(case.schema, draft)
                eval_cache[id(case.schema)] = ev
            got = ev.valid(case.data)
            if got == case.valid:
                passed += 1
            else:
                failures.append((case, None))
        except Exception as exc:  # compile errors count as failures
            failures.append((case, f"{type(exc).__name__}: {exc}"))
    return passed, total, failures
