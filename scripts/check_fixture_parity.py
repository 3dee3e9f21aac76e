"""Classic-error parity vs the reference's golden fixtures
(/root/reference/test/fixtures/<draft>.json): exact match of the
per-test error sets at (data_pointer, schema_pointer, type) granularity.

Round-2 hardening (review action): NOTHING may be silently skipped — any
missing file, group-count mismatch, compile error, or validate crash is
counted and reported, so the parity percentage's denominator can't shrink.

Usage: python scripts/check_fixture_parity.py [draft] [-v]
"""
import json, os, sys
sys.path.insert(0, "/root/repo")
from json_schemer_spark.schema.suite import SUITE_ROOT, make_evaluator

def run(draft: str, verbose: bool = False):
    fixtures = json.load(open(f"/root/reference/test/fixtures/{draft}.json"))
    total = exact = 0
    skipped: list[str] = []
    kw_hist = {}
    samples = []
    for file_rel, groups_fx in fixtures.items():
        # fixture keys are repo-relative suite paths, including optional/
        # subdirs ("JSON-Schema-Test-Suite/tests/<draft>/optional/x.json");
        # the old basename lookup conflated optional/anchor.json with
        # anchor.json AND silently dropped every optional file
        rel = file_rel.split("JSON-Schema-Test-Suite/", 1)[-1]
        fname = rel.split(f"tests/{draft}/", 1)[-1]
        path = os.path.join(SUITE_ROOT, "tests", draft, fname)
        assert_fmt = fname.startswith("optional/format/")
        if not os.path.exists(path):
            skipped.append(f"missing suite file {fname}")
            continue
        suite = json.load(open(path))
        if len(suite) != len(groups_fx):
            skipped.append(f"group-count mismatch {fname}: {len(suite)} vs {len(groups_fx)}")
            continue
        for gi, group in enumerate(suite):
            if len(group["tests"]) != len(groups_fx[gi]):
                skipped.append(f"test-count mismatch {fname}#{gi}")
                continue
            try:
                ev = make_evaluator(group["schema"], draft)
                # the reference asserts format for optional/format files
                # (test/json_schema_test_suite_test.rb:50)
                if assert_fmt:
                    ev.assert_formats = True
            except Exception as exc:
                skipped.append(f"compile error {fname}#{gi}: {exc}")
                continue
            for ti, test in enumerate(group["tests"]):
                try:
                    res = ev.validate(test["data"])
                except Exception as exc:
                    skipped.append(f"validate crash {fname}#{gi}.{ti}: {exc}")
                    continue
                ours = {(e["instance_pointer"], e["schema_pointer"], e["keyword"])
                        for e in res["errors"]}
                theirs = {(e["data_pointer"], e["schema_pointer"], e["type"])
                          for e in groups_fx[gi][ti]}
                total += 1
                if ours == theirs:
                    exact += 1
                else:
                    for t in theirs - ours:
                        kw_hist[("ref", t[2])] = kw_hist.get(("ref", t[2]), 0) + 1
                    for t in ours - theirs:
                        kw_hist[("ours", t[2])] = kw_hist.get(("ours", t[2]), 0) + 1
                    if len(samples) < 15:
                        samples.append((fname, group["description"][:30], test["description"][:30],
                                        sorted(theirs - ours)[:3], sorted(ours - theirs)[:3]))
    print(f"{draft}: exact classic-error parity {exact}/{total} ({100*exact/total:.1f}%)"
          f"{'' if not skipped else f'  [{len(skipped)} SKIPPED!]'}")
    for s in skipped[:10]:
        print("SKIPPED:", s)
    if verbose:
        print("mismatch histogram:", dict(sorted(kw_hist.items(), key=lambda x: -x[1])[:18]))
        for s in samples:
            print("MISMATCH", s[0], "|", s[1], "|", s[2])
            print("   ref :", s[3])
            print("   ours:", s[4])
    return exact, total, skipped

if __name__ == "__main__":
    draft = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "draft2020-12"
    _exact, _total, _skipped = run(draft, verbose="-v" in sys.argv)
    sys.exit(0 if not _skipped else 1)
