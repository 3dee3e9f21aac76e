"""Classic-error parity vs the reference's golden fixtures
(/root/reference/test/fixtures/<draft>.json): exact match of the
per-test error sets at (data_pointer, schema_pointer, type) granularity.

Usage: python scripts/check_fixture_parity.py [draft] [-v]
"""
import json, os, sys
sys.path.insert(0, "/root/repo")
from json_schemer_spark.schema.suite import SUITE_ROOT, make_evaluator

def run(draft: str, verbose: bool = False):
    fixtures = json.load(open(f"/root/reference/test/fixtures/{draft.replace('draft','draft') if draft.startswith('draft2') else draft}.json"))
    total = exact = 0
    kw_hist = {}
    samples = []
    for file_rel, groups_fx in fixtures.items():
        fname = os.path.basename(file_rel)
        path = os.path.join(SUITE_ROOT, "tests", draft, fname)
        if not os.path.exists(path):
            continue
        suite = json.load(open(path))
        if len(suite) != len(groups_fx):
            continue
        for gi, group in enumerate(suite):
            if len(group["tests"]) != len(groups_fx[gi]):
                continue
            try:
                ev = make_evaluator(group["schema"], draft)
            except Exception:
                continue
            for ti, test in enumerate(group["tests"]):
                try:
                    res = ev.validate(test["data"])
                except Exception:
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
    print(f"{draft}: exact classic-error parity {exact}/{total} ({100*exact/total:.1f}%)")
    if verbose:
        print("mismatch histogram:", dict(sorted(kw_hist.items(), key=lambda x: -x[1])[:18]))
        for s in samples:
            print("MISMATCH", s[0], "|", s[1], "|", s[2])
            print("   ref :", s[3])
            print("   ours:", s[4])
    return exact, total

if __name__ == "__main__":
    draft = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "draft2020-12"
    run(draft, verbose="-v" in sys.argv)
