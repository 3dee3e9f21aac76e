"""Golden-fixture oracles for the queries DuckDB cannot express (VERDICT r2
ask #6): q17-q20 (xxhash64-based LSH/simhash/fingerprints), q26 (multimodal
plumbing), q27 (LSH-ANN recall). Generation is fully deterministic (seeded
xxhash64, hash-of-id synthetic data), so the expected outputs at sf0.001 are
frozen in fixtures/golden/*.json — every `queries()` entry now has a hard
pass/fail signal: DuckDB for the SQL-expressible ones, these for the rest.

Regenerate (only after an INTENTIONAL semantic change) with the snippet in
the repo history / COVERAGE.md; an unintentional diff here is a regression.
"""

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden")
SF = "/root/testdata/sf0.001"

QUERIES = [
    "q17_minhash_lsh_candidates",
    "q18_neardup_jaccard",
    "q19_simhash_pairs",
    "q20_fingerprints",
    "q26_media_features",
    "q27_ann_lsh_recall",
    "q34_ann_ivf_recall",
    "q36_media_features_real",
    "q38_neardup_dedup_lsh",
    "q41_media_probe",
    "q42_media_resize",
]


def _norm(rows):
    return sorted(
        [[None if v is None else (round(v, 9) if isinstance(v, float) else v)
          for v in r] for r in rows]
    )


@pytest.mark.parametrize("qname", QUERIES)
def test_golden(spark, qname):
    import __spark_entry__ as entrymod

    with open(os.path.join(GOLDEN_DIR, f"{qname}.json")) as f:
        expected = json.load(f)
    df = entrymod.queries()[qname](spark, SF)
    assert df.columns == expected["columns"]
    got = _norm([list(r) for r in df.collect()])
    want = _norm(expected["rows"])
    assert got == want, (
        f"{qname}: {len(got)} rows vs golden {len(want)}; "
        f"first diff: {next(((a, b) for a, b in zip(got, want) if a != b), None)}"
    )
