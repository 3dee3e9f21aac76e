"""Doc-drift gate: BENCH.md/COVERAGE.md must quote the recorded artifacts
(see scripts/check_doc_numbers.py docstring for the round-2 incident this
prevents)."""


def test_doc_numbers_match_artifacts():
    from scripts.check_doc_numbers import check

    problems = check()
    assert not problems, "\n".join(problems)
