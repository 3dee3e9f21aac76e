"""Classic-error parity vs the reference's golden fixtures
(/root/reference/test/fixtures/<draft>.json): our violation rows must
match json_schemer's classic output EXACTLY at
(data_pointer, schema_pointer, type) granularity — every test, every draft.
"""

import pytest

import sys

sys.path.insert(0, "/root/repo/scripts")

from check_fixture_parity import run as parity_run

DRAFTS = ["draft4", "draft6", "draft7", "draft2019-09", "draft2020-12"]


@pytest.mark.parametrize("draft", DRAFTS)
def test_classic_error_parity(draft):
    exact, total, skipped = parity_run(draft)
    # the 100% claim is only airtight with an unshrunk denominator
    # (round-2 hardening: nothing may be silently skipped)
    assert not skipped, f"{draft}: skipped {skipped[:5]}"
    assert exact == total, f"{draft}: {exact}/{total}"
