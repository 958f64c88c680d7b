"""docs/api_reference.md is generated from live docstrings — regenerate and
assert byte-equality so the committed reference can never drift from the
code (the enforcement mechanism VERDICT round 3 item 8 asked for)."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_api_reference_up_to_date():
    sys.path.insert(0, str(REPO / "tools"))
    import gen_api_docs

    want = gen_api_docs.generate()
    got = (REPO / "docs" / "api_reference.md").read_text()
    assert got == want, (
        "docs/api_reference.md is stale — run: python tools/gen_api_docs.py"
    )
