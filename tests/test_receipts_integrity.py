"""Receipts-integrity gate (r10 verdict ask #1b).

Rounds 9 and 10 each shipped a doc sentence citing a ``RECEIPT_*.json``
that was never committed (SCALE.md:1311 in r9, SCALE.md:1601 in r10 —
both written while the run they described was still in flight and never
reconciled at end-of-round). Two rounds in a row makes the fix
structural: every receipt filename named in a builder-authored markdown
doc must exist in the repo, enforced at pytest time so a dangling
citation fails the tree it was committed on.

Scope: builder-authored ``*.md`` at the repo root plus any tracked
markdown under source dirs. VERDICT.md and ADVICE.md are excluded —
they are judge/advisor-written and legitimately *name* missing files as
findings (the r10 verdict quotes the dangling filename four times; that
is a report, not a citation promising evidence).

The inverse direction is covered too: every committed ``RECEIPT_*.json``
must have a row in RECEIPTS.md (the index exists so a fresh context can
find the evidence; r10 left it two receipts stale — verdict ask #2).
"""

import json
import os
import re
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Judge/advisor-authored files: they report on receipts (including
# missing ones) rather than citing them as evidence they produced.
EXCLUDED = {"VERDICT.md", "ADVICE.md"}

TOKEN = re.compile(r"RECEIPT_[A-Za-z0-9_]*\.json")


def _tracked_markdown() -> list:
    out = subprocess.run(
        ["git", "ls-files", "*.md"], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout
    return [p for p in out.splitlines() if os.path.basename(p) not in EXCLUDED]


def test_every_cited_receipt_exists():
    """Every RECEIPT_*.json token in builder-authored markdown must be a
    real committed file (would have failed the r9 and r10 trees)."""
    dangling = []
    for md in _tracked_markdown():
        with open(os.path.join(REPO, md), encoding="utf-8") as f:
            for lineno, line in enumerate(f, 1):
                for token in TOKEN.findall(line):
                    if not os.path.exists(os.path.join(REPO, token)):
                        dangling.append(f"{md}:{lineno} cites {token}")
    assert not dangling, (
        "markdown cites receipts that do not exist in the repo "
        "(commit the receipt, or reword the sentence to say the gates "
        "were observed but not retained):\n  " + "\n  ".join(dangling)
    )


def test_every_committed_receipt_is_indexed():
    """Every committed RECEIPT_*.json must have a RECEIPTS.md row."""
    receipts = sorted(
        f for f in os.listdir(REPO) if TOKEN.fullmatch(f)
    )
    assert receipts, "no receipts at repo root — the scale story regressed"
    with open(os.path.join(REPO, "RECEIPTS.md"), encoding="utf-8") as f:
        index = f.read()
    missing = [r for r in receipts if r not in index]
    assert not missing, f"RECEIPTS.md has no row for: {missing}"


def test_committed_receipts_parse_and_gates_green():
    """Committed receipts must be valid JSON whose recorded gates are all
    ok=true — a receipt is evidence only if its own gates passed."""
    for fname in sorted(f for f in os.listdir(REPO) if TOKEN.fullmatch(f)):
        with open(os.path.join(REPO, fname), encoding="utf-8") as f:
            receipt = json.load(f)
        gates = receipt.get("gates", [])
        bad = [g for g in gates if not g.get("ok")]
        assert not bad, f"{fname}: non-green gates {bad}"
        shape = receipt.get("sink_shape")
        if shape is not None:
            assert shape.get("ok"), f"{fname}: sink_shape not ok: {shape}"


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-v"]))
