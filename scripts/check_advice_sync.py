"""Staleness guard for ADVICE.md (round-7 verdict item 5).

The round-7 verdict flagged ADVICE.md carrying already-fixed items as
false signal for the next round.  This guard enforces the repo's
convention: every advisor item (a top-level `- **severity**` bullet)
must carry a `STATUS` line saying what happened to it, and any test
path a STATUS line cites must exist.  A fresh advisor drop (items with
no STATUS yet) fails the guard until the items are triaged — which is
exactly the forcing function the verdict asked for.

Wire-up: .git/hooks/pre-commit runs this when ADVICE.md is staged
(scripts/install_hooks.sh).  Run manually: python scripts/check_advice_sync.py
"""

from __future__ import annotations

import os
import re
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "ADVICE.md")
    if not os.path.exists(path):
        print("no ADVICE.md — nothing to check")
        return 0
    text = open(path).read()

    # split into top-level items: lines starting "- **"
    items = re.split(r"(?m)^(?=- \*\*)", text)
    items = [it for it in items if it.startswith("- **")]
    if not items:
        print("ADVICE.md has no advisor items — ok")
        return 0

    errors: list[str] = []
    for it in items:
        header = it.splitlines()[0][:100]
        m = re.search(r"(?m)^\s*STATUS\b.*$", it)
        if not m:
            errors.append(f"no STATUS line: {header}")
            continue
        # every cited test path must exist (strip ::test selectors)
        # filename chars beyond \w (dashes, extra dots) must not let a
        # citation silently escape the existence check
        for cite in re.findall(r"tests/[\w./-]+\.py", it):
            if not os.path.exists(os.path.join(repo, cite)):
                errors.append(f"STATUS cites missing file {cite}: {header}")

    if errors:
        print("ADVICE.md is stale / untriaged:")
        for e in errors:
            print(" -", e)
        print("annotate each item with a STATUS line (FIXED/WONTFIX/...)"
              " citing the guard test, then git add ADVICE.md")
        return 1
    print(f"ADVICE.md in sync: {len(items)} items, all triaged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
