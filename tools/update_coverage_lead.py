#!/usr/bin/env python
"""Regenerate COVERAGE.md's machine-checked lead line from the newest
CORRECTNESS_r*.json (VERDICT r12 item 1).

Two consecutive rounds (r11→r12, r12→r13) opened with the
docs-consistency gate red for the same mechanical reason: the driver
writes a fresh CORRECTNESS file AFTER the builder's final commit, so
the lead line in COVERAGE.md cites the previous round.  Running this
as the first act of every round closes that boundary gap.

Also refreshes the registry-count bullet ("N registered queries /
M carry full DuckDB oracles") from the live registry so the two
numbers COVERAGE.md leads with can never drift from the code.

Usage:  python tools/update_coverage_lead.py   (idempotent; prints a
diff-style summary and exits 0, or exits 1 if COVERAGE.md lacks the
expected machine-checked lines)
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_correctness() -> tuple[int, int, int, int]:
    files = sorted(
        glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    if not files:
        raise SystemExit("no CORRECTNESS_r*.json found")
    newest = files[-1]
    rnd = int(re.search(r"_r(\d+)", newest).group(1))
    rows = json.load(open(newest))
    green = sum(
        1 for r in rows.values()
        if r.get("rows_match") and r.get("schema_match")
        and r.get("hash_match") is not False
    )
    return rnd, green, len(rows) - green, len(rows)


def registry_counts() -> tuple[int, int]:
    sys.path.insert(0, _ROOT)
    from datapipelinerepo_spark.registry import REGISTRY
    import datapipelinerepo_spark.registry_ext  # noqa: F401
    return len(REGISTRY), sum(1 for e in REGISTRY.values() if e.sql is not None)


def main() -> int:
    rnd, green, red, total = newest_correctness()
    nreg, nora = registry_counts()
    path = os.path.join(_ROOT, "COVERAGE.md")
    text = open(path).read()

    lead_pat = re.compile(
        r"Newest driver check: CORRECTNESS_r\d+ — \d+ green / \d+ red of\s+\d+ rows"
    )
    new_lead = (
        f"Newest driver check: CORRECTNESS_r{rnd} — {green} green / "
        f"{red} red of\n  {total} rows"
    )
    if not lead_pat.search(text):
        print("ERROR: COVERAGE.md lacks the machine-checked lead line")
        return 1
    text, n1 = lead_pat.subn(new_lead, text, count=1)

    # VERDICT r13 item 1: the section header carried a hand-written
    # round number that went stale every boundary — fold it into what
    # this tool rewrites.
    hdr_pat = re.compile(r"## Current state \(round \d+\)")
    text, nh = hdr_pat.subn(f"## Current state (round {rnd})", text, count=1)

    cnt_pat = re.compile(
        r"\*\*\d+ registered queries\*\* \(`registry\.py` \+ "
        r"`registry_ext\.py`\);\n  \*\*\d+ carry full DuckDB oracles\*\*"
    )
    new_cnt = (
        f"**{nreg} registered queries** (`registry.py` + "
        f"`registry_ext.py`);\n  **{nora} carry full DuckDB oracles**"
    )
    if not cnt_pat.search(text):
        print("ERROR: COVERAGE.md lacks the registered/oracled count bullet")
        return 1
    text, n2 = cnt_pat.subn(new_cnt, text, count=1)

    open(path, "w").write(text)
    print(f"COVERAGE.md lead -> CORRECTNESS_r{rnd}: {green} green / "
          f"{red} red of {total}; counts -> {nreg} registered / "
          f"{nora} oracled ({n1 + nh + n2} lines touched)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
