"""Round-close checklist executor (VERDICT r6 #1: the regen step must be
part of the routine, not a memory).

    python tools/round_close.py [--full]

Steps, in order, fail-fast:

1. Regenerate docs/ROTATION_LEDGER.md from the committed CORRECTNESS_r*
   artifacts and report whether it changed (if it did, it must be
   committed — test_rotation_ledger enforces currency from a clean
   checkout).
2. Recompute the headline sum from the NEWEST BENCH_r*.json tail and
   print it — round claims must quote THIS number, nothing else
   (the r6 "31.1s" incident: a number no committed artifact contained).
3. Untracked round artifacts (CORRECTNESS/BENCH jsons) are listed as
   MUST-COMMIT.
4. --full: also run the ledger test file and the overflow oracle gate.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def sh(*args: str) -> str:
    return subprocess.run(args, capture_output=True, text=True, cwd=REPO).stdout


def main() -> int:
    rc = 0
    # 1. ledger regen
    before = (REPO / "docs/ROTATION_LEDGER.md").read_text()
    subprocess.run(
        [sys.executable, "tools/rotation_ledger.py", "--write"], cwd=REPO, check=True
    )
    after = (REPO / "docs/ROTATION_LEDGER.md").read_text()
    if before != after:
        print("LEDGER: regenerated with CHANGES -> commit docs/ROTATION_LEDGER.md")
    else:
        print("LEDGER: current")

    # 2. headline from the newest committed bench artifact
    benches = sorted(REPO.glob("BENCH_r*.json"))
    if benches:
        latest = benches[-1]
        d = json.loads(latest.read_text())
        tail = d.get("tail", "")
        m = re.search(r'"queries": \{([^}]*)\}', tail)
        if m:
            qs = json.loads("{" + m.group(1) + "}")
            print(
                f"BENCH: {latest.name} headline sum = "
                f"{sum(qs.values()):.1f}s over {len(qs)} queries "
                "(quote THIS number, no other)"
            )
        else:
            print(f"BENCH: {latest.name} has no parseable queries dict")

    # 3. untracked round artifacts
    untracked = [
        ln[3:]
        for ln in sh("git", "status", "--porcelain").splitlines()
        if ln.startswith("??")
        and re.match(r"(CORRECTNESS|BENCH)_r\d+\.json", ln[3:])
    ]
    for f in untracked:
        print(f"MUST-COMMIT: {f} is untracked")
        rc = 1
    if before != after:
        rc = 1

    if "--full" in sys.argv:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_rotation_ledger.py",
             "tests/test_correctness_extras.py", "-q"],
            cwd=REPO,
        )
        rc = rc or r.returncode
    print("round_close:", "CLEAN" if rc == 0 else "ACTION REQUIRED")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
