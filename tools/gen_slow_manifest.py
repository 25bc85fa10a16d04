"""Generate tests/slow_manifest.json from a pytest --durations=0 report
(VERDICT r14 #2: the 998-test suite outgrew the driver's VERIFY budget —
37-55 min wall; the default run must finish < 15 min).

    python -m pytest tests/ -q --durations=0 > /tmp/durations.txt
    python tools/gen_slow_manifest.py /tmp/durations.txt

Selection rule (measured-first, guide §1):

- a test is SLOW when its measured call time >= CUT seconds;
- per FILE, the fastest test always stays in the default set, so every
  operator family keeps smoke coverage in the driver's `pytest tests/`
  run even if all of a file's tests are individually heavy.

Slow tests still run — `python -m pytest tests/ -m slow` (the round-close
full gate) — and total oracle coverage is unchanged: the overflow oracle
rows the manifest defers are the same comparisons tools/check_correctness.py
executes in the per-round sf0.01 gate and the sf0.1 sweep.
"""

from __future__ import annotations

import json
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CUT = 3.0  # seconds (measured r15: default must clear the 15-min VERIFY budget with margin)


def main() -> int:
    report = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/durations.txt")
    per_test: dict[str, float] = {}
    for line in report.read_text().splitlines():
        m = re.match(r"(\d+\.\d+)s call\s+(tests/\S+)", line.strip())
        if m:
            per_test[m.group(2)] = float(m.group(1))
    by_file: dict[str, list[tuple[str, float]]] = defaultdict(list)
    for nid, sec in per_test.items():
        by_file[nid.split("::")[0]].append((nid, sec))

    slow: dict[str, float] = {}
    for f, tests in by_file.items():
        tests.sort(key=lambda t: t[1])
        fastest = tests[0][0]
        for nid, sec in tests:
            if sec >= CUT and nid != fastest:
                slow[nid] = sec

    out = REPO / "tests" / "slow_manifest.json"
    out.write_text(
        json.dumps(
            {
                "cut_seconds": CUT,
                "generated_from": str(report),
                "n_slow": len(slow),
                "n_total_measured": len(per_test),
                "slow_seconds_sum": round(sum(slow.values()), 1),
                "fast_seconds_sum": round(
                    sum(s for s in per_test.values()) - sum(slow.values()), 1
                ),
                "slow": {k: round(v, 1) for k, v in sorted(slow.items())},
            },
            indent=1,
        )
    )
    print(
        f"wrote {out}: {len(slow)} slow of {len(per_test)} measured; "
        f"default keeps {round(sum(s for s in per_test.values()) - sum(slow.values()))}s "
        f"of {round(sum(per_test.values()))}s measured call time"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
