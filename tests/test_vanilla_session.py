"""Session-independence gate: the external driver runs queries() on a
VANILLA SparkSession (none of the engine's confs — no UTC pin, no
nanosAsLong, default shuffle partitions). Every round-4-class failure
(events encoding, timezone-sensitive casts) is a session-dependence bug,
so the most session-sensitive queries are executed here under exactly
that condition, in a separate JVM via tools/check_correctness --vanilla.

Sentinels chosen for maximum sensitivity: every query that reads
events.ts (encoding + TZ), the date-casting retention query, and one
scalar watermark probe. One subprocess (~60s) covers all of them."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SENTINELS = [
    "ev_sessionize",
    "p6_delta_filter",
    "ev_asof_join",
    "ev_range_join",
    "ev_hourly_rollup",
    "ev_retention",
    "ev_funnel",
    "a1_watermark_probe",
]


def test_sentinel_queries_pass_on_vanilla_session():
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "check_correctness.py"),
            "/root/testdata/sf0.001",
            *SENTINELS,
            "--vanilla",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "all queries pass" in out
    for name in SENTINELS:
        assert f"PASS {name}" in out, f"{name} missing from vanilla run:\n{out[-4000:]}"
