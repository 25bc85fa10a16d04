"""Capture `explain("formatted")` for the r14-touched queries.

    python tools/capture_r14_plans.py <suffix> [sf_dir] [query ...]

Writes plans/r14/<query>_<suffix>.txt for each query (default list = the
queries touched by the r14 optimization waves). Run once with suffix
`before` from a pre-wave checkout (git worktree) and once with `after`
from HEAD — the judge checks plan-shape claims in OPTIMIZATION_r14.md
against these files. Plan shape is sf-independent; default sf0.01 keeps
side-effecting index builds cheap.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod
from odbc2deltalake_spark.session import get_spark

DEFAULT_QUERIES = [
    "sim_ann_pq",
    "sim_ann_opq",
    "sim_ann_ivfpq_search",
    "sim_ann_ivfpq_incremental",
    "dedup_cluster",
    "dedup_minhash_lsh",
    "text_letter_entropy",
    "bm25_index_search",
    "text_classifier_score",
    "sim_ann_ivf",
]

# plans/r14 lives at the REPO ROOT of the main checkout, not the worktree:
# before/after pairs must land side by side regardless of which checkout
# ran the capture
OUT_DIR = Path("/root/repo/plans/r14")


def main() -> int:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:] or DEFAULT_QUERIES
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture_r14_plans")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered in this checkout")
            continue
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record, keep going
            plan = f"ERROR building/explaining {name}: {e}\n"
        out = OUT_DIR / f"{name}_{suffix}.txt"
        out.write_text(
            f"# {name} — explain(formatted) @ {sf_dir} [{suffix}]\n" + plan
        )
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
