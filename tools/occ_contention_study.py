"""OCC contention study (VERDICT r10 #7): cost of the auto-rebase under
N racing blind appenders.

``MAX_REBASE_ATTEMPTS = 5`` with no backoff: each conflict re-reads the
commit listing and re-classifies every commit at/above the loser's
version, so an N-appender burst can collectively do O(N²) classifier
passes. This study measures, for N = 2..16 barrier-started appender
threads on one table:

- per-appender wall latency (mean / max),
- total CommitConflictError count (== rebase loop iterations),
- classifier passes (commits re-read during rebases),
- how many appenders exhausted the attempt budget and surfaced the
  conflict to the caller.

    python tools/occ_contention_study.py [max_n] [rows_per_append]

Writes docs/occ_contention_study.json; the decision (backoff or
fail-fast) is recorded in docs/commit-format.md §concurrency.
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from odbc2deltalake_spark.session import get_spark  # noqa: E402
from odbc2deltalake_spark.tablestore import (  # noqa: E402
    CommitConflictError,
    VersionedParquetTable,
)


def run_burst(spark, root: str, n: int, rows: int) -> dict:
    base = VersionedParquetTable(root)
    base.write(
        spark.createDataFrame([(0, 0)], "id long, v long"), mode="overwrite"
    )
    conflicts = {"n": 0}
    reads = {"n": 0}
    lock = threading.Lock()

    orig_write = VersionedParquetTable._write_commit
    orig_read = VersionedParquetTable._read_commit

    def counting_write(self, commit):
        try:
            return orig_write(self, commit)
        except CommitConflictError:
            with lock:
                conflicts["n"] += 1
            raise

    def counting_read(self, v):
        with lock:
            reads["n"] += 1
        return orig_read(self, v)

    VersionedParquetTable._write_commit = counting_write
    VersionedParquetTable._read_commit = counting_read

    lat: list[float] = []
    exhausted = {"n": 0}
    barrier = threading.Barrier(n)

    def appender(i: int) -> None:
        t = VersionedParquetTable(root)
        df = spark.createDataFrame(
            [(1000 * (i + 1) + j, i) for j in range(rows)], "id long, v long"
        )
        barrier.wait()
        t0 = time.perf_counter()
        try:
            t.write(df, mode="append")
        except CommitConflictError:
            with lock:
                exhausted["n"] += 1
        lat.append(time.perf_counter() - t0)

    try:
        threads = [
            threading.Thread(target=appender, args=(i,)) for i in range(n)
        ]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
    finally:
        VersionedParquetTable._write_commit = orig_write
        VersionedParquetTable._read_commit = orig_read

    final = VersionedParquetTable(root)
    landed = final.version()  # base at 0; each landed append +1
    return {
        "n_appenders": n,
        "landed": landed,
        "exhausted_budget": exhausted["n"],
        "conflicts_total": conflicts["n"],
        "commit_reads_total": reads["n"],
        "latency_mean_s": round(sum(lat) / len(lat), 3),
        "latency_max_s": round(max(lat), 3),
        "burst_wall_s": round(wall, 3),
    }


def main() -> None:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("occ_contention_study")
    out = []
    for n in [2, 4, 8, 12, max_n]:
        root = tempfile.mkdtemp(prefix=f"occ_burst_{n}_") + "/t"
        r = run_burst(spark, root, n, rows)
        print(json.dumps(r))
        out.append(r)
    path = REPO / "docs" / "occ_contention_study.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
