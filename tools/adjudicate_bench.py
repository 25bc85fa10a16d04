"""Headline-only bench harness for the r13-vs-r14 adjudication (VERDICT r14 item 1).

Runs the HEADLINE list + the CDC engine block (min-of-2 per entry, same
methodology as bench.py) plus both canaries against an arbitrary checkout:

    python tools/adjudicate_bench.py /path/to/checkout [tag]

The checkout's OWN session factory and query registry are used, so arm (a)
(the r13 tree) runs with r13's session conf (1 MB default AQE merge floor)
and arm (b) (r14 HEAD) with r14's (16 KB floor). Arm (c) is r14 HEAD with
SPARK_GRAFT_MIN_PARTITION_SIZE=1m exported by the caller.

Prints ONE JSON line. This is a measurement tool only — it does not replace
bench.py and is never run by the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path


def main() -> None:
    repo = Path(sys.argv[1]).resolve()
    tag = sys.argv[2] if len(sys.argv) > 2 else repo.name
    sys.path.insert(0, str(repo))

    import __spark_entry__ as entrymod  # noqa: PLC0415
    import bench as benchmod  # noqa: PLC0415
    from odbc2deltalake_spark.queries.registry import (  # noqa: PLC0415
        TABLE_NAMES,
        load_table,
    )
    from odbc2deltalake_spark.session import get_spark  # noqa: PLC0415

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("adjudicate")

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(0, 64, 1, 64).mapInPandas(lambda it: it, "id long").count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    cdc_first = benchmod._bench_cdc_engine(spark, sf_dir)
    cdc_second = benchmod._bench_cdc_engine(spark, sf_dir)
    for name, dt in cdc_first.items():
        timings[name] = min(dt, cdc_second[name])

    for name in benchmod.HEADLINE:
        samples = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            samples.append(round(time.time() - t0, 3))
        timings[name] = min(samples)

    total = round(sum(timings.values()), 3)

    canary = min(
        _timeit(
            lambda: spark.range(0, 200_000_000, 1, 64)
            .selectExpr("sum(id * 2 + 1) as s")
            .collect()
        )
        for _ in range(3)
    )
    wl_canary = min(
        _timeit(
            lambda: spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg({"l_quantity": "sum"})
            .collect()
        )
        for _ in range(3)
    )

    print(
        json.dumps(
            {
                "tag": tag,
                "repo": str(repo),
                "min_partition_size_env": os.environ.get(
                    "SPARK_GRAFT_MIN_PARTITION_SIZE", ""
                ),
                "headline_total_sec": total,
                "queries": timings,
                "host_canary_sec": round(canary, 3),
                "workload_canary_sec": round(wl_canary, 3),
            }
        )
    )


def _timeit(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
