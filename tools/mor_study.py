"""Measured merge-on-write vs merge-on-read study for the keys index.

The scenario the patch strategy exists for: a large bucketized keys
index (the CDC `latest_pk_version` shape — pk + loaded-version) taking
a stream of SMALL delta batches whose keys are uniformly hashed, so
every batch touches ~every bucket. Merge-on-write rewrites all touched
buckets per batch (cost ≈ a table rewrite regardless of batch size);
merge-on-read commits one delta-sized patch dir per batch and pays a
bounded reconciliation at read / fold time.

Measures, on the same table size and batch schedule:

- total wall time for K batches, rewrite vs patch strategy;
- a full read (count) after the K batches — rewrite reads the folded
  base, patch pays the read-time reconciliation over the chain;
- fold_patches() wall time — the amortization the auto bounds trigger.

    python tools/mor_study.py [rows] [batches] [batch_rows]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from odbc2deltalake_spark.session import get_spark  # noqa: E402
from odbc2deltalake_spark.tablestore import VersionedParquetTable  # noqa: E402


def run(rows: int, batches: int, batch_rows: int) -> dict:
    spark = get_spark("mor_study")
    base = spark.range(rows).select(
        F.col("id").alias("pk"), F.lit(0).cast("long").alias("v")
    )
    out: dict = {"rows": rows, "batches": batches, "batch_rows": batch_rows}
    for strategy in ("rewrite", "patch"):
        root = tempfile.mkdtemp(prefix=f"mor_{strategy}_")
        t = VersionedParquetTable(f"{root}/t")
        t.merge_upsert(spark, base, ["pk"])
        t0 = time.monotonic()
        for b in range(1, batches + 1):
            # uniformly-spread keys: worst case for bucket rewrites
            delta = spark.range(batch_rows).select(
                ((F.col("id") * (rows // batch_rows)) % rows).alias("pk"),
                F.lit(b).cast("long").alias("v"),
            )
            t.merge_upsert(spark, delta, ["pk"], strategy=strategy)
        merge_s = time.monotonic() - t0
        t0 = time.monotonic()
        n = t.read(spark).count()
        read_s = time.monotonic() - t0
        fold_s = None
        if strategy == "patch":
            t0 = time.monotonic()
            t.fold_patches(spark)
            fold_s = time.monotonic() - t0
        assert n == rows, (strategy, n)
        out[strategy] = {
            "merge_total_s": round(merge_s, 2),
            "read_after_s": round(read_s, 2),
            **({"fold_s": round(fold_s, 2)} if fold_s is not None else {}),
        }
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    out["merge_speedup"] = round(
        out["rewrite"]["merge_total_s"] / out["patch"]["merge_total_s"], 2
    )
    return out


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    import json

    print(json.dumps(run(rows, batches, batch_rows)))
