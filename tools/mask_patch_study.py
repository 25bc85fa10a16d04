"""Measured patch x mask interaction study (VERDICT r8 #4).

`_lazy_mask` force-folds any outstanding patch chain before committing a
mask, because mask semantics are per-DIR over the reconciled state and a
per-dir fence is UNSOUND: base row k val=5, patch upserts k val=10, mask
deletes val=10 — fencing the mask to patch dirs older than the mask
would filter the patch row, drop k from the patch key set, and
RESURFACE the base val=5 row (tests/test_lazy_delete.py pins the
counter-example). So a GDPR erasure on a merge-on-read-heavy table pays
the fold it was trying to defer. This study quantifies that trade-off:

- lazy delete on a table with an outstanding K-commit patch chain
  (pays fold + metadata commit), vs
- fold_patches() run beforehand on its own schedule, then the same
  lazy delete (~metadata only), vs
- the fold cost alone (the amount merely PULLED FORWARD — any later
  rewrite merge / DML / append would pay it anyway).

    python tools/mask_patch_study.py [rows] [patch_batches] [batch_rows]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from odbc2deltalake_spark.session import get_spark  # noqa: E402
from odbc2deltalake_spark.tablestore import VersionedParquetTable  # noqa: E402


def _patched_table(spark, root: str, rows: int, batches: int, batch_rows: int):
    t = VersionedParquetTable(f"{root}/t")
    base = spark.range(rows).select(
        F.col("id").alias("pk"),
        (F.col("id") % 1000).cast("long").alias("grp"),
        F.lit(0).cast("long").alias("v"),
    )
    t.merge_upsert(spark, base, ["pk"])
    for b in range(1, batches + 1):
        delta = spark.range(batch_rows).select(
            ((F.col("id") * (rows // batch_rows)) % rows).alias("pk"),
            (F.col("id") % 1000).cast("long").alias("grp"),
            F.lit(b).cast("long").alias("v"),
        )
        t.merge_upsert(spark, delta, ["pk"], strategy="patch")
    assert len(t._state_at()["patches"]) == batches
    return t


def run(rows: int, batches: int, batch_rows: int) -> dict:
    spark = get_spark("mask_patch_study")
    out: dict = {"rows": rows, "patch_batches": batches,
                 "batch_rows": batch_rows}

    # A: lazy delete straight onto the patched table (force-fold inside)
    root_a = tempfile.mkdtemp(prefix="maskpatch_a_")
    t = _patched_table(spark, root_a, rows, batches, batch_rows)
    t0 = time.monotonic()
    t.delete_where(spark, ("grp", "=", 7), lazy=True)
    out["lazy_delete_on_patched_s"] = round(time.monotonic() - t0, 3)
    shutil.rmtree(root_a, ignore_errors=True)

    # B: fold on its own schedule, then the same lazy delete
    root_b = tempfile.mkdtemp(prefix="maskpatch_b_")
    t = _patched_table(spark, root_b, rows, batches, batch_rows)
    t0 = time.monotonic()
    t.fold_patches(spark)
    out["fold_alone_s"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    t.delete_where(spark, ("grp", "=", 7), lazy=True)
    out["lazy_delete_after_fold_s"] = round(time.monotonic() - t0, 3)
    shutil.rmtree(root_b, ignore_errors=True)

    out["fold_share_of_erasure"] = round(
        out["fold_alone_s"] / max(out["lazy_delete_on_patched_s"], 1e-9), 2
    )
    return out


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    print(json.dumps(run(rows, batches, batch_rows)))
