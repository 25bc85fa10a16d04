"""Skew hardening for the SCD2 cascade (VERDICT r5 item #6).

SCALE.md claims AQE's skew handling + the cascade's shape survive a hot
primary key. This pins it with measurements: a 100k-row change set where
ONE pk owns ~50% of the rows (the frequently-updated-row pathology — at
100 TB that's a mutex row or a counter record) driven through

- ``latest_per_key`` (the W1 window — the one place a hot pk
  concentrates, since a window partition cannot be split),
- ``derive_latest_pk_from_history`` (restore path over skewed history),
- the ``pk_ts ANTI d2 ANTI d1`` union cascade (anti joins on pk).

The structural argument, verified here: the per-task ceiling of the
cascade is max(versions-per-pk), NOT table size — every other pk hashes
uniformly around the hot one, and the anti-join sides carry at most one
row per pk by construction (pk_ts and the post-W1 deltas are keysets).
Measured numbers live in SCALE.md §skew."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.metadata import SYS
from odbc2deltalake_spark.operators.scd2 import (
    derive_latest_pk_from_history,
    latest_per_key,
    latest_pk_union,
)

HOT = 50_000  # versions held by pk 0
TAIL = 50_000  # distinct single-version pks


def _skewed_changes(spark):
    """100k change rows: pk 0 with ts 1..50000, pks 1..50000 with one
    version each (ts = pk)."""
    hot = spark.range(1, HOT + 1).select(
        F.lit(0).alias("pk"), F.col("id").alias("ts")
    )
    tail = spark.range(1, TAIL + 1).select(
        F.col("id").alias("pk"), F.col("id").alias("ts")
    )
    return hot.unionByName(tail)


def test_w1_window_survives_hot_pk(spark):
    """latest_per_key over 50%-skewed input: completes, exact result,
    and the skew is confined to the hot pk's task — per-partition input
    is bounded by max(versions-per-pk) + uniform share, not by N."""
    changes = _skewed_changes(spark)
    got = {r["pk"]: r["ts"] for r in latest_per_key(changes, ["pk"], "ts").collect()}
    assert len(got) == TAIL + 1
    assert got[0] == HOT  # hot pk resolves to its max version
    assert got[1] == 1 and got[TAIL] == TAIL
    # partition profile of the window's shuffle: repartition exactly as
    # the window does (hash on pk) and measure per-partition rows
    sizes = (
        changes.repartition(32, "pk")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    per = {r["p"]: r["count"] for r in sizes}
    uniform_share = (HOT + TAIL) / 32
    hot_parts = [c for c in per.values() if c > 3 * uniform_share]
    assert len(hot_parts) <= 1, "only the hot pk's partition may be large"
    if hot_parts:
        assert hot_parts[0] <= HOT + 3 * uniform_share


def test_restore_path_over_skewed_history(spark):
    """derive_latest_pk_from_history on a history where one pk owns half
    the post-full-load rows: exact keyset, tombstone of the hot pk's
    final version excludes it."""
    changes = _skewed_changes(spark)
    full = spark.range(0, TAIL + 1).select(
        F.col("id").alias("pk"),
        F.lit(0).cast("long").alias("ts"),
        F.lit(0).cast("long").alias(SYS.timestamp),
        F.lit(False).alias(SYS.is_deleted),
        F.lit(True).alias(SYS.is_full_load),
    )
    deltas = changes.select(
        "pk",
        "ts",
        F.col("ts").alias(SYS.timestamp),
        F.lit(False).alias(SYS.is_deleted),
        F.lit(False).alias(SYS.is_full_load),
    )
    hist = full.unionByName(deltas)
    latest = derive_latest_pk_from_history(hist, ["pk"], "ts")
    got = {r["pk"]: r["ts"] for r in latest.collect()}
    assert len(got) == TAIL + 1
    assert got[0] == HOT

    # final version of the hot pk is a tombstone -> pk drops out
    tomb = spark.createDataFrame(
        [(0, HOT + 1, HOT + 1, True, False)],
        f"pk long, ts long, {SYS.timestamp} long, "
        f"{SYS.is_deleted} boolean, {SYS.is_full_load} boolean",
    )
    got2 = {
        r["pk"]: r["ts"]
        for r in derive_latest_pk_from_history(
            hist.unionByName(tomb), ["pk"], "ts"
        ).collect()
    }
    assert 0 not in got2 and len(got2) == TAIL


def test_anti_cascade_with_hot_pk_everywhere(spark):
    """The U1 cascade when the hot pk appears on EVERY side: d2 wins
    precedence, the anti joins stay one-row-per-pk on their keyset
    sides, result is the exact pk universe."""
    pk_ts = spark.range(0, TAIL + 1).select(
        F.col("id").alias("pk"), F.lit(0).cast("long").alias("ts")
    )
    d1 = latest_per_key(_skewed_changes(spark), ["pk"], "ts")  # keyset
    d2 = spark.createDataFrame([(0, HOT + 7), (1, HOT + 7)], "pk long, ts long")
    out = latest_pk_union(d2, d1, pk_ts, ["pk"], "ts")
    got = {r["pk"]: r["ts"] for r in out.collect()}
    assert len(got) == TAIL + 1
    assert got[0] == HOT + 7 and got[1] == HOT + 7  # d2 precedence
    assert got[2] == 2  # d1 branch
    # pk_ts branch: keys untouched by either delta keep the snapshot ts
    assert all(got[k] == k for k in range(2, TAIL + 1))
