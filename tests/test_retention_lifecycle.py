"""Composed retention lifecycle (VERDICT r6 #6): rotation-scale history
through checkpoint -> truncate_log -> lagging change-feed consumers ->
MV re-baseline -> vacuum, twice over. The unit pieces pass individually;
this pins their INTERACTION: a cursor that predates the truncation point
must surface ChangeFeedTruncatedError (tailer) or transparently
re-baseline to exactly-recomputed state (MV), and a second
truncate/vacuum cycle on the already-truncated table must behave
identically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.streaming import MaterializedAggregate, TableTailer
from odbc2deltalake_spark.tablestore import (
    ChangeFeedTruncatedError,
    VersionedParquetTable,
)


def _load(spark, i):
    return spark.range(i * 10, (i + 1) * 10).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("v")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_truncate_changefeed_checkpoint_vacuum_composed(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.checkpoint_interval = 20

    mv = MaterializedAggregate(
        t,
        tmp_path / "mv",
        group_cols=["g"],
        aggs={"n": ("count", None), "total": ("sum", "v")},
    )

    # 20 loads, MV current at v19 — this cursor will predate truncation
    for i in range(20):
        t.write(_load(spark, i), mode="append")
    mv.refresh(spark)
    assert mv.applied_to() == 19

    # 40 more loads -> v59; checkpoints at 20/40 (interval) landed
    for i in range(20, 60):
        t.write(_load(spark, i), mode="append")
    assert t.version() == 59
    n_before = len(t._commit_names())
    t.checkpoint(40)
    removed = t.truncate_log(before_version=40)
    assert len(removed) == 40
    n_after = len(t._commit_names())
    assert (n_before, n_after) == (60, 20)  # listing cost: 60 -> 20 JSONs

    # a tailer whose cursor predates the cut: loud, named error
    lag = TableTailer(t)
    with pytest.raises(ChangeFeedTruncatedError):
        lag.process_available(spark, lambda df, a, b: None)
    # ... and the snapshot policy recovers it to the pinned head
    seen = []
    lag.process_available(
        spark, lambda df, a, b: seen.append(df.count()), on_rewrite="snapshot"
    )
    assert seen == [600] and lag.last_processed() == 59

    # the MV's cursor (19) also predates the cut: refresh must
    # re-baseline -- and to EXACTLY the recomputed state
    rng = mv.refresh(spark)
    assert rng == (19, 59)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    assert mv.applied_to() == 59

    # vacuum after truncation; snapshot intact
    t.vacuum(retain_versions=1, orphan_min_age_seconds=0)
    assert t.read(spark).count() == 600
    assert _rows(mv.recompute(spark)) == _rows(mv.read(spark))

    # ---- repeat the whole cycle on the already-truncated table ----
    for i in range(60, 80):
        t.write(_load(spark, i), mode="append")
    assert t.version() == 79
    # incremental (non-rebaseline) refresh still flows post-truncation
    rng = mv.refresh(spark)
    assert rng == (59, 79)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))

    t.checkpoint(70)
    removed = t.truncate_log(before_version=70)
    assert [int(n.split(".")[0]) for n in removed] == list(range(40, 70))
    lag2 = TableTailer(t)  # cursor -1 < 70: truncated again
    with pytest.raises(ChangeFeedTruncatedError):
        lag2.process_available(spark, lambda df, a, b: None)
    t.vacuum(retain_versions=1, orphan_min_age_seconds=0)
    assert t.read(spark).count() == 800
    # MV stayed current through the second truncation (cursor 79 >= 70)
    assert mv.refresh(spark) is None
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    # and state below the cut is loudly unreachable, not silently wrong
    with pytest.raises(Exception):
        t.read(spark, version=50)
