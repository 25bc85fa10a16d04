"""auto_maintain (r9): one idempotent maintenance-window call executing
the maintenance_report's advice — fold chains, compact small dirs
(partial when big dirs exist), checkpoint, vacuum (dry-run unless
ordered). Rows never change; only layout and metadata do."""

from __future__ import annotations

from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _rows(t, spark):
    return sorted(r["k"] for r in t.read(spark).collect())


def test_full_window_on_small_fragmented_table(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    # write-time auto-checkpointing off: the maintenance window is the
    # only checkpointer (the step is a no-op when the interval already
    # keeps the replay tail short)
    t.checkpoint_interval = 0
    for i in range(5):
        t.write(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("k")),
            mode="append",
        )
    t.delete_where(spark, ("k", "<", 5), lazy=True)
    before = _rows(t, spark)
    out = t.auto_maintain(spark)
    assert "fold_masks" in out
    assert "compact" in out  # every dir small -> full compact
    assert out.get("checkpoint") is not None
    assert out["vacuum_would_remove"] > 0  # dry-run by default
    assert _rows(t, spark) == before
    assert not t._state_at()["masks"]
    # executing the vacuum reclaims, still row-exact
    out2 = t.auto_maintain(spark, vacuum_now=True)
    assert out2["vacuum_removed"] > 0
    assert _rows(t, spark) == before
    # a third run on the quiet table does nothing destructive
    out3 = t.auto_maintain(spark)
    assert "compact" not in out3 and "fold_masks" not in out3


def test_partial_compact_leaves_big_dirs_alone(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.range(50_000).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        ),
        mode="append",
    )
    big_dir = t._state_at()["dirs"][0]["dir"]
    for i in range(3):
        t.write(
            spark.createDataFrame([(10**6 + i, "x")], "k long, pad string"),
            mode="append",
        )
    before = sorted((r["k"], r["pad"]) for r in t.read(spark).collect())
    out = t.auto_maintain(spark, target_file_bytes=100_000)
    assert "compact_partial" in out
    live = {d["dir"] for d in t._state_at()["dirs"]}
    assert big_dir in live  # the big dir carried by reference
    assert len(live) == 2  # big + one consolidated small
    assert sorted((r["k"], r["pad"]) for r in t.read(spark).collect()) == before


def test_bucketized_table_skips_compaction(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.merge_upsert(
        spark,
        spark.range(100).select(F.col("id").alias("pk")),
        key_cols=["pk"],
        num_buckets=4,
    )
    t.merge_upsert(
        spark,
        spark.createDataFrame([(7,)], "pk long"),
        ["pk"],
        strategy="patch",
    )
    out = t.auto_maintain(spark)
    assert "fold_patches" in out
    assert "compact" not in out and "compact_partial" not in out
    assert t.read(spark).count() == 100
