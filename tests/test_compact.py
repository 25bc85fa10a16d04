"""OPTIMIZE-style compaction on the versioned parquet store: many small
append commits → one compacted commit; time travel, vacuum interaction,
Z-order pairing, and the bucketized refusal."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _data_files(root: Path) -> list[Path]:
    return [
        p
        for p in root.rglob("*.parquet")
        if p.is_file() and not p.name.startswith(".")
    ]


def test_compact_small_files(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    for i in range(5):
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).repartition(4)
        t.write(df, mode="append")
    pre_version = t.version()
    pre_files = len(_data_files(tmp_path / "t"))
    assert pre_files >= 20  # 5 commits x 4 part files

    v = t.compact(spark, out_partitions=2)
    assert v == pre_version + 1
    post = t.read(spark)
    assert post.count() == 500
    assert post.agg(F.sum("id")).first()[0] == sum(range(500))

    # the compacted snapshot reads few files; history is still on disk
    live_dirs = {d["dir"] for d in t._state_at()["dirs"]}
    live_files = [
        f
        for f in _data_files(tmp_path / "t")
        if any(d in str(f) for d in live_dirs)
    ]
    assert len(live_files) <= 2

    # time travel to the pre-compaction version still works
    old = t.read(spark, version=pre_version)
    assert old.count() == 500

    # vacuum retires the superseded dirs; current read unaffected
    removed = t.vacuum(retain_versions=1)
    assert removed
    assert t.read(spark).count() == 500


def test_compact_with_zorder(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    for i in range(3):
        df = spark.range(i * 200, (i + 1) * 200).select(
            F.col("id"), (F.col("id") * 37 % 101).alias("k")
        ).repartition(3)
        t.write(df, mode="append")
    t.compact(spark, zorder_by=["id", "k"], out_partitions=4)
    got = t.read(spark)
    assert got.count() == 600
    assert got.agg(F.sum("k")).first()[0] == sum(i * 37 % 101 for i in range(600))
    # the commit records its provenance
    last = t._read_commit(t.version())
    assert last["compacted_from"] == t.version() - 1
    assert last["zorder_by"] == ["id", "k"]


def test_compact_refuses_bucketized(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    df = spark.range(0, 100).select(F.col("id"), F.lit(1).alias("v"))
    t.merge_upsert(spark, df, key_cols=["id"])
    with pytest.raises(ValueError, match="bucketized"):
        t.compact(spark)


def test_partial_compact_rewrites_only_matching_dirs(spark, tmp_path):
    """compact(where=...): OPTIMIZE-WHERE — dirs whose stats exclude the
    predicate carry over by reference; matching dirs merge into one new
    dir; rows are never filtered; time travel and skipping survive."""
    from pyspark.sql import functions as F

    from odbc2deltalake_spark.tablestore import VersionedParquetTable

    t = VersionedParquetTable(tmp_path / "t")
    for lo in (0, 100, 200, 300):
        t.write(
            spark.range(lo, lo + 100).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ),
            mode="append",
            stats_cols=["k"],
        )
    before = {d["dir"] for d in t._state_at()["dirs"]}
    v = t.compact(spark, where=("k", ">=", 200), out_partitions=1)
    st = t._state_at()
    after = {d["dir"] for d in st["dirs"]}
    # two cold dirs untouched, two hot dirs merged into one new dir
    assert len(after & before) == 2 and len(after) == 3
    assert t.read(spark).count() == 400  # no rows filtered
    assert t.read(spark, version=v - 1).count() == 400  # time travel
    # fresh footer stats on the compacted dir keep pruning working
    pruned = t.read(spark, skip_where=("k", ">=", 350))
    assert {r["k"] for r in pruned.collect()} == set(range(350, 400))
    assert len(set(pruned.inputFiles())) < len(set(t.read(spark).inputFiles()))
    # a predicate matching nothing commits nothing
    v2 = t.version()
    assert t.compact(spark, where=("k", ">", 10_000)) == v2
    assert t.version() == v2


def test_maintenance_report_metadata_only(spark, tmp_path):
    """maintenance_report: the nightly-job decision inputs from pure
    metadata — small-dir census, checkpoint/log state, truncation
    eligibility, vacuum dry-run — with zero Spark jobs."""
    from pyspark.sql import functions as F

    from odbc2deltalake_spark.tablestore import VersionedParquetTable

    t = VersionedParquetTable(tmp_path / "t")
    t.checkpoint_interval = 5
    for i in range(8):
        t.write(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("k")),
            mode="append",
        )
    r = t.maintenance_report()
    assert r["version"] == 7 and r["n_live_dirs"] == 8
    assert len(r["small_dirs"]) == 8 and r["advise_compact"]
    assert r["newest_checkpoint"] == 5 and r["commits_since_checkpoint"] == 2
    assert r["truncate_eligible_below"] == 6
    assert r["vacuum_reclaimable_dirs"] == 0

    # act on the advice: compact, vacuum, truncate — report goes quiet
    t.compact(spark, out_partitions=1)
    r2 = t.maintenance_report()
    assert r2["n_live_dirs"] == 1
    assert r2["vacuum_reclaimable_dirs"] == 8  # superseded generations
    # ADVICE r7: the report must predict the OPERATOR'S vacuum, not the
    # default — with every generation still retained, nothing reclaims
    assert (
        t.maintenance_report(retain_versions=20)["vacuum_reclaimable_dirs"] == 0
    )
    t.vacuum(retain_versions=1, orphan_min_age_seconds=0)
    t.checkpoint()
    t.truncate_log(before_version=t.maintenance_report()["truncate_eligible_below"])
    r3 = t.maintenance_report()
    assert not r3["advise_compact"] or len(r3["small_dirs"]) <= 1
    assert r3["vacuum_reclaimable_dirs"] == 0
    assert r3["log_commits"] < r["log_commits"] + 2
    assert t.read(spark).count() == 80


def test_partial_compact_with_zorder(spark, tmp_path):
    """compact(where=..., zorder_by=...): the rewritten subset carries
    Z-order clustering + fresh per-file stats; untouched dirs keep their
    old layout."""
    from pyspark.sql import functions as F

    from odbc2deltalake_spark.tablestore import VersionedParquetTable

    t = VersionedParquetTable(tmp_path / "t")
    for lo in (0, 1000):
        df = spark.range(lo, lo + 1000).select(
            (F.col("id") % 50).alias("a"),
            (F.col("id") / 50).cast("long").alias("b"),
            F.col("id").alias("k"),
        )
        t.write(df, mode="append", stats_cols=["k"])
    v = t.compact(
        spark, where=("k", ">=", 1000), zorder_by=["a", "b"], out_partitions=4
    )
    assert t.version() == v
    assert t.read(spark).count() == 2000
    # conjunctive pruning works inside the z-ordered rewrite
    pruned = t.read(spark, skip_where=[("a", ">=", 40), ("b", "<", 25)])
    got = {(r["a"], r["b"]) for r in pruned.collect()}
    assert all(a >= 40 and b < 25 for a, b in got)
    all_files = set(t.read(spark).inputFiles())
    assert set(pruned.inputFiles()) < all_files
