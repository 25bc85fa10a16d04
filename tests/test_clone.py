"""Shallow clone (r9): a zero-copy table whose first commit references
the source's data dirs by absolute path. The clone diverges via local
copy-on-write dirs; each table's vacuum reclaims only its own root.
The Delta-documented hazard — source vacuum retiring dirs a clone still
references — is pinned as a loud failure, and compaction localizes the
clone out of it."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable
from tools.external_reader import read_table


def _src(spark, tmp_path, n=300):
    t = VersionedParquetTable(tmp_path / "src")
    for lo, hi in ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)):
        t.write(
            spark.range(lo, hi).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ),
            mode="append",
            stats_cols=["k"],
        )
    return t


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_clone_is_zero_copy_and_equal(spark, tmp_path):
    src = _src(spark, tmp_path)
    cl = src.clone_to(tmp_path / "cl")
    assert _rows(cl.read(spark)) == _rows(src.read(spark))
    # zero data copied: no parquet under the clone root
    assert not list((tmp_path / "cl").rglob("*.parquet"))
    # as-of clone
    old = src.clone_to(tmp_path / "cl0", version=0)
    assert old.read(spark).count() == 100
    with pytest.raises(ValueError):
        src.clone_to(tmp_path / "cl")  # target exists


def test_clone_diverges_without_touching_source(spark, tmp_path):
    src = _src(spark, tmp_path)
    before = _rows(src.read(spark))
    cl = src.clone_to(tmp_path / "cl")
    cl.delete_where(spark, ("k", "<", 50))  # copy-on-write rewrite
    cl.write(
        spark.createDataFrame([(9999, 0)], "k long, v long"), mode="append"
    )
    assert _rows(src.read(spark)) == before  # source untouched
    got = {k for k, _ in _rows(cl.read(spark))}
    assert 9999 in got and not any(k < 50 for k in got)
    # and source-side writes don't leak into the clone
    src.write(
        spark.createDataFrame([(7777, 0)], "k long, v long"), mode="append"
    )
    assert 7777 not in {k for k, _ in _rows(cl.read(spark))}


def test_clone_vacuum_never_reclaims_source_dirs(spark, tmp_path):
    src = _src(spark, tmp_path)
    cl = src.clone_to(tmp_path / "cl")
    cl.delete_where(spark, ("k", "<", 10))  # supersedes referenced dirs
    removed = cl.vacuum(retain_versions=1, orphan_min_age_seconds=0)
    assert all(not r.startswith("/") for r in removed)
    assert _rows(src.read(spark))  # source still fully readable
    assert src.read(spark).count() == 300


def test_source_vacuum_hazard_is_loud_and_compaction_cures(spark, tmp_path):
    src = _src(spark, tmp_path)
    cl = src.clone_to(tmp_path / "cl")
    cl2 = src.clone_to(tmp_path / "cl2")
    cl2.compact(spark)  # localizes every referenced dir
    # source rewrites + vacuums away the dirs the clones referenced
    src.compact(spark)
    src.vacuum(retain_versions=1, orphan_min_age_seconds=0)
    with pytest.raises(Exception):
        cl.read(spark).count()  # documented hazard: loud, not wrong
    assert cl2.read(spark).count() == 300  # compacted clone unaffected


def test_clone_carries_masks_patches_and_buckets(spark, tmp_path):
    src = VersionedParquetTable(tmp_path / "src")
    df = spark.range(400).select(
        F.col("id").alias("pk"), (F.col("id") * 2).alias("v")
    )
    src.merge_upsert(spark, df, key_cols=["pk"], num_buckets=4)
    src.merge_upsert(
        spark,
        spark.createDataFrame([(7, 777)], "pk long, v long"),
        ["pk"],
        strategy="patch",
    )
    assert src._state_at()["patches"]  # chain outstanding at clone time
    cl = src.clone_to(tmp_path / "cl")
    assert _rows_pk(cl.read(spark)) == _rows_pk(src.read(spark))
    # keyed lookup still routes on the cloned bucket layout
    assert {r["v"] for r in cl.read_keys(spark, [7]).collect()} == {777}
    # external reader parity on the clone
    ext = sorted((d["pk"], d["v"]) for d in read_table(cl.root).to_pylist())
    assert ext == _rows_pk(src.read(spark))
    # masks carry too (a patch and a mask can't BOTH be outstanding —
    # the r8 force-fold invariant — so pin masks on their own table)
    sm = VersionedParquetTable(tmp_path / "sm")
    sm.write(
        spark.range(100).select(
            F.col("id").alias("pk"), (F.col("id") * 2).alias("v")
        ),
        mode="append",
    )
    sm.delete_where(spark, ("pk", ">=", 90), lazy=True)
    assert sm._state_at()["masks"]
    smc = sm.clone_to(tmp_path / "smc")
    assert smc._state_at()["masks"]  # mask carried, still outstanding
    assert _rows_pk(smc.read(spark)) == _rows_pk(sm.read(spark))
    assert smc.read(spark).count() == 90


def _rows_pk(df):
    return sorted((r["pk"], r["v"]) for r in df.collect())
