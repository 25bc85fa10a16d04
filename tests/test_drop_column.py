"""ALTER TABLE DROP COLUMN (r9): one metadata-only commit narrows the
table schema; no data rewrite (the per-dir written-schema cast-union is
the column-mapping analog). Time travel below the drop still shows the
column; re-adding the name is refused while live files still hold the
old values (no physical column ids — stale data must not resurrect)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable
from tools.external_reader import read_table


def _t(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.createDataFrame(
            [(i, f"n{i}", i * 10) for i in range(20)],
            "k long, name string, v long",
        ),
        mode="append",
        stats_cols=["k"],
    )
    return t


def test_drop_narrows_reads_and_preserves_time_travel(spark, tmp_path):
    t = _t(spark, tmp_path)
    v_before = t.version()
    t.drop_column("v")
    assert t.schema().fieldNames() == ["k", "name"]
    assert t.read(spark).columns == ["k", "name"]
    assert t.read(spark).count() == 20
    # time travel below the drop still shows the column and its values
    old = t.read(spark, version=v_before)
    assert old.columns == ["k", "name", "v"]
    assert old.filter(F.col("k") == 3).first()["v"] == 30
    # appends after the drop align to the narrowed schema
    t.write(
        spark.createDataFrame([(100, "x")], "k long, name string"),
        mode="append",
    )
    assert t.read(spark).count() == 21
    with pytest.raises(ValueError):
        t.drop_column("nope")


def test_readd_refused_until_rewrite(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.drop_column("v")
    # the old files still hold v: re-adding must refuse, not resurrect
    wide = spark.createDataFrame([(200, "y", 999)], "k long, name string, v long")
    with pytest.raises(ValueError, match="compact"):
        t.write(wide, mode="append", merge_schema=True)
    # OPTIMIZE rewrites to the post-drop schema; the name is free again
    t.compact(spark, out_partitions=2)
    t.write(wide, mode="append", merge_schema=True)
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got[200] == 999
    assert all(got[k] is None for k in range(20))  # NOT the old values


def test_drop_guards(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.delete_where(spark, ("v", ">", 150), lazy=True)
    with pytest.raises(ValueError, match="mask"):
        t.drop_column("v")
    t.fold_masks(spark)
    t.set_check_constraint(spark, "v_pos", ("v", ">=", 0))
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("v")
    t.drop_check_constraint("v_pos")
    t.drop_column("v")
    assert t.read(spark).columns == ["k", "name"]
    # bucket keys are structural
    tb = VersionedParquetTable(tmp_path / "tb")
    tb.merge_upsert(
        spark,
        spark.createDataFrame([(1, 2)], "id long, x long"),
        key_cols=["id"],
        num_buckets=2,
    )
    with pytest.raises(ValueError, match="bucket"):
        tb.drop_column("id")


def test_change_feed_and_external_reader_after_drop(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.drop_column("v")
    t.write(
        spark.createDataFrame([(50, "z")], "k long, name string"),
        mode="append",
    )
    # the metadata commit emits no change rows; the post-drop feed is
    # narrowed
    ch = t.read_changes_cdf(spark, 0, t.version())
    assert set(ch.columns) == {"k", "name", "_change_type", "_commit_version"}
    assert ch.count() == 1  # only the post-drop append
    ext = read_table(t.root)
    assert ext.schema.names == ["k", "name"]
    eng = sorted((r["k"], r["name"]) for r in t.read(spark).collect())
    assert sorted((d["k"], d["name"]) for d in ext.to_pylist()) == eng
