"""Versioned table store: commit log, time travel, restore, vacuum, merge."""

from __future__ import annotations

from pyspark.sql import types as T

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_versions_and_time_travel(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    assert not t.exists()
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t.write(_df(spark, [(2, "b")]), mode="append")
    t.write(_df(spark, [(9, "z")]), mode="overwrite")
    assert t.version() == 2
    assert t.read(spark, version=0).count() == 1
    assert t.read(spark, version=1).count() == 2
    assert t.read(spark).collect()[0]["id"] == 9


def test_restore_points_at_old_files(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t.write(_df(spark, [(2, "b")]), mode="append")
    t.restore(0)
    assert t.version() == 2
    assert t.read(spark).count() == 1  # back to v0's content, as a new commit


def test_vacuum_removes_dead_dirs(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t.write(_df(spark, [(2, "b")]), mode="overwrite")  # v0's dir now dead
    removed = t.vacuum()
    assert len(removed) == 1
    assert t.read(spark).count() == 1  # live data intact


def test_schema_merge_on_append(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    wider = spark.createDataFrame([(2, "b", 5.0)], "id long, v string, x double")
    t.write(wider, mode="append", merge_schema=True)
    out = t.read(spark)
    assert set(out.columns) == {"id", "v", "x"}
    byid = {r["id"]: r for r in out.collect()}
    assert byid[1]["x"] is None and byid[2]["x"] == 5.0


def test_merge_upsert(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.merge_upsert(spark, _df(spark, [(2, "B"), (3, "c")]), ["id"])
    got = sorted(tuple(r) for r in t.read(spark).collect())
    assert got == [(1, "a"), (2, "B"), (3, "c")]


def test_properties(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t.set_properties({"k": "v"})
    assert t.get_property("k") == "v"
    assert t.get_property("nope") is None


def test_partitioned_write_reads_back(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")], "id long, v string, pt string"
    )
    t.write(df, mode="overwrite", partition_by=["pt"])
    out = t.read(spark)
    assert out.count() == 3
    assert sorted(r["pt"] for r in out.collect()) == ["x", "x", "y"]
    # partition pruning: filter on the partition column reads only that subdir
    assert t.read(spark).filter("pt = 'y'").count() == 1
