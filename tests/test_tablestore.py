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


def test_bucketed_merge_partial_rewrite(spark, tmp_path):
    """Second merge rewrites only touched buckets; untouched-bucket dirs
    survive across commits (Delta-MERGE-like matched-file rewrite)."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(i, f"v{i}") for i in range(40)]), mode="overwrite")
    # first merge converts to bucketed layout (full rewrite, once)
    t.merge_upsert(spark, _df(spark, [(0, "V0"), (41, "new")]), ["id"], num_buckets=8)
    st1 = t._state_at()
    assert all(d.get("bucket") is not None for d in st1["dirs"])
    assert st1["num_buckets"] == 8
    dirs_before = {d["dir"] for d in st1["dirs"]}
    # second merge: touches only the buckets of ids 1 and 42
    t.merge_upsert(spark, _df(spark, [(1, "V1"), (42, "new2")]), ["id"])
    st2 = t._state_at()
    surviving = {d["dir"] for d in st2["dirs"]} & dirs_before
    assert surviving, "untouched bucket dirs must be reused, not rewritten"
    # content correct
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert got[0] == "V0" and got[1] == "V1" and got[41] == "new" and got[42] == "new2"
    assert len(got) == 42
    # no duplicate keys
    assert t.read(spark).count() == t.read(spark).select("id").distinct().count()


def test_bucketed_merge_time_travel_and_vacuum(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.merge_upsert(spark, _df(spark, [(2, "B")]), ["id"], num_buckets=4)
    t.merge_upsert(spark, _df(spark, [(3, "c")]), ["id"])
    # time travel to pre-merge state (the CDC old_pk_version read path)
    assert {r["v"] for r in t.read(spark, version=0).collect()} == {"a", "b"}
    assert {r["v"] for r in t.read(spark, version=1).collect()} == {"a", "B"}
    assert {r["v"] for r in t.read(spark).collect()} == {"a", "B", "c"}
    # vacuum keeps live per-bucket dirs (they live under commit top dirs)
    t.vacuum()
    assert {r["v"] for r in t.read(spark, version=1).collect()} == {"a", "B"}


def test_bucketed_read_prunes_buckets(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(i, "x") for i in range(64)]), mode="overwrite")
    t.merge_upsert(spark, _df(spark, [(0, "y")]), ["id"], num_buckets=8)
    st = t._state_at()
    some_bucket = st["dirs"][0]["bucket"]
    pruned = t.read(spark, buckets=[some_bucket])
    full = t.read(spark)
    assert 0 < pruned.count() < full.count()


def test_schema_drift_incompatible_raises(spark, tmp_path):
    """string->binary / timestamp->int must raise, not silently swap
    (reference:tests/test_11_schema_drift.py:71-102)."""
    import pytest

    from odbc2deltalake_spark.tablestore import SchemaDriftError

    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    bad = spark.createDataFrame([(2, 99)], "id long, v int")  # string -> int
    with pytest.raises(SchemaDriftError):
        t.write(bad, mode="append", merge_schema=True)


def test_schema_drift_widening_flows(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.createDataFrame([(1, 5)], "id long, n int"), mode="overwrite")
    t.write(
        spark.createDataFrame([(2, 6_000_000_000)], "id long, n long"),
        mode="append",
        merge_schema=True,
    )
    out = t.read(spark)
    assert dict(out.dtypes)["n"] == "bigint"
    assert {r["n"] for r in out.collect()} == {5, 6_000_000_000}


def test_schema_drift_narrowing_keeps_wide_type(spark, tmp_path):
    """Source narrowed long->int: values still fit, history keeps bigint."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.createDataFrame([(1, 6_000_000_000)], "id long, n long"), mode="overwrite")
    t.write(
        spark.createDataFrame([(2, 7)], "id long, n int"),
        mode="append",
        merge_schema=True,
    )
    out = t.read(spark)
    assert dict(out.dtypes)["n"] == "bigint"
    assert {r["n"] for r in out.collect()} == {6_000_000_000, 7}


def test_is_type_widening_matrix():
    from odbc2deltalake_spark.tablestore import is_type_widening as w

    assert w(T.IntegerType(), T.LongType())
    assert w(T.ByteType(), T.ShortType())
    assert w(T.FloatType(), T.DoubleType())
    assert w(T.IntegerType(), T.DoubleType())
    assert w(T.DecimalType(15, 3), T.DecimalType(20, 3))
    assert w(T.IntegerType(), T.DecimalType(12, 2))
    assert w(T.DateType(), T.TimestampType())
    assert not w(T.LongType(), T.IntegerType())
    assert not w(T.LongType(), T.DoubleType())  # lossy
    assert not w(T.StringType(), T.BinaryType())
    assert not w(T.TimestampType(), T.LongType())
    assert not w(T.DecimalType(20, 3), T.DecimalType(15, 3))
    assert not w(T.DoubleType(), T.DecimalType(38, 10))


def test_storage_backend_interface(spark, tmp_path):
    """The commit log goes through the pluggable StorageBackend; a custom
    backend sees every metadata op (object-store swap point)."""
    from odbc2deltalake_spark.tablestore import LocalStorageBackend

    calls = []

    class SpyBackend(LocalStorageBackend):
        def write_text_atomic(self, path, text):
            calls.append(("write", path))
            super().write_text_atomic(path, text)

        def read_text(self, path):
            calls.append(("read", path))
            return super().read_text(path)

    t = VersionedParquetTable(tmp_path / "t", backend=SpyBackend())
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    assert t.read(spark).count() == 1
    assert any(op == "write" and "_commits" in p for op, p in calls)
    assert any(op == "read" and "_commits" in p for op, p in calls)
