"""MaterializedDistinct: exact COUNT(DISTINCT) per group maintained
incrementally via the two-level IVM decomposition (inner retractable
(group, value) occurrence view; outer live-row count on read). The
invariant throughout: after ANY refresh sequence, `read` equals
`recompute`, including across mutations that are the hard cases for
distinct counts — a delete removing a value's LAST occurrence, a merge
re-keying a value, an update emptying a whole group."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.streaming import MaterializedDistinct
from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _t(spark, tmp_path, rows):
    t = VersionedParquetTable(tmp_path / f"t{uuid.uuid4().hex[:8]}")
    t.merge_upsert(
        spark,
        spark.createDataFrame(rows, "id long, grp string, user long"),
        ["id"],
        num_buckets=4,
    )
    return t


def _mv(t, tmp_path):
    mv = MaterializedDistinct(
        t, tmp_path / "mv_distinct", group_cols=["grp"], distinct_col="user"
    )
    mv.inner.FOLD_COST_FACTOR = 100.0  # force folds on the tiny fixture
    return mv


def test_incremental_equals_recompute_through_lifecycle(spark, tmp_path):
    rows = [(i, "ab"[i % 2], i % 5) for i in range(40)]
    t = _t(spark, tmp_path, rows)
    mv = _mv(t, tmp_path)
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    # group a: users {0..4}; delete ALL rows of user 3 in group a only
    # via a merge re-keying them to user 9 (retract old value, add new)
    moved = spark.createDataFrame(
        [(i, "ab"[i % 2], 9) for i in range(40) if i % 5 == 3 and i % 2 == 0],
        "id long, grp string, user long",
    )
    t.merge_upsert(spark, moved, ["id"])
    mv.refresh(spark)
    got = dict(
        ((r["grp"]), (r["n_distinct"], r["n_rows"]))
        for r in mv.read(spark).collect()
    )
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    assert got["a"][0] == 5  # 3 left, 9 arrived: still 5 distinct
    # DELETE the last occurrences of one value: user 1 in both groups
    t.delete_where(spark, ("user", "=", 1))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    got = dict(
        ((r["grp"]), r["n_distinct"]) for r in mv.read(spark).collect()
    )
    assert got["a"] == 4 and got["b"] == 4
    # UPDATE re-keys every remaining user in group b to one value:
    # distinct collapses to 1 there
    t.update_where(spark, {"user": "77"}, ("grp", "=", "b"))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    got = dict(
        ((r["grp"]), r["n_distinct"]) for r in mv.read(spark).collect()
    )
    assert got["b"] == 1
    # empty group b entirely — it must vanish, matching recompute
    t.delete_where(spark, ("grp", "=", "b"))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    assert all(r["grp"] != "b" for r in mv.read(spark).collect())


def test_null_values_never_count(spark, tmp_path):
    rows = [(0, "a", 1), (1, "a", None), (2, "a", None), (3, "b", None)]
    t = _t(spark, tmp_path, rows)
    mv = _mv(t, tmp_path)
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    got = {r["grp"]: (r["n_distinct"], r["n_rows"]) for r in mv.read(spark).collect()}
    # COUNT(DISTINCT)/COUNT ignore NULLs; the all-null group still
    # appears (it has rows) with zero countable values — same as SQL
    assert got["a"] == (1, 1) and got["b"] == (0, 0)


def test_refresh_is_noop_when_current(spark, tmp_path):
    t = _t(spark, tmp_path, [(i, "a", i) for i in range(10)])
    mv = _mv(t, tmp_path)
    assert mv.refresh(spark) is not None
    assert mv.refresh(spark) is None
    assert mv.applied_to() == t.version()


def test_distinct_col_cannot_be_group_col(spark, tmp_path):
    t = _t(spark, tmp_path, [(0, "a", 1)])
    with pytest.raises(ValueError, match="cannot also be a group col"):
        MaterializedDistinct(t, tmp_path / "x", ["grp"], "grp")


def test_patched_source_distinct_folds(spark, tmp_path):
    # the r9 CDF fix end-to-end on the distinct view: patch commits and
    # a chain-folding merge must not double-apply (a double-applied
    # retract would drop a still-live value)
    rows = [(i, "a", i % 4) for i in range(2000)]
    t = _t(spark, tmp_path, rows)
    mv = _mv(t, tmp_path)
    mv.refresh(spark)
    up = spark.createDataFrame(
        [(i, "a", 50 + i % 3) for i in range(0, 2000, 7)],
        "id long, grp string, user long",
    )
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    t.fold_patches(spark)
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
