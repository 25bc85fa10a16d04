"""CHECK constraints (Delta ADD CONSTRAINT parity): enforced on write /
update_where / merge_upsert, NULL passes (SQL CHECK), violating data is
abandoned un-committed, add-time validates existing rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import (
    ConstraintViolationError,
    VersionedParquetTable,
)


def _df(spark, rows, schema="k long, v long"):
    return spark.createDataFrame(rows, schema)


def test_write_enforces_and_abandons_uncommitted(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, 10), (2, 20)]))
    t.set_check_constraint(spark, "v_nonneg", ("v", ">=", 0))
    v_before = t.version()

    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.write(_df(spark, [(3, 30), (4, -1)]))
    # nothing committed; table state unchanged
    assert t.version() == v_before
    assert t.read(spark).count() == 2
    # the rejected dir is removed eagerly — no orphan left behind
    assert t.vacuum(dry_run=True, orphan_min_age_seconds=0) == []

    # clean rows still flow
    t.write(_df(spark, [(3, 30)]))
    assert t.read(spark).count() == 3


def test_null_passes_sql_check_semantics(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, 10)]))
    t.set_check_constraint(spark, "v_nonneg", ("v", ">=", 0))
    t.write(_df(spark, [(2, None)]))  # NULL predicate -> passes
    assert t.read(spark).count() == 2


def test_add_time_validates_existing_rows(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, -5)]))
    with pytest.raises(ConstraintViolationError, match="existing rows"):
        t.set_check_constraint(spark, "v_nonneg", ("v", ">=", 0))
    with pytest.raises(ValueError, match="unknown column"):
        t.set_check_constraint(spark, "bad", ("nope", ">=", 0))
    with pytest.raises(ValueError, match="invalid constraint name"):
        t.set_check_constraint(spark, "bad name!", ("v", ">=", 0))


def test_drop_constraint_stops_enforcement(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, 10)]))
    t.set_check_constraint(spark, "v_nonneg", ("v", ">=", 0))
    assert "v_nonneg" in t.check_constraints()
    t.drop_check_constraint("v_nonneg")
    assert t.check_constraints() == {}
    t.write(_df(spark, [(2, -1)]))  # no longer enforced
    assert t.read(spark).count() == 2


def test_update_where_enforced_atomically(spark, tmp_path):
    """An UPDATE whose SET breaks the constraint must withhold the whole
    commit — the table reads back exactly as before."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(i, i * 10) for i in range(1, 6)]),
            stats_cols=["k"])
    t.set_check_constraint(spark, "v_cap", ("v", "<=", 100))
    v_before = t.version()
    with pytest.raises(ConstraintViolationError, match="v_cap"):
        t.update_where(spark, {"v": "v * 100"}, ("k", ">=", 4))
    assert t.version() == v_before
    assert sorted(tuple(r) for r in t.read(spark).collect()) == [
        (i, i * 10) for i in range(1, 6)
    ]
    # a compliant update still works and reports correctly
    out = t.update_where(spark, {"v": "v + 1"}, ("k", "=", 1))
    assert out["rows_updated"] == 1


def test_merge_upsert_source_gated(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, 10), (2, 20)]))
    t.set_check_constraint(spark, "v_nonneg", ("v", ">=", 0))
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.merge_upsert(spark, _df(spark, [(2, -7)]), key_cols=["k"])
    assert sorted(tuple(r) for r in t.read(spark).collect()) == [
        (1, 10), (2, 20)
    ]
    t.merge_upsert(spark, _df(spark, [(2, 25), (3, 30)]), key_cols=["k"])
    assert sorted(tuple(r) for r in t.read(spark).collect()) == [
        (1, 10), (2, 25), (3, 30)
    ]


def test_constraint_survives_restore_and_conjunction(spark, tmp_path):
    """Constraints live in table properties: they replicate through the
    commit log and keep enforcing after a RESTORE; conjunct lists AND."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, 10)]))
    t.set_check_constraint(
        spark, "v_range", [("v", ">=", 0), ("v", "<=", 100)]
    )
    t.write(_df(spark, [(2, 50)]))
    t.restore(t.version() - 1)
    with pytest.raises(ConstraintViolationError):
        t.write(_df(spark, [(9, 101)]))
    t.write(_df(spark, [(9, 100)]))


def test_missing_column_append_passes(spark, tmp_path):
    """An append lacking the constrained column stores NULL there — SQL
    CHECK passes NULLs, so the write goes through."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_df(spark, [(1, 10)]))
    t.set_check_constraint(spark, "v_nonneg", ("v", ">=", 0))
    t.write(spark.createDataFrame([(5,)], "k long"))
    rows = {tuple(r) for r in t.read(spark).collect()}
    assert (5, None) in rows
