"""Timestamp time travel (r9): every commit records wall-clock `ts`;
`read(timestamp=...)` / `version_at_timestamp` resolve the newest
version committed at or before that time, monotonizing writer-clock
regressions (Delta's timestampAsOf semantics). The external spec reader
resolves identically."""

from __future__ import annotations

import datetime
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable
from tools.external_reader import read_table, version_at_timestamp


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _t3(spark, tmp_path, tss=(100.0, 200.0, 300.0)):
    """Three appends with injected commit times."""
    t = VersionedParquetTable(tmp_path / "t")
    for i, ts in enumerate(tss):
        t.write(
            _mk(spark, i * 10, i * 10 + 10),
            mode="append",
            extra_commit_fields={"ts": ts},
        )
    return t


def test_resolution_and_read(spark, tmp_path):
    t = _t3(spark, tmp_path)
    assert t.version_at_timestamp(100.0) == 0
    assert t.version_at_timestamp(250.0) == 1
    assert t.version_at_timestamp(10**9) == 2
    assert t.read(spark, timestamp=199.9).count() == 10
    assert t.read(spark, timestamp=200.0).count() == 20
    # datetime form (naive = local clock, like Delta)
    dt = datetime.datetime.fromtimestamp(250.0)
    assert t.version_at_timestamp(dt) == 1
    with pytest.raises(ValueError):
        t.version_at_timestamp(99.9)  # predates the table
    with pytest.raises(ValueError):
        t.read(spark, version=1, timestamp=250.0)  # mutually exclusive


def test_clock_regression_is_monotonized(spark, tmp_path):
    # writer clock jumps BACK between v0 and v1: v1 must never resolve
    # as older than v0 (running-max monotonization, Delta's rule)
    t = _t3(spark, tmp_path, tss=(100.0, 50.0, 200.0))
    assert t.version_at_timestamp(100.0) == 1  # v1 counts as time 100
    assert t.version_at_timestamp(150.0) == 1
    assert t.version_at_timestamp(200.0) == 2
    with pytest.raises(ValueError):
        t.version_at_timestamp(99.0)


def test_default_commits_are_stamped_and_ordered(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_mk(spark, 0, 10), mode="append")
    t.delete_where(spark, ("k", "<", 3), lazy=True)
    t.merge_upsert(
        spark,
        _mk(spark, 5, 15),
        key_cols=["k"],
        num_buckets=2,
    )
    hs = {h["version"]: h for h in t.history()}
    tss = [hs[v]["ts"] for v in sorted(hs)]
    assert all(isinstance(x, float) for x in tss)
    assert tss == sorted(tss)  # same process: strictly non-decreasing
    # resolving "now" yields the head; reading there sees head rows
    now = max(tss)
    assert t.version_at_timestamp(now) == t.version()
    assert t.read(spark, timestamp=now).count() == t.read(spark).count()


def test_missing_ts_counts_as_time_zero(spark, tmp_path):
    # a pre-r9 log (no ts fields) stays readable: old commits count as
    # time 0, so any positive timestamp resolves to them
    t = _t3(spark, tmp_path)
    c0 = Path(tmp_path / "t" / "_commits" / f"{0:010d}.json")
    d = json.loads(c0.read_text())
    del d["ts"]
    c0.write_text(json.dumps(d))
    assert t.version_at_timestamp(50.0) == 0  # v0 now time-0
    assert t.version_at_timestamp(250.0) == 1


def test_restore_to_timestamp(spark, tmp_path):
    t = _t3(spark, tmp_path)
    t.restore(timestamp=150.0)  # back to the v0 state (ts 100)
    assert t.read(spark).count() == 10
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(10))
    with pytest.raises(ValueError):
        t.restore(version=1, timestamp=150.0)
    with pytest.raises(ValueError):
        t.restore()


def test_external_reader_resolves_identically(spark, tmp_path):
    t = _t3(spark, tmp_path, tss=(100.0, 50.0, 200.0))
    for q in (100.0, 150.0, 200.0, 10**9):
        assert version_at_timestamp(tmp_path / "t", q) == t.version_at_timestamp(q)
    ext = read_table(tmp_path / "t", timestamp=150.0)
    eng = t.read(spark, timestamp=150.0)
    assert sorted(d["k"] for d in ext.to_pylist()) == sorted(
        r["k"] for r in eng.collect()
    )
    with pytest.raises(ValueError):
        read_table(tmp_path / "t", version=1, timestamp=150.0)
