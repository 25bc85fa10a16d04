"""Protocol versioning (r9): a commit carrying min_reader_version above
the engine's READER_VERSION fences off the snapshot (Delta's
protocol-versioning rule — refuse, never skip); time travel below the
demanding commit stays readable, and the fence rides checkpoints."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import (
    UnsupportedReaderVersionError,
    VersionedParquetTable,
)
from tools.external_reader import read_table


def _t(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(10).select(F.col("id").alias("k")), mode="append")
    t.write(
        spark.range(10, 20).select(F.col("id").alias("k")),
        mode="append",
        extra_commit_fields={"min_reader_version": 99},
    )
    return t


def test_demanding_commit_fences_head_but_not_history(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(UnsupportedReaderVersionError):
        t.read(spark).count()
    with pytest.raises(UnsupportedReaderVersionError):
        t.schema()
    # the pre-demand version is still fully readable
    assert t.read(spark, version=0).count() == 10
    # external reader refuses identically, and time-travels identically
    with pytest.raises(RuntimeError, match="reader version"):
        read_table(tmp_path / "t")
    assert read_table(tmp_path / "t", version=0).num_rows == 10


def test_fence_rides_checkpoints(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(5).select(F.col("id").alias("k")), mode="append")
    t.checkpoint()
    # a newer writer (which understands v99) would persist the demand in
    # its checkpoints; simulate by hand-editing the checkpoint state
    ck = Path(tmp_path / "t" / "_checkpoints" / f"{0:010d}.json")
    st = json.loads(ck.read_text())
    st["min_reader_version"] = 99
    ck.write_text(json.dumps(st))
    with pytest.raises(UnsupportedReaderVersionError):
        t.read(spark).count()
    # bypassing checkpoints replays the (all-v1) log fine
    assert (
        VersionedParquetTable(tmp_path / "t")._state_at(use_checkpoint=False)[
            "version"
        ]
        == 0
    )


def test_current_protocol_states_version_one(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(3).select(F.col("id").alias("k")), mode="append")
    assert t._state_at()["min_reader_version"] == 1
    assert t.read(spark).count() == 3
