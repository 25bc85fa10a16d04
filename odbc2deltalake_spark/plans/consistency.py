"""Consistency invariant: the persisted ``latest_pk_version`` must equal
the current-rows set re-derived from the SCD2 history itself
(reference:odbc2deltalake/consistency.py:17-56). This is the correctness
contract of the whole engine — the reference runs it after every load in
its tests (SURVEY.md §5)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from odbc2deltalake_spark.config import WriteConfigAndInfos
from odbc2deltalake_spark.operators.scd2 import derive_latest_pk_from_history
from odbc2deltalake_spark.plans.destination import DeltaDestination


class InconsistentPrimaryKeyError(Exception):
    def __init__(self, message: str, invalid_data: list[dict[str, Any]]):
        self.message = message
        self.invalid_data = invalid_data
        super().__init__(message)


def check_latest_pk(
    infos: WriteConfigAndInfos, raise_if_not_consistent: bool = True
) -> list[dict[str, Any]]:
    """EXCEPT in both directions between the persisted index and the
    history-derived one; any row is an inconsistency
    (reference:odbc2deltalake/consistency.py:33-51)."""
    if not infos.delta_col or not infos.pk_cols:
        raise ValueError("Primary keys and delta column must be defined")
    cfg = infos.write_config
    dest = DeltaDestination(infos.destination)
    pk_names = [cfg.target_name(c) for c in infos.pk_cols]
    delta_name = cfg.target_name(infos.delta_col)
    sel = pk_names + [delta_name]

    persisted = dest.latest_pk_version.read(infos.spark).select(*sel)
    derived = derive_latest_pk_from_history(
        dest.delta.read(infos.spark), pk_names, delta_name
    )
    if derived is None:
        raise ValueError("No full load found in history; cannot derive latest pk")
    derived = derived.select(*sel)

    added = persisted.exceptAll(derived).withColumn(
        "issue", F.lit("added in persisted data")
    )
    missing = derived.exceptAll(persisted).withColumn(
        "issue", F.lit("missing in persisted data")
    )
    # cap the driver-side sample: a corrupted index at 100 TB could emit
    # millions of inconsistent rows — 1000 examples diagnose it without
    # OOMing the driver (the boolean outcome is unchanged)
    rows = [r.asDict() for r in added.unionByName(missing).limit(1000).collect()]
    if rows and raise_if_not_consistent:
        raise InconsistentPrimaryKeyError("Primary keys are not consistent", rows)
    return rows


def check_delta_consistency(
    infos: WriteConfigAndInfos, auto_fix: bool = False
) -> list[dict[str, Any]]:
    """Check; optionally repair by re-deriving the index from history
    (reference:tests/test_10_consistency_fix.py)."""
    rows = check_latest_pk(infos, raise_if_not_consistent=not auto_fix)
    if rows and auto_fix:
        cfg = infos.write_config
        dest = DeltaDestination(infos.destination)
        pk_names = [cfg.target_name(c) for c in infos.pk_cols]
        delta_name = cfg.target_name(infos.delta_col)
        derived = derive_latest_pk_from_history(
            dest.delta.read(infos.spark), pk_names, delta_name
        )
        assert derived is not None
        dest.latest_pk_version.write(derived, mode="overwrite")
        rows2 = check_latest_pk(infos, raise_if_not_consistent=True)
        assert not rows2
    return rows
