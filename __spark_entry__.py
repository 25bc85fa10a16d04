"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; `queries()` exposes one
callable per implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators); `oracle_sql()` gives the DuckDB
equivalent for the value-hash correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from odbc2deltalake_spark.queries import registry as _registry

_registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: current (non-deleted)
    rows from an SCD2-style change feed — the engine's core read contract."""
    spec = _registry.QUERIES["scd2_current_rows"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Emitted in curated order (registry.ordered_specs): the core set —
    every §2 operator plus every LLM-pipeline operator — first, overflow
    entries (priority>=100) last, so a harness that enumerates a bounded
    prefix always sees the core coverage."""
    return {spec.name: spec.fn for spec in _registry.ordered_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (omitted => rows-only)."""
    return {
        spec.name: spec.oracle
        for spec in _registry.ordered_specs()
        if spec.oracle is not None
    }
