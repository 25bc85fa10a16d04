"""One-slice driver-local DataFrames for control-plane writes.

``spark.createDataFrame(rows, schema)`` slices a local collection into
``defaultParallelism`` partitions — 32 on the bench host — so every tiny
control-plane write (a load's ~8-row log flush, the empty ``delta_2``
reset each simple load pays, ``write_empty``) launches a 32-task job to
move a handful of rows. Measured idle at r15 (guide §1): the 32-slice
8-row collect costs 0.31–0.44 s vs 0.19–0.25 s for the same rows in ONE
slice; an empty 32-partition write is a ~0.3 s zero-row job. These
writes sit on the CDC load's critical path (3 of them per simple load,
once per micro-batch under streaming), so the floor is paid constantly.

``coalesce(1)`` is NOT the fix — on a local-relation scan it measured
~5 s (it defeats the parallel local scan and serializes the whole
conversion through one task *inside the same job*). Building the frame
from a 1-slice ``parallelize`` keeps the driver-side conversion and
gives the scheduler exactly one task.

Scale note: these are control-plane frames (log records, empty resets,
commit markers) whose size is bounded by the engine, never by data —
one slice is the correct shape at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def one_slice_df(
    spark: SparkSession, rows: list, schema: T.StructType
) -> DataFrame:
    """A DataFrame over a small driver-local collection in ONE partition."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
