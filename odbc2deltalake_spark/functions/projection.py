"""Extraction projections — P1/P2/P3 of SURVEY.md §2.2.

The reference builds one big SELECT per extraction combining rename, cast,
TRIM, and system-column synthesis (reference:odbc2deltalake/db_to_delta.py:54-164);
here each concern is a small DataFrame transformation and Catalyst fuses
them into the scan (single codegen stage, no extra pass over the data).
"""

from __future__ import annotations

import datetime
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from odbc2deltalake_spark.metadata import SYS, ColInfo, should_trim


def convert_projection(
    df: DataFrame,
    cols: list[ColInfo],
    target_name,
    no_trim: bool = False,
) -> DataFrame:
    """P1+P2: select every source column renamed to its compat target name,
    cast through the type map, TRIM()ed when string-typed (except
    xml/uuid/oid/xid) (reference:odbc2deltalake/db_to_delta.py:54-88,104-164;
    trim behavior pinned by reference:tests/test_01_first_full.py:73)."""
    exprs = []
    for c in cols:
        e = F.col("`" + c.column_name.replace("`", "``") + "`")
        if c.data_type is not None:
            e = e.cast(c.data_type)
        if not no_trim and should_trim(c):
            e = F.trim(e)
        exprs.append(e.alias(target_name(c)))
    return df.select(*exprs)


def with_system_cols(
    df: DataFrame,
    load_ts: datetime.datetime,
    is_deleted: bool = False,
    is_full_load: bool = False,
) -> DataFrame:
    """P3: append ``__timestamp``, ``__is_deleted``, ``__is_full_load``
    (reference:odbc2deltalake/db_to_delta.py:91-101,142-163).

    Spark-native determinism choice (SURVEY.md §7.1#4): the timestamp is a
    driver-captured constant per load, not per-statement server time — one
    load stamps one instant, which the restore/consistency algebra relies
    on being monotonic across loads."""
    return (
        df.withColumn(SYS.timestamp, F.lit(load_ts).cast(T.TimestampType()))
        .withColumn(SYS.is_deleted, F.lit(bool(is_deleted)))
        .withColumn(SYS.is_full_load, F.lit(bool(is_full_load)))
    )


def tombstone_projection(
    deletes_keys: DataFrame,
    all_cols: list[str],
    pk_cols: list[str],
    schema: dict[str, T.DataType],
    load_ts: datetime.datetime,
) -> DataFrame:
    """P4: delete tombstones — PK values kept, every non-pk column NULL of
    the correct type, ``__is_deleted=true``
    (reference:odbc2deltalake/db_to_delta.py:794-843). The reference needs
    a ``WHERE 1=0`` typed branch to force types (P5); building the
    DataFrame against the target schema directly makes that unnecessary."""
    exprs = []
    for c in all_cols:
        if c in pk_cols:
            exprs.append(F.col(c))
        else:
            exprs.append(F.lit(None).cast(schema[c]).alias(c))
    out = deletes_keys.select(*exprs)
    return with_system_cols(out, load_ts, is_deleted=True, is_full_load=False)
