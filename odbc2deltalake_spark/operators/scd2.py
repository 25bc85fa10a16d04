"""The SCD2 relational algebra as named DataFrame builders.

These are the genuinely hard pieces of the reference (SURVEY.md §7.3 #1/#2)
— the three-source latest-pk union with anti-join precedence, delete
detection, and the history-derived current-rows reconstruction — kept pure
(DataFrame in → DataFrame out) so the consistency invariant can test them
directly.

Scale notes (100 TB): every join here is a conjunctive PK equi-join.
``delta_1``/``delta_2`` are per-load change sets (small → broadcast side);
``primary_keys_ts``/``latest_pk_version`` are keys-only tables, orders of
magnitude narrower than the history table. The only full-history scan is
``derive_latest_pk_from_history`` (restore path), a single window shuffle
partitioned by PK — the same unavoidable shuffle Delta's own CDC replay
pays. AQE handles skewed keys.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from odbc2deltalake_spark.metadata import SYS


def latest_per_key(
    df: DataFrame, pk_cols: list[str], ts_col: str, tiebreak: Optional[list[str]] = None
) -> DataFrame:
    """W1: ROW_NUMBER() OVER (PARTITION BY pks ORDER BY ts DESC NULLS LAST)
    = 1 (reference:odbc2deltalake/write_utils/restore_pk.py:97-118)."""
    order = [F.col(ts_col).desc_nulls_last()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*pk_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_pk_union(
    delta_2: Optional[DataFrame],
    delta_1: DataFrame,
    pk_ts: Optional[DataFrame],
    pk_cols: list[str],
    ts_col: str,
    delta_load_value=None,
) -> DataFrame:
    """U1: the three-source latest-pk assembly with anti-join precedence
    (reference:odbc2deltalake/db_to_delta.py:289-427 `_get_latest_pk_query`):

        latest_pk = delta_2
                  ∪ (delta_1  ANTI delta_2 on pks)
                  ∪ (pk_ts[ts<=delta_load_value] ANTI delta_2 ANTI delta_1)

    ``pk_ts=None`` is the simple-delta merge shape (first two branches
    only). The ``delta_load_value`` cap applies to the pk_ts branch only —
    it excludes keys whose rows appeared *during* the load (P9; pinned by
    reference:tests/test_12_insert_while_load.py:43-87).
    """
    sel = pk_cols + [ts_col]
    d2 = (delta_2 or None) and delta_2.select(*sel)
    d1 = delta_1.select(*sel)
    parts: list[DataFrame] = []
    if d2 is not None:
        parts.append(d2)
        parts.append(d1.join(d2.select(*pk_cols), on=pk_cols, how="left_anti"))
    else:
        parts.append(d1)
    if pk_ts is not None:
        branch = pk_ts.select(*sel)
        if delta_load_value is not None:
            branch = branch.filter(F.col(ts_col) <= F.lit(delta_load_value))
        if d2 is not None:
            branch = branch.join(d2.select(*pk_cols), on=pk_cols, how="left_anti")
        branch = branch.join(d1.select(*pk_cols), on=pk_cols, how="left_anti")
        parts.append(branch)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def deletes_keys(
    old_latest_pk: DataFrame, current_expected: DataFrame, pk_cols: list[str]
) -> DataFrame:
    """U2: deleted keys = old latest-pk set EXCEPT the currently-expected
    key set, on pk columns (reference:odbc2deltalake/db_to_delta.py:773-792).
    Set semantics (keys are unique) — expressed as a left anti join, which
    Catalyst plans identically to EXCEPT DISTINCT here but without the
    pre-aggregation."""
    return (
        old_latest_pk.select(*pk_cols)
        .join(current_expected.select(*pk_cols), on=pk_cols, how="left_anti")
        .distinct()
    )


def derive_latest_pk_from_history(
    history: DataFrame,
    pk_cols: list[str],
    ts_col: str,
) -> Optional[DataFrame]:
    """Reconstruct the current-rows key index from the SCD2 history alone
    (reference:odbc2deltalake/write_utils/restore_pk.py:16-203):

    1. ``last_full_ts`` = MAX(__timestamp) over full-load rows; None → fail.
    2. ``last_full_load`` = full-load rows at exactly that timestamp
       (the complete key universe as of the last full load — full loads
       implicitly delete undelivered keys, reference:README.md:7).
    3. ``delta_after`` = latest version per key among rows strictly after
       (W1 window).
    4. current = (delta_after ∪ (last_full_load ANTI delta_after)) minus
       rows whose latest version is a tombstone.

    Returns None when no full load exists (restore impossible).
    """
    full_rows = history.filter(F.col(SYS.is_full_load))
    row = full_rows.agg(F.max(SYS.timestamp).alias("m")).first()
    if row is None or row["m"] is None:
        return None
    last_full_ts = row["m"]

    sel = pk_cols + [ts_col, SYS.is_deleted]
    last_full = (
        full_rows.filter(F.col(SYS.timestamp) == F.lit(last_full_ts))
        .select(*pk_cols, F.col(ts_col), F.lit(False).alias(SYS.is_deleted))
    )
    after = history.filter(F.col(SYS.timestamp) > F.lit(last_full_ts)).select(
        *sel, F.col(SYS.timestamp)
    )
    latest_after = latest_per_key(after, pk_cols, SYS.timestamp).select(*sel)

    base = latest_after.unionByName(
        last_full.join(latest_after.select(*pk_cols), on=pk_cols, how="left_anti")
    )
    return base.filter(~F.col(SYS.is_deleted)).select(*pk_cols, ts_col)
