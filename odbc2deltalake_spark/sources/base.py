"""Source abstraction — what the engine reads *from*.

The reference splits every operation into ``source_*`` (SQL shipped to the
remote RDBMS) and ``local_*`` (duckdb/Spark over Delta files)
(reference:odbc2deltalake/reader/reader.py:35-123). Spark-first, that split
collapses: a Source just yields DataFrames; "runs on the source" becomes
"pushed into the scan" (JDBC embeds predicates in the query string, parquet
gets Catalyst pushdown), and everything else is one Spark plan.

Sources still own the *introspection* surface, the only genuinely
dialect-sensitive part (reference:odbc2deltalake/metadata.py:16-199):
column infos, primary keys, and delta-column detection.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2deltalake_spark.metadata import ColInfo


class Source(ABC):
    """A table/view/query the engine ingests."""

    #: SQL dialect of the source's type strings. Gates dialect-scoped type
    #: aliases — on "tsql", bare ``timestamp`` means rowversion; on "spark"
    #: (parquet/DataFrame sources) it is a real TimestampType and must NOT
    #: be treated as a row-change counter.
    dialect: str = "spark"

    @abstractmethod
    def col_infos(self, spark: SparkSession) -> list[ColInfo]:
        """Column descriptors, in source order
        (reference:odbc2deltalake/metadata.py:74-152; query sources probe
        with a LIMIT-0 read, metadata.py:155-199)."""

    def primary_keys(self, spark: SparkSession) -> list[str]:
        """Introspected PK column names; [] when unknown
        (reference:odbc2deltalake/metadata.py:16-45). Query sources must
        get PKs from WriteConfig (reference:odbc2deltalake/write_init.py:262-268)."""
        return []

    def default_delta_col(self, spark: SparkSession) -> Optional[str]:
        """Auto-detected delta column: rowversion-typed col, else
        AS_ROW_START generated col, else a col named ``__timestamp``
        (reference:odbc2deltalake/write_init.py:144-167)."""
        for c in self.col_infos(spark):
            base = c.data_type_str.split("(")[0].strip().lower()
            # "timestamp" is the rowversion alias only on tsql; on a Spark
            # dialect source it is a real time column, never a rowversion
            if base == "rowversion" or (base == "timestamp" and self.dialect == "tsql"):
                return c.column_name
        for c in self.col_infos(spark):
            if c.generated_always_type_desc == "AS_ROW_START":
                return c.column_name
        for c in self.col_infos(spark):
            if c.column_name == "__timestamp":
                return c.column_name
        return None

    @abstractmethod
    def read(self, spark: SparkSession) -> DataFrame:
        """Full projection of the source, source column names, raw types."""

    # ------------------------------------------------------------------
    # Pushdown points. Defaults express the predicate on the DataFrame and
    # let Catalyst push it into the scan; JDBC sources override to embed
    # SQL in the remote query (true server-side pushdown).
    # ------------------------------------------------------------------

    def read_where_gt(
        self, spark: SparkSession, column: str, value: Any
    ) -> DataFrame:
        """Rows with ``column > value`` — the delta criterion
        (reference:odbc2deltalake/db_to_delta.py:584-610)."""
        return self.read(spark).filter(F.col(column) > F.lit(value))

    def read_where_ge(
        self, spark: SparkSession, column: str, value: Any
    ) -> DataFrame:
        """Rows with ``column >= value`` — used by the strange-update
        watermark rewind. The reference re-extracts with strict ``>``
        MIN(ts) (reference:odbc2deltalake/db_to_delta.py:1120-1146), which
        leaves the min-ts key itself as a phantom in latest_pk_version with
        no corresponding history row; ``>=`` closes that gap."""
        return self.read(spark).filter(F.col(column) >= F.lit(value))

    def read_keys(self, spark: SparkSession, columns: list[str]) -> DataFrame:
        """PK + delta-col projection only — the pre-load key snapshot
        (reference:odbc2deltalake/db_to_delta.py:862-890). Column pruning
        reaches the scan by construction."""
        return self.read(spark).select(*columns)

    def read_for_keys(
        self, spark: SparkSession, key_df: DataFrame, key_cols: list[str]
    ) -> DataFrame:
        """Full rows for an explicit key set. The reference inlines the
        keys as OPENJSON/JSON_TABLE SQL in ≤7000-char chunks
        (reference:odbc2deltalake/db_to_delta.py:907-992); Spark-native
        this is a broadcast semi join — no SQL-length cap, and the same
        plan degrades gracefully to a shuffle join past the broadcast
        threshold."""
        return self.read(spark).join(
            F.broadcast(key_df.select(*key_cols).distinct()),
            on=key_cols,
            how="left_semi",
        )

    def max_and_count(
        self, spark: SparkSession, delta_col: Optional[str]
    ) -> tuple[Any, int]:
        """(MAX(delta_col), COUNT(*)) — the source watermark probe
        (reference:odbc2deltalake/load_infos.py:44-70). JDBC sources
        override to push the scalar aggregate to the server; here the agg
        reduces map-side and moves one row."""
        agg_max = (
            F.max(F.col(delta_col)).alias("max_ts")
            if delta_col
            else F.lit(None).alias("max_ts")
        )
        row = self.read(spark).agg(agg_max, F.count(F.lit(1)).alias("cnt")).first()
        return row["max_ts"], row["cnt"]
