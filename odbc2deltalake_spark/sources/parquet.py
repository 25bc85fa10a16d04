"""Parquet-table source — files/lakehouse tables as an ingestion source.

Covers the reference's "query as source" shape for local data
(reference:tests/test_09_query.py:25-43): any parquet path (or a SQL query
over registered views) can drive a load. Predicate pushdown and column
pruning reach the parquet scan via Catalyst (PushedFilters / ReadSchema in
``explain``), which is the Spark-native equivalent of the reference
embedding WHERE clauses in remote SQL.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from odbc2deltalake_spark.metadata import ColInfo
from odbc2deltalake_spark.sources.base import Source


class ParquetTableSource(Source):
    def __init__(
        self,
        path: str,
        primary_keys: Optional[list[str]] = None,
        type_strs: Optional[dict[str, str]] = None,
    ):
        self.path = path
        self._pks = primary_keys or []
        # optional source-type annotations (e.g. {"rv": "rowversion"}) to
        # drive delta-col detection / type mapping like INFORMATION_SCHEMA
        # strings would (reference:odbc2deltalake/metadata.py:129-152)
        self._type_strs = type_strs or {}

    def col_infos(self, spark: SparkSession) -> list[ColInfo]:
        schema = spark.read.parquet(self.path).schema
        return [
            ColInfo(
                column_name=f.name,
                data_type=f.dataType,
                data_type_str=self._type_strs.get(f.name, f.dataType.simpleString()),
                is_nullable=f.nullable,
            )
            for f in schema.fields
        ]

    def primary_keys(self, spark: SparkSession) -> list[str]:
        return list(self._pks)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)
