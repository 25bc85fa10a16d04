from odbc2deltalake_spark.sources.base import Source
from odbc2deltalake_spark.sources.dataframe import DataFrameSource
from odbc2deltalake_spark.sources.parquet import ParquetTableSource

__all__ = ["Source", "DataFrameSource", "ParquetTableSource"]
