"""In-memory mutable source — the test harness's RDBMS stand-in.

The reference tests mutate dockerized MSSQL/Postgres tables between loads
(reference:tests/test_03_delta.py); here tests mutate a DataFrame-backed
source the same way (insert/update/delete rows, add columns) and re-run the
load. A ``between_stages`` hook lets tests emulate concurrent writes that
land mid-load (reference:tests/test_12_insert_while_load.py:43-87).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from odbc2deltalake_spark.metadata import ColInfo
from odbc2deltalake_spark.sources.base import Source


class DataFrameSource(Source):
    def __init__(
        self,
        df: DataFrame,
        infos: list[ColInfo],
        primary_keys: Optional[list[str]] = None,
    ):
        self._df = df
        self._infos = infos
        self._pks = primary_keys or []
        # test hook: called with a stage tag before each engine read; may
        # replace the backing df (simulates concurrent source mutations)
        self.between_stages: Optional[Callable[[str, DataFrame], Optional[DataFrame]]] = None

    # -- test-side mutation API --

    def set_df(self, df: DataFrame, infos: Optional[list[ColInfo]] = None) -> None:
        self._df = df
        if infos is not None:
            self._infos = infos

    @property
    def df(self) -> DataFrame:
        return self._df

    # -- Source impl --

    def col_infos(self, spark: SparkSession) -> list[ColInfo]:
        return list(self._infos)

    def primary_keys(self, spark: SparkSession) -> list[str]:
        return list(self._pks)

    def read(self, spark: SparkSession) -> DataFrame:
        self._hook("read")
        return self._df

    def read_keys(self, spark: SparkSession, columns: list[str]) -> DataFrame:
        self._hook("read_keys")
        return self._df.select(*columns)

    def _hook(self, tag: str) -> None:
        if self.between_stages is not None:
            new = self.between_stages(tag, self._df)
            if new is not None:
                self._df = new
