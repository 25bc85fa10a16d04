"""Write configuration — analogue of the reference's ``WriteConfig`` /
``WriteConfigAndInfos`` (reference:odbc2deltalake/write_init.py:64-121).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Literal, Optional, TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from odbc2deltalake_spark.metadata import ColInfo, compat_name

if TYPE_CHECKING:
    from odbc2deltalake_spark.sources.base import Source

LoadMode = Literal[
    "overwrite",
    "append",
    "force_full",
    "append_inserts",
    "simple_delta",
    "simple_delta_check",
]

SchemaDrift = Literal[True, False, "new_only"]


@dataclass
class WriteConfig:
    """User-facing load configuration
    (reference:odbc2deltalake/write_init.py:64-104)."""

    delta_col: Optional[str] = None
    primary_keys: Optional[list[str]] = None
    load_mode: Optional[LoadMode] = None
    # source type string -> Spark target type, merged over the default map
    # (reference:odbc2deltalake/write_init.py:29-38; user override e.g.
    # decimal -> double, tests/test_05_conversion.py:29-36)
    data_type_map: dict[str, T.DataType] = field(default_factory=dict)
    allow_schema_drift: SchemaDrift = "new_only"
    no_trim: bool = False
    # strange-update strategy cutoff: above this many keys, rewind the
    # watermark instead of key-list fetching
    # (reference:odbc2deltalake/db_to_delta.py:1105-1107)
    max_complex_entries: int = 1000
    no_complex_entries_load: bool = False
    # column rename policy (reference:odbc2deltalake/write_init.py:95-99)
    get_target_name: Callable[[ColInfo], str] = None  # type: ignore[assignment]
    # hook applied to every source read, tagged by stage
    # (reference:odbc2deltalake/reader/spark_reader.py:95-113)
    transformation_hook: Callable[[DataFrame, str], DataFrame] = None  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.get_target_name is None:
            self.get_target_name = lambda c: compat_name(c.column_name)
        if self.transformation_hook is None:
            self.transformation_hook = lambda df, tag: df

    def target_name(self, col: ColInfo) -> str:
        return self.get_target_name(col)


@dataclass
class WriteConfigAndInfos:
    """The 'analyzed plan': everything resolved before execution
    (reference:odbc2deltalake/write_init.py:288-303)."""

    spark: SparkSession
    source: "Source"
    destination: Path
    col_infos: list[ColInfo]
    pk_cols: list[ColInfo]
    delta_col: Optional[ColInfo]
    write_config: WriteConfig

    def execute(self):
        from odbc2deltalake_spark.plans.db_to_delta import exec_write_db_to_delta

        return exec_write_db_to_delta(self)
