from odbc2deltalake_spark.functions.projection import (
    convert_projection,
    with_system_cols,
)

__all__ = ["convert_projection", "with_system_cols"]
