from odbc2deltalake_spark.operators.scd2 import (
    latest_per_key,
    latest_pk_union,
    deletes_keys,
    derive_latest_pk_from_history,
)

__all__ = [
    "latest_per_key",
    "latest_pk_union",
    "deletes_keys",
    "derive_latest_pk_from_history",
]
