from odbc2deltalake_spark.plans.destination import DeltaDestination, DeltaLogger
from odbc2deltalake_spark.plans.db_to_delta import (
    exec_write_db_to_delta,
    write_db_to_delta,
)
from odbc2deltalake_spark.plans.consistency import (
    check_latest_pk,
    check_delta_consistency,
    InconsistentPrimaryKeyError,
)

__all__ = [
    "DeltaDestination",
    "DeltaLogger",
    "exec_write_db_to_delta",
    "write_db_to_delta",
    "check_latest_pk",
    "check_delta_consistency",
    "InconsistentPrimaryKeyError",
]
