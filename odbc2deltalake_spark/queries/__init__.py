from odbc2deltalake_spark.queries.registry import QUERIES, QuerySpec, register, load_table

__all__ = ["QUERIES", "QuerySpec", "register", "load_table"]
