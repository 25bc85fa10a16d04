"""JDBC source SQL-generation tests (no database in this container — the
generated SQL strings are the contract; the reads are plain
``spark.read.format("jdbc")`` wherever a driver jar exists)."""

from __future__ import annotations

from odbc2deltalake_spark.metadata import ColInfo
from odbc2deltalake_spark.sources.jdbc import JDBCSource, _rebuild_type_str, _sql_type_to_spark

from pyspark.sql import types as T


def _tsql():
    return JDBCSource("jdbc:sqlserver://h;db=x", table=("dbo", "user2$"), dialect="tsql")


def _pg():
    return JDBCSource("jdbc:postgresql://h/x", table=("public", "user"), dialect="postgres")


def test_identifier_quoting():
    assert _tsql().from_clause() == "[dbo].[user2$] t"
    assert _pg().from_clause() == '"public"."user" t'


def test_query_source_wrap():
    s = JDBCSource(
        "jdbc:sqlserver://h", query="select * from dbo.[user] where age > 50"
    )
    assert s.from_clause() == "(select * from dbo.[user] where age > 50) t"


def test_delta_criterion_rowversion_cast():
    s = _tsql()
    s._col_cache = [ColInfo("rv", T.LongType(), "rowversion")]
    assert s.delta_criterion_sql("rv", 1000) == "CAST(t.[rv] AS BIGINT) > 1000"


def test_delta_criterion_xid_double_cast():
    s = _pg()
    s._col_cache = [ColInfo("xmin", T.LongType(), "xid")]
    assert (
        s.delta_criterion_sql("xmin", 7)
        == 'CAST(CAST(t."xmin" AS TEXT) AS BIGINT) > 7'
    )


def test_keyset_values_join():
    s = _tsql()
    sql = s.keyset_join_sql([{"id": 1}, {"id": 2}], ["id"])
    assert "INNER JOIN (VALUES (1), (2)) AS k ([id])" in sql
    assert "t.[id] = k.[id]" in sql


def test_keyset_string_quoting():
    s = _tsql()
    sql = s.keyset_join_sql([{"k": "O'Neil"}], ["k"])
    assert "(VALUES ('O''Neil'))" in sql


def test_information_schema_sql_shape():
    sql = _tsql().information_schema_sql()
    assert "INFORMATION_SCHEMA.COLUMNS" in sql and "sys.columns" in sql
    assert "WITH(NOLOCK)" in sql and "generated_always_type_desc" in sql
    sql_pg = _pg().information_schema_sql()
    assert "information_schema.columns" in sql_pg


def test_primary_keys_sql_shape():
    sql = _tsql().primary_keys_sql()
    assert "TABLE_CONSTRAINTS" in sql and "CONSTRAINT_COLUMN_USAGE" in sql
    assert "'PRIMARY KEY'" in sql


def test_type_str_rebuild():
    assert _rebuild_type_str({"data_type": "varchar", "character_maximum_length": -1}) == "varchar(MAX)"
    assert _rebuild_type_str({"data_type": "decimal", "numeric_precision": 15, "numeric_scale": 3}) == "decimal(15,3)"
    assert _rebuild_type_str({"data_type": "datetime2", "datetime_precision": 6}) == "datetime2(6)"


def test_sql_type_to_spark():
    assert _sql_type_to_spark("decimal(15,3)") == T.DecimalType(15, 3)
    assert _sql_type_to_spark("bit") == T.BooleanType()
    assert _sql_type_to_spark("uniqueidentifier") == T.StringType()
