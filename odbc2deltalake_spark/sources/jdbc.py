"""JDBC source — SQL Server / Postgres / generic JDBC ingestion.

Spark-native equivalent of the reference's ODBC/ADBC/Spark-connector
readers (reference:odbc2deltalake/reader/spark_reader.py:238-282 builds the
same ``spark.read.format("sqlserver"|"postgres"|"jdbc")`` reads; the
arrow-odbc path reader/odbc_reader.py:247-304 is subsumed — executors pull
partitioned JDBC splits instead of one driver-side arrow stream).

Pushdown model: every source-side operation is a ``query`` option string,
so predicates, key-set joins, and scalar aggregates run on the RDBMS —
exactly the property the reference's generated SQL had. Introspection uses
the same INFORMATION_SCHEMA joins (reference:odbc2deltalake/metadata.py:16-127).

No database is reachable in this environment, so this module is exercised
for SQL construction only (tests/test_sources.py); the read methods work
unchanged wherever the JDBC driver jar is on the classpath.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from odbc2deltalake_spark.metadata import ColInfo, resolve_type
from odbc2deltalake_spark.sources.base import Source

from pyspark.sql import types as T


def _q_tsql(name: str) -> str:
    return "[" + name.replace("]", "]]") + "]"


def _q_pg(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def sql_quote_value(v: Any) -> str:
    """Literal quoting (reference:odbc2deltalake/query.py:42-55)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


class JDBCSource(Source):
    """A (schema, table) or query over a JDBC connection.

    ``dialect`` is "tsql" or "postgres" — the only two dialect-sensitive
    surfaces are identifier quoting and the hidden-column expressions
    (``rowversion`` → bigint on tsql, ``xmin`` xid → bigint on postgres;
    reference:odbc2deltalake/write_init.py:144-255, load_infos.py:45-51).
    """

    def __init__(
        self,
        url: str,
        table: Optional[tuple[str, str]] = None,
        query: Optional[str] = None,
        dialect: str = "tsql",
        options: Optional[dict[str, str]] = None,
        primary_keys: Optional[list[str]] = None,
        partition_column: Optional[str] = None,
        num_partitions: int = 16,
    ):
        assert (table is None) != (query is None), "exactly one of table/query"
        self.url = url
        self.table = table
        self.query = query
        self.dialect = dialect
        self.options = options or {}
        self._pks = primary_keys or []
        self._col_cache: Optional[list[ColInfo]] = None
        # parallel extraction: numeric/ts column to range-split the read on
        # (executors each pull one split — the scale path for big source
        # tables; a single-stream read is the reference's ODBC behavior)
        self.partition_column = partition_column
        self.num_partitions = num_partitions

    # ---------------------------------------------------------- SQL gen --

    def _q(self, name: str) -> str:
        return _q_tsql(name) if self.dialect == "tsql" else _q_pg(name)

    def from_clause(self) -> str:
        if self.query is not None:
            # wrap user query as aliased subquery
            # (reference:odbc2deltalake/write_init.py:138-141)
            return f"({self.query}) t"
        schema, table = self.table  # type: ignore[misc]
        return f"{self._q(schema)}.{self._q(table)} t"

    def select_sql(
        self,
        columns: Optional[list[str]] = None,
        where: Optional[str] = None,
    ) -> str:
        cols = (
            ", ".join(f"t.{self._q(c)}" for c in columns) if columns else "t.*"
        )
        sql = f"SELECT {cols} FROM {self.from_clause()}"
        if where:
            sql += f" WHERE {where}"
        return sql

    def delta_criterion_sql(self, column: str, value: Any) -> str:
        """``converted(delta_col) > literal`` pushed to the server
        (reference:odbc2deltalake/db_to_delta.py:584-610). tsql rowversion
        compares as binary against its bigint watermark via CAST; postgres
        xmin needs the xid→text→bigint double cast
        (reference:odbc2deltalake/db_to_delta.py:73-77)."""
        info = next(
            (c for c in (self._col_cache or []) if c.column_name == column), None
        )
        expr = f"t.{self._q(column)}"
        ts = (info.data_type_str if info else "").split("(")[0].lower()
        if self.dialect == "tsql" and ts in ("rowversion", "timestamp"):
            expr = f"CAST(t.{self._q(column)} AS BIGINT)"
        if self.dialect == "postgres" and ts == "xid":
            expr = f"CAST(CAST(t.{self._q(column)} AS TEXT) AS BIGINT)"
        return f"{expr} > {sql_quote_value(value)}"

    def keyset_join_sql(self, keys: list[dict[str, Any]], key_cols: list[str]) -> str:
        """VALUES-derived-table semi join for an explicit key list — the
        pushdown alternative to a broadcast join, equivalent to the
        reference's OPENJSON/JSON_TABLE join
        (reference:odbc2deltalake/db_to_delta.py:907-992)."""
        rows = ", ".join(
            "(" + ", ".join(sql_quote_value(k[c]) for c in key_cols) + ")"
            for k in keys
        )
        klist = ", ".join(self._q(c) for c in key_cols)
        cond = " AND ".join(f"t.{self._q(c)} = k.{self._q(c)}" for c in key_cols)
        return (
            f"SELECT t.* FROM {self.from_clause()} "
            f"INNER JOIN (VALUES {rows}) AS k ({klist}) ON {cond}"
        )

    def information_schema_sql(self) -> str:
        """Column introspection (reference:odbc2deltalake/metadata.py:74-127):
        INFORMATION_SCHEMA.COLUMNS, left-joined to sys.columns on tsql for
        identity / generated-always flags (WITH(NOLOCK) hints as in the
        reference)."""
        schema, table = self.table  # type: ignore[misc]
        if self.dialect == "tsql":
            return f"""
SELECT c.COLUMN_NAME, c.DATA_TYPE, c.CHARACTER_MAXIMUM_LENGTH,
       c.NUMERIC_PRECISION, c.NUMERIC_SCALE, c.DATETIME_PRECISION,
       c.IS_NULLABLE, c.COLUMN_DEFAULT,
       sc.is_identity, sc.generated_always_type_desc
FROM INFORMATION_SCHEMA.COLUMNS c WITH(NOLOCK)
LEFT JOIN sys.columns sc WITH(NOLOCK)
  ON sc.object_id = OBJECT_ID({sql_quote_value(schema + "." + table)})
 AND sc.name = c.COLUMN_NAME
WHERE c.TABLE_SCHEMA = {sql_quote_value(schema)}
  AND c.TABLE_NAME = {sql_quote_value(table)}
ORDER BY c.ORDINAL_POSITION"""
        return f"""
SELECT c.column_name, c.data_type, c.character_maximum_length,
       c.numeric_precision, c.numeric_scale, c.datetime_precision,
       c.is_nullable, c.column_default,
       CASE WHEN c.is_identity = 'YES' THEN 1 ELSE 0 END AS is_identity,
       NULL AS generated_always_type_desc
FROM information_schema.columns c
WHERE c.table_schema = {sql_quote_value(schema)}
  AND c.table_name = {sql_quote_value(table)}
ORDER BY c.ordinal_position"""

    def primary_keys_sql(self) -> str:
        """PK introspection: TABLE_CONSTRAINTS ⨝ CONSTRAINT_COLUMN_USAGE
        (reference:odbc2deltalake/metadata.py:16-45)."""
        schema, table = self.table  # type: ignore[misc]
        return f"""
SELECT ccu.COLUMN_NAME
FROM INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc
JOIN INFORMATION_SCHEMA.CONSTRAINT_COLUMN_USAGE ccu
  ON tc.CONSTRAINT_NAME = ccu.CONSTRAINT_NAME
 AND tc.TABLE_SCHEMA = ccu.TABLE_SCHEMA
WHERE tc.CONSTRAINT_TYPE = 'PRIMARY KEY'
  AND tc.TABLE_SCHEMA = {sql_quote_value(schema)}
  AND tc.TABLE_NAME = {sql_quote_value(table)}"""

    # -------------------------------------------------------------- reads --

    def _jdbc(
        self, spark: SparkSession, sql: str, partitioned: bool = False
    ) -> DataFrame:
        reader = spark.read.format("jdbc").option("url", self.url)
        if partitioned and self.partition_column is not None:
            # range-partitioned parallel read: `query` and partition options
            # are mutually exclusive in the JDBC source, so wrap the SQL as
            # a dbtable subquery and probe the column bounds server-side
            bounds = (
                spark.read.format("jdbc")
                .option("url", self.url)
                .option(
                    "query",
                    f"SELECT MIN(pc) AS lo, MAX(pc) AS hi FROM ("
                    f"SELECT {self._q(self.partition_column)} AS pc FROM ({sql}) q) b",
                )
                .load()
                .first()
            )
            if bounds and bounds["lo"] is not None and bounds["lo"] != bounds["hi"]:
                reader = (
                    reader.option("dbtable", f"({sql}) spark_split")
                    .option("partitionColumn", self.partition_column)
                    .option("lowerBound", str(bounds["lo"]))
                    .option("upperBound", str(bounds["hi"]))
                    .option("numPartitions", str(self.num_partitions))
                )
            else:
                reader = reader.option("query", sql)
        else:
            reader = reader.option("query", sql)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load()

    def col_infos(self, spark: SparkSession) -> list[ColInfo]:
        if self._col_cache is not None:
            return self._col_cache
        if self.table is not None:
            rows = self._jdbc(spark, self.information_schema_sql()).collect()
            infos = []
            for r in rows:
                d = {k.lower(): v for k, v in r.asDict().items()}
                ts = _rebuild_type_str(d)
                dtype = resolve_type(ts) or _sql_type_to_spark(ts)
                infos.append(
                    ColInfo(
                        column_name=d["column_name"],
                        data_type=dtype,
                        data_type_str=ts,
                        is_nullable=str(d.get("is_nullable", "YES")).upper() != "NO",
                        column_default=d.get("column_default"),
                        is_identity=bool(d.get("is_identity")),
                        generated_always_type_desc=d.get("generated_always_type_desc"),
                    )
                )
            self._col_cache = infos
            return infos
        # query source: LIMIT-0 schema probe
        # (reference:odbc2deltalake/metadata.py:155-199, spark_reader.py:198-212)
        probe = f"SELECT * FROM ({self.query}) t WHERE 1=0"
        schema = self._jdbc(spark, probe).schema
        self._col_cache = [
            ColInfo(f.name, f.dataType, f.dataType.simpleString(), f.nullable)
            for f in schema.fields
        ]
        return self._col_cache

    def primary_keys(self, spark: SparkSession) -> list[str]:
        if self._pks:
            return list(self._pks)
        if self.table is None:
            return []
        return [r[0] for r in self._jdbc(spark, self.primary_keys_sql()).collect()]

    def read(self, spark: SparkSession) -> DataFrame:
        return self._jdbc(spark, self.select_sql(), partitioned=True)

    def read_where_gt(self, spark: SparkSession, column: str, value: Any) -> DataFrame:
        self.col_infos(spark)
        return self._jdbc(
            spark,
            self.select_sql(where=self.delta_criterion_sql(column, value)),
            partitioned=True,
        )

    def read_keys(self, spark: SparkSession, columns: list[str]) -> DataFrame:
        return self._jdbc(spark, self.select_sql(columns=columns))

    def max_and_count(self, spark: SparkSession, delta_col):
        expr = f"MAX(t.{self._q(delta_col)})" if delta_col else "NULL"
        row = self._jdbc(
            spark,
            f"SELECT {expr} AS max_ts, COUNT(*) AS cnt FROM {self.from_clause()}",
        ).first()
        return row["max_ts"], row["cnt"]


def _rebuild_type_str(d: dict) -> str:
    """Reconstruct precision/length type strings like varchar(MAX),
    decimal(p,s), datetime2(p) (reference:odbc2deltalake/metadata.py:129-152)."""
    base = str(d.get("data_type", "")).lower()
    cml = d.get("character_maximum_length")
    if base in ("varchar", "nvarchar", "char", "nchar", "varbinary", "binary"):
        if cml in (-1, None):
            return f"{base}(MAX)" if cml == -1 else base
        return f"{base}({cml})"
    if base in ("decimal", "numeric"):
        p, s = d.get("numeric_precision"), d.get("numeric_scale")
        if p is not None:
            return f"{base}({p},{s or 0})"
    if base in ("datetime2", "time", "datetimeoffset"):
        p = d.get("datetime_precision")
        if p is not None:
            return f"{base}({p})"
    return base


def _sql_type_to_spark(type_str: str) -> T.DataType:
    """SQL type string → Spark type (the arrow→sqlglot table of
    reference:odbc2deltalake/read_utils/delta_rs.py:22-57, inverted for
    Spark types)."""
    base = type_str.split("(")[0].strip().lower()
    m: dict[str, T.DataType] = {
        "bigint": T.LongType(),
        "int": T.IntegerType(),
        "integer": T.IntegerType(),
        "smallint": T.ShortType(),
        "tinyint": T.ShortType(),
        "bit": T.BooleanType(),
        "boolean": T.BooleanType(),
        "float": T.DoubleType(),
        "double": T.DoubleType(),
        "double precision": T.DoubleType(),
        "real": T.FloatType(),
        "date": T.DateType(),
        "datetime": T.TimestampType(),
        "datetime2": T.TimestampType(),
        "smalldatetime": T.TimestampType(),
        "timestamp without time zone": T.TimestampNTZType(),
        "timestamp with time zone": T.TimestampType(),
        "binary": T.BinaryType(),
        "varbinary": T.BinaryType(),
        "bytea": T.BinaryType(),
        "uniqueidentifier": T.StringType(),
        "uuid": T.StringType(),
        "xml": T.StringType(),
        "text": T.StringType(),
    }
    if base in ("decimal", "numeric") and "(" in type_str:
        inner = type_str.split("(")[1].rstrip(")").split(",")
        return T.DecimalType(int(inner[0]), int(inner[1]) if len(inner) > 1 else 0)
    return m.get(base, T.StringType())
