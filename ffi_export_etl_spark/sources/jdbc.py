"""JDBC source surface: URL building, table/query scans, catalog
introspection (SURVEY.md section 2.1 S5/S6 and function F7).

Reference equivalents: ``create_url`` builds a SQLAlchemy URL from a
config dict (/root/reference/parser/functions.py:7-25); ``FFIDatabase``
reflects the live catalog once and memoizes PK/FK maps
(/root/reference/parser/server.py:12-38); scalar COUNT(*) reads gate the
merge audit (/root/reference/parser/xml.py:667-677).

Spark-first: scans go through ``spark.read.jdbc`` (predicate pushdown into
the remote DB; ``numPartitions``+bounds parallelize big table reads);
catalog facts come from information_schema queries pushed down as
subquery scans, collected once on the driver (same memoization shape as
the reference, with a working cache).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sinks.jdbc_merge import FK_QUERY, PK_QUERY, TableMeta


def jdbc_url(
    dialect: str,
    host: str,
    database: str,
    port: int | None = None,
    **params: str,
) -> str:
    """Build a JDBC URL (F7 parity; mssql + postgres like the reference)."""
    if dialect in ("mssql", "sqlserver"):
        port = port or 1433
        extra = "".join(f";{k}={v}" for k, v in params.items())
        return f"jdbc:sqlserver://{host}:{port};databaseName={database}{extra}"
    if dialect in ("postgres", "postgresql"):
        port = port or 5432
        extra = "&".join(f"{k}={v}" for k, v in params.items())
        q = f"?{extra}" if extra else ""
        return f"jdbc:postgresql://{host}:{port}/{database}{q}"
    raise ValueError(f"unsupported dialect: {dialect}")


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC table scan; pass partition bounds for parallel reads of big
    tables (one executor connection per partition)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def read_query(
    spark: SparkSession, url: str, sql: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """Pushed-down subquery scan (S5: e.g. scalar COUNT(*) audits)."""
    return read_table(spark, url, f"({sql}) q", properties)


class JdbcCatalog:
    """information_schema introspection -> {table: TableMeta}, memoized
    (the reference's FFIDatabase.get_primary_keys/get_foreign_keys with a
    cache that actually fires — quirk Q4)."""

    def __init__(self, spark: SparkSession, url: str,
                 properties: dict[str, str] | None = None):
        self.spark = spark
        self.url = url
        self.properties = properties or {}
        self._metas: dict[str, TableMeta] | None = None

    def metas(self) -> dict[str, TableMeta]:
        if self._metas is None:
            pk_rows = read_query(self.spark, self.url, PK_QUERY, self.properties) \
                .collect()
            fk_rows = read_query(self.spark, self.url, FK_QUERY, self.properties) \
                .collect()
            self._metas = build_metas(
                [(r[0], r[1], r[2]) for r in pk_rows],
                [(r[0], r[1], r[2], r[3]) for r in fk_rows],
            )
        return self._metas


def build_metas(
    pk_rows: list[tuple[str, str, int]],
    fk_rows: list[tuple[str, str, str, str]],
) -> dict[str, TableMeta]:
    """Assemble TableMeta from (table, pk_col, ordinal) and
    (table, col, ref_table, ref_col) rows — pure, unit-testable."""
    metas: dict[str, TableMeta] = {}
    for table, col, _ord in sorted(pk_rows, key=lambda r: (r[0], r[2])):
        metas.setdefault(table, TableMeta(table, [])).primary_key.append(col)
    for table, col, ref_table, ref_col in fk_rows:
        meta = metas.setdefault(table, TableMeta(table, []))
        meta.foreign_keys.setdefault(col, []).append((ref_table, ref_col))
    return metas
