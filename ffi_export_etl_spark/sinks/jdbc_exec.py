"""Concrete executors wiring MergeLoader to a real database.

The reference executes its MERGE directly on a SQLAlchemy engine
(/root/reference/parser/xml.py:663-707: engine.begin() transaction,
statement execute, COUNT(*) audits, rollback on failure). MergeLoader
abstracts those three touchpoints behind callables; this module provides
the production implementations:

- ``DbApiExecutor``: execute/scalar over any DBAPI connection
  (pyodbc, psycopg2, sqlite3, ...). The connection must be in autocommit
  mode (e.g. ``sqlite3.connect(..., isolation_level=None)``,
  ``psycopg2 conn.autocommit = True``) because MergeLoader drives
  transactions explicitly with BEGIN/COMMIT/ROLLBACK statements, exactly
  like the reference's engine.begin() blocks.
- ``spark_staging_writer``: the scale path for staging rows —
  ``df.write.jdbc(mode="overwrite")`` appends in parallel from executors
  (batched, parameterized; ``numPartitions`` on the frame controls
  target-DB fan-in). Requires the target's JDBC driver jar on the Spark
  classpath.
- ``dbapi_staging_writer``: driver-side fallback for environments with
  no JDBC driver jar (integration tests, tiny dimension loads): collects
  the frame and executemany-inserts it over the same DBAPI connection.
  NOT for big tables — it funnels rows through the driver.

``sqlite_merge_loader`` assembles the pieces against sqlite3 for the
integration test (sqlite >= 3.24 supports INSERT ... ON CONFLICT DO
NOTHING, the postgres-dialect statement MergeLoader emits).
"""

from __future__ import annotations

from collections.abc import Mapping

from .jdbc_merge import MergeLoader, TableMeta


class DbApiExecutor:
    """execute/scalar over a DBAPI connection (autocommit mode)."""

    def __init__(self, connection):
        self.connection = connection

    def execute(self, sql: str) -> None:
        cur = self.connection.cursor()
        try:
            cur.execute(sql)
        finally:
            cur.close()

    def scalar(self, sql: str) -> int:
        cur = self.connection.cursor()
        try:
            cur.execute(sql)
            row = cur.fetchone()
            return int(row[0]) if row and row[0] is not None else 0
        finally:
            cur.close()


def spark_staging_writer(url: str, properties: Mapping[str, str],
                         mode: str = "overwrite"):
    """Parallel JDBC staging writer: executors stream partitions straight
    into the staging table (no driver funnel). ``mode='overwrite'``
    recreates the staging table per load, mirroring the reference's
    fresh-VALUES-per-export behavior."""

    def write(staging: str, df) -> None:
        df.write.jdbc(url=url, table=staging, mode=mode,
                      properties=dict(properties))

    return write


def _dbapi_placeholder(connection, placeholder: str | None) -> str:
    """Positional placeholder for the connection's DBAPI paramstyle:
    qmark (sqlite3/pyodbc) -> '?', format/pyformat (psycopg2, MySQLdb)
    -> '%s'. Explicit ``placeholder`` wins; otherwise the connection's
    defining module advertises ``paramstyle`` (PEP 249)."""
    if placeholder is not None:
        return placeholder
    mod = type(connection).__module__.split(".")[0]
    style = getattr(__import__(mod), "paramstyle", "qmark") if mod else "qmark"
    return {"qmark": "?", "format": "%s", "pyformat": "%s",
            "numeric": "?"}.get(style, "?")


def dbapi_staging_writer(connection, placeholder: str | None = None):
    """Driver-side staging writer (no JDBC jar needed): DROP/CREATE the
    staging table typelessly and executemany the collected rows. Test and
    tiny-dimension path only — rows pass through the driver. The
    parameter placeholder follows the connection module's PEP 249
    paramstyle (qmark and format/pyformat both supported); pass
    ``placeholder`` explicitly for exotic drivers."""
    ph = _dbapi_placeholder(connection, placeholder)

    def write(staging: str, df) -> None:
        rows = df.collect()
        cols = df.columns
        cur = connection.cursor()
        try:
            cur.execute(f"DROP TABLE IF EXISTS {staging}")
            cur.execute(f"CREATE TABLE {staging} ({', '.join(cols)})")
            placeholders = ", ".join(ph for _ in cols)
            cur.executemany(
                f"INSERT INTO {staging} VALUES ({placeholders})",
                [tuple(r[c] for c in cols) for r in rows],
            )
        finally:
            cur.close()

    return write


def sqlite_merge_loader(
    metas: Mapping[str, TableMeta], connection
) -> MergeLoader:
    """MergeLoader against a sqlite3 connection (integration tests; the
    postgres-dialect ON CONFLICT DO NOTHING runs verbatim on sqlite)."""
    ex = DbApiExecutor(connection)
    return MergeLoader(
        metas,
        execute=ex.execute,
        scalar=ex.scalar,
        write_staging=dbapi_staging_writer(connection),
        dialect="postgres",
    )


def jdbc_merge_loader(
    metas: Mapping[str, TableMeta],
    connection,
    url: str,
    properties: Mapping[str, str],
    dialect: str = "tsql",
) -> MergeLoader:
    """Production assembly: parallel Spark JDBC staging writes + DBAPI
    transaction control, FK-ordered MERGE per table with count-delta
    audits (reference parser/xml.py:663-707 semantics)."""
    ex = DbApiExecutor(connection)
    return MergeLoader(
        metas,
        execute=ex.execute,
        scalar=ex.scalar,
        write_staging=spark_staging_writer(url, properties),
        dialect=dialect,
    )
