"""Integration test for the concrete JDBC executor adapters: MergeLoader
driven end-to-end against a REAL database (sqlite3 over DBAPI — the
postgres-dialect INSERT ... ON CONFLICT DO NOTHING runs verbatim on
sqlite >= 3.24), exercising staging writes, explicit transactions,
FK-ordered loads, count-delta audits, idempotent re-runs, and per-table
failure isolation with rollback (reference parser/xml.py:663-707)."""

from __future__ import annotations

import sqlite3

import pytest

from ffi_export_etl_spark.sinks.jdbc_exec import (
    DbApiExecutor,
    dbapi_staging_writer,
    sqlite_merge_loader,
)
from ffi_export_etl_spark.sinks.jdbc_merge import TableMeta

METAS = {
    "plots": TableMeta("plots", ["plot_id"]),
    "events": TableMeta(
        "events", ["event_id"], {"plot_id": [("plots", "plot_id")]}
    ),
}


@pytest.fixture()
def conn():
    # autocommit mode (isolation_level=None): MergeLoader drives BEGIN /
    # COMMIT / ROLLBACK itself, like the reference's engine.begin()
    c = sqlite3.connect(":memory:", isolation_level=None)
    c.execute("CREATE TABLE plots (plot_id TEXT PRIMARY KEY, name TEXT)")
    c.execute(
        "CREATE TABLE events (event_id TEXT PRIMARY KEY, plot_id TEXT "
        "REFERENCES plots(plot_id), note TEXT)"
    )
    yield c
    c.close()


def test_dbapi_executor_scalar(conn):
    ex = DbApiExecutor(conn)
    ex.execute("INSERT INTO plots VALUES ('p1', 'one')")
    assert ex.scalar("SELECT COUNT(*) FROM plots") == 1


def test_merge_loader_against_live_db(spark, conn):
    plots = spark.createDataFrame(
        [("p1", "one"), ("p2", "two")], ["plot_id", "name"]
    )
    events = spark.createDataFrame(
        [("e1", "p1", "first"), ("e2", "p2", "second")],
        ["event_id", "plot_id", "note"],
    )
    cols = {"plots": plots.columns, "events": events.columns}
    frames = {"events": events, "plots": plots}

    loader = sqlite_merge_loader(METAS, conn)
    results = loader.load(frames, cols)

    # FK order: plots (referenced) before events
    assert [r.table for r in results] == ["plots", "events"]
    assert [(r.before, r.after) for r in results] == [(0, 2), (0, 2)]
    assert {r["Table"]: r["Changes"] for r in loader.audit_rows("u", "t")} \
        == {"plots": 2, "events": 2}

    # idempotent replay + one genuinely new row -> delta exactly 1
    plots2 = spark.createDataFrame(
        [("p1", "changed"), ("p3", "three")], ["plot_id", "name"]
    )
    loader2 = sqlite_merge_loader(METAS, conn)
    loader2.load({"plots": plots2}, {"plots": plots2.columns})
    assert [(r.before, r.after) for r in loader2.results] == [(2, 3)]
    ex = DbApiExecutor(conn)
    # WHEN NOT MATCHED semantics: existing p1 row untouched
    assert ex.scalar(
        "SELECT COUNT(*) FROM plots WHERE plot_id='p1' AND name='one'"
    ) == 1


def test_merge_loader_rolls_back_failed_table_only(spark, conn):
    plots = spark.createDataFrame([("p1", "one")], ["plot_id", "name"])
    ghosts = spark.createDataFrame([("g1",)], ["ghost_id"])
    metas = dict(METAS)
    metas["ghosts"] = TableMeta("ghosts", ["ghost_id"])  # no such table
    loader = sqlite_merge_loader(metas, conn)
    results = loader.load(
        {"ghosts": ghosts, "plots": plots},
        {"ghosts": ghosts.columns, "plots": plots.columns},
    )
    by_table = {r.table: r for r in results}
    assert by_table["ghosts"].failed and loader.insert_failed == ["ghosts"]
    # the healthy table still loaded despite the earlier failure
    assert (by_table["plots"].before, by_table["plots"].after) == (0, 1)


def test_dbapi_staging_writer_roundtrip(spark, conn):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["k", "v"])
    dbapi_staging_writer(conn)("staging_x", df)
    ex = DbApiExecutor(conn)
    assert ex.scalar("SELECT COUNT(*) FROM staging_x") == 2
    assert ex.scalar("SELECT COUNT(*) FROM staging_x WHERE v IS NULL") == 1


def test_dbapi_placeholder_follows_paramstyle():
    import sqlite3

    from ffi_export_etl_spark.sinks.jdbc_exec import _dbapi_placeholder

    con = sqlite3.connect(":memory:")
    try:
        assert _dbapi_placeholder(con, None) == "?"  # sqlite3 is qmark
        assert _dbapi_placeholder(con, "%s") == "%s"  # explicit wins

        class FakeConn:  # module without paramstyle -> safe default
            pass

        FakeConn.__module__ = "collections"
        assert _dbapi_placeholder(FakeConn(), None) == "?"
    finally:
        con.close()


def test_spark_staging_writer_executes_when_jar_present(spark, tmp_path):
    """The scale-path staging writer (df.write.jdbc from executors) runs
    end-to-end whenever a JDBC driver jar is on the Spark classpath
    (session.find_jdbc_jar discovers DuckDB/SQLite JDBC jars and
    get_spark adds them via spark.jars); in a jarless sandbox this skips
    WITH REASON instead of silently passing. COVERAGE.md section 2.1 S7
    documents the limitation."""
    import pytest

    from ffi_export_etl_spark.sinks.jdbc_exec import spark_staging_writer

    candidates = [
        ("org.sqlite.JDBC", f"jdbc:sqlite:{tmp_path / 'staging.db'}"),
        ("org.duckdb.DuckDBDriver", f"jdbc:duckdb:{tmp_path / 'staging.duckdb'}"),
    ]
    loader = spark._jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader()
    found = None
    for cls, url in candidates:
        try:
            spark._jvm.java.lang.Class.forName(cls, False, loader)
            found = (cls, url)
            break
        except Exception:
            continue
    if found is None:
        pytest.skip(
            "no JDBC driver jar on the Spark classpath (sandbox); "
            "spark_staging_writer is executed when one is present"
        )
    cls, url = found
    props = {"driver": cls}
    if cls == "org.duckdb.DuckDBDriver":
        # Spark ships no DuckDB dialect, so its tableExists probe cannot
        # classify DuckDB's "table does not exist" SQLException and
        # rethrows it. Pre-create the staging table (overwrite mode then
        # drops and recreates it through the normal path) — a
        # DuckDB-classification gap, not a writer limitation; real
        # deployments (postgres/sqlserver dialects) classify fine.
        jvm = spark._jvm
        drv = jvm.java.lang.Class.forName(cls, True, loader).newInstance()
        conn = drv.connect(url, jvm.java.util.Properties())
        try:
            st = conn.createStatement()
            st.execute("CREATE TABLE IF NOT EXISTS staging_t (id INTEGER, v TEXT)")
            st.close()
        finally:
            conn.close()
    # single partition: one writer connection (DuckDB is same-process
    # multi-connection but the 2-row fixture gains nothing from fan-in)
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id: int, v: string"
    ).coalesce(1)
    spark_staging_writer(url, props)("staging_t", df)
    back = spark.read.jdbc(url, "staging_t", properties=props)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}
