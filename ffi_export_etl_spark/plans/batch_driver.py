"""End-to-end batch driver: directory of FFI export XMLs -> transformed
tables -> keyed parquet warehouse, with per-file failure isolation and an
idempotent processed-file ledger.

Reference entry point parity (/root/reference/xml_to_rdb.py:15-56):
  scandir *.xml            -> glob + ledger.pending()
  FFIFile(...).extract/transform -> FFIPipeline.run()
  .load(server) MERGE      -> parquet_upsert per table (or MergeLoader
                              against a real JDBC warehouse)
  move to processed/       -> ledger.mark(file) iff no table failed
  UpdateLog audit          -> audit_log_append

Each file is processed independently (the reference's unit of retry);
tables within a file load independently too, with failures collected
per table (xml_to_rdb.py:44-49, parser/xml.py:699-707).
"""

from __future__ import annotations

import glob as globmod
import os
import time

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..plans.ffi_pipeline import EXCLUDED_TABLES, FFIPipeline
from ..plans.fieldmap import LoadMaps
from ..sinks.files import ProcessedLedger, audit_log_append, parquet_upsert
from ..sources.xml import read_ffi_export

# Primary keys for warehouse tables (reference: reflected from the live
# DB, parser/server.py:12-38; here declared for the parquet warehouse).
DEFAULT_KEYS: dict[str, tuple[str, ...]] = {
    "MacroPlot": ("PlotID",),
    "SampleEvent": ("EventID",),
    "ProjectUnit": ("ProjectID",),
    "ProjectVisit": ("VisitID", "MM_SampleEvent_GUID"),
    "Transect": ("EventID", "Transect"),
}
FALLBACK_KEY_CANDIDATES = (
    "EventID",
    "AttributeData_DataRow_GUID",
    "SampleData_SampleRow_GUID",
)


def _keys_for(table: str, columns: list[str]) -> tuple[str, ...] | None:
    if table in DEFAULT_KEYS:
        return tuple(k for k in DEFAULT_KEYS[table] if k in columns) or None
    keys = [k for k in FALLBACK_KEY_CANDIDATES if k in columns]
    return tuple(keys) or None


def process_exports(
    spark: SparkSession,
    export_glob: str,
    warehouse_dir: str,
    maps: LoadMaps | None = None,
) -> dict[str, dict[str, int]]:
    """Process every pending export file; returns {file: {table: rows}}."""
    os.makedirs(warehouse_dir, exist_ok=True)
    ledger = ProcessedLedger(os.path.join(warehouse_dir, "_processed.jsonl"))
    results: dict[str, dict[str, int]] = {}
    files = sorted(globmod.glob(export_glob))
    for path in ledger.pending(files):
        try:
            tables = read_ffi_export(spark, path)
            pipe = FFIPipeline(spark, tables)
            pipe.run()
        except Exception:
            # file-level isolation: a malformed export must not abort the
            # batch (the reference's loop would crash here,
            # xml_to_rdb.py:39-49). Not marked in the ledger -> retried
            # on the next run once fixed.
            results[path] = {}
            continue
        loaded: dict[str, int] = {}
        failed: list[str] = []
        for name in list(pipe.tables):
            if name in EXCLUDED_TABLES:
                continue
            df = pipe.tables[name]
            target_name = (maps.target_for(name) if maps else None) or name
            if maps:
                df = maps.project(df, target_name)
            keys = _keys_for(name, df.columns)
            if keys is None:
                continue  # no stable key -> not a warehouse table
            try:
                loaded[target_name] = parquet_upsert(
                    spark,
                    df,
                    os.path.join(warehouse_dir, target_name),
                    list(keys),
                )
            except Exception:  # per-table isolation (xml.py:699-707)
                failed.append(target_name)
        audit_log_append(
            spark,
            [
                {
                    "User": os.environ.get("USER", "spark"),
                    "Time": str(int(time.time())),
                    "Table": t,
                    "ChangeType": "INSERT",
                    "Changes": n,
                }
                for t, n in loaded.items()
                if n
            ],
            os.path.join(warehouse_dir, "UpdateLog"),
        )
        ledger.mark(path, failed_tables=failed)
        results[path] = loaded
    return results


def process_exports_batched(
    spark: SparkSession,
    export_glob: str,
    warehouse_dir: str,
    maps: LoadMaps | None = None,
) -> dict[str, int]:
    """Batch-mode loading: transform every pending file, UNION each table
    across files, and upsert ONCE per table.

    The per-file mode above issues files x tables upserts (each upsert =
    read existing + anti-join + append); with thousands of small exports
    that write amplification dominates. Batch mode collapses it to one
    upsert per TABLE — the scale shape — at the cost of coarser failure
    isolation (a bad file is still skipped at transform time, but a
    failed table load fails the whole batch's ledger mark for that
    table's files). Returns {table: rows_inserted}.

    Dedup note: cross-file duplicate keys resolve by parquet_upsert's
    keep-first within the unioned frame, matching the replay semantics of
    sequential per-file loads in file order.
    """
    os.makedirs(warehouse_dir, exist_ok=True)
    ledger = ProcessedLedger(os.path.join(warehouse_dir, "_processed.jsonl"))
    files = sorted(globmod.glob(export_glob))
    pending = ledger.pending(files)
    merged: dict[str, list] = {}
    ok_files: list[str] = []
    for path in pending:
        try:
            tables = read_ffi_export(spark, path)
            pipe = FFIPipeline(spark, tables)
            pipe.run()
        except Exception:
            continue  # stays pending; retried next run
        seq = len(ok_files)
        ok_files.append(path)
        for name in list(pipe.tables):
            if name in EXCLUDED_TABLES:
                continue
            merged.setdefault(name, []).append(
                pipe.tables[name].withColumn("_file_seq", F.lit(seq))
            )
    loaded: dict[str, int] = {}
    failed: list[str] = []
    for name, frames in merged.items():
        df = frames[0]
        for other in frames[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        target_name = (maps.target_for(name) if maps else None) or name
        if maps:
            # project first (matching the sequential loop), threading the
            # file-sequence bookkeeping column through the whitelist
            df = maps.project(df, target_name, keep_cols=("_file_seq",))
        keys = _keys_for(name, [c for c in df.columns if c != "_file_seq"])
        if keys is None:
            continue
        # earliest file wins on cross-file duplicate keys — identical to
        # sequential per-file loads (later files' dup keys anti-join away)
        w = Window.partitionBy(*keys).orderBy("_file_seq")
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_file_seq")
        )
        try:
            loaded[target_name] = parquet_upsert(
                spark, df, os.path.join(warehouse_dir, target_name), list(keys)
            )
        except Exception:
            failed.append(target_name)
    audit_log_append(
        spark,
        [
            {
                "User": os.environ.get("USER", "spark"),
                "Time": str(int(time.time())),
                "Table": t,
                "ChangeType": "INSERT",
                "Changes": n,
            }
            for t, n in loaded.items()
            if n
        ],
        os.path.join(warehouse_dir, "UpdateLog"),
    )
    for path in ok_files:
        ledger.mark(path, failed_tables=failed)
    return loaded


def process_exports_glob(
    spark: SparkSession,
    export_glob: str,
    warehouse_dir: str,
    maps: LoadMaps | None = None,
) -> dict[str, int]:
    """Whole-glob loading: ALL pending exports are read as ONE XML parse
    (the reader's glob mode — one row per file) and transformed by ONE
    pipeline run, then upserted once per table.

    This is the true 100 TB shape: per-file driver overhead (method
    discovery, per-table jobs) is paid once per BATCH, not once per file,
    and the cluster sees one big distributed parse instead of thousands
    of small ones. Semantics: the union of files is treated as one
    export, so cross-file duplicate keys resolve by the PIPELINE's own
    deterministic rules (e.g. latest-DateIn plot wins) — the reference's
    rules applied globally rather than in file-arrival order. Failure
    isolation is batch-level; use process_exports for per-file isolation.
    Returns {table: rows_inserted}.
    """
    os.makedirs(warehouse_dir, exist_ok=True)
    ledger = ProcessedLedger(os.path.join(warehouse_dir, "_processed.jsonl"))
    files = sorted(globmod.glob(export_glob))
    pending = ledger.pending(files)
    if not pending:
        return {}
    tables = read_ffi_export(spark, pending)
    pipe = FFIPipeline(spark, tables)
    pipe.run()
    loaded: dict[str, int] = {}
    failed: list[str] = []
    for name in list(pipe.tables):
        if name in EXCLUDED_TABLES:
            continue
        df = pipe.tables[name]
        target_name = (maps.target_for(name) if maps else None) or name
        if maps:
            df = maps.project(df, target_name)
        keys = _keys_for(name, df.columns)
        if keys is None:
            continue
        try:
            loaded[target_name] = parquet_upsert(
                spark, df, os.path.join(warehouse_dir, target_name), list(keys)
            )
        except Exception:
            failed.append(target_name)
    audit_log_append(
        spark,
        [
            {
                "User": os.environ.get("USER", "spark"),
                "Time": str(int(time.time())),
                "Table": t,
                "ChangeType": "INSERT",
                "Changes": n,
            }
            for t, n in loaded.items()
            if n
        ],
        os.path.join(warehouse_dir, "UpdateLog"),
    )
    for path in pending:
        ledger.mark(path, failed_tables=failed)
    return loaded
