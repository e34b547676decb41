"""File sinks + processed-file ledger.

- csv_dump: the reference's debug CSV escape hatch
  (/root/reference/parser/xml.py:758-765, S10) — one header CSV per table.
- parquet_upsert: insert-if-absent by key into a parquet "warehouse" dir —
  the same WHEN NOT MATCHED semantics as the MERGE sink, for lake targets
  without a database (left_anti + append; atomicity note in docstring).
- ProcessedLedger: idempotent processed-file tracking, replacing the
  reference's move-to-processed/ (xml_to_rdb.py:51-56, S11) with a record
  that works on object stores (no rename-as-commit assumption).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def csv_dump(tables: Mapping[str, DataFrame], out_dir: str) -> None:
    """Debug dump of every registry table to csv/{table}/ (header CSVs).
    coalesce(1) mirrors the reference's single-file layout — debug only,
    never the scale path."""
    for name, df in tables.items():
        df.coalesce(1).write.option("header", True).mode("overwrite").csv(
            os.path.join(out_dir, name)
        )


def parquet_upsert(
    spark: SparkSession,
    df: DataFrame,
    target_dir: str,
    key_cols: Sequence[str],
) -> int:
    """Append rows whose key is absent from the parquet target; returns the
    number appended.

    Equivalent to MERGE ... WHEN NOT MATCHED THEN INSERT: new = df
    left_anti existing ON key. The append itself is atomic per task file;
    concurrent upserts to one target need a table format with a commit
    protocol (Delta/Iceberg) — single-writer here, like the reference's
    one-process loader.
    """
    if os.path.isdir(target_dir) and any(
        f.endswith(".parquet") for f in os.listdir(target_dir)
    ):
        existing = spark.read.parquet(target_dir).select(*key_cols).distinct()
        new_rows = df.join(existing, list(key_cols), "left_anti")
    else:
        new_rows = df
    # dropDuplicates: source may carry internal dupes on the key; MERGE
    # targets reject those, we keep-first deterministically.
    new_rows = new_rows.dropDuplicates(list(key_cols))
    # persist across the count + write pair (r8): the upstream plan can
    # be a whole pipeline chain (the FFI 6-way EAV join), and running
    # it TWICE — once for the count, once for the write — was the
    # larger half of the batch loader's fixed floor. The cached set is
    # the delta being appended (batch-sized, not warehouse-sized).
    new_rows.persist()
    try:
        count = new_rows.count()
        if count:
            new_rows.write.mode("append").parquet(target_dir)
    finally:
        new_rows.unpersist()
    return count


class ProcessedLedger:
    """JSONL ledger of fully-loaded source files (S11).

    The reference moves files to processed/ only when every table loaded
    (insert_failed empty); here the same gate writes a ledger record, so
    reruns skip completed files without moving anything (object-store
    friendly, and the audit trail survives)."""

    def __init__(self, path: str):
        self.path = path

    def processed(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path) as f:
            return {json.loads(line)["file"] for line in f if line.strip()}

    def mark(self, file: str, *, failed_tables: Sequence[str] = ()) -> bool:
        """Record ``file`` as processed iff no tables failed (the
        reference's gate); returns True when recorded."""
        if failed_tables:
            return False
        rec = {"file": file, "ts": int(time.time())}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return True

    def pending(self, files: Sequence[str]) -> list[str]:
        done = self.processed()
        return [f for f in files if f not in done]


def audit_log_append(
    spark: SparkSession, rows: list[dict], target_dir: str
) -> None:
    """Append-only UpdateLog (S8, xml.py:681-695) as parquet."""
    if not rows:
        return
    df = spark.createDataFrame(rows)
    df.write.mode("append").parquet(target_dir)
