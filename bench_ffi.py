"""FFI batch-loader bench: the reference's actual workload shape (a
directory of many small export XMLs -> 17 tables -> keyed upsert) timed
across the three loading modes of plans/batch_driver.py:

  per-file  sequential loop, files x tables upserts (the reference's own
            loop shape, /root/reference/xml_to_rdb.py:39-49)
  batched   transform per file, union per table, ONE upsert per table
  glob      ONE distributed XML parse of every file + one pipeline run +
            one upsert per table (the 100 TB shape)

Each mode gets a fresh warehouse and its own freshly generated export
files (disjoint keys per file via tests/ffi_fixture.uniquify_export_xml).
Prints one JSON line: {"files": N, "modes": {mode: {"seconds": s,
"rows": r, "rows_per_sec": rps}}}.

Usage: python bench_ffi.py [plan]
  plan = comma-separated mode:count entries, default
  "per_file:16,batched:16,glob:8,glob:16,glob:64"
  (SPARK_GRAFT_CPUS controls local[] parallelism like bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ffi_export_etl_spark.plans.batch_driver import (  # noqa: E402
    process_exports,
    process_exports_batched,
    process_exports_glob,
)
from ffi_export_etl_spark.session import get_spark, tune  # noqa: E402
from tests.ffi_fixture import write_export_xml  # noqa: E402

MODES = {
    "per_file": process_exports,
    "batched": process_exports_batched,
    "glob": process_exports_glob,
}

DEFAULT_PLAN = "per_file:16,batched:16,glob:8,glob:16,glob:64"


def _gen_files(root: str, n: int) -> str:
    d = os.path.join(root, "exports")
    os.makedirs(d)
    for i in range(n):
        write_export_xml(os.path.join(d, f"export_{i:04d}.xml"), uniq=f"f{i:04d}")
    return os.path.join(d, "*.xml")


def _total_rows(result) -> int:
    if not result:
        return 0
    first = next(iter(result.values()))
    if isinstance(first, dict):  # per-file mode: {file: {table: rows}}
        return sum(sum(t.values()) for t in result.values())
    return sum(result.values())  # batch modes: {table: rows}


def bench_ffi(spark, plan: str = DEFAULT_PLAN) -> list[dict]:
    out: list[dict] = []
    work = tempfile.mkdtemp(prefix="bench_ffi_")
    try:
        for entry in plan.split(","):
            mode, n_s = entry.strip().split(":")
            n_files = int(n_s)
            run_dir = os.path.join(work, f"{mode}_{n_files}")
            os.makedirs(run_dir)
            glob_pat = _gen_files(run_dir, n_files)
            warehouse = os.path.join(run_dir, "warehouse")
            t0 = time.monotonic()
            result = MODES[mode](spark, glob_pat, warehouse)
            secs = round(time.monotonic() - t0, 3)
            rows = _total_rows(result)
            out.append(
                {
                    "mode": mode,
                    "files": n_files,
                    "seconds": secs,
                    "rows": rows,
                    "files_per_sec": round(n_files / secs, 2) if secs else None,
                }
            )
            print(f"# ffi {mode} x{n_files}: {secs}s ({rows} rows)",
                  file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    plan = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_PLAN
    # get_spark: 8g driver heap (the local-mode driver IS the executor;
    # the default 1g OOMs on the 64-file matrix), UI off, AQE on
    spark = get_spark(app_name="bench_ffi")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    print(json.dumps({"ffi_batch": bench_ffi(spark, plan)}))


if __name__ == "__main__":
    main()
