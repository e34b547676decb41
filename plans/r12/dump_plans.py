#!/usr/bin/env python
"""Dump .explain("formatted") for every registered query to
plans/r12/<name>_<tag>.txt  (tag = argv[1], default "before").

Optionally restrict to a comma-separated name list in argv[2].
Run from /root/repo:  python plans/r12/dump_plans.py before
Uses $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) so the captured
plans match the bench's scans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from ffi_export_etl_spark.queries import all_queries  # noqa: E402
from ffi_export_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    out_dir = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"plan-dump: {name}")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # record the failure, keep dumping
            plan = f"ERROR building/explaining {name}: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"# {name}: {len(plan)} chars", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
