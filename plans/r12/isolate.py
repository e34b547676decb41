#!/usr/bin/env python
"""Isolated re-timing harness (the r10 adjudication protocol): fresh
session, dedup_simhash first as the host-speed calibration row, then
each named query: 1 cold + N warm samples, printed as one JSON line.

Usage: python plans/r12/isolate.py q1,q2,... [n_warm]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from ffi_export_etl_spark.queries import all_queries  # noqa: E402
from ffi_export_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else ["dedup_simhash"]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="isolate")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # session warmup (bench protocol)
    queries["q5_local_supplier_volume"](spark, sf_dir).collect()
    out = {}
    for name in ["dedup_simhash"] + [n for n in names if n != "dedup_simhash"]:
        spark.sparkContext.setJobDescription(f"isolate: {name}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        cold = round(time.perf_counter() - t0, 3)
        samples = []
        for _ in range(n_warm):
            t1 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t1, 3))
        med = sorted(samples)[len(samples) // 2] if samples else None
        out[name] = {"cold": cold, "warm_med": med, "samples": samples}
        print(f"# {name}: cold {cold} warm {samples}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
