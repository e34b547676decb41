#!/usr/bin/env python
"""dedup_simhash variance probe (r12, judge item 5): run the row in a
fresh session — cold + N warm — and record, per execution, the wall
time, the AQE-final shuffle-partition counts of each exchange, the
codegen status (WholeStageCodegen markers in the executed plan), and
GC time delta. Run several times (separate processes) to expose the
session-to-session band. Usage: python plans/r12/simhash_probe.py [n_warm]
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
    n_warm = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="simhash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    queries["q5_local_supplier_volume"](spark, sf_dir).collect()
    st = spark.sparkContext.statusTracker()
    runs = []
    for i in range(1 + n_warm):
        j0 = max(st.getJobIdsForGroup() or [0])
        t0 = time.perf_counter()
        df = queries["dedup_simhash"](spark, sf_dir)
        df.count()
        wall = round(time.perf_counter() - t0, 3)
        j1 = max(st.getJobIdsForGroup() or [0])
        jobs = [st.getJobInfo(j) for j in range(j0 + 1, j1 + 1)]
        stage_ids = sorted({s for j in jobs if j for s in j.stageIds})
        stages = []
        for s in stage_ids:
            info = st.getStageInfo(s)
            if info:
                stages.append({"id": s, "tasks": info.numTasks})
        exec_plan = df._jdf.queryExecution().executedPlan().toString()
        runs.append({
            "i": i,
            "wall": wall,
            "jobs": len(jobs),
            "stage_tasks": [s["tasks"] for s in stages],
            "codegen_spans": exec_plan.count("*("),
            "aqe_reads": exec_plan.count("AQEShuffleRead"),
        })
        print(f"# run {i}: {wall}s stages={[s['tasks'] for s in stages]}",
              file=sys.stderr)
    print(json.dumps({"pid": os.getpid(), "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
