#!/usr/bin/env python
"""Structural probe of operators/pagerank.py (r12, judge item 4): run
the CC row's synthetic gate graph at sf0.1 through pagerank(10 iters)
and report StatusTracker job/stage/task counts, plus the FIRST loop
round's update-frame plan (captured by spying _ckpt_with_dang — the
real code path, not a reconstruction) to plans/r12/pagerank_round_<tag>.txt.

Usage: python plans/r12/pagerank_probe.py <tag>
Counts are deterministic (scheduler-structural), so a loaded host does
not bias them; wall time is reported for context only.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import ffi_export_etl_spark.operators.pagerank as pr  # noqa: E402
from ffi_export_etl_spark.sources.parquet import load_table  # noqa: E402
from ffi_export_etl_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    out_dir = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pagerank-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    edges = d.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 1) % n_docs).alias("dst"),
    ).unionAll(
        d.filter(F.col("doc_id") % 3 == 1).select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 13 + 3) % n_docs).alias("dst"),
        )
    )

    orig = pr._ckpt_with_dang
    calls = {"n": 0}

    def spy(df):
        calls["n"] += 1
        if calls["n"] == 2:  # call 1 = init frame; call 2 = round 1
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(out_dir, f"pagerank_round_{tag}.txt"), "w"
            ) as f:
                f.write(plan)
        return orig(df)

    pr._ckpt_with_dang = spy
    st = spark.sparkContext.statusTracker()
    # warm pass so JIT/footers don't ride the counted pass
    pr.pagerank(edges, iterations=2).count()
    j0 = max(st.getJobIdsForGroup() or [0])
    t0 = time.perf_counter()
    pr.pagerank(edges, iterations=10).count()
    wall = round(time.perf_counter() - t0, 3)
    j1 = max(st.getJobIdsForGroup() or [0])
    jobs = [st.getJobInfo(j) for j in range(j0 + 1, j1 + 1)]
    stage_ids = sorted({s for j in jobs if j for s in j.stageIds})
    infos = [st.getStageInfo(s) for s in stage_ids]
    tasks = sum(i.numTasks for i in infos if i)
    print(json.dumps({
        "tag": tag,
        "jobs": len(jobs),
        "stages": len(stage_ids),
        "tasks": tasks,
        "wall_10iter": wall,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
