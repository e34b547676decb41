#!/usr/bin/env python
"""Compute-bound scaling probe (r12, judge item 6).

At sf0.1 every headline row finishes in 0.14-3.4s and is
scheduler/JVM-overhead-bound, so the driver's 8-vs-32-core grid cannot
distinguish serial from parallel (all r11 ratios ~1). This probe makes
the three heaviest dedup operators COMPUTE-bound by scaling the sf0.1
documents corpus x``SPARK_GRAFT_SCALE_X`` (default 10, ~50k docs)
deterministically — each doc replicated with doc_id' = doc_id *
X + k and a per-replica suffix token appended to the text (replicas
stay near-duplicates, so candidate structure scales too) — and times
simhash / jaccard-prefix / minhash-LSH near-dup pair generation
through the noop sink (guide §1.4: compute, not sink).

Usage:  SPARK_GRAFT_CPUS=32 python plans/r12/scaling_probe.py
        SPARK_GRAFT_CPUS=8  python plans/r12/scaling_probe.py
One JSON line per run: {"cpus": N, "scale_x": X, "rows": R,
"ops": {name: {"cold": s, "warm": [..]}}}. Compare the two runs'
warm medians for the 8-vs-32 ratio. The scaled corpus is built
in-session from the sf0.1 parquet (no artifacts on disk); a run takes
a few minutes. NOT part of the bench contract — a standalone,
env-gated evidence script.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from pyspark.sql import functions as F  # noqa: E402

from ffi_export_etl_spark.session import get_spark  # noqa: E402
from ffi_export_etl_spark.sources.parquet import load_table  # noqa: E402
from ffi_export_etl_spark.queries.dedup_q import (  # noqa: E402
    BANDS,
    JACCARD_PCT,
    NUM_PERM,
)
from ffi_export_etl_spark.operators.shingles import jaccard_pairs  # noqa: E402
from ffi_export_etl_spark.operators.minhash import (  # noqa: E402
    minhash_near_duplicates,
)
from ffi_export_etl_spark.operators.simhash import (  # noqa: E402
    simhash_near_duplicates,
)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale_x = int(os.environ.get("SPARK_GRAFT_SCALE_X", "10"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"scaling-probe-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents")
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(scale_x - 1))
    ).alias("_k")
    big = (
        d.select("doc_id", "text", reps)
        .select(
            (F.col("doc_id") * scale_x + F.col("_k")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" zrep"), F.col("_k").cast("string")
            ).alias("text"),
        )
        .localCheckpoint()  # materialize ONCE so every op times its own
        #                     compute, not the corpus synthesis
    )
    rows = big.count()

    ops = {
        "dedup_simhash": lambda: simhash_near_duplicates(
            big, "doc_id", "text", max_hamming=3
        ),
        "dedup_jaccard_pairs": lambda: jaccard_pairs(
            big, "doc_id", "text", n=3, threshold_pct=JACCARD_PCT
        ),
        "dedup_minhash_lsh": lambda: minhash_near_duplicates(
            big, "doc_id", "text", n=3, num_perm=NUM_PERM, bands=BANDS,
            threshold_pct=JACCARD_PCT,
        ),
    }
    out: dict = {"cpus": cpus, "scale_x": scale_x, "rows": rows, "ops": {}}
    for name, build in ops.items():
        spark.sparkContext.setJobDescription(f"scaling-probe: {name}")
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        warm = []
        for _ in range(2):
            t1 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            warm.append(round(time.perf_counter() - t1, 3))
        out["ops"][name] = {"cold": cold, "warm": warm}
        print(f"# {name}: cold {cold} warm {warm}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
