"""Cross-pack concurrency: the threaded gate packs must be safe to run
CONCURRENTLY WITH EACH OTHER in one session — the busy-cluster shape.

This is the regression surface of the r9 thread-safety bug (a global
before/after diff in the iterative operators' round GC let one chain
unpersist a sibling's checkpoint blocks —
CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) and of the r10 shared
InheritableThread helper: three packs that each spawn their OWN worker
threads (nested run_parallel), own localCheckpoints, and own
persist/unpersist pairs run side by side, and every result must equal
its serial twin exactly."""

from __future__ import annotations

import pytest

from ffi_export_etl_spark.parallel import run_parallel

# r12 suite split: end-to-end/property sweep module — runs with SPARK_GRAFT_SLOW_TESTS=1
pytestmark = pytest.mark.slow_tail

SF = "/root/testdata/sf0.001"

PACKS = [
    "ann_pq_pack",              # nested run_parallel, 2 shared persists
    "dedup_connected_components",  # 3 iterative arms, round GC
    "cur_train_pack",           # eager store checkpoints + BPE loop
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _persisted_noncheckpoint_ids(spark) -> set[int]:
    out: set[int] = set()
    it = spark.sparkContext._jsc.getPersistentRDDs().entrySet().iterator()
    while it.hasNext():
        e = it.next()
        if not e.getValue().rdd().isLocallyCheckpointed():
            out.add(int(e.getKey()))
    return out


def test_threaded_packs_run_concurrently_and_match_serial(spark):
    import __spark_entry__ as entry

    queries = entry.queries()
    serial = {name: _rows(queries[name](spark, SF)) for name in PACKS}

    # delta-based leak check: the shared suite session legitimately
    # carries cross-call caches from OTHER rows (cur_e2e keeps its
    # boundary persists by design); these packs must add none of
    # their own (localCheckpoint blocks are the ContextCleaner's job)
    before = _persisted_noncheckpoint_ids(spark)
    results, errors = run_parallel(
        {name: (lambda n=name: _rows(queries[n](spark, SF))) for name in PACKS}
    )
    assert errors == {}
    for name in PACKS:
        assert results[name] == serial[name], name
    leaked = _persisted_noncheckpoint_ids(spark) - before
    assert leaked == set(), leaked
