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
