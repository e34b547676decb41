"""Incremental profiling (operators/profile.py profile_batch /
profile_from_batches): the folded store must reproduce the full-corpus
profile — exact stats exactly, HLL distinct within tolerance and
merge-order-invariant — and compose with profile_drift."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from ffi_export_etl_spark.operators.profile import (
    profile_batch,
    profile_drift,
    profile_from_batches,
    profile_table,
)

SF = "/root/testdata/sf0.01"


def _store(spark, docs, mods):
    batches = [
        profile_batch(docs.filter(F.col("doc_id") % 3 == m)) for m in mods
    ]
    return reduce(lambda a, b: a.unionByName(b), batches)


def test_store_fold_matches_full_profile(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )
    full = {r["column"]: r.asDict() for r in profile_table(docs).collect()}
    folded = {
        r["column"]: r.asDict()
        for r in profile_from_batches(_store(spark, docs, [0, 1, 2])).collect()
    }
    assert set(folded) == set(full)
    exact_distinct = docs.agg(
        *[F.count_distinct(c).alias(c) for c in docs.columns]
    ).collect()[0]
    for c, f in folded.items():
        assert f["n_rows"] == full[c]["n_rows"]
        assert f["n_nonnull"] == full[c]["n_nonnull"]
        assert f["min_val"] == full[c]["min_val"]
        assert f["max_val"] == full[c]["max_val"]
        # HLL DataSketch estimate vs exact distinct: within 15% at lgK=12
        exact = exact_distinct[c]
        assert abs(f["approx_distinct"] - exact) <= max(1, 0.15 * exact), c


def test_merge_is_order_invariant(spark):
    """Exact columns are bit-identical under any merge order; the HLL
    estimate is only APPROXIMATELY order-invariant (the DataSketches
    union gadget's internal mode transitions depend on feed order) —
    pinned to a 2% band, documented in profile_from_batches."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    a = {r["column"]: r.asDict()
         for r in profile_from_batches(_store(spark, docs, [0, 1, 2])).collect()}
    b = {r["column"]: r.asDict()
         for r in profile_from_batches(_store(spark, docs, [2, 0, 1])).collect()}
    for c in a:
        for k in ("n_rows", "n_nonnull", "min_val", "max_val"):
            assert a[c][k] == b[c][k], (c, k)
        assert abs(a[c]["approx_distinct"] - b[c]["approx_distinct"]) <= max(
            1, 0.02 * a[c]["approx_distinct"]
        ), c


def test_incremental_growth_and_drift(spark):
    """Day-1 store (one batch) vs day-2 store (all batches) through
    profile_drift: the profile_table-shaped outputs compose directly."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    day1 = profile_from_batches(_store(spark, docs, [0]))
    day2 = profile_from_batches(_store(spark, docs, [0, 1, 2]))
    drift = {r["column"]: r.asDict() for r in profile_drift(day1, day2).collect()}
    assert drift["doc_id"]["n_rows_old"] < drift["doc_id"]["n_rows_new"]
    # corpus tripled: row_volume flags, cardinality must NOT (id column
    # grows with volume; the normalized ratio stays in-bounds)
    assert "row_volume" in drift["doc_id"]["drift_reasons"]
    assert "cardinality" not in drift["doc_id"]["drift_reasons"]


def test_empty_batch_is_identity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    empty = profile_batch(docs.filter(F.lit(False)))
    store = _store(spark, docs, [0, 1, 2]).unionByName(empty)
    with_empty = {
        r["column"]: r.asDict()
        for r in profile_from_batches(store).collect()
    }
    without = {
        r["column"]: r.asDict()
        for r in profile_from_batches(_store(spark, docs, [0, 1, 2])).collect()
    }
    assert with_empty == without


def test_store_alone_profiles_nothing_rescanned(spark, tmp_path):
    """The store round-trips through parquet (sketches are first-class
    binary values) and the report reads ONLY the store."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    p = str(tmp_path / "profile_store")
    _store(spark, docs, [0, 1, 2]).write.parquet(p)
    reloaded = profile_from_batches(spark.read.parquet(p))
    plan = reloaded._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan
    assert reloaded.count() == 2
