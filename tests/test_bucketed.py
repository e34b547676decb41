"""Bucketed-join test: same-bucketed tables join without a shuffle
(no Exchange in the final plan) and match the plain-join result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ffi_export_etl_spark.sinks.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    # warehouse.dir is a static conf; the session default (spark-warehouse
    # under cwd) is fine for test tables, dropped on teardown
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        ["o_orderkey"],
        8,
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join exercises the bucketed SMJ path (at
    # real scale both sides are too big to broadcast anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, ["o_orderkey"]).select(
            "o_orderkey", "l_linenumber", "o_totalprice"
        )
        joined.collect()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, sf_small, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed_count = bucketed_join(spark, lt, rt, ["o_orderkey"]).count()
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    plain_count = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert bucketed_count == plain_count


def test_signature_store_disk_roundtrip_incremental(spark, sf_small):
    """The 'persistable LSH index' claim made concrete: write the
    signature store as a parquet table bucketed on (band, bucket), read
    it back, and run the incremental candidate join against the ON-DISK
    store — identical candidates to the in-memory path."""
    from ffi_export_etl_spark.operators.minhash import (
        incremental_candidate_pairs,
        minhash_signature_store,
    )

    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    stored_docs = d.filter(F.col("doc_id") % 5 != 0)
    new_docs = d.filter(F.col("doc_id") % 5 == 0)
    stored = minhash_signature_store(stored_docs, "doc_id", "text")
    newb = minhash_signature_store(new_docs, "doc_id", "text")
    in_memory = {
        (r["id_a"], r["id_b"])
        for r in incremental_candidate_pairs(newb, stored).collect()
    }

    write_bucketed(stored, "sig_store_b", ["band", "bucket"], 8)
    try:
        from_disk = {
            (r["id_a"], r["id_b"])
            for r in incremental_candidate_pairs(
                newb, spark.table("sig_store_b")
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS sig_store_b")
    assert from_disk == in_memory
    assert from_disk  # the split corpus actually produces candidates


def test_simhash_store_disk_roundtrip_incremental(spark, sf_small):
    """simhash signature store written bucketed on (band, val), read
    back, incremental pairs against the ON-DISK store == in-memory."""
    from ffi_export_etl_spark.operators.simhash import (
        incremental_simhash_pairs,
        simhash_signature_store,
    )

    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    stored_docs = d.filter(F.col("doc_id") % 5 != 0)
    new_docs = d.filter(F.col("doc_id") % 5 == 0)
    stored = simhash_signature_store(stored_docs, "doc_id", "text")
    newb = simhash_signature_store(new_docs, "doc_id", "text")
    in_memory = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in incremental_simhash_pairs(newb, stored).collect()
    }

    write_bucketed(stored, "simhash_store_b", ["band", "val"], 8)
    try:
        from_disk = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in incremental_simhash_pairs(
                newb, spark.table("simhash_store_b")
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS simhash_store_b")
    assert from_disk == in_memory


def test_signlsh_store_disk_roundtrip_incremental(spark, sf_small):
    """sign-LSH signature store written bucketed on (band, bucket), read
    back, incremental candidates against the ON-DISK store == in-memory
    (minhash.incremental_candidate_pairs is the shared join)."""
    from ffi_export_etl_spark.operators.minhash import (
        incremental_candidate_pairs,
    )
    from ffi_export_etl_spark.operators.similarity import (
        signlsh_signature_store,
    )

    e = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    stored_vecs = e.filter(F.col("vec_id") % 5 != 0)
    new_vecs = e.filter(F.col("vec_id") % 5 == 0)
    stored = signlsh_signature_store(stored_vecs, 64)
    newb = signlsh_signature_store(new_vecs, 64)
    in_memory = {
        (r["id_a"], r["id_b"])
        for r in incremental_candidate_pairs(newb, stored).collect()
    }

    write_bucketed(stored, "signlsh_store_b", ["band", "bucket"], 8)
    try:
        from_disk = {
            (r["id_a"], r["id_b"])
            for r in incremental_candidate_pairs(
                newb, spark.table("signlsh_store_b")
            ).collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS signlsh_store_b")
    assert from_disk == in_memory
