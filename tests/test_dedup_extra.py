"""Oracle pins for dedup paths that are NOT in the 50-slot driver window.

dedup_jaccard_pairs was demoted from the registry in round 3 (the exact
quadratic shingle self-join must not be a registered plan at scale — its
slot pins dedup_incremental_minhash instead), but the exact path remains
the verification semantics for MinHash, so it stays oracle-pinned here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_export_etl_spark.queries import dedup_q
from tests.oracle_utils import compare_to_oracle


def test_jaccard_exact_path_matches_oracle(spark, sf_oracle):
    df = dedup_q.dedup_jaccard_pairs(spark, sf_oracle)
    compare_to_oracle(df, dedup_q.JACCARD_PAIRS_ORACLE, sf_oracle)


def test_jaccard_not_registered_but_incremental_is():
    from ffi_export_etl_spark.queries import all_oracle_sql, all_queries

    q, o = all_queries(), all_oracle_sql()
    assert "dedup_jaccard_pairs" not in q
    assert "dedup_incremental_minhash" in q
    assert "dedup_incremental_minhash" in o


def test_incremental_exact_store(spark):
    """operators/exactdedup.py: the content-hash increment matches the
    full-corpus exact grouping restricted to new-involving pairs, and
    drop_known_duplicates keeps exactly the never-seen content."""
    from ffi_export_etl_spark.operators.exactdedup import (
        drop_known_duplicates,
        exact_signature_store,
        incremental_exact_pairs,
    )

    rows = [(i, f"text {i % 6}") for i in range(12)]  # 6 contents x2
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    stored_docs = docs.filter("doc_id < 8")
    new_docs = docs.filter("doc_id >= 8")  # 8..11 -> contents 2,3,4,5

    store = exact_signature_store(stored_docs)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in incremental_exact_pairs(new_docs, store).collect()
    }
    # full recompute restricted to pairs with at least one new id
    full = (
        docs.withColumn("k", F.md5(F.encode("text", "UTF-8")))
        .alias("a")
        .join(
            docs.withColumn("k", F.md5(F.encode("text", "UTF-8"))).alias("b"),
            "k",
        )
        .filter("a.doc_id < b.doc_id")
        .filter("a.doc_id >= 8 or b.doc_id >= 8")
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    assert pairs == {(r["id_a"], r["id_b"]) for r in full.collect()}
    assert len(pairs) == 4  # 8<->2, 9<->3, 10<->4, 11<->5

    # ingest filter: all 4 new docs repeat stored content -> none kept
    assert drop_known_duplicates(new_docs, store).count() == 0
    # fresh content passes; an in-batch dup keeps only the min id
    fresh = spark.createDataFrame(
        [(20, "brand new"), (21, "brand new"), (22, "also new")],
        "doc_id: long, text: string",
    )
    kept = sorted(
        r["doc_id"] for r in drop_known_duplicates(fresh, store).collect()
    )
    assert kept == [20, 22]
