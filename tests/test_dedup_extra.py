"""Extra dedup pins beyond the driver rows.

dedup_jaccard_pairs was demoted in round 3 while it was a quadratic
shingle self-join, then re-registered in round 4 once the AllPairs prefix
filter made the exact path scale-safe — all five dedup families from the
brief now carry driver rows. The oracle pin here predates the
re-registration and stays as a fast local check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_export_etl_spark.queries import dedup_q
from tests.oracle_utils import compare_to_oracle


def test_jaccard_exact_path_matches_oracle(spark, sf_oracle):
    df = dedup_q.dedup_jaccard_pairs(spark, sf_oracle)
    compare_to_oracle(df, dedup_q.JACCARD_PAIRS_ORACLE, sf_oracle)


def test_all_five_dedup_families_registered():
    from ffi_export_etl_spark.queries import all_oracle_sql, all_queries

    q, o = all_queries(), all_oracle_sql()
    for name in (
        "dedup_exact_pack",        # exact (content hash) + decontamination
        "dedup_jaccard_pairs",     # exact n-gram Jaccard (prefix filter)
        "dedup_minhash_lsh",       # MinHash+LSH
        "dedup_simhash",           # SimHash
        "dedup_embedding_cosine",  # embedding-cosine (banded sign-LSH)
        "dedup_incremental_minhash",
    ):
        assert name in q and name in o, name


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
