"""Deduplication queries over the documents/embeddings tables (extension
surface): exact hash dedup, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine near-dup.

Exact + Jaccard + cosine have full DuckDB oracles (integer Jaccard tests
and sequential double sums keep both engines bit-identical). MinHash-LSH
and SimHash are genuinely non-SQL-expressible at oracle fidelity (engine
hash functions differ) -> rows-only driver check + pytest recall tests
against the exact oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.minhash import minhash_near_duplicates
from ..operators.shingles import jaccard_pairs
from ..operators.similarity import cosine_pairs
from ..operators.simhash import simhash_near_duplicates
from ..sources.parquet import load_table

JACCARD_PCT = 20  # word-trigram Jaccard >= 0.20 => near-duplicate
COSINE_THRESHOLD = 0.4  # synthetic 64-d embeddings: max off-diag cos ~0.51


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one representative (min id) per md5.
    Hash-groupBy is one shuffle on the digest — the 100 TB-safe exact path."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("text_md5", F.md5(F.encode(F.col("text"), "UTF-8")))
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-trigram Jaccard near-dup pairs (operators/shingles.py)."""
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(d, "doc_id", "text", n=3, threshold_pct=JACCARD_PCT)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms)+LSH(8 bands) candidates verified by exact Jaccard
    (operators/minhash.py). Rows-only driver check; recall vs the exact
    pairs is asserted in tests."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        d, "doc_id", "text", n=3, num_perm=32, bands=8, threshold_pct=JACCARD_PCT
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs with Hamming <= 3 (operators/simhash.py).
    Rows-only driver check."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_near_duplicates(d, "doc_id", "text", max_hamming=3)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (operators/similarity.py).

    Threshold 0.4 fits the synthetic embeddings (max off-diagonal cosine
    ~0.51); real corpora use ~0.95 with LSH bucketing first."""
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs(e, "vec_id", "embedding", threshold=COSINE_THRESHOLD)


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: transitive closure over the exact Jaccard
    pairs via iterative min-label propagation (operators/components.py).
    Every doc gets (cluster_id = min doc_id in component, is_keeper).
    Oracle: recursive CTE reachability over the same pairs."""
    from ..operators.components import dedup_clusters

    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, "doc_id", "text", n=3, threshold_pct=JACCARD_PCT)
    return dedup_clusters(d, pairs.select("id_a", "id_b"), "doc_id")


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_jaccard_pairs": dedup_jaccard_pairs,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_connected_components": dedup_connected_components,
}

_DUCK_SHINGLES = """
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
          FROM documents)
    WHERE len(t) >= 3
"""

ORACLE = {
    "dedup_exact": """
        SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_jaccard_pairs": f"""
        WITH sh AS ({_DUCK_SHINGLES}),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b, n_inter,
               sa.n_sh + sb.n_sh - n_inter AS n_union,
               n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE n_inter * 100 >= {JACCARD_PCT} * (sa.n_sh + sb.n_sh - n_inter)
    """,
    "dedup_connected_components": f"""
        WITH RECURSIVE sh AS ({_DUCK_SHINGLES}),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_inter * 100 >= {JACCARD_PCT} * (sa.n_sh + sb.n_sh - n_inter)
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach(id, r) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id
        ),
        comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
        SELECT d.doc_id,
               coalesce(c.component, d.doc_id) AS cluster_id,
               d.doc_id = coalesce(c.component, d.doc_id) AS is_keeper
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    """,
    "dedup_embedding_cosine": f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
            FROM embeddings
        ), n AS (
            SELECT vec_id, vv,
                   sqrt(list_sum(list_transform(vv, x -> x * x))) AS nrm
            FROM v
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.vv, b.vv) / (a.nrm * b.nrm), 6) AS cos
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.vv, b.vv) / (a.nrm * b.nrm), 6)
              >= {COSINE_THRESHOLD}
    """,
}
