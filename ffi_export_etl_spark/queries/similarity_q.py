"""Similarity-search queries over the embeddings table (extension surface):
exact brute-force cosine top-k and LSH-bucketed approximate top-k.

The brute-force query has a full DuckDB oracle (both engines accumulate
doubles left-to-right; ranks compare rounded cosines with a vec_id
tiebreak). The LSH variant's buckets depend on xxhash64-derived hyperplanes
-> rows-only driver check + pytest recall assertion vs brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from ..sources.parquet import load_table

TOPK = 10
N_QUERIES = 5  # vec_id 0..4 serve as query vectors
DIM = 64


def _queries_df(e: DataFrame) -> DataFrame:
    return e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors: broadcast the query side,
    scan the corpus once, per-query window for the top-k."""
    e = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        e, _queries_df(e), "vec_id", "embedding", "query_id", k=TOPK
    )


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via 8-plane sign-LSH bucketing; probes only the
    query's bucket (~1/256 of the corpus at scale). Rows-only check."""
    e = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        e, _queries_df(e), DIM, "vec_id", "embedding", "query_id",
        k=TOPK, planes=8,
    )


def ann_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors, computed dimension-wise with
    posexplode + avg (pure JVM; no Python). Rounded to 6 digits so the
    (order-dependent) double summation matches the oracle bit-for-bit in
    practice. The IVF scale path builds on exactly this: centroids ->
    assign -> probe nearest cells."""
    e = load_table(spark, sf_dir, "embeddings")
    from ..operators.similarity import as_double

    return (
        e.select(
            "label",
            F.posexplode(as_double(F.col("embedding"))).alias("pos", "x"),
        )
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg("x"), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: probe the 3 nearest of 10 cells per query
    (operators/similarity.py ivf_topk). Rows-only check; recall vs brute
    force asserted in tests."""
    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        e, _queries_df(e), DIM, "vec_id", "embedding", "query_id",
        cell_col="label", k=TOPK, nprobe=3,
    )


QUERIES = {
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "ann_label_centroids": ann_label_centroids,
}

ORACLE = {
    "ann_topk_bruteforce": f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
            FROM embeddings
        ), n AS (
            SELECT vec_id, vv,
                   sqrt(list_sum(list_transform(vv, x -> x * x))) AS nrm
            FROM v
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
                   round(list_dot_product(c.vv, q.vv) / (c.nrm * q.nrm), 6)
                       AS cos
            FROM n c JOIN n q
              ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        )
        SELECT query_id, nbr_id, cos, CAST(rnk AS INTEGER) AS rnk
        FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, nbr_id) AS rnk
            FROM scored
        ) WHERE rnk <= {TOPK}
    """,
    "ann_label_centroids": """
        WITH flat AS (
            SELECT label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER)
                       AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        )
        SELECT label, pos, round(avg(x), 6) AS centroid_val,
               count(*) AS n_vectors
        FROM flat GROUP BY label, pos
    """,
}
