"""Deterministic-sampling gate query (operators/sampling.py).

Curation runs must be reproducible: membership is decided by the portable
md5 family over the row key (never a partition-seeded RNG), so the same
rows make the cut on any cluster, any partitioning, any engine — and the
DuckDB oracle replays the exact membership decision, giving the driver a
full value-hash check over both samplers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.porthash import MERSENNE31, duck_md5_long
from ..operators.sampling import NULL_KEY_SENTINEL, hash_sample, stratified_take
from ..sources.parquet import load_table

SAMPLE_FRACTION = 0.25
SAMPLE_THRESHOLD = int(SAMPLE_FRACTION * (1 << 60))  # mirrors hash_sample
STRAT_N = 5


def samp_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both samplers union-tagged into one driver row: a deterministic
    25% Bernoulli sample of documents (hash_sample — one scan, no
    shuffle) and an exact 5-per-label stratified take of embeddings
    (stratified_take — one label-partitioned window)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bern = hash_sample(d, "doc_id", SAMPLE_FRACTION).select(
        F.lit("bernoulli").alias("kind"),
        F.col("doc_id").alias("k"),
        F.lit(None).cast("int").alias("label"),
    )
    strat = stratified_take(e, "label", "vec_id", STRAT_N).select(
        F.lit("stratified").alias("kind"),
        F.col("vec_id").alias("k"),
        F.col("label"),
    )
    return bern.unionByName(strat)


QUERIES = {"samp_pack": samp_pack}

# template with a {key} placeholder; salt is '' so the hashed string is
# exactly coalesce(cast(key), sentinel), matching operators/sampling.py
_KEY_HASH = duck_md5_long(
    f"coalesce(CAST({{key}} AS VARCHAR), '{NULL_KEY_SENTINEL}')", 15
)

ORACLE = {
    "samp_pack": f"""
        SELECT 'bernoulli' AS kind, doc_id AS k, CAST(NULL AS INTEGER) AS label
        FROM documents
        WHERE {_KEY_HASH.format(key="doc_id")} < {SAMPLE_THRESHOLD}
        UNION ALL
        SELECT 'stratified', vec_id, label
        FROM (
            SELECT vec_id, label,
                   row_number() OVER (
                       PARTITION BY label
                       ORDER BY {_KEY_HASH.format(key="vec_id")} % {MERSENNE31},
                                vec_id
                   ) AS rk
            FROM embeddings
        )
        WHERE rk <= {STRAT_N}
    """,
}
