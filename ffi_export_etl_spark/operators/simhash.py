"""SimHash near-duplicate detection over 60-bit token-hash fingerprints.

simhash(doc) = for each of 60 bit positions, sign of the sum over tokens of
(+1 if md5-hash(token) has the bit set else -1). Near-duplicates = pairs
with small Hamming distance, found without an all-pairs scan by banding the
60-bit fingerprint into 15-bit chunks (pigeonhole: hamming <= 3 implies at
least one of 4 chunks equal) and joining only within chunk buckets.

Token hashing is the portable md5 family (functions/porthash.py): 60 bits
= 15 hex chars, non-negative in a signed 64-bit in Spark, DuckDB, and
Python alike, so the DuckDB oracle replays the fingerprints exactly and
the driver gets a full value-hash check.

All native Column exprs (bit ops, joins) — deterministic, no UDFs, linear
shuffle volume + bucket-pair blowup. The scale profile matches
MinHash-LSH; SimHash trades shingle sets for weighted token bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.porthash import md5_long

BITS = 60  # 15 hex chars of md5 -> non-negative BIGINT in every engine
CHUNKS = 4  # 15-bit chunks; pigeonhole covers max_hamming <= 3
CHUNK_BITS = BITS // CHUNKS
CHUNK_MASK = (1 << CHUNK_BITS) - 1


def simhash_fingerprints(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, simhash: bigint) — 60-bit fingerprint per document."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok"), 15))
    # 60 conditional-sum aggregates over token rows — one pass, map-side
    # combined. (The explode-per-bit formulation shuffles 60x the rows;
    # this shuffles one 60-column row per doc.)
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(BITS)
        ]
    )
    fingerprint = None
    for b in range(BITS):
        term = F.when(F.col(f"b{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return bit_sums.select("id", fingerprint.alias("simhash"))


def simhash_near_duplicates(
    docs: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Banding into 4 15-bit chunks guarantees recall for max_hamming <= 3
    (pigeonhole); larger thresholds need more chunks.
    """
    fp = simhash_fingerprints(docs, id_col, text_col)
    chunks = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * CHUNK_BITS)
                        .bitwiseAND(F.lit(CHUNK_MASK))
                        .alias("val"),
                    )
                    for c in range(CHUNKS)
                ]
            )
        ).alias("cv"),
    ).select("id", "simhash", "cv.chunk", "cv.val")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
