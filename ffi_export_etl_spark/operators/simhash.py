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
from .spread import spread_per_doc

BITS = 60  # 15 hex chars of md5 -> non-negative BIGINT in every engine
CHUNKS = 4  # 15-bit chunks; pigeonhole covers max_hamming <= 3
CHUNK_BITS = BITS // CHUNKS
CHUNK_MASK = (1 << CHUNK_BITS) - 1


# 20-bit counter lanes, 3 packed per 64-bit sum (top lane shifted by 40).
# Each token contributes at most 2^40 + 2^20 + 1 < 2^41 to a sum, so under
# ANSI mode (Spark 4 default, which throws on 64-bit overflow instead of
# wrapping) the running sum stays below 2^63 for any document up to 2^22
# tokens, and a lane counter cannot carry into its neighbour until it
# reaches 2^20. The binding bound is therefore the lane width:
# MAX_TOKENS_PER_DOC = 2^20 - 1, ENFORCED by slicing the token array
# before explode (deterministic first-N truncation; replayed nowhere in
# the oracle because no real document approaches a million tokens).
LANES_PER_SUM = 3
LANE_BITS = 20
LANE_MASK = (1 << LANE_BITS) - 1
MAX_TOKENS_PER_DOC = LANE_MASK


def simhash_fingerprints(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, simhash: bigint) — 60-bit fingerprint per document.

    Per-bit set-counts are aggregated PACKED: each 64-bit sum carries 3
    independent 20-bit counter lanes ((h>>b)&1 shifted into its lane), so
    the group-by runs 20 sum-aggregates + a token count instead of 60 —
    one pass, map-side combined, ~3x less aggregation state, and every
    intermediate stays under 2^63 (ANSI-overflow-safe, see lane constants
    above). Bit b of the fingerprint is set iff 2*count_b >= n_tokens
    (identically the sign of the +1/-1 sum the oracle computes)."""
    toks = spread_per_doc(docs, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.slice(
                F.split(F.col(text_col), r"\s+"), 1, MAX_TOKENS_PER_DOC
            )
        ).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok"), 15))
    n_sums = BITS // LANES_PER_SUM
    packed_aggs = []
    for s in range(n_sums):
        lanes = None
        for k in range(LANES_PER_SUM):
            b = s * LANES_PER_SUM + k
            lane = F.shiftleft(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)).cast("bigint"),
                k * LANE_BITS,
            )
            lanes = lane if lanes is None else lanes + lane
        packed_aggs.append(F.sum(lanes).alias(f"s{s}"))
    sums = toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("_n"), *packed_aggs
    )
    fingerprint = None
    for b in range(BITS):
        s, k = divmod(b, LANES_PER_SUM)
        count_b = F.shiftright(F.col(f"s{s}"), k * LANE_BITS).bitwiseAND(
            F.lit(LANE_MASK)
        )
        term = F.when(
            count_b * 2 >= F.col("_n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return sums.select("id", fingerprint.alias("simhash"))


def _chunk_banded(fp: DataFrame) -> DataFrame:
    """(id, simhash, chunk, val) — the fingerprint table exploded into its
    CHUNKS pigeonhole bands (chunk index + 15-bit chunk value)."""
    return fp.select(
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


def simhash_signature_store(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, simhash, chunk, val) — the persistable simhash index of a
    corpus, mirroring minhash_signature_store: write it bucketed by
    (chunk, val) and incremental batches join against it WITHOUT
    re-fingerprinting the corpus. Unlike the minhash store, this one
    carries everything verification needs (the 60-bit fingerprint), so
    the incremental path emits FINAL pairs, not just candidates."""
    return _chunk_banded(simhash_fingerprints(docs, id_col, text_col))


def incremental_simhash_pairs(
    new_store: DataFrame,
    stored_store: DataFrame,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) near-dup pairs INVOLVING a new batch: the
    daily-increment shape. new x stored pairs come from a chunk-bucket
    equi-join against the persisted index, plus new x new — never
    stored x stored (already deduped). Verification is pure fingerprint
    arithmetic over columns both stores carry, so stored documents are
    never re-read. Equals the full-recompute pair set restricted to
    pairs with at least one new id (pinned by test)."""

    def pairs(a: DataFrame, b: DataFrame, strict: bool) -> DataFrame:
        cond = (F.col("a.chunk") == F.col("b.chunk")) & (
            F.col("a.val") == F.col("b.val")
        )
        cond = cond & (
            (F.col("a.id") < F.col("b.id"))
            if strict
            else (F.col("a.id") != F.col("b.id"))
        )
        return (
            a.alias("a")
            .join(b.alias("b"), cond)
            .select(
                F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).alias("hamming"),
            )
        )

    out = pairs(new_store, stored_store, strict=False).unionByName(
        pairs(new_store, new_store, strict=True)
    )
    return out.filter(F.col("hamming") <= max_hamming).distinct()


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    cache_fingerprints: bool = False,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Banding into 4 15-bit chunks guarantees recall for max_hamming <= 3
    (pigeonhole); larger thresholds need more chunks.

    ``cache_fingerprints``: both sides of the candidate self-join read
    the fingerprint pipeline; True persists it so the scan+explode+md5
    aggregation runs once instead of once per side — the right call when
    the corpus scan is the dominant cost (real 100 TB runs). Default
    False: a clean fresh-JVM A/B at sf0.1 measures the two within noise
    (cached plans pin partitioning away from AQE but skip recompute), so
    the default keeps cache memory free across many-query sessions and
    scan-bound corpora opt in.
    """
    fp = simhash_fingerprints(docs, id_col, text_col)
    if cache_fingerprints:
        fp = fp.persist()
    chunks = _chunk_banded(fp)
    a = chunks.alias("a")
    b = chunks.alias("b")
    # Hamming verification runs BEFORE the pair-dedup distinct: it is a
    # pure function of the pair, and at real scale most chunk collisions
    # are false positives — filtering first keeps them out of the
    # distinct's shuffle entirely (map-side, inside the join's codegen
    # stage), so shuffle volume tracks true near-dups, not collisions.
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
