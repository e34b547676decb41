"""MinHash + LSH banding near-duplicate detection — the 100 TB dedup path.

shingle -> per-permutation min of xxhash64(shingle, seed) -> band the
signature -> group by (band_id, band_hash) -> candidate pairs only within
buckets -> verify with exact Jaccard. Cost is linear in corpus size plus
the (small) bucket-pair blowup, instead of the quadratic shingle self-join.

Everything is deterministic: xxhash64 is a fixed function of its input, so
signatures are stable across runs/partitionings (driver rows-only checks
stay reproducible). All steps are native Column exprs — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .shingles import jaccard_pairs, shingle_table


def signatures_from_shingles(sh: DataFrame, num_perm: int = 32) -> DataFrame:
    """MinHash signatures from an (id, shingle) table."""
    mins = sh.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
            for i in range(num_perm)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 32,
) -> DataFrame:
    """(id, sig: array<bigint>[num_perm]) MinHash signatures.

    One permutation = min over shingles of xxhash64(shingle, seed-col=i).
    Aggregated with groupBy().agg(min...) — map-side partial aggregation
    keeps the shuffle tiny at scale.
    """
    return signatures_from_shingles(shingle_table(docs, id_col, text_col, n), num_perm)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 8,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate (id_a, id_b) pairs sharing >= 1 LSH band bucket.

    Bucket key = hash of one band's slice of the signature; the self-join is
    on (band, bucket) so only same-bucket docs ever meet.

    ``max_bucket_size`` caps the worst case: a degenerate bucket of B docs
    contributes B^2/2 pairs (e.g. a boilerplate string shared by millions
    of documents). Buckets above the cap are dropped — their members are
    near-identical to so many others that the remaining bands still pair
    them, and the quadratic blowup is bounded. Off by default.
    """
    num_perm = bands * rows_per_band
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        sizes = banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        banded = (
            banded.join(sizes, ["band", "bucket"])
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold_pct: int = 20,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard >= threshold_pct/100.

    Verification computes Jaccard ONLY for candidate pairs (shingle joins
    pinned to the candidate list), never all-pairs — that is the whole
    point at scale. Output has no LSH false positives; false negatives
    remain possible (the recall/cost tradeoff; tests measure recall vs the
    brute-force jaccard_pairs).
    """
    rows_per_band = num_perm // bands
    # ONE shingle pass feeds signatures, sizes, and pair verification —
    # cached because three downstream plans consume it.
    sh = shingle_table(docs, id_col, text_col, n)
    sh.persist()
    sigs = signatures_from_shingles(sh, num_perm)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)

    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("id").alias("id_a"), F.col("shingle").alias("sh_a"))
    sb = sh.select(F.col("id").alias("_idb"), F.col("shingle").alias("sh_b"))
    inter = (
        cands.join(sa, "id_a")
        .join(sb, (F.col("id_b") == F.col("_idb")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .filter(F.col("n_inter") * 100 >= threshold_pct * F.col("n_union"))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            (F.col("n_inter") / F.col("n_union")).alias("jaccard"),
        )
    )
