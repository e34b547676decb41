"""One-shuffle candidate-pair expansion from bucket groups — the shared
core of every sketch family's pair generation (minhash LSH, simhash
bands, sign-LSH tables, winnowing fingerprints, and their incremental
variants).

The idiom: group rows by their bucket key, collect each bucket to a
SORTED array (sorting inside the aggregation — an unaliased array_sort
referenced from the expansion lambdas would be inlined and re-evaluated
per element, the measured Catalyst gotcha), drop buckets above the cap
(a degenerate bucket contributes B^2/2 pairs — the one quadratic risk in
any bucketed plan, so callers cap by default and document the recall
trade), and emit intra-array (i, j>i) pairs with array expressions. The
equivalent banded self-join shuffles the bucket table twice on the same
key and cannot bound per-bucket pair volume; here the collected array is
bounded by the cap, so per-row memory is bounded too.

Extracted in r7: five hand-rolled copies of this expression tree had to
be kept in sync (minhash.py x2, simhash.py, similarity.py,
fingerprints.py); each caller now supplies only its payload and pair
shape and keeps its own tail (distinct / count / verify filters).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .xplode import explode_nonempty


def bucket_pairs(
    rows: DataFrame,
    key_cols: Sequence[str],
    payload: Column,
    pair_builder: Callable[[Column, Column], Column],
    max_bucket_size: int | None,
) -> DataFrame:
    """Explode every within-bucket pair: returns one row per (i, j>i)
    pair of each surviving bucket, as struct column ``p`` built by
    ``pair_builder(x, y)`` where x sorts before y in the bucket's
    sorted payload array. ONE shuffle (the groupBy); buckets above
    ``max_bucket_size`` (None disables) and singleton buckets drop
    before expansion."""
    buckets = rows.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(payload)).alias("_rows")
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("_rows") <= max_bucket_size)
    buckets = buckets.filter(F.size("_rows") >= 2)
    arr = F.col("_rows")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: pair_builder(x, y),
            ),
        )
    )
    return explode_nonempty(buckets, [], pair_structs, "p")
