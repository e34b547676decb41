"""Bucketed table layout for co-located, shuffle-free joins.

At 100 TB the dominant recurring cost of fact-fact joins (lineitem x
orders on orderkey) is the shuffle. Bucketing both tables by the join key
at WRITE time moves that shuffle to ingest, once; every subsequent join
on the key is exchange-free (SortMergeJoin over pre-bucketed scans).

Spark bucketing requires the session catalog (``saveAsTable``); bucket
counts must match across tables for co-location. Verified by
tests/test_bucketed.py asserting the joined plan contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``path``: write an EXTERNAL table whose parquet data lives at the
    given location instead of inside the session warehouse. The catalog
    entry then carries only the bucket metadata — a consumer whose
    metastore cannot resolve the table (different working directory ->
    different derby metastore_db) can still read the location as plain
    parquet, trading bucket co-location for correctness (the
    signature-store folds ride this: the store root stays
    self-contained)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key —
    produces an exchange-free plan when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
