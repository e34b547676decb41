"""Training-shard writer: the last-mile sink that turns a curated corpus
into the file layout a training job actually consumes.

Requirements that make this more than ``df.write.parquet``:
- DETERMINISTIC GLOBAL ORDER: data loaders stream shards in filename
  order; the example sequence must be reproducible run-to-run, so rows
  are ordered by the salted key hash (operators/sampling.
  deterministic_shuffle — a range-partitioned sort, no single-partition
  bottleneck) and shard N's every row precedes shard N+1's.
- BOUNDED SHARD SIZE: loaders want uniform ~file sizes; rows_per_shard
  bounds file row counts via the writer's maxRecordsPerFile (files
  split WITHIN a partition keep the sorted order, part file numbering
  stays monotone with the range partitioning).
- AUDITABLE MANIFEST: the returned manifest (one row per output file,
  in order, with row counts and key ranges) is what a loader checks
  against instead of re-listing the directory.

At 100 TB: the sort is Spark's sampled range partitioning (the same
mechanics as any large orderBy), the write is embarrassingly parallel,
and the manifest aggregation reads footers, not data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import _key_hash, deterministic_shuffle


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    rows_per_shard: int = 100_000,
    salt: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Write ``df`` as ordered parquet training shards under ``path``;
    returns the manifest DataFrame (file, n_rows, first_key, last_key —
    in stream order) after writing it to ``path + '/_manifest'``.

    ``num_partitions`` sizes the range partitions explicitly; the
    default keeps Spark's ``spark.sql.shuffle.partitions`` (counting the
    corpus to derive it would cost an extra scan) and lets
    maxRecordsPerFile bound rows within each partition.
    """
    ordered = deterministic_shuffle(
        df, key_col, salt=salt, num_partitions=num_partitions
    )
    (
        ordered.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .parquet(path)
    )
    spark = df.sparkSession
    written = spark.read.parquet(path)
    # first/last IN STREAM ORDER = min/max along the hash axis the sort
    # used, not the raw key ordering
    h = _key_hash(key_col, salt)
    manifest = (
        written.select(
            F.element_at(
                F.split(F.input_file_name(), "/"), -1
            ).alias("file"),
            F.col(key_col).alias("_k"),
            h.alias("_h"),
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min_by("_k", "_h").alias("first_key"),
            F.max_by("_k", "_h").alias("last_key"),
        )
        .orderBy("file")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest")
    )
    return spark.read.parquet(os.path.join(path, "_manifest")).orderBy("file")
