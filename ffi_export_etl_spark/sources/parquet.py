"""Parquet loaders for the driver's synthetic test tables (TESTDATA.md).

Mirrors the reference's "file-collection source" role
(/root/reference/xml_to_rdb.py:35-37) for the parquet star schema. Columnar
scans go through Spark's vectorized parquet reader, so filters/projections
declared downstream are pushed into the scan by Catalyst (check
``.explain`` for PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at *any* scale factor (region/nation
# are fixed-size; TPC-H dims grow with sf but region/nation never do).
BROADCAST_SAFE = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the named tables lazily; nothing is read until an action runs."""
    return {name: load_table(spark, sf_dir, name) for name in names if
            os.path.exists(table_path(sf_dir, name))}
