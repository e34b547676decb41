"""Multimodal-column query (rows-only driver check): binary media columns
with typed metadata, decoded/feature-extracted through Arrow-batched
mapInPandas (operators/multimodal.py).

The synthetic tables carry no real media, so documents.text bytes stand in
as the opaque binary payload — the Spark-side plumbing (binary column,
batch iteration, UDF signature, output schema) is exactly what production
media would use; only the decode kernel is a deterministic fake
(set_decoder swaps in a real one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features
from ..sources.parquet import load_table


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.col("text")).cast("long").alias("n_bytes"),
    )
    return extract_features(media)


QUERIES = {
    "mm_feature_extract": mm_feature_extract,
}

# mapInPandas decode is not SQL-expressible -> rows-only driver check.
# (The checksum column IS md5(text); tests/test_operators.py pins the
# full feature schema and determinism.)
ORACLE: dict[str, str] = {}
