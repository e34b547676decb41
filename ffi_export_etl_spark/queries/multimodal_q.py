"""Multimodal-column query: binary media columns with typed metadata,
decoded/feature-extracted through Arrow-batched mapInPandas
(operators/multimodal.py).

The synthetic tables carry no real media, so documents.text bytes stand in
as the opaque binary payload — the Spark-side plumbing (binary column,
batch iteration, UDF signature, output schema) is exactly what production
media would use; only the decode kernel is a deterministic fake
(set_decoder swaps in a real one). The fake derives width/height from md5
hex prefixes of the payload, so the DuckDB oracle replays the full feature
extraction and the driver gets a value-hash check even though the Spark
path runs through Python/Arrow.
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
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )
    return extract_features(media)


QUERIES = {
    "mm_feature_extract": mm_feature_extract,
}

# The oracle replays the deterministic fake decoder: n_bytes is the UTF-8
# byte length, width/height come from md5 hex prefixes, checksum is the
# md5 hex digest — Python hashlib and DuckDB md5() agree bit for bit.
ORACLE = {
    "mm_feature_extract": """
        SELECT doc_id AS media_id,
               'image' AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(64 + CAST(CONCAT('0x', substr(md5(text), 1, 4)) AS BIGINT)
                    % 1024 AS INTEGER) AS width,
               CAST(64 + CAST(CONCAT('0x', substr(md5(text), 5, 4)) AS BIGINT)
                    % 1024 AS INTEGER) AS height,
               md5(text) AS checksum
        FROM documents
    """,
}
