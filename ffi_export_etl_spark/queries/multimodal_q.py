"""Multimodal-column query: binary media columns with typed metadata,
decoded/feature-extracted through Arrow-batched mapInPandas
(operators/multimodal.py).

Two arms, union-tagged into one driver row (mm_pack):

- ``stub``: documents.text bytes as an opaque payload through the
  injectable-decoder plumbing (operators/multimodal.extract_features)
  — the deterministic fake derives width/height from md5 hex prefixes,
  so DuckDB replays the "decode" exactly.
- ``real``: a REAL image decode through the production kernel
  (extract_real_features -> operators/media_codecs.decode_pnm): each
  document's first 64 bytes (space-padded; the corpus is pure ASCII,
  asserted at generation sizes) become the pixel body of a binary
  8x8 PGM built in-plan, and the numpy decoder's reported dimensions,
  channel count, and mean pixel value are value-hash-checked against a
  DuckDB replay (mean = sum of the 64 code points / 64.0 — exact
  integer sums, bit-identical doubles). This pins the actual decode
  kernel, not just the Arrow plumbing, at the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, extract_real_features
from ..sources.parquet import load_table

PGM_W = 8
PGM_H = 8
_PGM_HEADER = f"P5\n{PGM_W} {PGM_H}\n255\n"
_BODY_LEN = PGM_W * PGM_H


def mm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stub_media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )
    stub = extract_features(stub_media).select(
        F.lit("stub").alias("arm"),
        "media_id",
        "width",
        "height",
        F.lit(None).cast("double").alias("mean_value"),
        F.col("checksum").alias("tag"),
    )

    pgm = F.encode(
        F.concat(
            F.lit(_PGM_HEADER), F.rpad(F.col("text"), _BODY_LEN, " ")
        ),
        "UTF-8",
    ).cast("binary")
    real_media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        pgm.alias("content"),
        F.lit("image/x-portable-graymap").alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )
    real = extract_real_features(real_media).select(
        F.lit("real").alias("arm"),
        "media_id",
        "width",
        "height",
        "mean_value",
        F.col("format").alias("tag"),
    )
    return stub.unionByName(real)


QUERIES = {
    "mm_pack": mm_pack,
}

# stub arm: replay the deterministic fake decoder (md5 hex prefixes —
# Python hashlib and DuckDB md5() agree bit for bit). real arm: the
# constructed PGM's dimensions are literal, channels is not part of the
# pack (gray = 2-D array), and the mean pixel value is the exact
# integer sum of the padded body's code points over 64.0.
ORACLE = {
    "mm_pack": f"""
        SELECT 'stub' AS arm,
               doc_id AS media_id,
               CAST(64 + CAST(CONCAT('0x', substr(md5(text), 1, 4)) AS BIGINT)
                    % 1024 AS INTEGER) AS width,
               CAST(64 + CAST(CONCAT('0x', substr(md5(text), 5, 4)) AS BIGINT)
                    % 1024 AS INTEGER) AS height,
               CAST(NULL AS DOUBLE) AS mean_value,
               md5(text) AS tag
        FROM documents
        UNION ALL
        SELECT 'real',
               doc_id,
               {PGM_W},
               {PGM_H},
               list_sum(list_transform(
                   range(1, {_BODY_LEN + 1}),
                   i -> ascii(substr(rpad(text, {_BODY_LEN}, ' '), i, 1))
               )) / {_BODY_LEN}.0,
               'pgm'
        FROM documents
    """,
}
