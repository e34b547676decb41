"""Curation gate query: document chunking + int8 embedding quantization.

Pins two training-data-pipeline operators that were pytest-only through
round 2 (VERDICT.md r2 "What's missing" #1) with a FULL DuckDB oracle:

- ``operators/textproc.chunk_documents`` — overlapping token-window
  fan-out (posexplode, narrow, no shuffle). Registered at 32-token
  windows / 8-token overlap so the sf corpus (~54 tokens/doc) actually
  produces multi-chunk documents.
- ``operators/quantize.quantize_embedding`` — symmetric per-vector int8
  codes + max-abs scale. The oracle replays the exact code arithmetic
  (float->double cast, /scale*127, round half-away-from-zero, clamp),
  so the driver value-hashes every code byte, not a checksum.
- ``operators/packing.pack_sequences`` — concat-and-split sequence
  packing via the block-partitioned distributed cumsum. The oracle is a
  plain ``SUM() OVER (ORDER BY doc_id)`` — correct at oracle scale —
  while the Spark side never materializes a single-partition sort, so
  the driver pins that the two-pass shape equals the textbook cumsum.
- ``operators/textproc.vocab_top_tokens`` — tokenizer-prep top-N
  vocabulary (explode + map-side-combined counts + TakeOrderedAndProject;
  deterministic count-desc/token-asc tiebreak replayed by the oracle).

The arms are union-tagged into one result (the established pack shape:
queries/packs.py) so the trio costs one registry slot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import pack_sequences
from ..operators.quantize import quantize_embedding
from ..operators.textproc import chunk_documents, vocab_top_tokens
from ..sources.parquet import load_table

CHUNK_TOKENS = 32
OVERLAP = 8
STRIDE = CHUNK_TOKENS - OVERLAP
SEQ_CAPACITY = 512
PACK_BLOCK = 500  # exercises multi-block cumsum even at sf0.01
VOCAB_N = 200


def cur_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-tagged: 'chunk' rows = one per token-window chunk of every
    document; 'quant' rows = one per embedding with the full int8 code
    vector rendered as CSV (value-level pin) + the per-vector scale;
    'pack' rows = one per document with its packed-stream position."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        docs, chunk_tokens=CHUNK_TOKENS, overlap=OVERLAP
    ).select(
        F.lit("chunk").alias("kind"),
        F.col("id"),
        F.col("chunk_index").alias("idx"),
        F.col("chunk_n_tokens").alias("n_tokens"),
        F.col("chunk_text").alias("payload"),
        F.lit(None).cast("double").alias("qscale"),
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.withColumn("q", quantize_embedding(F.col("embedding")))
    quant = q.select(
        F.lit("quant").alias("kind"),
        F.col("vec_id").alias("id"),
        F.lit(None).cast("int").alias("idx"),
        F.size("q.codes").alias("n_tokens"),
        F.array_join(
            F.transform("q.codes", lambda c: c.cast("string")), ","
        ).alias("payload"),
        F.col("q.scale").alias("qscale"),
    )

    packed = pack_sequences(
        docs, capacity=SEQ_CAPACITY, block_size=PACK_BLOCK
    ).select(
        F.lit("pack").alias("kind"),
        F.col("id"),
        F.col("first_seq").alias("idx"),
        F.col("n_tokens"),
        F.concat_ws(
            ":", F.col("tok_offset"), F.col("offset_in_seq"), F.col("last_seq")
        ).alias("payload"),
        F.lit(None).cast("double").alias("qscale"),
    )

    vocab = vocab_top_tokens(docs, n=VOCAB_N).select(
        F.lit("vocab").alias("kind"),
        F.col("rank").cast("bigint").alias("id"),
        F.lit(None).cast("int").alias("idx"),
        F.col("n_occurrences").cast("int").alias("n_tokens"),
        F.col("token").alias("payload"),
        F.lit(None).cast("double").alias("qscale"),
    )
    return (
        chunks.unionByName(quant).unionByName(packed).unionByName(vocab)
    )


QUERIES = {"cur_pack": cur_pack}

ORACLE = {
    "cur_pack": f"""
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id, toks,
                   unnest(generate_series(
                       1, greatest(len(toks) - {OVERLAP}, 1), {STRIDE}
                   )) AS start
            FROM t
        )
        SELECT 'chunk' AS kind, doc_id AS id,
               CAST((start - 1) // {STRIDE} AS INTEGER) AS idx,
               CAST(len(toks[start : start + {CHUNK_TOKENS - 1}]) AS INTEGER)
                   AS n_tokens,
               array_to_string(toks[start : start + {CHUNK_TOKENS - 1}], ' ')
                   AS payload,
               CAST(NULL AS DOUBLE) AS qscale
        FROM s
        UNION ALL
        SELECT 'quant', vec_id, CAST(NULL AS INTEGER),
               CAST(len(embedding) AS INTEGER),
               array_to_string(list_transform(embedding, x ->
                   CAST(CASE WHEN scale = 0 THEN 0
                        ELSE greatest(-127.0, least(127.0,
                             round(CAST(x AS DOUBLE) / scale * 127)))
                        END AS TINYINT)), ','),
               scale
        FROM (
            SELECT vec_id, embedding,
                   list_max(list_transform(
                       embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
            FROM embeddings
        )
        UNION ALL
        SELECT 'pack', doc_id,
               CAST((cum - n_tokens) // {SEQ_CAPACITY} AS INTEGER),
               CAST(n_tokens AS INTEGER),
               concat_ws(':', cum - n_tokens,
                         (cum - n_tokens) % {SEQ_CAPACITY},
                         (cum - 1) // {SEQ_CAPACITY}),
               CAST(NULL AS DOUBLE)
        FROM (
            SELECT doc_id,
                   len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
                   sum(len(regexp_split_to_array(text, '\\s+')))
                       OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
            FROM documents
        )
        UNION ALL
        SELECT 'vocab', CAST(rank AS BIGINT), CAST(NULL AS INTEGER),
               CAST(n_occurrences AS INTEGER), token, CAST(NULL AS DOUBLE)
        FROM (
            SELECT row_number() OVER (ORDER BY count(*) DESC, token) AS rank,
                   token, count(*) AS n_occurrences
            FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token
                  FROM documents)
            GROUP BY token
            ORDER BY count(*) DESC, token
            LIMIT {VOCAB_N}
        )
    """,
}
