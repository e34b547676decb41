"""Sequence packing — map documents into fixed-capacity training windows.

Pretraining pipelines concatenate documents in a deterministic order into
one token stream and slice it into fixed-size training sequences
(documents may straddle a boundary). For each document this computes
where it lands: its global token offset and the range of sequence ids it
spans.

The core is a GLOBAL cumulative sum of token counts in a deterministic
order — the naive Window over a global ORDER BY collapses to a single
partition (a scale killer), so this uses the two-pass distributed shape:

  1. cumsum WITHIN deterministic blocks (id div block_size) — an
     ordinary partitioned window, fully parallel;
  2. per-block totals (one tiny aggregate, #blocks rows) turned into
     block prefix offsets with a window over the BLOCK table (single
     partition over #blocks rows, not N rows), broadcast-joined back.

Result is identical for any block_size (tested), so block_size is purely
a parallelism knob: pick ~(rows / cluster cores); the block-offset table
stays thousands of rows even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .xplode import explode_nonempty

DEFAULT_BLOCK_SIZE = 100_000


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> DataFrame:
    """Adds ``cum`` = sum of ``value_col`` over all rows with
    ``order_col`` <= this row's (order_col must be unique), without a
    global single-partition sort."""
    # double divide + truncate is a monotone nondecreasing map of the
    # order key, which is all blocking needs (each block is a contiguous
    # key range, blocks ordered consistently with the key) — correct even
    # where double precision merges adjacent huge ids into one block
    blk = (F.col(order_col) / F.lit(block_size)).cast("long")
    w_in = (
        Window.partitionBy("_blk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = df.withColumn("_blk", blk).withColumn(
        "_cum_in", F.sum(F.col(value_col).cast("long")).over(w_in)
    )
    totals = (
        within.groupBy("_blk")
        .agg(F.sum(F.col(value_col).cast("long")).alias("_tot"))
    )
    w_blk = (
        Window.orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "_off", F.sum("_tot").over(w_blk) - F.col("_tot")
    ).select("_blk", "_off")
    return (
        within.join(F.broadcast(offsets), "_blk")
        .withColumn("cum", F.col("_cum_in") + F.col("_off"))
        .drop("_blk", "_cum_in")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 512,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> DataFrame:
    """(id, n_tokens, tok_offset, first_seq, offset_in_seq, last_seq):
    the document's position in the packed token stream when documents
    are concatenated in ``id_col`` order and sliced into
    ``capacity``-token training sequences (empty docs still count their
    single empty token, matching the whitespace tokenizer)."""
    n_tok = F.size(F.split(F.col(text_col), r"\s+"))
    with_cum = global_cumsum(
        docs.select(F.col(id_col).alias("id"), n_tok.alias("n_tokens")),
        "id",
        "n_tokens",
        block_size,
    )
    start = F.col("cum") - F.col("n_tokens")  # 0-based global token offset
    # first_seq/last_seq are LONG: an int32 id wraps past ~2^31
    # sequences, i.e. a few TB of text at capacity 512 — far below the
    # scale this module targets. offset_in_seq < capacity stays int.
    return with_cum.select(
        "id",
        "n_tokens",
        start.alias("tok_offset"),
        F.expr(f"(cum - n_tokens) div {capacity}").alias("first_seq"),
        ((F.col("cum") - F.col("n_tokens")) % capacity)
        .cast("int")
        .alias("offset_in_seq"),
        F.expr(f"(cum - 1) div {capacity}").alias("last_seq"),
    )


def sequence_manifest(packed: DataFrame, capacity: int) -> DataFrame:
    """The data-loader view of a packed corpus: one row per
    (seq_id, document slice) — (seq_id, id, doc_tok_start, seq_tok_start,
    n_toks) — where sequence seq_id's tokens [seq_tok_start,
    seq_tok_start + n_toks) come from tokens [doc_tok_start,
    doc_tok_start + n_toks) of document id.

    ``packed`` is pack_sequences' output (same ``capacity``). A document
    spanning sequences [first_seq, last_seq] contributes one slice per
    sequence it touches — a NARROW per-row explode over that span (no
    shuffle, fan-out = spans touched, bounded by n_tokens/capacity + 1).
    Within each sequence the slices tile it exactly: consecutive,
    non-overlapping, summing to ``capacity`` (the final sequence may be
    short) — property-tested, and exactly the contract a training data
    loader needs to reassemble sequences without re-tokenizing.
    """
    seq = F.col("s")
    seq_start = seq.cast("long") * capacity  # global offset where s begins
    slice_start = F.greatest(F.col("tok_offset"), seq_start)
    slice_end = F.least(
        F.col("tok_offset") + F.col("n_tokens"), seq_start + capacity
    )
    return (
        explode_nonempty(
            packed,
            ["id", "tok_offset", "n_tokens"],
            F.sequence("first_seq", "last_seq"), "s",
        )
        .filter(F.col("n_tokens") > 0)
        .select(
            seq.alias("seq_id"),
            "id",
            (slice_start - F.col("tok_offset")).cast("int")
            .alias("doc_tok_start"),
            (slice_start - seq_start).cast("int").alias("seq_tok_start"),
            (slice_end - slice_start).cast("int").alias("n_toks"),
        )
    )
