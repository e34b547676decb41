"""Corpus snapshot diff — what changed between two versions of a table.

Incremental pipelines (the curate-stream daemon, nightly re-exports)
need "what did this drop actually change": which documents are new,
which disappeared, which were edited in place. Deduplication stores
answer "have I seen this CONTENT"; this answers the id-level question.

Shape at 100 TB: one narrow digest projection per side (md5 of the text
column — never the text itself — so the join payload is 32 bytes/row),
ONE full-outer equi-join on the id (both sides shuffle on the id once;
AQE broadcast-converts a small side at runtime), and a tiny status
aggregation. No text ever crosses the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status) for every id in either snapshot: 'added' (new side
    only), 'removed' (old side only), 'changed' (both, different text
    digest), 'unchanged'. The digest prepends a null-flag character
    ('N' for NULL, 'V' for a value) so NULL, empty, and any literal
    text are all pairwise distinct — no sentinel value a real document
    could collide with.
    """
    def _digest(col):
        return F.md5(
            F.encode(
                F.concat(
                    F.when(F.col(col).isNull(), F.lit("N")).otherwise(
                        F.lit("V")
                    ),
                    F.coalesce(F.col(col), F.lit("")),
                ),
                "UTF-8",
            )
        )

    o = old.select(F.col(id_col).alias("id"), _digest(text_col).alias("_ho"))
    n = new.select(F.col(id_col).alias("id"), _digest(text_col).alias("_hn"))
    return o.join(n, "id", "full_outer").select(
        "id",
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def corpus_diff_counts(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(status, n_docs, min_id, max_id) rollup of :func:`corpus_diff` —
    the four-row report a drift dashboard consumes. Statuses with no
    rows are absent (count them as 0)."""
    return (
        corpus_diff(old, new, id_col=id_col, text_col=text_col)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
    )
