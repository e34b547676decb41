"""Fifth batch: array/map function pack and the tolerance range join
(bucket+refine). (Cube moved into packs.a_rollup_cube; k-means ANN
lives in similarity_q.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.eventtime import event_micros
from ..operators.rangejoin import tolerance_join
from ..sources.parquet import load_table
from ._util import dec, money



def f_array_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map function pack over tokenized documents: intersect/except
    against a fixed vocabulary, zip positions, build a map and read it
    back — the collection-function surface the reference never had."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.array_distinct(F.split(F.col("text"), r"\s+"))
    vocab = F.array(*[F.lit(w) for w in ("spark", "table", "query", "join")])
    inter = F.array_sort(F.array_intersect(toks, vocab))
    exc = F.array_sort(F.array_except(vocab, toks))
    m = F.map_from_arrays(
        F.array(F.lit("first"), F.lit("n")),
        F.array(
            F.element_at(F.array_sort(toks), 1),
            F.size(toks).cast("string"),
        ),
    )
    return d.select(
        "doc_id",
        F.array_join(inter, ",").alias("vocab_hits"),
        F.array_join(exc, ",").alias("vocab_misses"),
        F.element_at(m, "first").alias("first_token"),
        F.element_at(m, "n").cast("int").alias("n_distinct"),
    )


def j_tolerance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance range join (operators/rangejoin.py): error events within
    60s of each purchase, counted per purchase — bucket+refine, no cross
    product. Oracle: plain inequality join (fine at oracle scale)."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("ts_us", event_micros(ev))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts_us").alias("p_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts_us").alias("e_ts")
    )
    pairs = tolerance_join(purchases, errors, "p_ts", "e_ts", 60 * 10**6)
    return pairs.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_errors_60s"),
        F.min("error_id").alias("first_error_id"),
    )


QUERIES = {
    "f_array_map_pack": f_array_map_pack,
    "j_tolerance_pairs": j_tolerance_pairs,
}

ORACLE = {
    "f_array_map_pack": """
        WITH t AS (
            SELECT doc_id,
                   list_distinct(regexp_split_to_array(text, '\\s+')) AS toks
            FROM documents WHERE doc_id < 100
        )
        SELECT doc_id,
               coalesce(array_to_string(list_sort(list_intersect(toks,
                   ['spark','table','query','join'])), ','), '')
                   AS vocab_hits,
               coalesce(array_to_string(list_sort(list_filter(
                   ['spark','table','query','join'],
                   x -> NOT list_contains(toks, x))), ','), '')
                   AS vocab_misses,
               list_sort(toks)[1] AS first_token,
               CAST(len(toks) AS INTEGER) AS n_distinct
        FROM t
    """,
    "j_tolerance_pairs": """
        SELECT p.event_id AS purchase_id,
               count(*) AS n_errors_60s,
               min(e.event_id) AS first_error_id
        FROM (SELECT event_id, epoch_us(ts) AS p_ts FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT event_id, epoch_us(ts) AS e_ts FROM events
              WHERE event_type = 'error') e
          ON abs(p.p_ts - e.e_ts) <= 60000000
        GROUP BY p.event_id
    """,
}
