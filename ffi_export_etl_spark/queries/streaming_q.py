"""Streaming queries run to completion on the bounded events table, then
oracle-checked against plain batch SQL — streaming/batch result parity is
exactly what Structured Streaming's incremental execution promises.

5-minute windows are used because every real timezone offset is a multiple
of 15 minutes, so wall-clock window boundaries match the naive-timestamp
DuckDB oracle under any session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import table_path
from ..streaming.events import read_events_stream, run_to_completion, windowed_counts


def stream_5min_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windowed counts/sums computed by a real streaming
    query (availableNow -> memory sink), returned as a batch DataFrame."""
    stream = read_events_stream(spark, table_path(sf_dir, "events"))
    agg = windowed_counts(stream, window="5 minutes")
    result = run_to_completion(agg, output_mode="complete")
    return result.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n_events",
        F.col("value_sum").cast("double").alias("value_sum"),
    )


def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup of an at-least-once source: distinct
    (user_id, event_type) keys via dropDuplicatesWithinWatermark — the
    state-bounded streaming dedup operator (state for a key is evicted
    once the watermark passes it, so unbounded streams hold bounded
    state). Run to completion on the bounded events table; only the key
    columns are emitted, so the result is deterministic and
    batch-oracle-checkable (SELECT DISTINCT)."""
    stream = read_events_stream(spark, table_path(sf_dir, "events"))
    deduped = (
        stream.select("user_id", "event_type", "ts_micro")
        .withWatermark("ts_micro", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    result = run_to_completion(deduped, output_mode="append")
    return result.select("user_id", "event_type")


QUERIES = {
    "stream_5min_counts": stream_5min_counts,
    "stream_dedup_keys": stream_dedup_keys,
}

ORACLE = {
    "stream_5min_counts": """
        SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts))
                   AS window_start_us,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 1, 2
    """,
    "stream_dedup_keys": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
}
