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
from ..functions.eventtime import event_timestamp
from ..streaming.events import (
    events_stream_schema,
    interval_join_streams,
    read_events_stream,
    run_to_completion,
    stage_with_late_filler,
    windowed_counts,
)

JOIN_BOUND = "2 hours"  # click -> purchase attribution horizon
JOIN_BOUND_US = 2 * 3600 * 10**6


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


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (10 min window / 5 min slide) counts in APPEND mode
    with a 30-minute watermark — the late-data-bounded streaming shape:
    only windows the watermark has closed are emitted, exactly once, and
    state for them is evicted (bounded state on unbounded streams).

    Emission semantics this oracle replays (pinned empirically and by
    tests/test_streaming.py): a window is emitted iff
    window.end <= max(event_time) - delay, computed in MICROSECONDS
    (Spark's watermark works on the micro-truncated event time). The
    source is staged with a trailing all-late filler batch
    (streaming/events.py stage_with_late_filler) because the watermark
    advances one micro-batch late — without a second batch an
    availableNow run terminates before emitting anything. The filler row
    is excluded from the aggregation by predicate."""
    events = table_path(sf_dir, "events")
    src_dir = stage_with_late_filler(events)
    stream = (
        spark.readStream.schema(events_stream_schema(spark, events))
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_dir)
    )
    stream = stream.withColumn("ts_micro", event_timestamp(stream))
    agg = windowed_counts(
        stream.filter(F.col("event_type") != "__filler__"),
        window="10 minutes",
        slide="5 minutes",
        watermark="30 minutes",
    )
    result = run_to_completion(agg, output_mode="append")
    return result.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n_events",
        F.col("value_sum").cast("double").alias("value_sum"),
    )


def stream_joined_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'joined' arm: watermarked stream-stream interval join — each
    click joined to the purchases the same user makes within JOIN_BOUND
    (streaming/events.interval_join_streams), run as a REAL streaming
    query (two independent file-source streams, availableNow -> memory
    sink). Inner matches emit as soon as both sides arrive, so on
    bounded input the drained pair set equals the batch interval join —
    that equality IS Structured Streaming's incremental-execution
    promise, and the DuckDB oracle replays it directly. The drained
    pairs are then reshaped BATCH-side onto the pack grain (5-minute
    click windows; purchase value sums), so the streaming query under
    test is the join itself, not a chained stateful aggregation."""
    events = table_path(sf_dir, "events")
    # The oracle is the unrestricted batch interval join, so the gate
    # arm's correctness must not depend on the source's physical file
    # layout (ADVICE r8): under multi-file micro-batch pacing, a
    # click/purchase pair split across batches with more cross-file
    # event-time disorder than the watermark is state-evicted
    # stream-side while the oracle keeps it. Derive a watermark
    # covering the dataset's full event-time span (one tiny min/max
    # aggregate — a driver-side scalar, bounded at any SF) so no
    # in-bound pair can ever drop; 30 minutes stays the production
    # default (interval_join_streams docstring), where late data is
    # MEANT to be dropped.
    ebatch = spark.read.parquet(events)
    lo, hi = (
        ebatch.select(
            F.unix_micros(F.min(event_timestamp(ebatch))),
            F.unix_micros(F.max(event_timestamp(ebatch))),
        ).first()
    )
    # empty table -> min/max are NULL; any watermark gives the same
    # (empty) result, keep the production default (review r8)
    span_minutes = (
        int((hi - lo) // 60_000_000) + 60 if hi is not None else 30
    )
    clicks = read_events_stream(spark, events).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, events).filter(
        F.col("event_type") == "purchase"
    )
    joined = interval_join_streams(
        clicks, purchases, key="user_id",
        bound=JOIN_BOUND, watermark=f"{span_minutes} minutes",
    )
    pairs = joined.select(
        F.col("l.ts_micro").alias("click_ts"),
        F.col("r.value").alias("purchase_value"),
    )
    result = run_to_completion(pairs, output_mode="append")
    return result.groupBy(
        F.window("click_ts", "5 minutes").alias("window")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.col("purchase_value").cast("decimal(12,2)")
        ).alias("value_sum"),
    ).select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        F.lit("click_purchase").alias("event_type"),
        "n_events",
        F.col("value_sum").cast("double").alias("value_sum"),
    )


def stream_window_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two windowed-count streaming shapes union-tagged into one slot
    (identical grain: window_start_us, event_type, n_events, value_sum):

    'tumbling' rows — stream_5min_counts (complete-mode 5-minute tumbling
    windows, the unconditional-emission contract).

    'sliding' rows — stream_sliding_counts (append-mode 10/5 sliding
    windows under a 30-minute watermark, the late-data-bounded emission
    contract: only watermark-closed windows appear, exactly once).

    'joined' rows (r7) — stream_joined_counts (watermarked stream-stream
    interval join, click -> purchase within JOIN_BOUND, reshaped onto
    the pack grain).

    All arms still run as REAL streaming queries to completion; the fold
    only unions their batch results, so every emission semantics stays
    driver-pinned while freeing a registry slot (precedent: q_count_pack,
    ann_cell_pack)."""
    tumbling = stream_5min_counts(spark, sf_dir).select(
        F.lit("tumbling").alias("arm"), "*"
    )
    sliding = stream_sliding_counts(spark, sf_dir).select(
        F.lit("sliding").alias("arm"), "*"
    )
    joined = stream_joined_counts(spark, sf_dir).select(
        F.lit("joined").alias("arm"), "*"
    )
    return tumbling.unionByName(sliding).unionByName(joined)


QUERIES = {
    "stream_window_pack": stream_window_pack,
    "stream_dedup_keys": stream_dedup_keys,
}

# Sliding windows: each event belongs to two 10-min windows (its 5-min
# bucket start and the one 5 min earlier). Append-mode emission:
# window end <= watermark = micro-truncated max event time - 30 min
# (integer microsecond arithmetic; <= is the pinned Spark behavior).
ORACLE = {
    "stream_window_pack": f"""
        WITH m AS (SELECT epoch_ns(max(ts)) // 1000 AS max_us FROM events),
        w AS (
            SELECT event_type, value,
                   unnest([
                       time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts)
                           - INTERVAL '5 minutes'
                   ]) AS win_start
            FROM events
        )
        SELECT 'tumbling' AS arm,
               epoch_us(time_bucket(INTERVAL '5 minutes', ts))
                   AS window_start_us,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        FROM events
        GROUP BY 2, 3
        UNION ALL
        SELECT 'sliding', epoch_us(win_start), event_type,
               count(*),
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
        FROM w, m
        GROUP BY 2, 3, m.max_us
        HAVING epoch_us(win_start) + 600000000 <= max_us - 1800000000
        UNION ALL
        SELECT 'joined',
               epoch_us(time_bucket(INTERVAL '5 minutes', l.ts)),
               'click_purchase',
               count(*),
               CAST(sum(CAST(r.value AS DECIMAL(12,2))) AS DOUBLE)
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND l.event_type = 'click' AND r.event_type = 'purchase'
         -- compare in MICROS like the stream (ts_micro is the
         -- micro-truncated event time whatever the physical encoding)
         AND epoch_ns(r.ts) // 1000 >= epoch_ns(l.ts) // 1000
         AND epoch_ns(r.ts) // 1000 <= epoch_ns(l.ts) // 1000
                                       + {JOIN_BOUND_US}
        GROUP BY 2
    """,
    "stream_dedup_keys": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
}
