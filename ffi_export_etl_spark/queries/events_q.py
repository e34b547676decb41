"""Event-stream batch queries: JSON extraction, time rollups,
sessionization, as-of join (extension surface, SURVEY.md section 2.8).

All event-time arithmetic happens in exact integer MICROseconds via
functions/eventtime.py, which normalizes whichever physical encoding the
events.ts column ships with (epoch-nanos BIGINT or TIMESTAMP_NTZ) —
DuckDB's TIMESTAMP is microsecond-precision, so integer-us math is
bit-identical across engines and immune to session-timezone rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.eventtime import event_micros, event_timestamp
from ..operators.asof import asof_join
from ..sources.parquet import load_table
from ._util import dec, money

US_PER_HOUR = 3600 * 10**6
US_PER_SEC = 10**6


def _with_ts_us(ev: DataFrame) -> DataFrame:
    return ev.withColumn("ts_us", event_micros(ev))


IV_LEN_US = 90 * 60 * 10**6   # interval arm: 90-minute windows
IV_BIN_US = 30 * 60 * 10**6   # bin width ~ len/3: fan-out 3-4 bins/interval


def evt_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both JSON property-extraction paths over events.props plus the
    bin-bucketed interval join, union-tagged into one slot: 'extract' =
    get_json_object (path extraction, string in/out), 'typed' =
    from_json with a declared schema (schema-on-read typed struct),
    'interval' = operators/rangejoin.interval_join of every event onto
    the 90-minute window opening at each event type's first event (pure
    range, no equality key — the oracle replays it as a direct
    inequality join, pinning the bin/explode/filter mechanics). All
    JVM-side, no Python in the loop."""
    from ..operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    extract = ev.select(
        F.lit("extract").alias("kind"),
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.lit(None).cast("bigint").alias("k_mod10"),
    )
    parsed = F.from_json(F.col("props"), "k BIGINT")
    typed = ev.select(
        F.lit("typed").alias("kind"),
        "event_id",
        F.lit(None).cast("string").alias("event_type"),
        parsed.getField("k").alias("k"),
        (parsed.getField("k") % 10).alias("k_mod10"),
    )
    ev_us = _with_ts_us(ev)
    iv = ev_us.groupBy(F.col("event_type").alias("iv_type")).agg(
        F.min("ts_us").alias("ivs")
    ).withColumn("ive", F.col("ivs") + F.lit(IV_LEN_US))
    pairs = interval_join(
        ev_us.select("event_id", "ts_us"), iv,
        "ts_us", "ivs", "ive", IV_BIN_US,
    )
    ranged = pairs.select(
        F.lit("interval").alias("kind"),
        "event_id",
        F.col("iv_type").alias("event_type"),
        F.lit(None).cast("bigint").alias("k"),
        F.lit(None).cast("bigint").alias("k_mod10"),
    )
    return extract.unionByName(typed).unionByName(ranged)


def evt_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour rollup per event type: counts + exact decimal sums.
    Hour bucket = epoch-micros div us/hour (exact integer division)."""
    ev = _with_ts_us(load_table(spark, sf_dir, "events"))
    return (
        ev.withColumn("hour_bucket", F.expr(f"ts_us div {US_PER_HOUR}"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money(F.sum(dec("value")), "value_sum"),
        )
    )


def evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with a 30-minute inactivity gap (the batch
    analog of a streaming session window): lag -> new-session flag ->
    running sum -> per-session rollup. Two window passes over ONE
    per-user partitioning — a single shuffle on user_id."""
    ev = _with_ts_us(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = F.col("ts_us") - F.lag("ts_us").over(w)
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull() | (gap_us > 1800 * US_PER_SEC), 1
        ).otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_id", F.sum("new_s").over(run))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("int").alias("session_id"),
            "n_events",
            "session_start_us",
            "session_end_us",
        )
    )


def evt_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at or
    before it (operators/asof.py: union+window, no range cross product)."""
    ev = _with_ts_us(load_table(spark, sf_dir, "events"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts_us"),
        F.col("event_id").alias("click_id"),
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts_us",
        right_ts="ts_us",
        right_cols=["click_id"],
        tiebreak="click_id",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        "click_id",
    )


def evt_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.session_window (30-min gap) in batch mode — same semantics
    as evt_sessionize but expressed through Spark's built-in session
    windows (works identically over a stream). Window end = last event +
    gap, so the oracle adds the gap to its computed session end."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("ts_micro", event_timestamp(ev))
        .groupBy(F.session_window("ts_micro", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("start_us"),
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            "n_events",
        )
    )


QUERIES = {
    "evt_json_pack": evt_json_pack,
    "evt_hourly_rollup": evt_hourly_rollup,
    "evt_sessionize": evt_sessionize,
    "evt_asof_last_click": evt_asof_last_click,
    "evt_session_window_native": evt_session_window_native,
}

ORACLE = {
    "evt_json_pack": f"""
        SELECT 'extract' AS kind, event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(NULL AS BIGINT) AS k_mod10
        FROM events
        UNION ALL
        SELECT 'typed', event_id, CAST(NULL AS VARCHAR),
               CAST(json_extract_string(props, '$.k') AS BIGINT),
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
        FROM events
        UNION ALL
        SELECT 'interval', e.event_id, i.iv_type,
               CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM events e
        JOIN (SELECT event_type AS iv_type, min(epoch_us(ts)) AS ivs
              FROM events GROUP BY 1) i
          ON epoch_us(e.ts) >= i.ivs
         AND epoch_us(e.ts) < i.ivs + {IV_LEN_US}
    """,
    "evt_hourly_rollup": f"""
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour_bucket,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1, 2
    """,
    "evt_sessionize": f"""
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > {1800 * US_PER_SEC}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), sess AS (
            SELECT user_id, event_id, ts_us,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
               count(*) AS n_events,
               min(ts_us) AS session_start_us,
               max(ts_us) AS session_end_us
        FROM sess GROUP BY user_id, session_id
    """,
    "evt_asof_last_click": """
        SELECT p.event_id AS purchase_id, p.user_id,
               epoch_us(p.ts) AS purchase_ts_us,
               c.click_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id FROM events
                        WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "evt_session_window_native": f"""
        WITH flagged AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                > {1800 * US_PER_SEC}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        ), sess AS (
            SELECT user_id, ts_us,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id,
               min(ts_us) AS start_us,
               max(ts_us) + {1800 * US_PER_SEC} AS end_us,
               count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
}
