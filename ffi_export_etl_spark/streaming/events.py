"""Structured Streaming over the events table (SURVEY.md section 2.8
extension surface: the reference is batch-only; its processed-file
tracking xml_to_rdb.py:51-56 and append-only audit log parser/xml.py:
681-695 are natively covered by the file source + sinks here).

Patterns provided:
- file-source reader with explicit schema (streams never infer),
- tumbling/sliding window aggregation with optional watermark,
- run-to-completion helper (availableNow + memory sink) that turns a
  bounded stream into a DataFrame — used for oracle-checked streaming
  queries and tests.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions.eventtime import event_timestamp


def events_stream_schema(spark: SparkSession, path: str) -> StructType:
    """Explicit schema for the events file stream (streams never infer).

    Probed from the parquet footer by a one-off batch read so the stream
    matches whichever physical ts encoding this data generation uses
    (epoch-nanos BIGINT under nanosAsLong, or TIMESTAMP_NTZ for
    micro-precision files). Footer-only — no data is scanned.
    """
    return spark.read.parquet(path).schema


def stage_as_dir(path: str) -> str:
    """The file stream source requires a *directory*; stage a single file
    behind a temp dir of symlinks (no data copy)."""
    if os.path.isdir(path):
        return path
    d = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    return d


def stage_with_late_filler(path: str) -> str:
    """Stage a single parquet file as a TWO-file stream-source dir: the
    real file plus a tiny filler file whose only row is maximally late
    (ts = epoch 0), mtime-ordered strictly after the real file.

    Why: Spark advances the event-time watermark at micro-batch
    boundaries — one batch late. A bounded single-file availableNow
    stream therefore terminates with the watermark still at its initial
    value and an append-mode windowed aggregation emits NOTHING. With
    maxFilesPerTrigger=1 the filler forms a second micro-batch that runs
    under the watermark computed from the real data, flushing every
    closed window; the filler row itself falls far below that watermark
    and is discarded by the late-data filter, so it never appears in any
    aggregate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="stream_src_wm_")
    real = os.path.abspath(path)
    if os.path.isdir(real):
        # sorted => the probed file is deterministic; all part files of
        # one table share a schema, so any one is representative
        inner = sorted(f for f in os.listdir(real) if f.endswith(".parquet"))
        if not inner:
            raise ValueError(
                f"no .parquet files under {real!r} — cannot probe the "
                "events ts physical type"
            )
        ts_type = pq.read_schema(os.path.join(real, inner[0])).field("ts").type
    else:
        ts_type = pq.read_schema(real).field("ts").type
    os.symlink(real, os.path.join(d, os.path.basename(path)))
    filler = os.path.join(d, "zz_late_filler.parquet")
    # filler ts matches the real file's physical type; 0 == epoch either way
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([-1], pa.int64()),
                "ts": pa.array([0]).cast(ts_type),
                "user_id": pa.array([-1], pa.int64()),
                "event_type": pa.array(["__filler__"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array([None], pa.string()),
            }
        ),
        filler,
    )
    # the file source orders batches by modification time; pin the filler
    # into the future so it is always the LAST micro-batch
    future = os.stat(os.path.abspath(path)).st_mtime + 3600
    os.utime(filler, (future, future))
    return d


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over parquet events (one file per micro-batch
    by default; maxFilesPerTrigger tunes ingest pacing). Adds ``ts_micro``
    (TimestampType, exact epoch micros) whatever the physical ``ts``."""
    stream = (
        spark.readStream.schema(events_stream_schema(spark, path))
        .format("parquet")
        .load(stage_as_dir(path))
    )
    return stream.withColumn("ts_micro", event_timestamp(stream))


def windowed_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) window counts + value sums per event_type."""
    src = stream.withWatermark("ts_micro", watermark) if watermark else stream
    win = (
        F.window("ts_micro", window, slide)
        if slide
        else F.window("ts_micro", window)
    )
    return src.groupBy(win, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("value_sum"),
    )


def run_to_completion(
    aggregated: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Drain a bounded stream (availableNow) into a memory sink and return
    the final result as a batch DataFrame. Complete mode emits every
    window regardless of watermark — deterministic on bounded input."""
    name = f"stream_result_{uuid.uuid4().hex[:12]}"
    q = (
        aggregated.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = aggregated.sparkSession
    return spark.table(name)
