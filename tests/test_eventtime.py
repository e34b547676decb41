"""functions/eventtime.py: the three physical ts encodings must all
normalize to the same exact epoch-microsecond integers."""

import pandas as pd
from pyspark.sql import functions as F

from ffi_export_etl_spark.functions.eventtime import (
    event_micros,
    event_timestamp,
)

US = [0, 1, 999_999, 1_700_000_000_123_456]


def test_event_micros_all_encodings_agree(spark):
    # epoch-nanos BIGINT (the nanosAsLong legacy read of TIMESTAMP(NANOS))
    nanos = spark.createDataFrame(
        [(u * 1000,) for u in US], "ts long"
    )
    # TIMESTAMP_NTZ (the timestamp[us] parquet read)
    ntz = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime(US, unit="us")})
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    # TIMESTAMP (ltz; session tz pinned UTC in session.py)
    ltz = spark.createDataFrame(
        [(u,) for u in US], "u long"
    ).select(F.timestamp_micros("u").alias("ts"))

    for df in (nanos, ntz, ltz):
        got = sorted(
            r[0] for r in df.select(event_micros(df).alias("us")).collect()
        )
        assert got == sorted(US), df.schema.simpleString()

    # event_timestamp round-trips through unix_micros for every encoding
    for df in (nanos, ntz, ltz):
        got = sorted(
            r[0]
            for r in df.select(
                F.unix_micros(event_timestamp(df)).alias("us")
            ).collect()
        )
        assert got == sorted(US), df.schema.simpleString()
