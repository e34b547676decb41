"""Partitioned-table layout: writes partitioned by a filter column let
Catalyst prune entire directories at plan time (PartitionFilters in the
scan) — at 100 TB this is the difference between scanning one event type
and scanning everything."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_partitioned_write_prunes_scan(spark, sf_small, tmp_path):
    target = str(tmp_path / "events_by_type")
    events = spark.read.parquet(f"{sf_small}/events.parquet")
    events.write.partitionBy("event_type").mode("overwrite").parquet(target)

    filtered = spark.read.parquet(target).filter(
        F.col("event_type") == "purchase"
    )
    n = filtered.count()
    plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "simple"
    )
    assert "PartitionFilters: [isnotnull(event_type" in plan or (
        "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]
    ), plan
    expected = events.filter(F.col("event_type") == "purchase").count()
    assert n == expected
