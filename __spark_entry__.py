"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``ffi_export_etl_spark`` package; this module
only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ffi_export_etl_spark.queries import all_oracle_sql, all_queries
from ffi_export_etl_spark.queries.relational import q5_local_supplier_volume
from ffi_export_etl_spark.session import tune


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-style Q5 (6-table
    join + broadcast dims + grouped exact-decimal aggregation)."""
    tune(spark)
    return q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2 plus the
    LLM-data-pipeline extension surface (dedup_/ann_/text_/evt_/stream_)."""
    base = all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` — one per query,
    including the sketch/ANN/multimodal paths (engine-portable md5-family
    hashing makes them SQL-replayable; no rows-only fallbacks)."""
    return all_oracle_sql()
