"""Table-profiling gate query (operators/profile.py).

profile_table's cardinality column is an HLL++ sketch
(approx_count_distinct) — deliberately not replayable in another engine,
so the driver pin works in two layers:

- n_rows / n_nonnull come straight from profile_table's single-scan
  aggregation and are value-hashed exactly;
- the HLL estimate is checked against an exact-distinct twin computed in
  the same query (multi count-distinct, one Catalyst expand) and exposed
  as ``hll_ok`` = |approx - exact| / exact <= 3*rsd, which the oracle
  pins to TRUE for every column. Deterministic: HLL++ on identical input
  yields the identical estimate.

At 100 TB only profile_table runs (2 aggs/column, map-side combined, one
scan); the exact-distinct twin here is the verification harness, not the
scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import profile_table
from ..sources.parquet import load_table

RSD = 0.05
TOL = 3 * RSD


def prof_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per documents column: exact counts from the one-scan
    profile + exact distinct + the HLL-within-tolerance flag."""
    d = load_table(spark, sf_dir, "documents")
    prof = profile_table(d, rsd=RSD)
    exact = d.agg(
        *[F.count_distinct(F.col(c)).alias(c) for c in d.columns]
    )
    stack_args = []
    for c in d.columns:
        stack_args += [F.lit(c), F.col(c)]
    exact_long = exact.select(
        F.stack(F.lit(len(d.columns)), *stack_args).alias(
            "column", "n_distinct"
        )
    )
    return prof.join(exact_long, "column").select(
        "column",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        "min_val",
        "max_val",
        (
            F.abs(F.col("approx_distinct") - F.col("n_distinct"))
            / F.greatest(F.col("n_distinct"), F.lit(1))
            <= TOL
        ).alias("hll_ok"),
    )


QUERIES = {"prof_pack": prof_pack}

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_ARMS = "\n        UNION ALL\n".join(
    f"""        SELECT '{c}' AS "column", count(*) AS n_rows,
               count({c}) AS n_nonnull,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val,
               TRUE AS hll_ok
        FROM documents"""
    for c in _DOC_COLS
)

ORACLE = {"prof_pack": _ARMS}
