"""One-pass table profiling — data-quality stats for pipeline audits.

The reference audits row-count deltas only (parser/xml.py:665-697); a
training-data pipeline also wants per-column health: null ratios and
cardinality estimates, computed in ONE scan regardless of column count.
Distinct counts use the HLL++ sketch (approx_count_distinct) — bounded
memory at any scale; exact distinct per column would be one shuffle EACH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """(column, n_rows, n_nonnull, approx_distinct, min_val, max_val) —
    one aggregation job over all columns (4 aggregates per column + one
    count, all map-side combined), then a driver-side unpivot of the
    single result row. min/max are rendered as strings so the unpivoted
    schema is uniform across column types (the order used is each
    column's native one). Portability caveat: integers and strings
    render identically on every engine, but FLOAT/DOUBLE min/max go
    through Java's Double.toString (scientific notation for very
    large/small magnitudes), which DuckDB renders differently — an
    oracle pin over a table with floating-point columns would drift.
    Pre-format such columns (e.g. format_number / printf with fixed
    precision) before profiling when cross-engine string equality
    matters; the registered prof_pack profiles int/string columns only."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in df.columns:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd).alias(f"ad_{c}")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"mx_{c}"))
    row = df.agg(*aggs)
    stack_args = []
    for c in df.columns:
        stack_args += [
            F.lit(c),
            F.col(f"nn_{c}"),
            F.col(f"ad_{c}"),
            F.col(f"mn_{c}"),
            F.col(f"mx_{c}"),
        ]
    n_cols = len(df.columns)
    return row.select(
        F.col("_n").alias("n_rows"),
        F.stack(
            F.lit(n_cols), *stack_args
        ).alias("column", "n_nonnull", "approx_distinct", "min_val", "max_val"),
    ).select(
        "column", "n_rows", "n_nonnull", "approx_distinct",
        "min_val", "max_val",
    )
