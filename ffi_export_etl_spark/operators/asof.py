"""As-of (point-in-time) join without a cross product.

Spark has no native ASOF JOIN. The scalable formulation is union + window:
tag both sides, union them, and per key take the last right-side row at or
before each left row's timestamp. One shuffle on (key), no range cross
product, no per-row driver work — survives arbitrarily large sides as long
as single keys fit a partition (AQE skew-split handles hot keys).

Equivalent DuckDB oracle: ``left ASOF LEFT JOIN right ON l.key = r.key AND
l.ts >= r.ts`` (inclusive match, latest right wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts on the same key (inclusive, ASOF semantics).

    Returns all left columns plus ``right_cols`` (null when no match).
    ``tiebreak`` orders right rows sharing one timestamp (last wins);
    without it, equal-timestamp right rows are ambiguous — pass one.
    """
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tb"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    ).withColumn("_side", F.lit(0))

    lt = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_tb", F.lit(None).cast("long"))
        .withColumn("_side", F.lit(1))
    )

    # allowMissingColumns fills left-only columns with nulls on the right
    # side and _r with nulls on the left side.
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    # Right rows sort before left rows at equal timestamps (_side 0 < 1), so
    # an equal-ts right row is visible to the left row — inclusive ASOF.
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = (
        unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out = matched
    for c in right_cols:
        out = out.withColumn(c, F.col("_match").getField(c))
    return out.drop("_match", "_side", "_ts", "_tb")
