"""Interval (tolerance) join without a cross product: bucket + refine.

Joining two event streams on |t_left - t_right| <= tolerance has no equi
key, so a naive join is a cross product. The scalable pattern: bucket both
sides by floor(ts / tolerance); a qualifying pair's buckets differ by at
most 1, so joining on bucket IN {b-1, b, b+1} (via a 3-way explode of the
smaller side) + refining with the exact predicate touches only
neighboring buckets. Shuffle volume is O(n) x 3 instead of O(n^2).

Same technique generalizes to value ranges (price bands, geo tiles) —
bucket width = tolerance is the locality knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tolerance_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance: int,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with |left_ts - right_ts| <= tolerance
    (integer timestamps, e.g. epoch micros). Right side is exploded to
    its bucket and both neighbors — keep the smaller side on the right.
    """
    lb = left.withColumn("_b", F.expr(f"{left_ts} div {tolerance}"))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.array(
                F.expr(f"{right_ts} div {tolerance} - 1"),
                F.expr(f"{right_ts} div {tolerance}"),
                F.expr(f"{right_ts} div {tolerance} + 1"),
            )
        ),
    )
    joined = lb.join(rb, "_b", how).filter(
        F.abs(F.col(left_ts) - F.col(right_ts)) <= tolerance
    )
    return joined.drop("_b")
