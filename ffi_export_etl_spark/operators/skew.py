"""Skew mitigation: salted join.

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; explicit salting remains the tool when a single key is so hot
that even split shuffle partitions overwhelm one reducer, or when joining
against a pre-aggregated side where AQE cannot split (e.g. a shuffle-free
cached build side).

``salted_join``: replicate the small side R times (salt 0..R-1), salt the
big side's key with hash(row)%R, join on (key, salt). Row-for-row
equivalent to the unsalted inner/left join on the key — verified by
tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    replication: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``key`` with salt-based key splitting.

    The salt on the big side is xxhash64 over the ROW CONTENT (all
    columns), so one hot key fans across ``replication`` reducers and the
    salt is stable under task retries (monotonically_increasing_id is
    not — a retried task would re-salt rows differently); the small side
    is exploded ``replication`` times (only acceptable because it is
    small — that is the contract).
    """
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(replication))
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(replication)]))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")
