"""Event-time normalization robust to the physical ``ts`` encoding.

The ``events`` table has shipped with two physical schemas across test
data generations:

- ``TIMESTAMP(NANOS)`` — Spark's vectorized reader rejects it, so
  session.py sets ``spark.sql.legacy.parquet.nanosAsLong`` and the column
  arrives as epoch-nanoseconds BIGINT;
- ``timestamp[us]`` — arrives as TIMESTAMP_NTZ (no UTC-adjustment flag in
  the footer).

Every event-time computation in the engine goes through these helpers so
the queries are schema-generation-proof. The canonical internal
representation is **exact integer epoch microseconds** (BIGINT): DuckDB's
TIMESTAMP is microsecond-precision, so integer-us arithmetic is
bit-identical across engines and immune to session-timezone rendering.

The NTZ path uses ``timestampdiff(MICROSECOND, epoch, ts)`` — pure
wall-clock arithmetic with no timezone conversion, matching DuckDB's
``epoch_us(ts)`` on a naive timestamp exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def event_micros(df: DataFrame, src: str = "ts") -> Column:
    """Exact epoch-microseconds BIGINT from ``src``, whatever its physical
    type (works on batch and streaming DataFrames — only the schema is
    consulted)."""
    dt = dict(df.dtypes)[src]
    if dt in ("bigint", "long"):
        # epoch-nanos BIGINT (legacy TIMESTAMP(NANOS) via nanosAsLong).
        # FLOOR division, not `div` (which truncates toward zero): a
        # pre-epoch timestamp with sub-microsecond residue must round
        # DOWN to agree with the NTZ path's exact microsecond arithmetic.
        # pmod(ts, 1000) is in [0, 999], so the subtraction yields the
        # exact multiple of 1000 at-or-below ts — all integer math (a
        # double `/` would lose precision above 2^53 nanos ~ 1970+3 months).
        return F.expr(f"({src} - pmod({src}, 1000)) div 1000")
    if dt == "timestamp_ntz":
        # timezone-free wall-clock diff == DuckDB epoch_us(naive ts)
        return F.expr(
            f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {src})"
        )
    # TIMESTAMP (ltz): session timezone is pinned UTC (session.py)
    return F.unix_micros(F.col(src))


def event_timestamp(df: DataFrame, src: str = "ts") -> Column:
    """TIMESTAMP (ltz, session tz pinned UTC) column for window/watermark
    operators, derived from the exact integer microseconds so both
    physical encodings produce the identical column."""
    return F.timestamp_micros(event_micros(df, src))
