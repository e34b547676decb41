"""DuckDB-oracle comparison mirroring the driver's correctness gate:
row-count + schema (column names) + order-insensitive value equality with
columns sorted by name. We assert EXACT value equality (the decimal/int
strategies in the query library are designed for bit-identical results);
any mismatch prints a diff sample for debugging.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from ffi_export_etl_spark.sources.parquet import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        else:
            # decimals/np floats/bools -> canonical python types via str
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def compare_to_oracle(spark_df, sql: str, sf_dir: str) -> None:
    mine = _normalize(spark_df.toPandas())
    con = duck_connection(sf_dir)
    try:
        theirs = _normalize(con.execute(sql).fetchdf())
    finally:
        con.close()

    assert list(mine.columns) == list(theirs.columns), (
        f"column mismatch: spark={list(mine.columns)} oracle={list(theirs.columns)}"
    )
    assert len(mine) == len(theirs), (
        f"row count mismatch: spark={len(mine)} oracle={len(theirs)}"
    )
    for c in mine.columns:
        a, b = mine[c], theirs[c]
        # Driver-grade strictness: the driver stringifies values before
        # hashing, so an int64 109025541 vs float64 109025541.0 hashes
        # differently even though == forgives it (the r4 red gate row,
        # DuckDB HUGEINT). Numeric kind must match exactly.
        ka, kb = a.dtype.kind, b.dtype.kind
        numeric = {"i", "u", "f"}
        if (ka in numeric or kb in numeric) and (
            (ka in "iu") != (kb in "iu") or (ka == "f") != (kb == "f")
        ):
            raise AssertionError(
                f"dtype kind mismatch in column {c!r}: spark dtype={a.dtype} "
                f"oracle dtype={b.dtype} — int-vs-float drift would fail the "
                f"driver's stringify-then-hash gate even when values are equal"
            )
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            bad = (~eq).idxmax()
            raise AssertionError(
                f"value mismatch in column {c!r} at sorted row {bad}: "
                f"spark={a[bad]!r} oracle={b[bad]!r} "
                f"(types {type(a[bad]).__name__}/{type(b[bad]).__name__}; "
                f"{int((~eq).sum())} rows differ)"
            )
