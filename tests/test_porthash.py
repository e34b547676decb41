"""Cross-engine portability of the md5 hash family — the load-bearing
assumption behind every sketch oracle (minhash, simhash, sign-LSH,
k-means seeding, multimodal features): Spark, DuckDB, and Python must
produce the SAME integer for the same input string, including unicode,
empty strings, and whitespace."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ffi_export_etl_spark.functions.porthash import (
    MERSENNE31,
    duck_md5_long,
    md5_long,
    perm_coefficients,
    py_md5_long,
)

TRICKY = [
    "hello",
    "",
    " ",
    "the quick brown fox",
    "naïve café ☕ über",        # non-ASCII / multibyte
    "タブ\tと改行\n",             # CJK + control chars
    "0" * 500,                    # long run
    "a'b\"c\\d",                  # quoting hazards
]


@pytest.mark.parametrize("nchars", [8, 15])
def test_three_engines_agree(spark, nchars):
    py = [py_md5_long(s, nchars) for s in TRICKY]

    df = spark.createDataFrame([(s,) for s in TRICKY], ["s"])
    sp = [r[0] for r in df.select(md5_long(F.col("s"), nchars)).collect()]

    con = duckdb.connect()
    dk = [
        con.execute(
            f"SELECT {duck_md5_long('?', nchars)}", [s]
        ).fetchone()[0]
        for s in TRICKY
    ]
    con.close()
    assert sp == py
    assert dk == py


def test_perm_family_in_safe_range():
    # products must stay under 2^63 (DuckDB raises on BIGINT overflow)
    for a, b in perm_coefficients(64):
        assert 0 < a < MERSENNE31 and 0 <= b < MERSENNE31
        assert a * (MERSENNE31 - 1) + b < 2**63
