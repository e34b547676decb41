"""Registry-wide oracle type sweep (judge r4 item 2).

DuckDB widens sum(BIGINT) to HUGEINT, which fetches into pandas as
float64 and breaks the driver's stringify-then-hash value compare
against Spark's int64 even when values are numerically identical (the
r4 ``text_langfp_pack`` red row).  This sweep DESCRIBEs every oracle —
planning only, no execution — and bans HUGEINT/UHUGEINT output columns
so the drift can never reach the gate again.  The Spark-vs-DuckDB
dtype-kind match for the *fetched* frames is enforced by
``tests/oracle_utils.compare_to_oracle`` on the real sf0.01 runs.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import duck_connection

ORACLE = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duck_connection(sf_small)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_has_no_hugeint_columns(duck, name):
    desc = duck.execute(f"DESCRIBE {ORACLE[name]}").fetchall()
    offenders = [
        (col, typ) for col, typ, *_ in desc if "HUGEINT" in typ.upper()
    ]
    assert not offenders, (
        f"{name}: oracle output column(s) {offenders} are HUGEINT — DuckDB "
        f"fetches these as float64, which fails the driver's stringified "
        f"hash against Spark ints; CAST them (e.g. AS BIGINT) in the oracle"
    )


def test_round2_double_matches_oracle_arithmetic(spark):
    """r11: Spark's round() rounds a double's shortest-decimal string,
    DuckDB rounds the binary value — an interpolated percentile on a
    .xx5 midpoint diverges by 0.01 (found live: sf0.001 customer
    nationkey=1 median). _round2_double reproduces the oracle's
    multiply-then-half-away fold; pin it against DuckDB's answers on
    the adversarial midpoints, both signs, plus the live case."""
    import duckdb
    from pyspark.sql import functions as F

    from ffi_export_etl_spark.queries.packs import _round2_double

    cases = [
        (4013.54 + 5289.01) / 2,  # the live sf0.001 tie: -> 4651.27
        2.675, 2.665, 0.125, -2.675, -0.125, 1.005, -1.005, 2.5,
        9302.55, 0.0,
        # r12 (ADVICE r11): scaled value half-an-ULP BELOW the .5
        # midpoint — naive floor(x*100+0.5) carries up to 0.01 where C
        # round() (DuckDB) gives 0.0; both signs
        0.0049999999999999994, -0.0049999999999999994,
    ]
    con = duckdb.connect()
    expected = [
        con.execute("SELECT round(CAST(? AS DOUBLE), 2)", [x]).fetchone()[0]
        for x in cases
    ]
    df = spark.createDataFrame([(x,) for x in cases], "x double")
    got = [
        r["r"]
        for r in df.select(_round2_double(F.col("x")).alias("r")).collect()
    ]
    assert got == expected
    # NULL propagates
    nul = spark.createDataFrame([(None,)], "x double").select(
        _round2_double(F.col("x")).alias("r")
    ).collect()
    assert nul[0]["r"] is None
