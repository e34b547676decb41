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
