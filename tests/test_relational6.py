"""The 8 non-registered TPC-H shapes (queries/relational6.py) pinned
against full DuckDB oracles at sf0.01 — completing 22/22 TPC-H shape
coverage (14 driver-registered + these 8)."""

from __future__ import annotations

import pytest

from ffi_export_etl_spark.queries import relational6
from tests.oracle_utils import compare_to_oracle

NAMES = sorted(relational6.QUERIES)


def test_every_extra_shape_has_an_oracle():
    assert set(relational6.ORACLE) == set(relational6.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, sf_oracle, name):
    df = relational6.QUERIES[name](spark, sf_oracle)
    compare_to_oracle(df, relational6.ORACLE[name], sf_oracle)


@pytest.mark.parametrize("name", NAMES)
def test_nondegenerate_at_oracle_sf(spark, sf_oracle, name):
    """Each shape exercises its operator for real: at least one row (the
    filters were chosen against the synthetic value domains)."""
    assert relational6.QUERIES[name](spark, sf_oracle).count() > 0