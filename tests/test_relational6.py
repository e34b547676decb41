"""The 8 singleton TPC-H shapes (queries/relational6.py) pinned against
full DuckDB oracles at sf0.01 — since r6 they ALSO carry a driver row
via q_shapes_pack (union-tagged with q21/q22); these singleton pins
stay so a pack-arm failure is attributable to one shape."""

from __future__ import annotations

import pytest

from ffi_export_etl_spark.queries import relational6
from tests.oracle_utils import compare_to_oracle

NAMES = sorted(relational6.SHAPE_QUERIES)


def test_every_extra_shape_has_an_oracle():
    assert set(relational6.SHAPE_ORACLE) == set(relational6.SHAPE_QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, sf_oracle, name):
    df = relational6.SHAPE_QUERIES[name](spark, sf_oracle)
    compare_to_oracle(df, relational6.SHAPE_ORACLE[name], sf_oracle)


@pytest.mark.parametrize("name", NAMES)
def test_nondegenerate_at_oracle_sf(spark, sf_oracle, name):
    """Each shape exercises its operator for real: at least one row (the
    filters were chosen against the synthetic value domains)."""
    assert relational6.SHAPE_QUERIES[name](spark, sf_oracle).count() > 0


def _plan(spark, name):
    from tests.conftest import SF_SMALL

    df = relational6.SHAPE_QUERIES[name](spark, SF_SMALL)
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# q11/q15 deliberately attach a ONE-ROW global scalar via
# crossJoin(broadcast(...)) — that shows as BroadcastNestedLoopJoin with
# a single-row build side, the scale-safe decorrelated form.
_SCALAR_ATTACH = {"q11_important_stock", "q15_top_supplier"}


@pytest.mark.parametrize("name", sorted(set(NAMES) - _SCALAR_ATTACH))
def test_no_cartesian_or_bnlj(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q2_decorrelates_the_scalar_subquery(spark):
    """Catalyst must rewrite the correlated min-acctbal subquery to an
    aggregate + join — a per-part re-execution would appear as a
    subquery node surviving into the physical plan joins."""
    plan = _plan(spark, "q2_min_cost_supplier")
    assert "CartesianProduct" not in plan
    # the rewritten plan aggregates min(s_acctbal) once
    assert "min(" in plan


def test_q8_q9_broadcast_the_filtered_part_dim(spark):
    for name in ("q8_market_share", "q9_product_type_profit"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        # the selective part filter is pushed to the scan
        assert "PushedFilters" in plan, name


def test_q16_exclusion_is_an_anti_join(spark):
    plan = _plan(spark, "q16_supplier_part_counts")
    assert "LeftAnti" in plan

# --- relational4's folded shapes (q21/q22) keep singleton pins too ---
# (review fix r6: the q_shapes_pack fold removed their own driver rows;
# without these a q21/q22 regression would surface only as an opaque
# 10-arm pack hash mismatch)
R4_NAMES = None


def _r4():
    from ffi_export_etl_spark.queries import relational4

    return relational4


def test_every_r4_shape_has_an_oracle():
    r4 = _r4()
    assert set(r4.SHAPE_ORACLE) == set(r4.SHAPE_QUERIES)
    assert set(r4.SHAPE_QUERIES) == {"q21_waiting_orders",
                                     "q22_idle_customers"}


@pytest.mark.parametrize(
    "name", ["q21_waiting_orders", "q22_idle_customers"]
)
def test_r4_shape_matches_oracle(spark, sf_oracle, name):
    r4 = _r4()
    df = r4.SHAPE_QUERIES[name](spark, sf_oracle)
    compare_to_oracle(df, r4.SHAPE_ORACLE[name], sf_oracle)
    # q22's NOT-EXISTS + above-average-balance filter is legitimately
    # empty at sf0.01 (verified equal to the oracle's empty set; the
    # sf0.1 sweep exercises it non-empty) — only q21 must be non-empty
    if name == "q21_waiting_orders":
        assert df.count() > 0, f"{name} degenerate at sf0.01"
