"""Oracle pins for dedup paths that are NOT in the 50-slot driver window.

dedup_jaccard_pairs was demoted from the registry in round 3 (the exact
quadratic shingle self-join must not be a registered plan at scale — its
slot pins dedup_incremental_minhash instead), but the exact path remains
the verification semantics for MinHash, so it stays oracle-pinned here.
"""

from __future__ import annotations

from ffi_export_etl_spark.queries import dedup_q
from tests.oracle_utils import compare_to_oracle


def test_jaccard_exact_path_matches_oracle(spark, sf_oracle):
    df = dedup_q.dedup_jaccard_pairs(spark, sf_oracle)
    compare_to_oracle(df, dedup_q.JACCARD_PAIRS_ORACLE, sf_oracle)


def test_jaccard_not_registered_but_incremental_is():
    from ffi_export_etl_spark.queries import all_oracle_sql, all_queries

    q, o = all_queries(), all_oracle_sql()
    assert "dedup_jaccard_pairs" not in q
    assert "dedup_incremental_minhash" in q
    assert "dedup_incremental_minhash" in o
