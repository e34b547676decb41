"""Table-profiling + data-quality gate query (operators/profile.py,
operators/validate.py).

Two union-tagged arm families over the documents table:

- ``arm='profile'`` — profile_table's cardinality column is an HLL++
  sketch (approx_count_distinct), deliberately not replayable in
  another engine, so the pin works in two layers: n_rows / n_nonnull
  come straight from profile_table's single-scan aggregation and are
  value-hashed exactly; the HLL estimate is checked against an
  exact-distinct twin computed in the same query (multi count-distinct,
  one Catalyst expand) and exposed as ``hll_ok`` = |approx - exact| /
  exact <= 3*rsd, which the oracle pins to TRUE for every column.
  Deterministic: HLL++ on identical input yields identical estimates.

- ``arm='dq'`` — a CheckSuite constraint report (Deequ-vocabulary
  checks compiled to ONE aggregate scan) mapped onto the same schema;
  the oracle recomputes every violation count + pass decision in plain
  SQL, including a deliberately FAILING check (unique:lang) so the
  violation arithmetic itself is value-pinned, not just the happy path.
  Column mapping (documented in COVERAGE.md): column=check name,
  n_nonnull=n_violations, n_distinct=threshold, min_val=target column,
  max_val=check kind, hll_ok=passed.

At 100 TB only profile_table + CheckSuite.run execute (one scan each,
map-side combined; the dq uniques share one expand); the exact-distinct
twin here is the verification harness, not the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profile import profile_table
from ..operators.validate import CheckSuite
from ..sources.parquet import load_table

RSD = 0.05
TOL = 3 * RSD


def _dq_suite() -> CheckSuite:
    """The constraint set a curation pipeline would gate this corpus on.

    unique:lang is intentionally failing — 5 languages over thousands
    of rows — so the report (and its oracle twin) pins real violation
    counts, not only zeros.
    """
    return (
        CheckSuite()
        .not_null("doc_id")
        .unique("doc_id")
        .unique("lang")
        .in_range("n_chars", 1, 1_000_000)
        .matches("lang", "^[a-z]{2}$")
        .accepted_values("lang", ["en", "zh", "es", "de", "fr"])
        .satisfies(
            "n_chars_is_len",
            F.col("n_chars") == F.length("text"),
            column="n_chars",
        )
        .null_fraction_at_most("text", 0.01)
        .min_rows(100)
    )


def prof_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """profile arm: one row per documents column (exact counts from the
    one-scan profile + exact distinct + HLL-within-tolerance flag).
    dq arm: one row per constraint from the single-scan CheckSuite."""
    d = load_table(spark, sf_dir, "documents")
    prof = profile_table(d, rsd=RSD)
    exact = d.agg(
        *[F.count_distinct(F.col(c)).alias(c) for c in d.columns]
    )
    stack_args = []
    for c in d.columns:
        stack_args += [F.lit(c), F.col(c)]
    exact_long = exact.select(
        F.stack(F.lit(len(d.columns)), *stack_args).alias(
            "column", "n_distinct"
        )
    )
    profile_rows = prof.join(exact_long, "column").select(
        F.lit("profile").alias("arm"),
        "column",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        "min_val",
        "max_val",
        (
            F.abs(F.col("approx_distinct") - F.col("n_distinct"))
            / F.greatest(F.col("n_distinct"), F.lit(1))
            <= TOL
        ).alias("hll_ok"),
    )
    dq_rows = _dq_suite().run(d).select(
        F.lit("dq").alias("arm"),
        F.col("check").alias("column"),
        F.col("n_rows"),
        F.col("n_violations").alias("n_nonnull"),
        F.col("threshold").alias("n_distinct"),
        F.col("column").alias("min_val"),
        F.col("kind").alias("max_val"),
        F.col("passed").alias("hll_ok"),
    )
    return profile_rows.unionByName(dq_rows)


QUERIES = {"prof_pack": prof_pack}

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_ARMS = "\n        UNION ALL\n".join(
    f"""        SELECT 'profile' AS arm, '{c}' AS "column",
               count(*) AS n_rows,
               count({c}) AS n_nonnull,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val,
               TRUE AS hll_ok
        FROM documents"""
    for c in _DOC_COLS
)

# (check name, violations SQL, threshold, target column, kind,
#  passed SQL override or None for violations <= threshold)
_DQ_ARMS = (
    ("not_null:doc_id", "count(*) - count(doc_id)", 0, "doc_id",
     "not_null", None),
    ("unique:doc_id", "count(doc_id) - count(DISTINCT doc_id)", 0,
     "doc_id", "unique", None),
    ("unique:lang", "count(lang) - count(DISTINCT lang)", 0, "lang",
     "unique", None),
    ("in_range:n_chars",
     "count(*) FILTER (WHERE n_chars IS NULL"
     " OR n_chars < 1 OR n_chars > 1000000)",
     0, "n_chars", "in_range", None),
    ("matches:lang",
     "count(*) FILTER (WHERE lang IS NULL"
     " OR NOT regexp_matches(lang, '^[a-z]{2}$'))",
     0, "lang", "matches", None),
    ("accepted_values:lang",
     "count(*) FILTER (WHERE lang IS NULL"
     " OR lang NOT IN ('en','zh','es','de','fr'))",
     0, "lang", "accepted_values", None),
    # satisfies counts rows where NOT(cond) is TRUE — a NULL comparison
    # is neither pass nor violation in both engines (FILTER drops NULL).
    ("n_chars_is_len",
     "count(*) FILTER (WHERE NOT (n_chars = length(text)))",
     0, "n_chars", "satisfies", None),
    ("null_fraction:text", "count(*) - count(text)", 10000, "text",
     "null_fraction",
     "(count(*) - count(text)) * 1000000 <= 10000 * count(*)"),
    ("min_rows:100", "greatest(0, 100 - count(*))", 100, "",
     "min_rows", "count(*) >= 100"),
)

_DQ_SQL = "\n        UNION ALL\n".join(
    f"""        SELECT 'dq' AS arm, '{name}' AS "column",
               count(*) AS n_rows,
               CAST({viol} AS BIGINT) AS n_nonnull,
               CAST({thresh} AS BIGINT) AS n_distinct,
               '{col}' AS min_val, '{kind}' AS max_val,
               {passed if passed else f'CAST({viol} AS BIGINT) <= {thresh}'} AS hll_ok
        FROM documents"""
    for name, viol, thresh, col, kind, passed in _DQ_ARMS
)

ORACLE = {"prof_pack": _PROFILE_ARMS + "\n        UNION ALL\n" + _DQ_SQL}
