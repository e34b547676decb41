"""Second batch of relational operator queries: EAV melt/pivot roundtrip,
row-set union with heterogeneous columns, full outer join (SURVEY.md
section 2 rows A1/A2, S3). Rollup/rank/percentile/edit-distance/datetime
demos merged into packs.py and relational.f_scalar_pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ._util import dec, money

# --------------------------------------------------------------------------


def a1_eav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAV melt -> pivot roundtrip (the reference's core A1 transform,
    parser/xml.py:255-258, exercised on the driver gate): unpivot three
    lineitem measures into (key, field, value) triples, then pivot back
    wide with explicit pivot values. min() aggregation because
    (l_orderkey, l_linenumber) is NOT unique in this generator — the
    reference's first()-semantics (pandas pivot uniqueness assertion)
    applies only to genuinely keyed indexes, cf. operators/pivot.py
    strict mode."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    long = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'qty', CAST(l_quantity AS STRING), "
            "'price', CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS STRING), "
            "'flag', l_returnflag) AS (field, value)"
        ),
    )
    wide = (
        long.groupBy("l_orderkey", "l_linenumber")
        .pivot("field", ["qty", "price", "flag"])
        .agg(F.min("value"))
    )
    return wide.select("l_orderkey", "l_linenumber", "qty", "price", "flag")



def s3_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-set union with heterogeneous columns (S3, parser/xml.py:114-118
    pd.concat NaN-fill semantics): customers and suppliers stacked into
    one party table, missing columns null-filled."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).withColumn("kind", F.lit("customer"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_id"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
    ).withColumn("kind", F.lit("supplier"))
    return c.unionByName(s, allowMissingColumns=True)



# j_full_outer folded into packs.j_semi_anti (round 3) as the
# 'nation_counts' arm — the full-outer join stays driver-pinned there
# while freeing a verification-window slot.



QUERIES = {
    "a1_eav_roundtrip": a1_eav_roundtrip,
    "s3_union_by_name": s3_union_by_name,
}

ORACLE = {
    "a1_eav_roundtrip": """
        WITH long AS (
            SELECT l_orderkey, l_linenumber, 'qty' AS field,
                   CAST(l_quantity AS VARCHAR) AS value
            FROM lineitem WHERE l_orderkey <= 2000
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price',
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR)
            FROM lineitem WHERE l_orderkey <= 2000
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'flag', l_returnflag
            FROM lineitem WHERE l_orderkey <= 2000
        )
        SELECT l_orderkey, l_linenumber,
               min(value) FILTER (WHERE field = 'qty') AS qty,
               min(value) FILTER (WHERE field = 'price') AS price,
               min(value) FILTER (WHERE field = 'flag') AS flag
        FROM long GROUP BY l_orderkey, l_linenumber
    """,
    "s3_union_by_name": """
        SELECT c_custkey AS party_id, c_name AS name, c_nationkey AS nationkey,
               c_mktsegment AS segment, 'customer' AS kind
        FROM customer
        UNION ALL
        SELECT s_suppkey, s_name, s_nationkey, NULL, 'supplier'
        FROM supplier
    """,
}
