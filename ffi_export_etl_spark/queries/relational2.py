"""Second batch of relational operator queries: EAV melt/pivot roundtrip,
grouping sets, set ops, rank-family windows, full outer join, datetime
normalization (SURVEY.md section 2 rows A1/A2, S3, W-ext, F2/F3).
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


def a9_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup totals (free-in-Spark extension beyond the
    reference, SURVEY.md section 2.4 'not present' row)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money(F.sum(dec("o_totalprice")), "total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


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


def w4_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent-tile windows over part prices per
    brand (the window family the reference lacks, SURVEY section 2.5)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return p.select(
        "p_partkey",
        "p_brand",
        money(dec("p_retailprice"), "price"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).filter(F.col("rnk") <= 8)


def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: per-nation customer vs supplier counts, keeping
    nations present on either side only."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("c_nationkey") < 20)
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("s_nationkey") >= 5)
    )
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


def f2_datetime_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert_datetime parity (F2, reference functions.py:72-88): parse
    heterogeneous timestamp strings, render millisecond wall clock.
    Inputs are built from o_orderdate so the oracle can reproduce them."""
    from ..functions.datetime_norm import normalize_datetime, to_datenum

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    as_str = F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss")
    return o.select(
        "o_orderkey",
        normalize_datetime(as_str).alias("norm_ts"),
        to_datenum(F.col("o_orderdate")).alias("datenum"),
    )


def a10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont` semantics), rounded to cents. The scale path
    swaps in percentile_approx (t-digest sketch) when exactness can be
    traded for a single-pass bounded-memory plan."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90"),
        money(F.max(dec("o_totalprice")), "max_price"),
    )


def f_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact string-distance functions (levenshtein) — integer outputs,
    engine-portable; the fuzzy-matching primitive for entity resolution."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    probe = F.lit("Customer#000000001")
    return c.select(
        "c_custkey",
        F.levenshtein(F.col("c_name"), probe).alias("lev_dist"),
        (F.length("c_name") - F.length(probe)).alias("len_delta"),
    )


QUERIES = {
    "a10_percentiles": a10_percentiles,
    "f_edit_distance": f_edit_distance,
    "a1_eav_roundtrip": a1_eav_roundtrip,
    "a9_rollup": a9_rollup,
    "s3_union_by_name": s3_union_by_name,
    "w4_rank_family": w4_rank_family,
    "j_full_outer": j_full_outer,
    "f2_datetime_normalize": f2_datetime_normalize,
}

ORACLE = {
    "a10_percentiles": """
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
               round(quantile_cont(o_totalprice, 0.5), 2) AS median,
               round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
               CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS max_price
        FROM orders GROUP BY o_orderstatus
    """,
    "f_edit_distance": """
        SELECT c_custkey,
               CAST(levenshtein(c_name, 'Customer#000000001') AS INTEGER)
                   AS lev_dist,
               CAST(length(c_name) - length('Customer#000000001') AS INTEGER)
                   AS len_delta
        FROM customer WHERE c_custkey <= 500
    """,
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
    "a9_rollup": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "s3_union_by_name": """
        SELECT c_custkey AS party_id, c_name AS name, c_nationkey AS nationkey,
               c_mktsegment AS segment, 'customer' AS kind
        FROM customer
        UNION ALL
        SELECT s_suppkey, s_name, s_nationkey, NULL, 'supplier'
        FROM supplier
    """,
    "w4_rank_family": """
        SELECT p_partkey, p_brand,
               CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
               CAST(rnk AS INTEGER) AS rnk,
               CAST(drnk AS INTEGER) AS drnk,
               CAST(quartile AS INTEGER) AS quartile
        FROM (
            SELECT p_partkey, p_brand, p_retailprice,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   ntile(4) OVER w AS quartile
            FROM part
            WINDOW w AS (PARTITION BY p_brand
                         ORDER BY p_retailprice DESC, p_partkey)
        ) WHERE rnk <= 8
    """,
    "j_full_outer": """
        SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
              GROUP BY c_nationkey HAVING c_nationkey < 20) c
        FULL OUTER JOIN
             (SELECT s_nationkey, count(*) AS n_supp FROM supplier
              GROUP BY s_nationkey HAVING s_nationkey >= 5) s
          ON c.c_nationkey = s.s_nationkey
    """,
    "f2_datetime_normalize": """
        SELECT o_orderkey,
               strftime(strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'),
                                 '%Y-%m-%dT%H:%M:%S'),
                        '%Y-%m-%d %H:%M:%S.%g') AS norm_ts,
               CAST(date_diff('day', DATE '1900-01-01',
                              CAST(o_orderdate AS DATE)) AS INTEGER) AS datenum
        FROM orders WHERE o_orderkey <= 3000
    """,
}
