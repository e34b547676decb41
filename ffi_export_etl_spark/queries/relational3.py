"""Third batch: deeper TPC-H-style shapes adapted to the synthetic schema
(q4 exists-semijoin, q7 bi-nation volume, q12 priority classes, q14 promo
share, q18 having-join, q19 disjunctive brackets).

All follow the engine's exactness conventions (_util.py): DECIMAL money,
deterministic tiebreaks, aliased columns identical to the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ._util import DEC, DUCK_REVENUE, dec, money, revenue


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style semijoin: orders with any line shipped more than 90
    days after the order date, counted per priority."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 90)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q7_bi_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-nation trade volume per ship-year: supplier nation != customer
    nation, both from a fixed pair; exercises a join graph with two
    independent dimension legs."""
    n1, n2 = "NATION_1", "NATION_2"
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(money(F.sum(revenue()), "volume"))


def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum classification (TPC-H q12 shape): per linestatus,
    how many lines belong to urgent-class vs other-class orders."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-HAVING then join back (TPC-H q18 shape): orders whose total
    quantity exceeds 250, top-20 by (totalprice desc, orderkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > 250)
    )
    return (
        big.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "c_custkey",
            "o_orderkey",
            money(dec("o_totalprice"), "totalprice"),
            money(F.col("_qty"), "total_qty"),
        )
    )



# q4/q12 registered through q_count_pack rounds 3-8; r9 registry
# surgery folded them into packs.a_agg_pack (same tagged counting
# shape) to free the slot ann_pq_pack now occupies. The shape
# functions stay here — a_agg_pack imports them.
QUERIES = {
    "q7_bi_nation_volume": q7_bi_nation_volume,
    "q18_large_orders": q18_large_orders,
}

ORACLE = {
    "q7_bi_nation_volume": f"""
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(sum({DUCK_REVENUE}) AS DOUBLE) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
           OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
        GROUP BY ns.n_name, nc.n_name, year(l_shipdate)
    """,
    "q18_large_orders": """
        SELECT c_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
                   AS totalprice,
               CAST(_qty AS DOUBLE) AS total_qty
        FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS _qty
              FROM lineitem GROUP BY l_orderkey HAVING _qty > 250) big
        JOIN orders   ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
}
