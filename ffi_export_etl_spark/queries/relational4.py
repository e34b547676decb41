"""Fourth batch: correlated-subquery shapes (Catalyst decorrelates these
into joins — the optimizer capability layer the reference entirely lacks)
and the SQL-string API surface over registered temp views.

q17: correlated scalar AVG subquery (decorrelated to an aggregate join)
q21: multi-EXISTS / NOT-EXISTS (semi + anti join stack)
q22: scalar subquery + anti join
sql:  the same engine driven through spark.sql over temp views
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ._util import DUCK_REVENUE, dec, money, revenue



def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with lines in multi-supplier F-status orders where they
    are the ONLY supplier shipping after 1999 — EXISTS + NOT EXISTS
    stacked as semi + anti joins (TPC-H q21 shape on available columns)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    late = li.filter(F.col("l_shipdate") >= F.lit("1999-01-01"))
    l1 = late.alias("l1")
    # exists: another supplier in the same order (any shipdate)
    l2 = li.select("l_orderkey", F.col("l_suppkey").alias("s2")).alias("l2")
    # not exists: another supplier ALSO late in the same order
    l3 = late.select("l_orderkey", F.col("l_suppkey").alias("s3")).alias("l3")
    cand = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.s3")),
            "left_anti",
        )
    )
    return (
        cand.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no orders (scalar subquery +
    anti join, TPC-H q22 shape): per nation-key-bucket counts and total
    balance."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .withColumn("nation_bucket", (F.col("c_nationkey") % 5).cast("int"))
        .groupBy("nation_bucket")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money(F.sum(dec("c_acctbal")), "totacctbal"),
        )
    )



# r6: q21/q22 register through relational6's q_shapes_pack (one driver
# row for all ten remaining TPC-H shapes) — the functions and oracle
# SQL live here; SHAPE_* feeds the pack and the pytest pins.
QUERIES: dict = {}

SHAPE_QUERIES = {
    "q21_waiting_orders": q21_waiting_orders,
    "q22_idle_customers": q22_idle_customers,
}

ORACLE: dict = {}

SHAPE_ORACLE = {
    "q21_waiting_orders": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate >= TIMESTAMP '1999-01-01'
          AND EXISTS (SELECT 1 FROM orders
                      WHERE o_orderkey = l1.l_orderkey
                        AND o_orderstatus = 'F')
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate >= TIMESTAMP '1999-01-01')
        GROUP BY s_name
    """,
    "q22_idle_customers": """
        SELECT CAST(c_nationkey % 5 AS INTEGER) AS nation_bucket,
               count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   AS totacctbal
        FROM customer
        WHERE c_acctbal > (
              SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                     / count(*)
              FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey % 5
    """,
}
