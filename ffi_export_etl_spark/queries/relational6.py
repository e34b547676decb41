"""The remaining 8 TPC-H query SHAPES (q2/q8/q9/q11/q13/q15/q16/q20) —
pytest-oracle-pinned extras, NOT in the 50-slot driver registry.

With these, all 22 TPC-H shapes exist in the engine: 14 driver-registered
(q1/3/4/5/6/7/10/12/14/17/18/19/21/22, some packed) and these 8 pinned by
tests/test_relational6.py against full DuckDB oracles at sf0.01.

The synthetic schema has no partsupp table (TESTDATA.md), so the four
partsupp queries keep their SHAPE over the lineitem bridge (distinct
(l_partkey, l_suppkey) plays part-supplier association): what is pinned
is the plan structure Catalyst must handle — correlated scalar subqueries
and their decorrelation (q2), conditional-share aggregation (q8),
LIKE-filtered multi-join profit rollup (q9), group HAVING against a
global scalar (q11), outer-join count distribution (q13), view + max
self-reference (q15), count-distinct with NOT IN exclusion (q16), nested
semi-join chains (q20).

All money arithmetic follows _util's exact-DECIMAL-then-double contract
so both engines produce bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ._util import DUCK_REVENUE, dec, money, revenue


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The part-supplier bridge: distinct (l_partkey, l_suppkey) pairs
    that actually shipped — the schema's stand-in for partsupp."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated scalar subquery — for each EUROPE-region
    supplier-shipped part of size >= 45, the supplier(s) whose account
    balance equals the per-part MINIMUM among that part's European
    shippers. Expressed via spark.sql so Catalyst's scalar-subquery
    decorrelation (rewrite to aggregate + join) is what runs."""
    # Prefixed view names so a caller's own part/supplier/... temp views
    # are never clobbered; dropped after spark.sql resolves the plan
    # (analysis is eager — the returned DataFrame no longer needs them).
    views = {
        "_q2_part": load_table(spark, sf_dir, "part"),
        "_q2_supplier": load_table(spark, sf_dir, "supplier"),
        "_q2_nation": load_table(spark, sf_dir, "nation"),
        "_q2_region": load_table(spark, sf_dir, "region"),
        "_q2_ps": _ps(spark, sf_dir),
    }
    for name, frame in views.items():
        frame.createOrReplaceTempView(name)
    try:
        return spark.sql(
            """
            SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
            FROM _q2_part p
            JOIN _q2_ps ps ON ps.l_partkey = p.p_partkey
            JOIN _q2_supplier s ON s.s_suppkey = ps.l_suppkey
            JOIN _q2_nation n ON n.n_nationkey = s.s_nationkey
            JOIN _q2_region r ON r.r_regionkey = n.n_regionkey
            WHERE p.p_size >= 45 AND r.r_name = 'EUROPE'
              AND s.s_acctbal = (
                  SELECT min(s2.s_acctbal)
                  FROM _q2_ps ps2
                  JOIN _q2_supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                  JOIN _q2_nation n2 ON n2.n_nationkey = s2.s_nationkey
                  JOIN _q2_region r2 ON r2.r_regionkey = n2.n_regionkey
                  WHERE ps2.l_partkey = p.p_partkey
                    AND r2.r_name = 'EUROPE'
              )
            """
        )
    finally:
        for name in views:
            spark.catalog.dropTempView(name)


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — of all 1996-1997 revenue on
    PROMO-type parts sold to ASIA customers, the fraction supplied by
    NATION_5, per order year. Conditional-sum share over one joined
    fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = c.join(
        n.withColumnRenamed("n_nationkey", "_cnk"), c.c_nationkey == F.col("_cnk")
    ).join(r, F.col("n_regionkey") == r.r_regionkey).select("c_custkey")
    supp_nation = s.join(
        n.select(
            F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
        ),
        s.s_nationkey == F.col("_snk"),
    ).select("s_suppkey", "supp_nation")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_nation, o.o_custkey == cust_nation.c_custkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            revenue().alias("vol"),
            (F.col("supp_nation") == "NATION_5").alias("is_target"),
        )
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("is_target"), F.col("vol")).otherwise(
                F.lit(0).cast("decimal(12,2)")
            )).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: LIKE-filtered part join -> revenue rollup per supplier
    nation per order year (the schema has no ps_supplycost, so profit =
    discounted revenue — the plan shape, a 5-table join + year
    extraction + two-key rollup, is what is pinned)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(money(F.sum(revenue()), "sum_profit"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-group value filtered against a FRACTION of the
    global total (scalar-subquery HAVING): revenue shipped by each
    supplier nation, keeping nations above 2% of the all-nation total."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue()).alias("_val"))
    )
    total = per_nation.agg(
        F.sum("_val").cast("double").alias("_total")
    )
    # crossJoin here is a ONE-ROW broadcast scalar attach (the global
    # total) — the scale-safe decorrelated form of the Q11 HAVING
    # subquery, not a data-sized cartesian.
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("_val").cast("double") > F.col("_total") * 0.02)
        .select("n_name", money(F.col("_val"), "value"))
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: LEFT OUTER join with a join-condition filter (orders
    that are not 1-URGENT), per-customer order count, then the count
    distribution. Two aggregations, outer join preserved."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view over a 3-month shipdate window + max()
    self-reference — supplier(s) whose window revenue equals the global
    maximum. Exact decimal revenue makes the equality portable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue()).alias("_rev")
    )
    top = rev.agg(F.max("_rev").alias("_max"))
    s = load_table(spark, sf_dir, "supplier")
    # one-row broadcast scalar attach (global max) — see q11 note
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("_rev") == F.col("_max"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", money(F.col("_rev"), "total_revenue")
        )
    )


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute triple,
    excluding suppliers from a NOT-IN subquery (negative balances play
    the 'complaints' exclusion), sizes restricted to an IN list."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 50)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("_bad"))
    ps = _ps(spark, sf_dir).join(
        excluded, F.col("l_suppkey") == F.col("_bad"), "left_anti"
    )
    return (
        ps.join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-join chain — suppliers in ASIA whose 1996
    shipped quantity of PROMO parts exceeds 100 units, names only (the
    availqty>half-of-shipped comparison needs partsupp; the >threshold
    aggregate-in-semijoin preserves the nesting)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty").cast("double") > 100.0)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = s.join(n, s.s_nationkey == n.n_nationkey).join(
        r, F.col("n_regionkey") == r.r_regionkey
    )
    return asia_supp.join(
        heavy, asia_supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_name")


SHAPE_QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_promo_volume_suppliers": q20_promo_volume_suppliers,
}

_PS = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"

SHAPE_ORACLE = {
    "q2_min_cost_supplier": f"""
        WITH ps AS ({_PS})
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
        FROM part p
        JOIN ps ON ps.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size >= 45 AND r.r_name = 'EUROPE'
          AND s.s_acctbal = (
              SELECT min(s2.s_acctbal)
              FROM ps ps2
              JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
              JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
              JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
              WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
          )
    """,
    "q8_market_share": f"""
        SELECT year(o_orderdate) AS o_year,
               CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
                             THEN {DUCK_REVENUE}
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(sum({DUCK_REVENUE}) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
    "q9_product_type_profit": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(sum({DUCK_REVENUE}) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    """,
    "q11_important_stock": f"""
        WITH per_nation AS (
            SELECT n_name, sum({DUCK_REVENUE}) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1
        )
        SELECT n_name, CAST(val AS DOUBLE) AS value
        FROM per_nation
        WHERE CAST(val AS DOUBLE) >
              (SELECT CAST(sum(val) AS DOUBLE) FROM per_nation) * 0.02
    """,
    "q13_order_count_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY 1
        )
        SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no, sum({DUCK_REVENUE}) AS r
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON supplier_no = s_suppkey
        WHERE r = (SELECT max(r) FROM rev)
    """,
    "q16_supplier_part_counts": f"""
        WITH ps AS ({_PS})
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_size IN (1, 7, 14, 23, 36, 45, 49, 50)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
    """,
    "q20_promo_volume_suppliers": """
        SELECT s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY 1
            HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   > 100.0
        )
    """,
}


# --- q_shapes_pack (r6): all ten remaining TPC-H shapes in ONE driver
# row. The 50-slot registry was full; union-tagging onto the common
# (kind, k1, k2, n1, n2, v) schema (the q_count_pack precedent) pins
# q2/q8/q9/q11/q13/q15/q16/q20 (this module) plus q21/q22
# (queries/relational4.py) under the gate without new slots — these are
# the shapes (correlated scalar, view self-reference, NOT IN,
# multi-EXISTS) most likely to drift silently under a Spark upgrade.
# The oracle wraps each shape's already-pinned SQL verbatim as a
# subquery, so pack and singleton pins can never diverge.


def _arm(df: DataFrame, kind: str, k1=None, k2=None, n1=None, n2=None,
         v=None) -> DataFrame:
    def c(x, t):
        return (x if x is not None else F.lit(None)).cast(t)

    return df.select(
        F.lit(kind).alias("kind"),
        c(k1, "string").alias("k1"),
        c(k2, "string").alias("k2"),
        c(n1, "bigint").alias("n1"),
        c(n2, "bigint").alias("n2"),
        c(v, "double").alias("v"),
    )


def q_shapes_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational4 import q21_waiting_orders, q22_idle_customers

    arms = [
        _arm(q2_min_cost_supplier(spark, sf_dir), "q2",
             k1=F.col("s_name"),
             k2=F.concat_ws("|", "n_name", "p_name"),
             n1=F.col("p_partkey"), v=F.col("s_acctbal")),
        _arm(q8_market_share(spark, sf_dir), "q8",
             n1=F.col("o_year"), v=F.col("mkt_share")),
        _arm(q9_product_type_profit(spark, sf_dir), "q9",
             k1=F.col("nation"), n1=F.col("o_year"),
             v=F.col("sum_profit")),
        _arm(q11_important_stock(spark, sf_dir), "q11",
             k1=F.col("n_name"), v=F.col("value")),
        _arm(q13_order_count_distribution(spark, sf_dir), "q13",
             n1=F.col("c_count"), n2=F.col("custdist")),
        _arm(q15_top_supplier(spark, sf_dir), "q15",
             k1=F.col("s_name"), n1=F.col("s_suppkey"),
             v=F.col("total_revenue")),
        _arm(q16_supplier_part_counts(spark, sf_dir), "q16",
             k1=F.col("p_brand"), k2=F.col("p_type"),
             n1=F.col("p_size"), n2=F.col("supplier_cnt")),
        _arm(q20_promo_volume_suppliers(spark, sf_dir), "q20",
             k1=F.col("s_name")),
        _arm(q21_waiting_orders(spark, sf_dir), "q21",
             k1=F.col("s_name"), n1=F.col("numwait")),
        _arm(q22_idle_customers(spark, sf_dir), "q22",
             n1=F.col("nation_bucket"), n2=F.col("numcust"),
             v=F.col("totacctbal")),
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


def _arm_sql(kind: str, inner: str, k1="NULL", k2="NULL", n1="NULL",
             n2="NULL", v="NULL") -> str:
    return (
        f"SELECT '{kind}' AS kind, CAST({k1} AS VARCHAR) AS k1, "
        f"CAST({k2} AS VARCHAR) AS k2, CAST({n1} AS BIGINT) AS n1, "
        f"CAST({n2} AS BIGINT) AS n2, CAST({v} AS DOUBLE) AS v "
        f"FROM ({inner}) _t"
    )


def _shapes_pack_oracle() -> str:
    from .relational4 import SHAPE_ORACLE as R4

    arms = [
        _arm_sql("q2", SHAPE_ORACLE["q2_min_cost_supplier"],
                 k1="s_name", k2="concat_ws('|', n_name, p_name)",
                 n1="p_partkey", v="s_acctbal"),
        _arm_sql("q8", SHAPE_ORACLE["q8_market_share"],
                 n1="o_year", v="mkt_share"),
        _arm_sql("q9", SHAPE_ORACLE["q9_product_type_profit"],
                 k1="nation", n1="o_year", v="sum_profit"),
        _arm_sql("q11", SHAPE_ORACLE["q11_important_stock"],
                 k1="n_name", v="value"),
        _arm_sql("q13", SHAPE_ORACLE["q13_order_count_distribution"],
                 n1="c_count", n2="custdist"),
        _arm_sql("q15", SHAPE_ORACLE["q15_top_supplier"],
                 k1="s_name", n1="s_suppkey", v="total_revenue"),
        _arm_sql("q16", SHAPE_ORACLE["q16_supplier_part_counts"],
                 k1="p_brand", k2="p_type", n1="p_size",
                 n2="supplier_cnt"),
        _arm_sql("q20", SHAPE_ORACLE["q20_promo_volume_suppliers"],
                 k1="s_name"),
        _arm_sql("q21", R4["q21_waiting_orders"],
                 k1="s_name", n1="numwait"),
        _arm_sql("q22", R4["q22_idle_customers"],
                 n1="nation_bucket", n2="numcust", v="totacctbal"),
    ]
    return "\nUNION ALL\n".join(arms)


QUERIES = {"q_shapes_pack": q_shapes_pack}
ORACLE = {"q_shapes_pack": _shapes_pack_oracle()}
