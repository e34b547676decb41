"""Core relational operator queries (SURVEY.md section 2 S/P/J/A/W/F rows)
plus TPC-H-style headline queries.

Each query exists twice: as an idiomatic PySpark DataFrame plan (Catalyst
optimizes; filters/projections reach the parquet scan) and as ANSI SQL for
the DuckDB oracle. Reference-parity notes cite /root/reference files.

Scale notes (100 TB design):
- region/nation are constant-size dims -> always broadcast (J6/J7 analogs,
  parser/xml.py:151-177 lookup joins become broadcast hash joins).
- fact-fact joins (lineitem x orders) shuffle on the join key; AQE picks
  partition counts and splits skewed keys at runtime.
- every aggregate is algebraic (sum/count/min/max) -> map-side partial
  aggregation halves shuffle volume automatically.
- top-k per group uses row_number window with a deterministic tiebreak
  (quirk Q8, parser/xml.py:276,281: the reference relies on frame order;
  we do not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ._util import DEC, DUCK_REVENUE, dec, fmt_date, money, revenue

# --------------------------------------------------------------------------
# S/P family: scans, projections, filters
# --------------------------------------------------------------------------


def s1_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with pushed filter + pruned projection (S1/P1/P3).

    Reference analog: directory scan + per-table column subsetting
    (xml_to_rdb.py:35-37, parser/xml.py:203-204)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").alias("qty"),
            money(dec("l_extendedprice"), "ext_price"),
        )
    )


def p2_rename_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FieldMap-style rename projection (P2, parser/xml.py:582-584)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        F.upper(F.col("c_name")).alias("name_upper"),
        F.col("c_mktsegment").alias("segment"),
    )


def p4_p5_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality + null-guard filters (P4/P5, parser/xml.py:187-192)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") != "O") & F.col("o_orderpriority").isNotNull())
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    )


def p6_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withColumn-style derived columns (P6, parser/xml.py:186-190,500-503)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money(revenue(), "rev"),
        money(dec("l_extendedprice") * dec("l_tax"), "tax_amt"),
        F.year("l_shipdate").alias("ship_year"),
    )


def p8_backfill_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-column backfill with typed NULLs (P8, parser/xml.py:233-241)."""
    c = load_table(spark, sf_dir, "customer")
    for col in ("created_by", "modified_by"):
        if col not in c.columns:
            c = c.withColumn(col, F.lit(None).cast("string"))
    return c.select("c_custkey", "c_name", "created_by", "modified_by")


# --------------------------------------------------------------------------
# J family: joins
# --------------------------------------------------------------------------


def j1_chain_left_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way chained left equi-joins, the EAV-assembly shape (J1,
    parser/xml.py:214-232). Dim sides broadcast; fact-fact legs shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(c, o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey, "left")
    )
    return joined.select(
        "l_orderkey",
        "l_linenumber",
        F.col("c_name").alias("cust_name"),
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
        F.col("s_name").alias("supp_name"),
    )


def j6_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar lookup -> broadcast left join + ''-default (J6/J7,
    parser/xml.py:151-177: per-row .loc probes become one hash join)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_name"), F.lit("")).alias("nation_name"),
        )
    )


def j_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers having at least one F-status order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def j_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# A family: aggregation / dedup / pivot
# --------------------------------------------------------------------------


def a1_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot with EXPLICIT pivot values (A1, parser/xml.py:255-258).

    Passing the value list skips Spark's distinct-collect pre-job — at 100 TB
    the pivot domain must be declared, not discovered (SURVEY.md section 4.2
    item 4). Missing combos are 0-filled (pandas pivot yields NaN; we take
    the count semantics)."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds],
    )


def a2_pivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a measure aggregate (A2, parser/xml.py:347-352): exact
    decimal sum of value per user x event_type."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "purchase", "view"]
    wide = (
        ev.filter(F.col("event_type").isin(kinds))
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.sum(dec("value")))
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(k), F.lit(0).cast(DEC)).cast("double").alias(f"sum_{k}")
            for k in kinds
        ],
    )


def a3_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row distinct (A3, parser/xml.py:249,611,734)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


def a4_keep_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort + keep-first-per-key dedup (A4, parser/xml.py:186-193): the
    canonical Spark top-1-per-group window. Deterministic tiebreak on
    o_orderkey (quirk Q8)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("first_orderkey"),
            fmt_date("o_orderdate", "first_orderdate"),
        )
    )


def a5_group_seqnum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group sequence numbers (A5, parser/xml.py:274-281 cumcount+1) with a
    deterministic order (Q8)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("visit_seq"),
    )


def a7_grouped_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count aggregates (A7, parser/xml.py:666-683 count-delta audit)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def a8_set_union_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-distinct string aggregation (A8, parser/xml.py:413-450
    combine_teams). The reference joins a Python set (nondeterministic
    order, quirk Q9); we emit array_join(array_sort(collect_set)) which is
    deterministic and set-equal."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ", ").alias(
            "segments"
        )
    )


# --------------------------------------------------------------------------
# W family: windows / sorts / limits
# --------------------------------------------------------------------------


def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per market segment (W1/W2 extension)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("c_mktsegment").alias("segment"),
            "rnk",
            "o_orderkey",
            money(dec("o_totalprice"), "totalprice"),
        )
    )


def w3_lag_lead_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + running sum frames over per-customer order history."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        money(F.lag(dec("o_totalprice")).over(w), "prev_price"),
        money(F.lead(dec("o_totalprice")).over(w), "next_price"),
        money(F.sum(dec("o_totalprice")).over(run), "running_total"),
    )


def w2_global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic top-N (W2): 10 most expensive orders."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", money(dec("o_totalprice"), "totalprice"))
    )


# --------------------------------------------------------------------------
# F family: scalar function pack
# --------------------------------------------------------------------------


def f_scalar_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function pack (F8-F14): upper, substring, identifier strip,
    concat ids, regexp_extract, year, datenum, conditional chains.

    PlotID/EventID-style key synthesis (parser/xml.py:158-175): an id is
    built from normalized name parts + a date; to_datenum
    (parser/functions.py:91-108) is days since 1900-01-01."""
    o = load_table(spark, sf_dir, "orders")
    norm_prio = F.translate(F.col("o_orderpriority"), " -_.", "")  # F9
    return o.select(
        "o_orderkey",
        F.upper(F.col("o_orderstatus")).alias("status_u"),  # F8
        F.substring(norm_prio, 1, 5).alias("prio5"),  # F9+F10
        F.concat(
            F.substring(norm_prio, 1, 5),
            F.date_format("o_orderdate", "yyyyMMdd"),
        ).alias("event_id"),  # F12 (EventID = plotid+yyyymmdd)
        F.regexp_extract(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
            r"(\d{4}-\d{2}-\d{2})",
            1,
        ).alias("date_part"),  # F11
        F.year("o_orderdate").alias("visit_year"),
        F.datediff(F.col("o_orderdate"), F.lit("1900-01-01")).alias("datenum"),  # F3
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("Imm"))  # F14
        .when(F.col("o_orderstatus") == "F", F.concat(F.lit("F-"), F.year("o_orderdate").cast("string")))
        .otherwise(F.lit("Std"))
        .alias("visit_code"),
    )


def f13_split_dedup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split -> distinct -> sort -> join (F13/A8, parser/xml.py:375-450):
    per-document token normalization, the combine_teams shape made
    deterministic (Q9)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ", ").alias("vocab"),
    )


# --------------------------------------------------------------------------
# TPC-H-style headline queries (bench workload)
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation, all algebraic
    (map-side partial agg at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Stage the charge product through (18,4) x (6,2) so the result type
    # stays inside the 38-digit decimal limit in BOTH engines (exact).
    charge = revenue().cast("decimal(18,4)") * (
        F.lit(1).cast(DEC) + dec("l_tax")
    ).cast("decimal(6,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum(dec("l_quantity")), "sum_qty"),
            money(F.sum(dec("l_extendedprice")), "sum_base_price"),
            money(F.sum(revenue()), "sum_disc_price"),
            money(F.sum(charge), "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (
                F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> top-10 revenue.
    Deterministic order: (revenue desc, o_orderkey)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            money(F.col("_rev"), "revenue"),
            fmt_date("o_orderdate", "orderdate"),
            "o_orderpriority",
        )
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with co-located nation keys; revenue per
    nation in ASIA for one order-year."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money(F.sum(revenue()), "revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + pushed predicates + scalar agg."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money(F.sum(dec("l_extendedprice") * dec("l_discount")), "revenue"))
    )
    return out


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue()).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"),
                money(F.col("_rev"), "revenue"))
    )


# --------------------------------------------------------------------------
# Registry + oracle SQL
# --------------------------------------------------------------------------

QUERIES = {
    "s1_scan_filter_project": s1_scan_filter_project,
    "p2_rename_project": p2_rename_project,
    "p4_p5_filters": p4_p5_filters,
    "p6_derived_columns": p6_derived_columns,
    "p8_backfill_missing": p8_backfill_missing,
    "j1_chain_left_joins": j1_chain_left_joins,
    "j6_broadcast_lookup": j6_broadcast_lookup,
    "j_semi": j_semi,
    "j_anti": j_anti,
    "a1_pivot_counts": a1_pivot_counts,
    "a2_pivot_measures": a2_pivot_measures,
    "a3_distinct": a3_distinct,
    "a4_keep_first_per_key": a4_keep_first_per_key,
    "a5_group_seqnum": a5_group_seqnum,
    "a7_grouped_counts": a7_grouped_counts,
    "a8_set_union_string_agg": a8_set_union_string_agg,
    "w1_topk_per_group": w1_topk_per_group,
    "w2_global_topn": w2_global_topn,
    "w3_lag_lead_running": w3_lag_lead_running,
    "f_scalar_pack": f_scalar_pack,
    "f13_split_dedup_join": f13_split_dedup_join,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
}

ORACLE = {
    "s1_scan_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity AS qty,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS ext_price
        FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 45
    """,
    "p2_rename_project": """
        SELECT c_custkey AS custkey, upper(c_name) AS name_upper,
               c_mktsegment AS segment
        FROM customer
    """,
    "p4_p5_filters": """
        SELECT o_orderkey, o_orderstatus, o_orderpriority
        FROM orders
        WHERE o_orderstatus <> 'O' AND o_orderpriority IS NOT NULL
    """,
    "p6_derived_columns": f"""
        SELECT l_orderkey, l_linenumber,
               CAST({DUCK_REVENUE} AS DOUBLE) AS rev,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax_amt,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year
        FROM lineitem
    """,
    "p8_backfill_missing": """
        SELECT c_custkey, c_name,
               CAST(NULL AS VARCHAR) AS created_by,
               CAST(NULL AS VARCHAR) AS modified_by
        FROM customer
    """,
    "j1_chain_left_joins": """
        SELECT l_orderkey, l_linenumber, c_name AS cust_name,
               n_name AS nation_name, r_name AS region_name, s_name AS supp_name
        FROM lineitem
        LEFT JOIN orders    ON l_orderkey = o_orderkey
        LEFT JOIN customer  ON o_custkey = c_custkey
        LEFT JOIN nation    ON c_nationkey = n_nationkey
        LEFT JOIN region    ON n_regionkey = r_regionkey
        LEFT JOIN supplier  ON l_suppkey = s_suppkey
        WHERE l_quantity >= 48
    """,
    "j6_broadcast_lookup": """
        SELECT c_custkey, coalesce(n_name, '') AS nation_name
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
    "j_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "j_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "a1_pivot_counts": """
        SELECT user_id,
               count(*) FILTER (event_type = 'click')    AS n_click,
               count(*) FILTER (event_type = 'error')    AS n_error,
               count(*) FILTER (event_type = 'purchase') AS n_purchase,
               count(*) FILTER (event_type = 'signup')   AS n_signup,
               count(*) FILTER (event_type = 'view')     AS n_view
        FROM events GROUP BY user_id
    """,
    "a2_pivot_measures": """
        SELECT user_id,
               CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                    FILTER (event_type = 'click'), 0)    AS DOUBLE) AS sum_click,
               CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                    FILTER (event_type = 'purchase'), 0) AS DOUBLE) AS sum_purchase,
               CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                    FILTER (event_type = 'view'), 0)     AS DOUBLE) AS sum_view
        FROM events
        WHERE event_type IN ('click', 'purchase', 'view')
        GROUP BY user_id
    """,
    "a3_distinct": "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "a4_keep_first_per_key": """
        SELECT o_custkey AS custkey, o_orderkey AS first_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) = 1
    """,
    "a5_group_seqnum": """
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS visit_seq
        FROM orders
    """,
    "a7_grouped_counts": """
        SELECT l_returnflag, count(*) AS n_rows,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem GROUP BY l_returnflag
    """,
    "a8_set_union_string_agg": """
        SELECT c_nationkey,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ', ')
                   AS segments
        FROM customer GROUP BY c_nationkey
    """,
    "w1_topk_per_group": """
        SELECT c_mktsegment AS segment,
               CAST(rnk AS INTEGER) AS rnk, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rnk <= 3
    """,
    "w2_global_topn": """
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "w3_lag_lead_running": """
        SELECT o_custkey, o_orderkey,
               CAST(lag(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS prev_price,
               CAST(lead(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS next_price,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_total
        FROM orders WHERE o_custkey <= 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "f_scalar_pack": """
        SELECT o_orderkey,
               upper(o_orderstatus) AS status_u,
               substr(replace(replace(replace(replace(o_orderpriority,
                      ' ', ''), '-', ''), '_', ''), '.', ''), 1, 5) AS prio5,
               substr(replace(replace(replace(replace(o_orderpriority,
                      ' ', ''), '-', ''), '_', ''), '.', ''), 1, 5)
                   || strftime(o_orderdate, '%Y%m%d') AS event_id,
               regexp_extract(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                              '(\\d{4}-\\d{2}-\\d{2})', 1) AS date_part,
               CAST(year(o_orderdate) AS INTEGER) AS visit_year,
               CAST(date_diff('day', DATE '1900-01-01',
                              CAST(o_orderdate AS DATE)) AS INTEGER) AS datenum,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 'Imm'
                    WHEN o_orderstatus = 'F'
                         THEN 'F-' || CAST(year(o_orderdate) AS VARCHAR)
                    ELSE 'Std' END AS visit_code
        FROM orders
    """,
    "f13_split_dedup_join": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(text, '\\s+')) AS INTEGER)
                   AS n_tokens,
               array_to_string(list_sort(list_distinct(
                   regexp_split_to_array(text, '\\s+'))), ', ') AS vocab
        FROM documents
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_base_price,
               CAST(sum({DUCK_REVENUE}) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST({DUCK_REVENUE} AS DECIMAL(18,4))
                        * CAST(1 + CAST(l_tax AS DECIMAL(12,2)) AS DECIMAL(6,2)))
                   AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT o_orderkey,
               CAST(sum({DUCK_REVENUE}) AS DOUBLE) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-03-15'
          AND l_shipdate  > TIMESTAMP '1997-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY sum({DUCK_REVENUE}) DESC, o_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name, CAST(sum({DUCK_REVENUE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name AS nation,
               CAST(sum({DUCK_REVENUE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY sum({DUCK_REVENUE}) DESC, c_custkey
        LIMIT 20
    """,
}
