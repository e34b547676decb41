"""Operator packs: merged single-operator demonstration queries.

The driver verifies only the first 50 ``queries()`` entries, so the
one-operator-per-query demos from round 1 are folded into packs — each
pack exercises several SURVEY.md section-2 operators in ONE flow with ONE
oracle, keeping every operator pinned by a green driver CORRECTNESS row
while freeing window slots for the LLM-pipeline extension surface.

Pack -> operator map (COVERAGE.md has the full table):
  p_pack          S1 scan, P1 project, P2 rename, P3/P4/P5 filters,
                  P6 derived, P8 backfill, A3 distinct
  j_semi_anti     left-semi + left-anti joins (union-tagged)
  a_pivot_pack    A1 pivot counts + A2 pivot measures (one pivot, 2 aggs)
  a_first_seqnum  A4 keep-first-per-key + A5 group sequence numbers
  a_agg_pack      A7 count aggs + A8 sorted string agg + A10 percentiles
  w_window_pack   W1 top-k/group, W2 positional head, W3 lag/lead/running,
                  W4 rank family
  f_string_pack   F13 split-dedup-join + levenshtein edit distance
  a_rollup_cube   A9 rollup + A11 cube (union-tagged grouping sets)
  q_scalar_pack   TPC-H q6/q14/q17/q19 single-row shapes, driven through
                  spark.sql over temp views (the SQL-interface pin): the
                  SAME SQL text runs on both engines
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ._util import DEC, dec, fmt_date, money


def p_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> filters (equality P3, inequality P4, null-drop P5) ->
    projection P1 with renames P2 and derived columns P6 -> typed-null
    backfill P8 -> full-row distinct A3. Filters and pruning reach the
    parquet scan (asserted in test_plan_hygiene)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") >= 45)
            & F.col("l_shipdate").isNotNull()
        )
        .select(
            F.col("l_returnflag").alias("ret_flag"),
            F.col("l_linestatus").alias("line_status"),
            F.year("l_shipdate").alias("ship_year"),
            (F.floor(F.col("l_quantity") / 10) * 10).cast("int").alias("qty_bucket"),
        )
    )
    for col in ("created_by",):
        if col not in out.columns:
            out = out.withColumn(col, F.lit(None).cast("string"))
    return out.distinct()


def j_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (customers with an F-status order), left-anti (customers
    with no orders), and full-outer (per-nation customer vs supplier
    counts) joins, union-tagged into one result — the J-family outer/semi
    pack. The tagged shape (kind, k, name, n_a, n_b) lets three join
    types share one driver CORRECTNESS row."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    null_b = F.lit(None).cast("bigint")
    o_f = o.filter(F.col("o_orderstatus") == "F")
    semi = c.join(o_f, c.c_custkey == o_f.o_custkey, "left_semi").select(
        F.lit("has_f_order").alias("kind"),
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_name").alias("name"),
        null_b.alias("n_a"),
        null_b.alias("n_b"),
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("no_orders").alias("kind"),
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_name").alias("name"),
        null_b.alias("n_a"),
        null_b.alias("n_b"),
    )
    cn = (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("c_nationkey") < 20)
    )
    sn = (
        s.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
        .filter(F.col("s_nationkey") >= 5)
    )
    full = cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full_outer").select(
        F.lit("nation_counts").alias("kind"),
        F.coalesce("c_nationkey", "s_nationkey").cast("bigint").alias("k"),
        F.lit(None).cast("string").alias("name"),
        F.coalesce("n_cust", F.lit(0)).alias("n_a"),
        F.coalesce("n_supp", F.lit(0)).alias("n_b"),
    )
    return semi.unionByName(anti).unionByName(full)


_EVENT_KINDS = ["click", "error", "purchase", "signup", "view"]


def a_pivot_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot with EXPLICIT pivot values and TWO aggregates per
    kind (count + exact-decimal sum) — A1 and A2 in one pivot. Declaring
    the domain skips Spark's distinct-collect pre-job (mandatory at
    100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_KINDS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).alias("amt"),
        )
    )
    cols = [F.col("user_id")]
    for k in _EVENT_KINDS:
        cols.append(F.coalesce(F.col(f"{k}_n"), F.lit(0)).alias(f"n_{k}"))
        cols.append(
            F.coalesce(F.col(f"{k}_amt"), F.lit(0).cast(DEC))
            .cast("double")
            .alias(f"amt_{k}")
        )
    return wide.select(*cols)


def a_first_seqnum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group sequence numbers (A5, cumcount+1 parity) with a deterministic
    order, plus the keep-first-per-key dedup marker (A4) in one window
    pass."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        fmt_date("o_orderdate", "orderdate"),
        F.row_number().over(w).alias("visit_seq"),
    ).withColumn("is_first", F.col("visit_seq") == 1)


def _round2_double(c: F.Column) -> F.Column:
    """round(x, 2) over DOUBLE with the ORACLE's arithmetic.

    DuckDB rounds a double on its binary value (round(x*100)/100, C
    half-away-from-zero); Spark's round() instead rounds the SHORTEST
    DECIMAL representation of the double (BigDecimal.valueOf). The two
    diverge when an interpolated percentile lands on a .xx5 midpoint:
    sf0.001 customer nationkey=1 has an even group whose middle pair
    means to the double nearest 4651.275 — Spark round -> 4651.28, the
    oracle -> 4651.27. Reproducing the multiply-then-half-away fold
    in-plan makes the value engine-portable (probed against DuckDB on
    adversarial midpoints both signs). Scoped to the exact-percentile
    columns — money paths round DECIMALs, exact in both engines.

    r12 (ADVICE r11): ``floor(scaled + 0.5)`` alone over-rounds when
    ``scaled`` sits within half an ULP BELOW a .5 midpoint — IEEE
    addition carries 0.49999999999999994 + 0.5 up to 1.0, where C
    round() (DuckDB) truncates to 0. The standard correction checks
    the candidate against the unadded value: if ``r - 0.5 > scaled``
    the addition rounded up spuriously, so take ``r - 1``. floor()
    yields BIGINT, so |x| >= ~9.2e16 would overflow — out of range for
    every percentile column this is scoped to (acctbal magnitudes)."""
    scaled = F.abs(c) * F.lit(100.0)
    r = F.floor(scaled + F.lit(0.5))
    r = F.when(r.cast("double") - F.lit(0.5) > scaled, r - F.lit(1)).otherwise(r)
    return F.signum(c) * (r / F.lit(100.0))


def a_agg_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count aggregates (A7), sorted-distinct string aggregation (A8,
    deterministic vs the reference's Python-set order quirk Q9), and
    exact interpolated percentiles (A10) in one grouped pass, PLUS the
    two TPC-H counting shapes formerly in q_count_pack — q4 (EXISTS
    semijoin count per priority) and q12 (conditional-sum
    classification) — folded in as tagged-union arms (r9 registry
    surgery: the freed slot hosts ann_pq_pack; precedent: samp_pack).
    All three arms are count-aggregation shapes; the union schema is
    (kind, k, n_a, n_b, segments, p25, median, p90, max_bal) with the
    string/percentile columns NULL on the counting arms."""
    from .relational3 import q4_order_priority, q12_priority_classes

    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    null_b = F.lit(None).cast("bigint")
    c = load_table(spark, sf_dir, "customer")
    nation = (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ", "
            ).alias("segments"),
            _round2_double(F.expr("percentile(c_acctbal, 0.25)")).alias("p25"),
            _round2_double(F.expr("percentile(c_acctbal, 0.5)")).alias("median"),
            _round2_double(F.expr("percentile(c_acctbal, 0.9)")).alias("p90"),
            money(F.max(dec("c_acctbal")), "max_bal"),
        )
        .select(
            F.lit("nation_agg").alias("kind"),
            F.col("c_nationkey").cast("string").alias("k"),
            F.col("n_rows").alias("n_a"),
            F.col("n_segments").alias("n_b"),
            "segments",
            "p25",
            "median",
            "p90",
            "max_bal",
        )
    )
    q4 = q4_order_priority(spark, sf_dir).select(
        F.lit("q4_order_priority").alias("kind"),
        F.col("o_orderpriority").alias("k"),
        F.col("order_count").alias("n_a"),
        null_b.alias("n_b"),
        null_s.alias("segments"),
        null_d.alias("p25"),
        null_d.alias("median"),
        null_d.alias("p90"),
        null_d.alias("max_bal"),
    )
    q12 = q12_priority_classes(spark, sf_dir).select(
        F.lit("q12_priority_classes").alias("kind"),
        F.col("l_linestatus").alias("k"),
        F.col("high_line_count").cast("bigint").alias("n_a"),
        F.col("low_line_count").cast("bigint").alias("n_b"),
        null_s.alias("segments"),
        null_d.alias("p25"),
        null_d.alias("median"),
        null_d.alias("p90"),
        null_d.alias("max_bal"),
    )
    return nation.unionByName(q4).unionByName(q12)


def w_window_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-function family over part prices per brand: rank /
    dense_rank / ntile (W4), lag / lead / running sum frames (W3), top-k
    per group via row_number (W1), and a global positional rank (W2) over
    the (already tiny) top-k subset — the global window runs on <=
    3x|brands| rows, never the full table."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = (
        p.select(
            "p_partkey",
            "p_brand",
            money(dec("p_retailprice"), "price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            money(F.lag(dec("p_retailprice")).over(w), "prev_price"),
            money(F.lead(dec("p_retailprice")).over(w), "next_price"),
            money(F.sum(dec("p_retailprice")).over(run), "running_total"),
        )
        .filter(F.col("rn") <= 3)
    )
    wg = Window.orderBy(F.col("price").desc(), F.col("p_partkey"))
    return base.withColumn("global_rank", F.row_number().over(wg))


def f_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split -> distinct -> sort -> join (F13/A8 combine_teams shape made
    deterministic) plus exact string distance (levenshtein) — the fuzzy
    matching primitive for entity resolution."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    probe = F.lit("the quick brown fox home")
    head = F.substring(F.col("text"), 1, 24)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ", ").alias("vocab"),
        F.levenshtein(head, probe).alias("lev_dist"),
        (F.length(head) - F.length(probe)).alias("len_delta"),
    )


def a_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets both ways: hierarchical ROLLUP over order status x
    priority and full CUBE over order status x line status, union-tagged
    (A9/A11 — free-in-Spark extensions the reference lacks)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    roll = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), money(F.sum(dec("o_totalprice")), "total"))
        .select(
            F.lit("rollup").alias("grouping_kind"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("d1"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("d2"),
            "n",
            "total",
        )
    )
    cub = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .cube("o_orderstatus", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), money(F.sum(dec("l_quantity")), "total"))
        .select(
            F.lit("cube").alias("grouping_kind"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("d1"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("d2"),
            "n",
            "total",
        )
    )
    return roll.unionByName(cub)


# One SQL text, two engines: Spark runs it via spark.sql over temp views
# (the dual-API pin — SURVEY.md section 1.1), DuckDB runs it verbatim as
# the oracle. Four single-row TPC-H shapes cross-joined into one row.
_Q_SCALAR_SQL = """
    SELECT q6_revenue, promo_share_pct, small_qty_revenue, q17_n_lines,
           q19_revenue
    FROM (
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
                   AS q6_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    ) AS q6
    CROSS JOIN (
        SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                   AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    ) AS q14
    CROSS JOIN (
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS small_qty_revenue,
               count(*) AS q17_n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN (SELECT l_partkey AS apk,
                     CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                         / count(*) AS avg_qty
              FROM lineitem GROUP BY l_partkey) AS aq
          ON lineitem.l_partkey = aq.apk
        WHERE p_brand = 'Brand#5'
          AND l_quantity < 0.5 * avg_qty
    ) AS q17
    CROSS JOIN (
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                   AS q19_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    ) AS q19
"""


def q_scalar_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 (pure-scan scalar agg), q14 (promo share), q17 (correlated
    AVG subquery, decorrelated), q19 (disjunctive brackets) — four
    single-row shapes in one result, driven through the spark.sql string
    API over temp views. The SQL text is engine-portable: the DuckDB
    oracle runs the identical string."""
    for name in ("lineitem", "part"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_Q_SCALAR_SQL)


QUERIES = {
    "p_pack": p_pack,
    "j_semi_anti": j_semi_anti,
    "a_pivot_pack": a_pivot_pack,
    "a_first_seqnum": a_first_seqnum,
    "a_agg_pack": a_agg_pack,
    "w_window_pack": w_window_pack,
    "f_string_pack": f_string_pack,
    "a_rollup_cube": a_rollup_cube,
    "q_scalar_pack": q_scalar_pack,
}


def _pivot_oracle() -> str:
    cols = []
    for k in _EVENT_KINDS:
        cols.append(f"count(*) FILTER (event_type = '{k}') AS n_{k}")
        cols.append(
            f"CAST(coalesce(sum(CAST(value AS DECIMAL(12,2))) "
            f"FILTER (event_type = '{k}'), 0) AS DOUBLE) AS amt_{k}"
        )
    sel = ",\n               ".join(cols)
    return f"""
        SELECT user_id,
               {sel}
        FROM events GROUP BY user_id
    """


ORACLE = {
    "p_pack": """
        SELECT DISTINCT l_returnflag AS ret_flag, l_linestatus AS line_status,
               CAST(year(l_shipdate) AS INTEGER) AS ship_year,
               CAST(CAST(floor(l_quantity / 10) AS BIGINT) * 10 AS INTEGER)
                   AS qty_bucket,
               CAST(NULL AS VARCHAR) AS created_by
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity >= 45
          AND l_shipdate IS NOT NULL
    """,
    "j_semi_anti": """
        SELECT 'has_f_order' AS kind, CAST(c_custkey AS BIGINT) AS k,
               c_name AS name, CAST(NULL AS BIGINT) AS n_a,
               CAST(NULL AS BIGINT) AS n_b
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        UNION ALL
        SELECT 'no_orders', CAST(c_custkey AS BIGINT), c_name, NULL, NULL
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT 'nation_counts',
               CAST(coalesce(c.c_nationkey, s.s_nationkey) AS BIGINT),
               NULL, coalesce(n_cust, 0), coalesce(n_supp, 0)
        FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
              GROUP BY c_nationkey HAVING c_nationkey < 20) c
        FULL OUTER JOIN
             (SELECT s_nationkey, count(*) AS n_supp FROM supplier
              GROUP BY s_nationkey HAVING s_nationkey >= 5) s
          ON c.c_nationkey = s.s_nationkey
    """,
    "a_pivot_pack": _pivot_oracle(),
    "a_first_seqnum": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS visit_seq,
               row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) = 1 AS is_first
        FROM orders
    """,
    "a_agg_pack": """
        SELECT 'nation_agg' AS kind,
               CAST(c_nationkey AS VARCHAR) AS k,
               count(*) AS n_a,
               count(DISTINCT c_mktsegment) AS n_b,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ', ')
                   AS segments,
               round(quantile_cont(c_acctbal, 0.25), 2) AS p25,
               round(quantile_cont(c_acctbal, 0.5), 2) AS median,
               round(quantile_cont(c_acctbal, 0.9), 2) AS p90,
               CAST(max(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
        FROM customer GROUP BY c_nationkey
        UNION ALL
        SELECT 'q4_order_priority', o_orderpriority, count(*),
               CAST(NULL AS BIGINT), NULL, NULL, NULL, NULL, NULL
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'q12_priority_classes', l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT),
               NULL, NULL, NULL, NULL, NULL
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
    """,
    "w_window_pack": """
        SELECT *, CAST(row_number() OVER (ORDER BY price DESC, p_partkey)
                       AS INTEGER) AS global_rank
        FROM (
            SELECT p_partkey, p_brand,
                   CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE)
                       AS price,
                   CAST(rn AS INTEGER) AS rn,
                   CAST(rnk AS INTEGER) AS rnk,
                   CAST(drnk AS INTEGER) AS drnk,
                   CAST(quartile AS INTEGER) AS quartile,
                   prev_price, next_price, running_total
            FROM (
                SELECT p_partkey, p_brand, p_retailprice,
                       row_number() OVER w AS rn,
                       rank() OVER w AS rnk,
                       dense_rank() OVER w AS drnk,
                       ntile(4) OVER w AS quartile,
                       CAST(lag(CAST(p_retailprice AS DECIMAL(12,2))) OVER w
                            AS DOUBLE) AS prev_price,
                       CAST(lead(CAST(p_retailprice AS DECIMAL(12,2))) OVER w
                            AS DOUBLE) AS next_price,
                       CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) OVER
                            (PARTITION BY p_brand
                             ORDER BY p_retailprice DESC, p_partkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS DOUBLE) AS running_total
                FROM part
                WINDOW w AS (PARTITION BY p_brand
                             ORDER BY p_retailprice DESC, p_partkey)
            ) WHERE rn <= 3
        )
    """,
    "f_string_pack": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(text, '\\s+')) AS INTEGER)
                   AS n_tokens,
               array_to_string(list_sort(list_distinct(
                   regexp_split_to_array(text, '\\s+'))), ', ') AS vocab,
               CAST(levenshtein(substr(text, 1, 24),
                                'the quick brown fox home') AS INTEGER)
                   AS lev_dist,
               CAST(length(substr(text, 1, 24))
                    - length('the quick brown fox home') AS INTEGER)
                   AS len_delta
        FROM documents
    """,
    "a_rollup_cube": """
        SELECT 'rollup' AS grouping_kind,
               coalesce(o_orderstatus, 'ALL') AS d1,
               coalesce(o_orderpriority, 'ALL') AS d2,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        UNION ALL
        SELECT 'cube',
               coalesce(o_orderstatus, 'ALL'),
               coalesce(l_linestatus, 'ALL'),
               count(*),
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY CUBE (o_orderstatus, l_linestatus)
    """,
    "q_scalar_pack": _Q_SCALAR_SQL,
}
