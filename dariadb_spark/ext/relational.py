"""[EXT] relational operators over the TPC-H-ish star schema — joins,
grouped aggregation, windows, rollup/cube, set ops, top-k, JSON scalar
extraction. Absent from the reference (it has no relational surface,
SURVEY.md §2.3 J3 / §2.6 O3 / §2.7 C4); Catalyst provides the physical
strategies. Scale notes per query below: dims broadcast, filters pushed
to the parquet scan, single shuffle on the aggregate key.

Money aggregates are rounded to 2 decimals (|sum| ~1e9 at sf0.1 —
accumulation-order noise ~1e-5 stays far below the rounding step);
ratios/averages to 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dariadb_spark.model import load_table
from dariadb_spark.registry import register


def _ntz(lit: str):
    return F.expr(f"TIMESTAMP_NTZ '{lit}'")


# --- TPC-H Q1-style pricing summary --------------------------------------

def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Scan-heavy single-shuffle aggregate: filter pushed to parquet scan,
    partial aggregation map-side, ~6 output groups."""
    li = load_table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= _ntz("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


# --- joined revenue by nation (broadcast dim chain) ----------------------

def revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """4-way join: lineitem⋈orders shuffles on orderkey; customer/nation/
    region are broadcast (≤ a few MB even at 100 TB fact scale), so the
    only big shuffle is the fact-fact join + final tiny agg."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ntz("1997-01-01 00:00:00"))
    )
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("cnt"),
        )
        .orderBy("n_name")
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS cnt
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND r_name = 'ASIA'
GROUP BY n_name
ORDER BY n_name"""


# --- top-k customers by revenue ------------------------------------------

def topk_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate-then-top-k: the groupBy shrinks orders to one row per
    customer before the rank, so the sort handles |customers| rows, not
    |orders|; deterministic tiebreak on custkey."""
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    rev = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    return (
        rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey"), F.col("c_name"), F.col("revenue"), F.col("n_orders")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


TOPK_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, revenue, n_orders
FROM (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
  FROM orders GROUP BY o_custkey
) r JOIN customer ON o_custkey = c_custkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10"""


# --- semi / anti joins ----------------------------------------------------

def customers_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Customers having ≥1 open ('O') order — left-semi join, aggregated
    per market segment. Semi avoids materializing the join product."""
    cust = load_table(spark, sf, "customer")
    open_orders = load_table(spark, sf, "orders").where(
        F.col("o_orderstatus") == "O"
    )
    return (
        cust.join(
            open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .orderBy("c_mktsegment")
    )


CUSTOMERS_SEMI_SQL = """
SELECT c_mktsegment, count(*) AS cnt
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_mktsegment ORDER BY c_mktsegment"""


def customers_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Customers with no 1995 orders — left-anti join against the
    date-filtered fact, counted per nation (broadcast nation dim)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= _ntz("1995-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ntz("1996-01-01 00:00:00"))
    )
    nation = load_table(spark, sf, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("n_name")
    )


CUSTOMERS_ANTI_SQL = """
SELECT n_name, count(*) AS cnt
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
GROUP BY n_name ORDER BY n_name"""


# --- rollup / cube --------------------------------------------------------

def rollup_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


ROLLUP_ORDERS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority"""


def cube_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


CUBE_LINEITEM_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus"""


# --- analytic window: top-N orders per customer ---------------------------

def top_orders_per_cust(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-per-group window (O3-style top-k): partition prune first
    (custkey < 100) so the window state stays small."""
    orders = load_table(spark, sf, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
        .orderBy("o_custkey", "rk")
    )


TOP_ORDERS_PER_CUST_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders WHERE o_custkey < 100
) WHERE rk <= 3
ORDER BY o_custkey, rk"""


# --- set operation: customers active in both years ------------------------

def repeat_customers(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")

    def _year(y: int) -> DataFrame:
        return orders.where(
            (F.col("o_orderdate") >= _ntz(f"{y}-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ntz(f"{y + 1}-01-01 00:00:00"))
        ).select("o_custkey")

    return (
        _year(1995).intersect(_year(1996)).orderBy("o_custkey")
    )


REPEAT_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
ORDER BY o_custkey"""


# --- JSON scalar extraction on events ------------------------------------

def events_json(spark: SparkSession, sf: str) -> DataFrame:
    """C4 scalar surface: get_json_object over the events props column,
    aggregated. Stays fully JVM-side (no Python UDF)."""
    ev = load_table(spark, sf, "events")
    return (
        ev.select(
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k")
        )
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
        .orderBy("k")
    )


EVENTS_JSON_SQL = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS cnt
FROM events GROUP BY k ORDER BY k"""


# --- part × supplier margin rollup ---------------------------------------

def part_supplier_margin(spark: SparkSession, sf: str) -> DataFrame:
    """Fact scan with TWO broadcast dimension joins (part, supplier) plus
    the supplier's nation — covers the remaining fixture tables. The only
    shuffle is the final (p_brand, n_name) aggregate; part/supplier stay
    broadcast at any fact scale (dimension growth is sub-linear)."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    margin = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", F.col("n_name").alias("supp_nation"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(margin), 2).alias("total_margin"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .orderBy("p_brand", "supp_nation")
    )


PART_SUPPLIER_MARGIN_SQL = """
SELECT p_brand, n_name AS supp_nation, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity), 2) AS total_margin,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY p_brand, supp_nation
ORDER BY p_brand, supp_nation"""


# --- year-over-year revenue growth per nation -----------------------------

def revenue_yoy(spark: SparkSession, sf: str) -> DataFrame:
    """Nation × year revenue with year-over-year growth via a lag
    window. orders⋈customer shuffles on custkey once; nation broadcasts;
    the window runs over the tiny (nation, year) aggregate — 25×7 rows
    regardless of fact scale, so the lag costs nothing at 100 TB. The
    growth ratio is computed from the ROUNDED yearly revenue so the lag
    inputs are bit-identical across engines."""
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("o_year")
    prev = F.lag("revenue", 1).over(w)
    return yearly.select(
        "n_name",
        "o_year",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    ).orderBy("n_name", "o_year")


REVENUE_YOY_SQL = """
WITH yearly AS (
  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, year(o_orderdate))
SELECT n_name, o_year, revenue,
       round((revenue - lag(revenue, 1) OVER w)
             / lag(revenue, 1) OVER w, 6) AS yoy_growth
FROM yearly
WINDOW w AS (PARTITION BY n_name ORDER BY o_year)
ORDER BY n_name, o_year"""


register("ext_revenue_yoy", revenue_yoy, REVENUE_YOY_SQL)
register("ext_pricing_summary", pricing_summary, PRICING_SUMMARY_SQL)
register("ext_part_supplier_margin", part_supplier_margin, PART_SUPPLIER_MARGIN_SQL)
register("ext_revenue_by_nation", revenue_by_nation, REVENUE_BY_NATION_SQL)
register("ext_topk_customers", topk_customers, TOPK_CUSTOMERS_SQL)
register("ext_customers_semi", customers_semi, CUSTOMERS_SEMI_SQL)
register("ext_customers_anti", customers_anti, CUSTOMERS_ANTI_SQL)
# --- A13: explicit GROUPING SETS (beyond rollup/cube shorthands) ----------

def grouping_sets_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Hand-picked grouping sets — (year, priority), (year), grand total —
    with GROUPING() flags so subtotal rows are distinguishable from
    genuine NULL groups. Declared in SQL (the DataFrame rollup/cube
    shorthands can't express an arbitrary set list); one Expand + one
    shuffle, same physical shape as rollup."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
SELECT year(o_orderdate) AS yr, o_orderpriority AS prio,
       CAST(grouping(year(o_orderdate)) AS BIGINT) AS g_yr,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders_gs
GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
                        (year(o_orderdate)), ())
ORDER BY g_yr, g_prio, yr, prio"""
    )


GROUPING_SETS_SQL = """
SELECT year(o_orderdate) AS yr, o_orderpriority AS prio,
       CAST(grouping(year(o_orderdate)) AS BIGINT) AS g_yr,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority),
                        (year(o_orderdate)), ())
ORDER BY g_yr, g_prio, yr, prio"""


# --- salted skew-proof join (plans/skew.py) -------------------------------

def salted_join_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """orders ⋈ customer through plans/skew.py's salted_join — a hot
    custkey spreads over 16 tasks instead of one straggler. Shares the
    UNSALTED oracle: hash-match proves salting is value-invisible."""
    from dariadb_spark.plans.skew import salted_join

    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    return (
        salted_join(orders, cust, "o_custkey")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_nationkey")
    )


SALTED_JOIN_SQL = """
SELECT c_nationkey, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey ORDER BY c_nationkey"""


# --- dataset profiling ----------------------------------------------------

def profile_documents(spark: SparkSession, sf: str) -> DataFrame:
    """One-pass dataset profile (the pre-flight check a pipeline runs
    before training): row count, per-column null counts, distinct
    cardinalities, length stats. Single scan, map-side partials, one
    1-row result — scan-bound at any scale (swap countDistinct for
    approx_count_distinct at 100 TB; exact kept for the oracle)."""
    docs = load_table(spark, sf, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("null_text"),
        F.countDistinct("doc_id").alias("distinct_ids"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.round(F.sum("n_chars"), 6) / F.count("*")).alias("avg_chars"),
    )


PROFILE_SQL = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text,
       count(DISTINCT doc_id) AS distinct_ids,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       round(sum(n_chars), 6) / count(*) AS avg_chars
FROM documents"""


register("ext_join_salted", salted_join_revenue, SALTED_JOIN_SQL)
register("ext_profile_documents", profile_documents, PROFILE_SQL)
register("ext_grouping_sets", grouping_sets_orders, GROUPING_SETS_SQL)
register("ext_rollup_orders", rollup_orders, ROLLUP_ORDERS_SQL)
register("ext_cube_lineitem", cube_lineitem, CUBE_LINEITEM_SQL)
register("ext_top_orders_per_cust", top_orders_per_cust, TOP_ORDERS_PER_CUST_SQL)
register("ext_repeat_customers", repeat_customers, REPEAT_CUSTOMERS_SQL)
register("ext_events_json", events_json, EVENTS_JSON_SQL)


# --- RFM customer segmentation ------------------------------------------------
# Registered round 15 (staged round 14 with the full discipline:
# implemented + oracled + pytest parity + planted stress first,
# registered at the window rotation).
#
# The classic lifecycle segmentation (recency / frequency / monetary
# quintiles) the revenue family lacked: `ext_topk_customers` ranks the
# head, `ext_repeat_customers` flags one behavior, `ext_retention_cohorts`
# tracks cohorts over time — RFM is the STANDING per-customer score
# grid marketing actually segments on. Scores are computed from
# row_number arithmetic, NOT ntile(): score = hi − ((rn−1)·5) DIV m is
# the same closed form in both engines, so bucket-boundary conventions
# cannot diverge (ntile's larger-first-buckets rule stays out of the
# hash surface entirely).

RFM_REF_DATE = "2001-09-01"  # fixed reference (orders end 2001-08-01)


def rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r15 window (:func:`rfm_segments_op`)."""
    return rfm_segments_op(load_table(spark, sf, "orders"))


def rfm_segments_op(orders: DataFrame) -> DataFrame:
    """RFM quintile grid: per (r_score, f_score, m_score) cell the
    customer count and the exact average spend.

    Exactness: monetary is per-order cent-quantized BEFORE summing
    (integer Σ — no float accumulation order), recency is an integer
    day difference, ranks order by the metric with custkey as the
    total-order tiebreak, scores are pure integer arithmetic, and the
    one float per output row is the HALF_UP avg_monetary.

    Plan shape (100 TB): one groupBy on o_custkey (the natural
    clustering key), three window ranks over the |customers|-row
    aggregate (each a single sort of the REDUCED table, not the fact
    table), and a ≤125-cell final aggregate. At billions of customers
    swap the three global ranks for percentile cut points from
    `ext_sketch_quantile_hdr` — the scores change from exact ranks to
    sketch bins; the per-customer reduction is unchanged.
    """
    per_cust = orders.selectExpr(
        "o_custkey",
        f"datediff(DATE '{RFM_REF_DATE}', CAST(o_orderdate AS DATE))"
        " AS rec_days",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
    ).groupBy("o_custkey").agg(
        F.min("rec_days").alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum("cents").alias("monetary_cents"),
    )
    m = Window.partitionBy()
    w_r = Window.orderBy("recency_days", "o_custkey")
    w_f = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    w_m = Window.orderBy(F.desc("monetary_cents"), F.asc("o_custkey"))
    scored = per_cust.select(
        "o_custkey",
        "monetary_cents",
        F.row_number().over(w_r).alias("rn_r"),
        F.row_number().over(w_f).alias("rn_f"),
        F.row_number().over(w_m).alias("rn_m"),
        F.count("*").over(m).alias("n_cust"),
    ).selectExpr(
        "o_custkey",
        "monetary_cents",
        "5 - ((rn_r - 1) * 5) DIV n_cust AS r_score",
        "5 - ((rn_f - 1) * 5) DIV n_cust AS f_score",
        "5 - ((rn_m - 1) * 5) DIV n_cust AS m_score",
    )
    from dariadb_spark.ext.exact import ratio_round_spark

    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary_cents").alias("sum_cents"),
        )
        .selectExpr(
            "CAST(r_score AS BIGINT) AS r_score",
            "CAST(f_score AS BIGINT) AS f_score",
            "CAST(m_score AS BIGINT) AS m_score",
            "n_customers",
            ratio_round_spark("sum_cents", "100 * n_customers", 2)
            + " AS avg_monetary",
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def _rfm_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
pc AS (SELECT o_custkey,
              min(datediff('day', CAST(o_orderdate AS DATE),
                           DATE '{RFM_REF_DATE}')) AS recency_days,
              count(*) AS frequency,
              sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS monetary_cents
       FROM orders GROUP BY o_custkey),
sc AS (SELECT o_custkey, monetary_cents,
              row_number() OVER (ORDER BY recency_days, o_custkey) AS rn_r,
              row_number() OVER (ORDER BY frequency DESC, o_custkey) AS rn_f,
              row_number() OVER (ORDER BY monetary_cents DESC, o_custkey)
                AS rn_m,
              count(*) OVER () AS n_cust
       FROM pc),
g AS (SELECT o_custkey, monetary_cents,
             5 - ((rn_r - 1) * 5) // n_cust AS r_score,
             5 - ((rn_f - 1) * 5) // n_cust AS f_score,
             5 - ((rn_m - 1) * 5) // n_cust AS m_score
      FROM sc)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       count(*) AS n_customers,
       {ratio_round_duck("sum(monetary_cents)", "100 * count(*)", 2)}
         AS avg_monetary
FROM g GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score"""


RFM_SEGMENTS_SQL = _rfm_sql()

# Registered round 15 (staged round 14: implemented + oracled + pytest
# parity incl. planted-quintile fixtures + 100k-row stress +
# hash-matched at sf0.1 in the staged second-pass sweep).
register("ext_rfm_segments", rfm_segments, RFM_SEGMENTS_SQL)


# --- market-basket association rules -------------------------------------------
# Registered round 15 (staged round 14 with the full discipline:
# implemented + oracled + pytest parity + planted stress first,
# registered at the window rotation).
#
# Pairwise co-purchase mining (support / confidence / lift) — the one
# association view the relational family lacked; the token-domain
# sibling is `ext_token_pmi` (same margins-and-pairs skeleton, PMI in
# place of lift). Pair generation is the PPJoin/edit-distance family's
# blocked self-join: DISTINCT (order, part) first, equi-join on the
# order key with part_a < part_b — candidate volume is Σ C(k_o, 2)
# with k_o the order's item count (TPC-H max 13; a hot basket is a
# data-quality finding, not a plan hazard).

BASKET_MIN_SUP = 2  # pairs must co-occur in ≥2 orders
BASKET_TOP = 50


def market_basket(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r15 window (:func:`market_basket_op`)."""
    return market_basket_op(load_table(spark, sf, "lineitem"))


def market_basket_op(li: DataFrame) -> DataFrame:
    """Top co-purchased part pairs with exact support counts, both
    directional confidences, and lift.

    Exactness: supports are integer counts; confidences are HALF_UP
    ratios; lift's ranking-irrelevant value is ONE float expression
    round(n_orders·sup_ab / (sup_a·sup_b), 6) from exact int64 — the
    top-k order key is (sup_ab DESC, part_a, part_b), all integers.

    Plan shape (100 TB): the DISTINCT basket table partitions on the
    order key (the lineitem clustering key — co-located, no extra
    shuffle); the pair self-join is per-order-key equi-join with the
    a < b triangle filter; margins are one broadcastable |parts|-row
    aggregate; the final TakeOrderedAndProject keeps the sort partial.
    """
    # localCheckpoint pins the DISTINCT basket table ONCE: it feeds
    # five consumers (both self-join sides, margins twice, n_orders)
    # whose diverging projections re-inlined the distinct aggregate —
    # the static plan showed 10 lineitem scans. At 100 TB the pin is
    # the in-session rendering of an explicit basket-artifact write
    # (block manager, disk fallback); isolated best-of-3 2.97 → 2.73 s
    # at sf0.1 and 4 repeated lineitem distinct-shuffles removed.
    basket = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # 1-row broadcast scalar (the PCA-norm-join pattern): the total
    # order count rides a crossJoin, never a driver-side action
    n_orders = basket.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("sup_ab"))
        .where(F.col("sup_ab") >= BASKET_MIN_SUP)
    )
    margins = basket.groupBy(F.col("l_partkey").alias("mp")).agg(
        F.count("*").alias("sup")
    )
    from dariadb_spark.ext.exact import ratio_round_spark

    return (
        pairs.join(
            F.broadcast(margins.selectExpr("mp AS pa", "sup AS sup_a")),
            F.col("part_a") == F.col("pa"),
        )
        .join(
            F.broadcast(margins.selectExpr("mp AS pb", "sup AS sup_b")),
            F.col("part_b") == F.col("pb"),
        )
        .crossJoin(F.broadcast(n_orders))
        .selectExpr(
            "part_a",
            "part_b",
            "sup_ab",
            "sup_a",
            "sup_b",
            ratio_round_spark("sup_ab", "sup_a", 4) + " AS conf_a_to_b",
            ratio_round_spark("sup_ab", "sup_b", 4) + " AS conf_b_to_a",
            "round(CAST(n_orders AS DOUBLE) * sup_ab"
            " / (CAST(sup_a AS DOUBLE) * sup_b), 6) AS lift",
        )
        .orderBy(F.desc("sup_ab"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP)
    )


def _basket_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_ord AS (SELECT count(DISTINCT l_orderkey) AS n FROM basket),
pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 count(*) AS sup_ab
          FROM basket a JOIN basket b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= {BASKET_MIN_SUP}),
m AS (SELECT l_partkey AS mp, count(*) AS sup FROM basket GROUP BY 1)
SELECT p.part_a, p.part_b, p.sup_ab,
       ma.sup AS sup_a, mb.sup AS sup_b,
       {ratio_round_duck("p.sup_ab", "ma.sup", 4)} AS conf_a_to_b,
       {ratio_round_duck("p.sup_ab", "mb.sup", 4)} AS conf_b_to_a,
       round(CAST(n.n AS DOUBLE) * p.sup_ab
             / (CAST(ma.sup AS DOUBLE) * mb.sup), 6) AS lift
FROM pairs p
JOIN m ma ON p.part_a = ma.mp
JOIN m mb ON p.part_b = mb.mp
CROSS JOIN n_ord n
ORDER BY p.sup_ab DESC, p.part_a, p.part_b
LIMIT {BASKET_TOP}"""


MARKET_BASKET_SQL = _basket_sql()

# Registered round 15 (staged round 14: implemented + oracled + pytest
# parity incl. planted-rule fixtures + 100k-row stress + hash-matched
# at sf0.1 in the staged second-pass sweep).
register("ext_market_basket", market_basket, MARKET_BASKET_SQL)


# --- co-purchase PageRank (exact-integer power iteration) ----------------------
# Registered round 15 (staged round 14 with the full discipline:
# implemented + oracled + pytest parity + planted stress first,
# registered at the window rotation).
#
# The iterative-algorithm class under the SAME hash gate as everything
# else: five unrolled PageRank power iterations (Brin & Page 1998,
# damping 0.85) over the undirected co-purchase graph the market-basket
# op mines — "which parts anchor the catalog" where raw degree
# over-counts leaf-heavy hubs. The float-free trick: ranks live in
# micro-units (r₀ = 10⁶) and the damped contribution is the HALF_UP
# integer rational (34·r + 20·deg) DIV (40·deg) ≡ round(0.85·r/deg),
# so every iterate is an EXACT int64 in both engines — the oracle
# unrolls the same five iterations as chained CTEs and the driver's
# hash compare re-proves the whole trajectory, not just the fixed
# point. Uniform-degree graphs sit at the exact fixed point 10⁶
# (0.15·10⁶ + deg·round(0.85·10⁶/deg) = 10⁶), the stress's closed form.

PAGERANK_ITERS = 5
PAGERANK_TOP = 20


def part_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r15 window (:func:`part_pagerank_op`)."""
    return part_pagerank_op(load_table(spark, sf, "lineitem"))


def part_pagerank_op(li: DataFrame, materialize: bool = False) -> DataFrame:
    """Top parts by exact-integer PageRank over the support-≥2
    co-purchase graph (the market-basket pair set, both directions).

    Exactness: degrees and ranks are int64; each contribution is ONE
    integer rational with HALF_UP closure; the per-node sum is an
    integer sum (order-free); the displayed pagerank is round(r/10⁶, 6)
    of the exact final integer — identical expression in both engines.
    No dangling nodes exist (every node has degree ≥ 1 by
    construction), so no teleport-mass correction term is needed.

    Plan shape (100 TB): the edge list is hash-partitioned by dst ONCE
    (r20, guide §2.4 — two operations keyed the same way share one
    exchange): each of the five iterations joins the |nodes|-row rank
    table as an explicit broadcast (dimension-sized while |parts| is —
    the claim this plan always made, now enforced with a hint) and its
    (dst) contribution aggregate reuses the standing partitioning, so
    NO iteration re-shuffles the edge table — one edge exchange total
    instead of one per iteration. At billion-node scale where the rank
    vector outgrows broadcast, drop the hint and the same unrolled plan
    runs with shuffle joins, still benefiting from the single dst
    co-partitioning.
    """
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= BASKET_MIN_SUP)
        .select("x", "y")
    )
    edges = pairs.selectExpr("x AS src", "y AS dst").unionByName(
        pairs.selectExpr("y AS src", "x AS dst")
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # The five unrolled iterations each join against `ed`, whose printed
    # plan repeats the basket scan + pair aggregate per iteration — but
    # AQE's RUNTIME stage reuse dedupes the identical exchange subplans,
    # so the lazy form executes the edge build once (r15 A/B at sf0.1,
    # warm best-of-3: lazy 3.17 s vs eager localCheckpoint 3.73 s — the
    # checkpoint's blocking materialization is pure overhead here).
    # `materialize=True` is the knob for clusters where the fact scan
    # is expensive enough to pin the edge table explicitly (the
    # GraphX/Pregel convention) rather than trust stage reuse.
    ed = edges.join(F.broadcast(deg), "src")
    if materialize:
        ed = ed.localCheckpoint(eager=True)
    # one explicit dst-exchange, reused by every iteration's aggregate
    # (r20; see the plan-shape paragraph above)
    ed = ed.repartition("dst")
    ranks = deg.selectExpr("src AS node", "CAST(1000000 AS BIGINT) AS r")
    for _ in range(PAGERANK_ITERS):
        ranks = (
            ed.join(F.broadcast(ranks), ed.src == ranks.node)
            .selectExpr(
                "dst",
                "(34 * r + 20 * deg) DIV (40 * deg) AS contrib",
            )
            .groupBy("dst")
            .agg((F.lit(150_000) + F.sum("contrib")).alias("r"))
            .selectExpr("dst AS node", "CAST(r AS BIGINT) AS r")
        )
    return (
        ranks.selectExpr(
            "node AS part",
            "r AS rank_micro",
            "round(CAST(r AS DOUBLE) / 1000000.0d, 6) AS pagerank",
        )
        .orderBy(F.desc("rank_micro"), F.asc("part"))
        .limit(PAGERANK_TOP)
    )


def _pagerank_sql() -> str:
    its = []
    prev = "r0"
    for k in range(1, PAGERANK_ITERS + 1):
        its.append(
            f"""r{k} AS (SELECT e.dst AS node,
              150000 + sum((34 * p.r + 20 * e.deg) // (40 * e.deg)) AS r
       FROM ed e JOIN {prev} p ON e.src = p.node
       GROUP BY e.dst)"""
        )
        prev = f"r{k}"
    chain = ",\n".join(its)
    return f"""WITH
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS x, b.l_partkey AS y
          FROM basket a JOIN basket b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= {BASKET_MIN_SUP}),
edges AS (SELECT x AS src, y AS dst FROM pairs
          UNION ALL SELECT y, x FROM pairs),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
{chain}
SELECT node AS part, CAST(r AS BIGINT) AS rank_micro,
       round(CAST(r AS DOUBLE) / 1000000.0, 6) AS pagerank
FROM {prev}
ORDER BY rank_micro DESC, part ASC
LIMIT {PAGERANK_TOP}"""


PART_PAGERANK_SQL = _pagerank_sql()

# Registered round 15 (staged round 14: implemented + oracled + pytest
# parity incl. the exact-fixed-point ring + planted-star stress +
# hash-matched at sf0.1 in the staged second-pass sweep — the
# iterative-algorithm class kept inside the hash gate via the
# chained-CTE oracle).
register("ext_part_pagerank", part_pagerank, PART_PAGERANK_SQL)


# --- co-purchase triangle census (degree-oriented) ------------------------------
# STAGED for the round-16 driver window (the staging every late operator
# goes through: implemented + oracled + pytest parity + planted stress
# now, registered at the next window rotation).
#
# The graph family's second distributed-algorithm verb after the
# PageRank power iteration: triangle counting — the density/community
# primitive behind clustering coefficients and recommendation-graph
# health checks. The Spark plan is the DEGREE-ORIENTED algorithm
# (Suri & Vassilvitskii WWW'11 / Cohen's MapReduce form — public
# literature): orient every undirected edge from its (degree, node)-
# smaller endpoint to the larger, so each triangle {a ≺ b ≺ c} is
# found EXACTLY once as wedge (a→b, a→c) closed by (b→c), and the
# wedge fan-out per node is bounded by OUT-degree ≤ O(√|E|) on any
# graph — the skew-immunity that makes the census feasible where a
# naive wedge join on raw degree explodes on hubs. The oracle stays
# DEFINITIONAL (the a<b<c triple self-join of the undirected pair set,
# no orientation), so the hash gate proves the oriented plan exact.

TRIANGLE_TOP = 20
_OKEY = 4_294_967_296  # orientation key = deg * 2^32 + node (partkeys < 2^32)


def part_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r16 window (:func:`part_triangles_op`)."""
    return part_triangles_op(load_table(spark, sf, "lineitem"))


def part_triangles_op(li: DataFrame) -> DataFrame:
    """Top parts by triangle participation in the support-≥2
    co-purchase graph, with each part's share of the global census.

    Exactness: pure int64 end to end (pair supports, degrees,
    orientation keys, triangle counts); the one float per row is the
    exact-rational HALF_UP share ratio — identical expression shape in
    both engines (ext/exact.py recipe). Ties rank by part id.

    Plan shape (100 TB): the pair set is the market-basket pair
    aggregate (one shuffle); degrees are one more tiny aggregate;
    orientation is a projection over two broadcastable degree joins;
    the wedge join fans out by ORIENTED out-degree (≤ O(√|E|) per
    node regardless of hub skew) and the closing join is an equi-join
    against the oriented edge set — no cartesian anywhere, candidate
    volume Σ out_deg(u)², the published bound.
    """
    from dariadb_spark.ext.exact import ratio_round_spark

    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= BASKET_MIN_SUP)
        .select("x", "y")
    )
    deg = (
        pairs.selectExpr("x AS node").unionByName(pairs.selectExpr("y AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .selectExpr("node", f"deg * {_OKEY} + node AS okey")
    )
    dx = deg.selectExpr("node AS nx", "okey AS kx")
    dy = deg.selectExpr("node AS ny", "okey AS ky")
    oriented = (
        pairs.join(F.broadcast(dx), pairs.x == F.col("nx"))
        .join(F.broadcast(dy), pairs.y == F.col("ny"))
        .selectExpr(
            "CASE WHEN kx < ky THEN x ELSE y END AS src",
            "CASE WHEN kx < ky THEN y ELSE x END AS dst",
            "CASE WHEN kx < ky THEN kx ELSE ky END AS src_k",
            "CASE WHEN kx < ky THEN ky ELSE kx END AS dst_k",
        )
    )
    o1 = oriented.selectExpr("src AS u", "dst AS v", "dst_k AS vk")
    o2 = oriented.selectExpr("src AS u2", "dst AS w", "dst_k AS wk")
    wedges = o1.join(
        o2, (F.col("u") == F.col("u2")) & (F.col("vk") < F.col("wk"))
    ).select("u", "v", "w")
    closing = oriented.selectExpr("src AS cv", "dst AS cw")
    tris = wedges.join(
        closing, (F.col("v") == F.col("cv")) & (F.col("w") == F.col("cw"))
    ).select("u", "v", "w")
    per_part = (
        tris.selectExpr("explode(array(u, v, w)) AS part")
        .groupBy("part")
        .agg(F.count("*").alias("tri_cnt"))
    )
    total = tris.agg(F.count("*").alias("n_tri"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .selectExpr(
            "part",
            "tri_cnt",
            "n_tri",
            ratio_round_spark("tri_cnt", "n_tri", 6) + " AS tri_share",
        )
        .orderBy(F.desc("tri_cnt"), F.asc("part"))
        .limit(TRIANGLE_TOP)
    )


def _triangles_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS x, b.l_partkey AS y
          FROM basket a JOIN basket b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY x, y HAVING count(*) >= {BASKET_MIN_SUP}),
tris AS (SELECT ab.x AS u, ab.y AS v, bc.y AS w
         FROM pairs ab
         JOIN pairs bc ON bc.x = ab.y
         JOIN pairs ac ON ac.x = ab.x AND ac.y = bc.y),
pp AS (SELECT part, count(*) AS tri_cnt FROM (
         SELECT unnest([u, v, w]) AS part FROM tris)
       GROUP BY part),
tot AS (SELECT count(*) AS n_tri FROM tris)
SELECT part, tri_cnt, n_tri,
       {ratio_round_duck("tri_cnt", "n_tri", 6)} AS tri_share
FROM pp, tot
ORDER BY tri_cnt DESC, part ASC
LIMIT {TRIANGLE_TOP}"""


PART_TRIANGLES_SQL = _triangles_sql()

# Registered round 16 (staged round 15 with the full discipline:
# implemented + oracled + pytest parity incl. the planted-graph
# closed form and random-graph brute-force property test + planted
# ≥100k-row stress + hash-matched at sf0.1 in the staged sweep).
register("ext_part_triangles", part_triangles, PART_TRIANGLES_SQL)


# --- Benford first-digit data-quality screen ----------------------------------
# STAGED for the round-16 driver window (the staging every late operator
# follows: implemented + oracled + pytest parity + planted stress now,
# registered at the next rotation). The data-quality family's
# "is this numeric column ORGANIC?" verb: fabricated or clipped amount
# columns fail the first-significant-digit profile long before any
# per-row rule fires — the classic forensic-accounting screen, applied
# per order-priority segment so a single doctored segment cannot hide
# in the corpus-wide profile.

#: Benford shares P(d) = log10(1 + 1/d) in HALF_UP micro-units, pinned
#: as integer literals so both engines compare against the SAME grid
#: value (the nine literals sum to exactly 1_000_000; pytest re-derives
#: them from math.log10).
BENFORD_MICRO = [301030, 176091, 124939, 96910, 79181, 66947, 57992,
                 51153, 45757]


def orders_benford(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r16 window (:func:`orders_benford_op`)."""
    return orders_benford_op(load_table(spark, sf, "orders"))


def benford_screen(
    df: DataFrame, amount_col: str, segment_col: str
) -> DataFrame:
    """Library API: the Benford first-digit screen over ANY positive
    numeric column, segmented by any grouping column — the generic
    entry point behind :func:`orders_benford_op` (the build-once IVF /
    gram_arrow convention: the driver row pins one concrete instance,
    the API serves the rest). Same exactness contract: integer counts,
    HALF_UP micro-shares, integer dev_micro against the pinned
    literals; rows where ``amount_col`` < 1 are excluded (no leading
    significant digit), and so are NaN and any value ≥ 9.2e18 —
    which covers +Infinity AND finite doubles beyond the int64 range
    (r15 review + r16 advice: Spark sorts NaN above every number, so
    NaN passes a bare ≥ 1 gate and then crashes element_at with digit
    0, while +Inf or a finite 1e19 silently saturates Spark's BIGINT
    cast into a phantom digit 9 where DuckDB's cast raises — a
    data-quality screen must tolerate exactly the doctored input it
    is pointed at, and it must fail the SAME way on both engines).
    Output columns: segment, digit, n, n_total, obs_share,
    benford_share, dev_micro.
    """
    arr = ", ".join(str(v) for v in BENFORD_MICRO)
    amt = F.col(amount_col)
    digits = df.where(
        (amt >= 1) & ~F.isnan(amt) & (amt < F.lit(9.2e18))
    ).selectExpr(
        f"{segment_col} AS segment",
        f"CAST(substr(CAST(CAST(floor({amount_col}) AS BIGINT) AS STRING),"
        " 1, 1) AS INT) AS digit",
    )
    counts = digits.groupBy("segment", "digit").agg(
        F.count("*").alias("n")
    )
    totals = digits.groupBy("segment").agg(F.count("*").alias("n_total"))
    return (
        counts.join(F.broadcast(totals), "segment")
        .selectExpr(
            "segment",
            "digit",
            "n",
            "n_total",
            "(2 * n * 1000000 + n_total) DIV (2 * n_total) AS obs_micro",
            f"element_at(array({arr}), digit) AS benford_micro",
        )
        .selectExpr(
            "segment",
            "digit",
            "n",
            "n_total",
            "(obs_micro / 1000000.0d) AS obs_share",
            "(benford_micro / 1000000.0d) AS benford_share",
            "abs(obs_micro - benford_micro) AS dev_micro",
        )
        .orderBy("segment", "digit")
    )


def orders_benford_op(orders: DataFrame) -> DataFrame:
    """First-significant-digit profile of o_totalprice per order
    priority vs the Benford expectation, with the deviation in exact
    micro-units — the driver-pinned instance of :func:`benford_screen`.

    Exactness: the digit is substr(1,1) of the BIGINT floor — floor()
    BEFORE the int cast because Spark's double→bigint cast truncates
    while DuckDB's rounds; counts are int64; the observed share is the
    HALF_UP integer micro-quotient (narrow closure — valid to ~4.6e12
    rows per segment, the documented int64 ceiling) so dev_micro =
    |obs_micro − benford_micro| is a pure integer; the two displayed
    shares divide micro-ints by 10⁶. Rows with o_totalprice < 1 carry
    no leading significant digit and are excluded by contract.

    Plan shape (100 TB): one scan with the digit projection pushed into
    it, one (priority, digit) partial-agg shuffle bounded by 9·|priorities|
    output rows, one broadcastable per-priority margin join — no sort
    until the ≤45-row presentation ORDER BY.
    """
    return benford_screen(
        orders, "o_totalprice", "o_orderpriority"
    ).withColumnRenamed("segment", "priority")


def _benford_sql() -> str:
    arr = ", ".join(str(v) for v in BENFORD_MICRO)
    return f"""WITH
digits AS (
  SELECT o_orderpriority AS priority,
         CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1 AND isfinite(o_totalprice)
    AND o_totalprice < 9.2e18),
counts AS (SELECT priority, digit, count(*) AS n
           FROM digits GROUP BY priority, digit),
totals AS (SELECT priority, count(*) AS n_total
           FROM digits GROUP BY priority),
m AS (SELECT c.priority, c.digit, c.n, t.n_total,
             (2 * c.n * 1000000 + t.n_total) // (2 * t.n_total)
               AS obs_micro,
             ([{arr}])[c.digit] AS benford_micro
      FROM counts c JOIN totals t ON c.priority = t.priority)
SELECT priority, digit, CAST(n AS BIGINT) AS n,
       CAST(n_total AS BIGINT) AS n_total,
       (obs_micro / 1000000.0) AS obs_share,
       (benford_micro / 1000000.0) AS benford_share,
       CAST(abs(obs_micro - benford_micro) AS BIGINT) AS dev_micro
FROM m ORDER BY priority, digit"""


ORDERS_BENFORD_SQL = _benford_sql()

# Registered round 16 (staged round 15 with the full discipline:
# implemented + oracled + pytest parity incl. pinned micro-literals,
# planted-digit closed form, the non-finite/overflow guard test, and a
# pure-Python property replay + planted ≥100k-row stress +
# hash-matched at sf0.1 in the staged sweep).
register("ext_orders_benford", orders_benford, ORDERS_BENFORD_SQL)


# --- HITS hub/authority on the bipartite purchase graph ------------------------
# STAGED for the round-16 driver window (the staging every late operator
# follows: implemented + oracled + pytest parity + planted stress now,
# registered at the next rotation). The iterative-fixpoint class's
# SECOND topology next to part_pagerank's homogeneous co-purchase walk:
# HITS runs two mutually-recursive score vectors over the BIPARTITE
# customer→part edge set (hubs = broad buyers, authorities = parts
# broad buyers converge on), L1-normalized each half-step so the
# iteration is a pure integer-rational fixpoint both engines replay.

HITS_ITERS = 2
HITS_TOP = 20


def part_hits(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r16 window (:func:`part_hits_op`)."""
    return part_hits_op(
        load_table(spark, sf, "orders"), load_table(spark, sf, "lineitem")
    )


def part_hits_op(
    orders: DataFrame, li: DataFrame, materialize: bool = False
) -> DataFrame:
    """Top parts by HITS authority over the distinct customer→part
    purchase edges, after ``HITS_ITERS`` L1-normalized iterations.

    Exactness: hubs start at 1_000_000 micro-units; each half-step is
    an integer edge-sum (order-free) followed by ONE wide HALF_UP
    normalization to PER-NODE micro-units — a = HALF_UP(raw·n·10⁶ /
    tot) where n is the side's node count, so the side's MEAN score is
    always 10⁶ (the part_pagerank convention) — in DECIMAL(38,0)/
    HUGEINT: every score in the fixpoint is an exact integer and both
    engines land on identical micro-int vectors; the one float per
    output row is the display division by 10⁶ (authority relative to
    the mean part). The per-node grid is what makes the fixpoint
    scale-safe (r15 review): the earlier total-mass-10⁶ grid rounded
    every score to ZERO once a side exceeded ~2·10⁶ comparably-scored
    nodes — at the 100 TB part count the whole vector collapsed and
    the next normalization divided by zero. With per-node units the
    mean score is grid-exact at ANY node count; only n·10⁶-fold
    skew UNDER the mean truncates to zero, which is the sketch-grade
    behavior a top-k ranking wants. Overflow: raw·n·10⁶ ≤ ~10³⁴ at
    10¹⁰ nodes × 10¹² edges — inside DECIMAL(38)/HUGEINT.

    Plan shape (100 TB): the edge list is the orders⋈lineitem
    ORDER-KEY equi-join (the schema's co-clustered key — no extra
    shuffle beyond the join) distinct'd once, then hash-partitioned
    ONCE per half-step key (part for the authority steps, cust for the
    hub steps — r20, guide §2.4); each half-step joins the
    dimension-sized score vector (|customers| or |parts| rows —
    broadcastable) as an explicit broadcast and aggregates on the
    standing partitioning, so no half-step re-shuffles the edges; the
    L1 total rides a 1-row broadcast crossJoin, never a driver action.
    At a scale where the score vectors outgrow broadcast, drop the
    hints and the same unrolled plan runs with shuffle joins.
    """
    edges = (
        orders.select("o_orderkey", "o_custkey")
        .join(li.select("l_orderkey", "l_partkey"),
              orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .distinct()
    )
    # same lazy-by-default story as part_pagerank_op: AQE stage reuse
    # dedupes the repeated edge subplan at runtime (r15 A/B at sf0.1:
    # lazy 2.83 s vs eager checkpoint 3.14 s); materialize=True pins
    # the edge list for clusters with expensive fact scans
    if materialize:
        edges = edges.localCheckpoint(eager=True)
    hubs = edges.select("cust").distinct().selectExpr(
        "cust", "CAST(1000000 AS BIGINT) AS h"
    )
    # r20 (guide §2.4): two standing copies of the edge list, hash-
    # partitioned by each half-step's AGGREGATE key, with the score
    # vectors joined as explicit broadcasts (dimension-sized at any SF —
    # the plan-shape claim below, now enforced): each of the four
    # half-steps aggregates on the standing partitioning, so no
    # half-step re-shuffles the edge table. Both repartitions read the
    # SAME distinct exchange, so the orders⋈lineitem edge build still
    # runs once (ReusedExchange) — two |E| exchanges total instead of
    # one per half-step.
    ed_p = edges.repartition("part")
    ed_c = edges.repartition("cust")
    auth = None
    for _ in range(HITS_ITERS):
        a_raw = (
            ed_p.join(F.broadcast(hubs), "cust")
            .groupBy("part")
            .agg(F.sum("h").alias("raw"))
        )
        # the 1-row (total mass, node count) pair rides one broadcast
        a_tot = a_raw.agg(
            F.sum(F.col("raw").cast("decimal(38,0)")).alias("tot"),
            F.count("*").alias("n_side"),
        )
        auth = a_raw.crossJoin(F.broadcast(a_tot)).selectExpr(
            "part",
            "CAST((2 * CAST(raw AS DECIMAL(38,0)) * n_side * 1000000"
            " + tot) DIV (2 * tot) AS BIGINT) AS a",
        )
        h_raw = (
            ed_c.join(F.broadcast(auth), "part")
            .groupBy("cust")
            .agg(F.sum("a").alias("raw"))
        )
        h_tot = h_raw.agg(
            F.sum(F.col("raw").cast("decimal(38,0)")).alias("tot"),
            F.count("*").alias("n_side"),
        )
        hubs = h_raw.crossJoin(F.broadcast(h_tot)).selectExpr(
            "cust",
            "CAST((2 * CAST(raw AS DECIMAL(38,0)) * n_side * 1000000"
            " + tot) DIV (2 * tot) AS BIGINT) AS h",
        )
    return (
        auth.selectExpr(
            "part",
            "a AS auth_micro",
            "(a / 1000000.0d) AS authority",
        )
        .orderBy(F.desc("auth_micro"), F.asc("part"))
        .limit(HITS_TOP)
    )


def _hits_sql() -> str:
    steps = ["""
edges AS (SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
h0 AS (SELECT DISTINCT cust, CAST(1000000 AS BIGINT) AS h FROM edges)"""]
    prev_h = "h0"
    auth = None
    for i in range(HITS_ITERS):
        auth = f"a{i + 1}"
        nxt_h = f"h{i + 1}"
        steps.append(f"""
ar{i + 1} AS (SELECT e.part, CAST(sum(h.h) AS HUGEINT) AS raw
       FROM edges e JOIN {prev_h} h ON e.cust = h.cust GROUP BY e.part),
{auth} AS (SELECT part,
       CAST((2 * raw * t.n_side * 1000000 + t.tot) // (2 * t.tot)
            AS BIGINT) AS a
       FROM ar{i + 1},
            (SELECT sum(raw) AS tot, count(*) AS n_side
             FROM ar{i + 1}) t),
hr{i + 1} AS (SELECT e.cust, CAST(sum(a.a) AS HUGEINT) AS raw
       FROM edges e JOIN {auth} a ON e.part = a.part GROUP BY e.cust),
{nxt_h} AS (SELECT cust,
       CAST((2 * raw * t.n_side * 1000000 + t.tot) // (2 * t.tot)
            AS BIGINT) AS h
       FROM hr{i + 1},
            (SELECT sum(raw) AS tot, count(*) AS n_side
             FROM hr{i + 1}) t)""")
        prev_h = nxt_h
    return (
        "WITH" + ",".join(steps) + f"""
SELECT part, a AS auth_micro, (a / 1000000.0) AS authority
FROM {auth}
ORDER BY auth_micro DESC, part ASC
LIMIT {HITS_TOP}"""
    )


PART_HITS_SQL = _hits_sql()

# Registered round 16 (staged round 15 with the full discipline:
# implemented + oracled + pytest parity incl. the planted-star closed
# form and a random-bipartite Python-fixpoint property test + planted
# ≥100k-edge stress + hash-matched at sf0.1 in the staged sweep; the
# r15 review's normalization-underflow hazard was fixed pre-staging).
register("ext_part_hits", part_hits, PART_HITS_SQL)


# --- Pareto / ABC revenue-concentration screen ---------------------------------
# STAGED for the round-17 driver window (the staging every late operator
# follows: implemented + oracled + pytest parity + planted stress now,
# registered at the next rotation). The BI family's "how CONCENTRATED
# is the revenue?" verb next to rfm_segments' per-customer scoring: the
# classic ABC split — customers ranked by lifetime revenue, class A
# while the running share stays ≤ 80%, B to 95%, C after — reported as
# the 3-row class summary a planner reads (members, revenue, share).

#: class boundaries as exact integer comparisons on cent sums:
#: A while 5·cum ≤ 4·total (≤ 80%), B while 20·cum ≤ 19·total (≤ 95%)
PARETO_A_NUM, PARETO_A_DEN = 4, 5
PARETO_B_NUM, PARETO_B_DEN = 19, 20


def orders_pareto(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r17 window (:func:`orders_pareto_op`)."""
    return orders_pareto_op(load_table(spark, sf, "orders"))


def orders_pareto_op(orders: DataFrame) -> DataFrame:
    """ABC classes over customers ranked by total order revenue.

    Exactness: revenue is the exact int64 cent sum per customer
    (round(price·100) before the cast, the house money rule); the
    running total is an integer window sum over the (cents DESC,
    custkey ASC) total order; the class decision is a pure integer
    comparison (5·cum ≤ 4·total etc.) so the boundary member lands
    identically on both engines; class shares are HALF_UP micro-units.

    Plan shape (100 TB): one orders scan → one per-customer partial
    aggregate (the only corpus-sized shuffle) → the ranking window runs
    over CUSTOMERS, a dimension-sized set, in one partition here; at
    extreme customer cardinality the same prefix-sum splits into the
    range-partitioned two-pass with identical integer semantics — NOT
    prose: ``plans/prefix.py`` ``abc_classes_distributed`` is that
    plan, pinned byte-equal to this one and measured faster already at
    1M customers (stress_prefix_two_pass). Output is exactly ≤ 3
    rows."""
    cents = orders.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
        ).alias("cents")
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey").asc())
    ranked = cents.select(
        "o_custkey",
        "cents",
        F.sum("cents").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cents").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    ).selectExpr(
        "cents",
        "total",
        f"CASE WHEN {PARETO_A_DEN} * cum <= {PARETO_A_NUM} * total"
        " THEN 'A'"
        f" WHEN {PARETO_B_DEN} * cum <= {PARETO_B_NUM} * total"
        " THEN 'B' ELSE 'C' END AS abc_class",
    )
    return (
        ranked.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("class_cents"),
            F.max("total").alias("total"),
        )
        .selectExpr(
            "abc_class",
            "n_customers",
            "class_cents",
            # int64 envelope (ADVICE r18): the 2·mass·10⁶ term caps the
            # per-group mass at ~4.6e12 (≈ $46B in cents) before int64
            # wraps — past it DuckDB errors loudly while non-ANSI Spark
            # wraps silently; route through ext/exact.py's
            # ratio_round_wide / DECIMAL(38,0) when a deployment can
            # approach that mass (part_price_size/vr_test convention)
            "(2 * class_cents * 1000000 + total) DIV (2 * total)"
            " AS share_micro",
        )
        .orderBy("abc_class")
    )


ORDERS_PARETO_SQL = f"""WITH
cust AS (SELECT o_custkey,
                sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
         FROM orders GROUP BY o_custkey),
ranked AS (SELECT cents,
                  sum(cents) OVER (ORDER BY cents DESC, o_custkey ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum,
                  sum(cents) OVER () AS total
           FROM cust),
classed AS (SELECT cents, total,
                   CASE WHEN {PARETO_A_DEN} * cum <= {PARETO_A_NUM} * total
                        THEN 'A'
                        WHEN {PARETO_B_DEN} * cum <= {PARETO_B_NUM} * total
                        THEN 'B' ELSE 'C' END AS abc_class
            FROM ranked)
SELECT abc_class, count(*) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS class_cents,
       CAST((2 * sum(cents) * 1000000 + max(total)) // (2 * max(total))
            AS BIGINT) AS share_micro
FROM classed GROUP BY abc_class ORDER BY abc_class"""

# Registered round 17 (staged round 16, full gauntlet: oracle + planted
# boundary grid + 20M-row two-pass A/B in plans/prefix.py).
register("ext_orders_pareto", orders_pareto, ORDERS_PARETO_SQL)


# --- local clustering coefficient (graph family, third verb) -------------------
# STAGED for the round-17 driver window (the staging every late operator
# follows: implemented + oracled + pytest parity + planted stress now,
# registered at the next rotation). After part_pagerank's "which nodes
# MATTER?" and part_triangles' "how many triangles EXIST?", this is the
# per-node "how CLIQUEY is the neighborhood?" verb: Watts–Strogatz
# local clustering cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) over the same
# support-≥2 co-purchase graph — the community-structure screen a
# recommender health check reads next to the global census.

CLUSTER_TOP = 20


def part_clustering(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r17 window (:func:`part_clustering_op`)."""
    return part_clustering_op(load_table(spark, sf, "lineitem"))


def part_clustering_op(li: DataFrame) -> DataFrame:
    """Top parts by local clustering coefficient (ties: deg DESC, part
    ASC) among parts with degree ≥ 2 in the support-≥2 co-purchase
    graph; zero-triangle nodes report an exact 0.

    Exactness: pure int64 (supports, degrees, orientation keys,
    per-node triangle counts); the one float per row is the HALF_UP
    rational 2·tri / (deg·(deg−1)) — identical expression shape in
    both engines. The triangle machinery is the degree-oriented
    algorithm of :func:`part_triangles_op` verbatim (same orientation
    key, same wedge bound); the oracle stays DEFINITIONAL (unoriented
    a<b<c triple join + degree table), so the hash gate proves the
    oriented plan exact per node, not just in aggregate.

    Plan shape (100 TB): identical to the census — one basket-pair
    shuffle, broadcast degree joins, the O(√|E|)-bounded wedge join —
    plus one broadcastable deg⟕tri join; no cartesian anywhere."""
    from dariadb_spark.ext.exact import ratio_round_spark

    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= BASKET_MIN_SUP)
        .select("x", "y")
    )
    deg = (
        pairs.selectExpr("x AS node").unionByName(pairs.selectExpr("y AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .selectExpr("node", "deg", f"deg * {_OKEY} + node AS okey")
    )
    dx = deg.selectExpr("node AS nx", "okey AS kx")
    dy = deg.selectExpr("node AS ny", "okey AS ky")
    oriented = (
        pairs.join(F.broadcast(dx), pairs.x == F.col("nx"))
        .join(F.broadcast(dy), pairs.y == F.col("ny"))
        .selectExpr(
            "CASE WHEN kx < ky THEN x ELSE y END AS src",
            "CASE WHEN kx < ky THEN y ELSE x END AS dst",
            "CASE WHEN kx < ky THEN kx ELSE ky END AS src_k",
            "CASE WHEN kx < ky THEN ky ELSE kx END AS dst_k",
        )
    )
    o1 = oriented.selectExpr("src AS u", "dst AS v", "dst_k AS vk")
    o2 = oriented.selectExpr("src AS u2", "dst AS w", "dst_k AS wk")
    wedges = o1.join(
        o2, (F.col("u") == F.col("u2")) & (F.col("vk") < F.col("wk"))
    ).select("u", "v", "w")
    closing = oriented.selectExpr("src AS cv", "dst AS cw")
    tris = wedges.join(
        closing, (F.col("v") == F.col("cv")) & (F.col("w") == F.col("cw"))
    ).select("u", "v", "w")
    per_part = (
        tris.selectExpr("explode(array(u, v, w)) AS part")
        .groupBy("part")
        .agg(F.count("*").alias("tri_cnt"))
    )
    return (
        deg.where(F.col("deg") >= 2)
        .join(per_part, deg.node == per_part.part, "left")
        .selectExpr(
            "node AS part",
            "deg",
            "COALESCE(tri_cnt, 0L) AS tri_cnt",
            ratio_round_spark("2 * COALESCE(tri_cnt, 0L)",
                              "deg * (deg - 1)", 6)
            + " AS clustering",
        )
        .orderBy(
            F.desc("clustering"), F.desc("deg"), F.asc("part")
        )
        .limit(CLUSTER_TOP)
    )


def _clustering_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS x, b.l_partkey AS y
          FROM basket a JOIN basket b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY x, y HAVING count(*) >= {BASKET_MIN_SUP}),
deg AS (SELECT node, count(*) AS deg FROM (
          SELECT x AS node FROM pairs
          UNION ALL SELECT y AS node FROM pairs)
        GROUP BY node),
tris AS (SELECT ab.x AS u, ab.y AS v, bc.y AS w
         FROM pairs ab
         JOIN pairs bc ON bc.x = ab.y
         JOIN pairs ac ON ac.x = ab.x AND ac.y = bc.y),
pp AS (SELECT part, count(*) AS tri_cnt FROM (
         SELECT unnest([u, v, w]) AS part FROM tris)
       GROUP BY part)
SELECT d.node AS part, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(p.tri_cnt, 0) AS BIGINT) AS tri_cnt,
       {ratio_round_duck("2 * COALESCE(p.tri_cnt, 0)",
                         "d.deg * (d.deg - 1)", 6)} AS clustering
FROM deg d LEFT JOIN pp p ON d.node = p.part
WHERE d.deg >= 2
ORDER BY clustering DESC, deg DESC, part ASC
LIMIT {CLUSTER_TOP}"""


PART_CLUSTERING_SQL = _clustering_sql()

# Registered round 17 (staged round 16; the graph family's third verb,
# on the triangles wedge machinery with the definitional triple-join
# oracle).
register("ext_part_clustering", part_clustering, PART_CLUSTERING_SQL)


# --- Gini revenue-inequality coefficient ---------------------------------------
# STAGED for the round-17 driver window (the staging every late operator
# follows: implemented + oracled + pytest parity + planted stress now,
# registered at the next rotation). After orders_pareto's "who holds the
# top 80%?" this is the concentration family's scale-free summary: the
# Gini coefficient of customer lifetime revenue PER MARKET SEGMENT —
# one number a planner compares across segments and over time, where
# the ABC split answers a threshold question.


def orders_gini(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r17 window (:func:`orders_gini_op`)."""
    return orders_gini_op(
        load_table(spark, sf, "orders"), load_table(spark, sf, "customer")
    )


def orders_gini_op(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Gini coefficient of per-customer revenue within each market
    segment: G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) over the ascending
    (cents, custkey) rank i — the classic sorted-values identity, whose
    Σ i·x_i term is invariant to permutations within a tie group (tied
    x contribute the same product for any rank assignment), so the
    statistic is total-order-free even though the rank walk is not.

    Exactness: revenue is the exact int64 cent sum per customer (the
    house money rule); W = Σ rn·cents accumulates in DECIMAL(38,0)
    (HUGEINT in the oracle); the single float per row is the HALF_UP
    6-dp wide rational (2W − (n+1)S) / (n·S). Customers with orders
    but no customer row are dropped by the inner dim join.

    Plan shape (100 TB): one orders scan → per-customer partial-agg
    shuffle (the only corpus-sized exchange) → broadcast segment join →
    the rank window runs over CUSTOMERS per segment (5 partitions of a
    dimension-sized set; at extreme customer cardinality the same
    prefix machinery splits into the range-partitioned two-pass of
    ``plans/prefix.py`` ``ranked_prefix`` — code with an equality
    contract, see orders_pareto). The denominator n·S is widened to
    DECIMAL(38,0)/HUGEINT like the numerator (ADVICE r16), so there is
    no int64 cliff at ~10¹⁸ cent-customers — the envelope is the same
    ~1e37 as every wide ratio in this package."""
    from dariadb_spark.ext.exact import ratio_round_signed_wide_spark

    cents = orders.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
        ).alias("cents")
    )
    seg = customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    w = Window.partitionBy("mktsegment").orderBy(
        F.col("cents").asc(), F.col("o_custkey").asc()
    )
    ranked = (
        cents.join(F.broadcast(seg), "o_custkey")
        .select(
            "mktsegment", "cents",
            F.row_number().over(w).alias("rn"),
        )
    )
    return (
        ranked.groupBy("mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("total_cents"),
            F.sum(
                F.col("rn").cast("decimal(38,0)") * F.col("cents")
            ).alias("wsum"),
        )
        .where(F.col("total_cents") > 0)
        .selectExpr(
            "mktsegment",
            "n_customers",
            "total_cents",
            ratio_round_signed_wide_spark(
                "2 * wsum - (n_customers + 1) * CAST(total_cents"
                " AS DECIMAL(38,0))",
                "n_customers * CAST(total_cents AS DECIMAL(38,0))",
                6,
            )
            + " AS gini",
        )
        .orderBy("mktsegment")
    )


def _gini_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_signed_wide_duck

    return f"""WITH
cust AS (SELECT o_custkey,
                sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
         FROM orders GROUP BY o_custkey),
ranked AS (SELECT c.c_mktsegment AS mktsegment, cents,
                  row_number() OVER (PARTITION BY c.c_mktsegment
                                     ORDER BY cents ASC, o_custkey ASC)
                    AS rn
           FROM cust JOIN customer c ON cust.o_custkey = c.c_custkey),
agg AS (SELECT mktsegment, count(*) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               sum(CAST(rn AS HUGEINT) * cents) AS wsum
        FROM ranked GROUP BY mktsegment HAVING sum(cents) > 0)
SELECT mktsegment, n_customers, total_cents,
       {ratio_round_signed_wide_duck(
           "2 * wsum - (n_customers + 1) * CAST(total_cents AS HUGEINT)",
           "n_customers * CAST(total_cents AS HUGEINT)", 6)} AS gini
FROM agg ORDER BY mktsegment"""


ORDERS_GINI_SQL = _gini_sql()

# Registered round 17 (staged round 16; denominator widened to
# DECIMAL(38,0)/HUGEINT per ADVICE r16 before registration).
register("ext_orders_gini", orders_gini, ORDERS_GINI_SQL)


# --- Herfindahl–Hirschman supplier-concentration index --------------------------
# STAGED for the round-17 driver window (same staging discipline). The
# concentration family's THIRD verb, on the supply side: how
# concentrated is lineitem revenue among SUPPLIERS within each nation —
# the antitrust HHI (Σ market-share²), reported in micro-units so the
# 0.15/0.25 policy thresholds read as integers (150000/250000).


def supplier_hhi(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r17 window (:func:`supplier_hhi_op`)."""
    return supplier_hhi_op(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
    )


def supplier_hhi_op(
    li: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-nation HHI of supplier revenue: Σ_i (cents_i / total)² over
    the nation's suppliers, as the HALF_UP 6-dp rational
    Σ cents² / total².

    Exactness: per-row discounted revenue is ONE fixed-arity double
    expression rounded to cents before the int64 cast (identical shape
    on both engines — the Benford/money recipe); supplier sums are
    int64; Σ cents² and total² run in DECIMAL(38,0)/HUGEINT, and the
    division is the manual wide HALF_UP walk with a DECIMAL
    denominator (total² can pass int64 at corpus scale, so the
    ratio_round_wide helper's int64-denominator contract is widened
    inline: 2·Σc²·10⁶ ≤ 2·total²·10⁶ < 10³⁸ up to total ~2·10¹⁵ cents
    per nation — $20 T, beyond any nation slice of a 100 TB corpus).

    Plan shape (100 TB): one lineitem scan → per-supplier partial-agg
    shuffle (the only corpus-sized exchange) → two broadcast dim joins
    → a nation-sized (≤25-row) aggregate. No window anywhere."""
    rev = li.select(
        "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
            " AS BIGINT)"
        ).alias("rc"),
    ).groupBy("l_suppkey").agg(F.sum("rc").alias("cents"))
    sup = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = nation.select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    return (
        rev.join(F.broadcast(sup), "l_suppkey")
        .join(F.broadcast(nat), "s_nationkey")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("cents").alias("total_cents"),
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("cents")
            ).alias("sumsq"),
        )
        .where(F.col("total_cents") > 0)
        .selectExpr(
            "n_name",
            "n_suppliers",
            "total_cents",
            "CAST((2 * CAST(sumsq AS DECIMAL(38,0)) * 1000000"
            " + CAST(total_cents AS DECIMAL(38,0)) * total_cents)"
            " DIV (2 * CAST(total_cents AS DECIMAL(38,0)) * total_cents)"
            " AS BIGINT) AS hhi_micro",
        )
        .orderBy("n_name")
    )


SUPPLIER_HHI_SQL = """WITH
rev AS (SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS cents
        FROM lineitem GROUP BY l_suppkey),
agg AS (SELECT n.n_name, count(*) AS n_suppliers,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               sum(CAST(cents AS HUGEINT) * cents) AS sumsq
        FROM rev
        JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name HAVING sum(cents) > 0)
SELECT n_name, n_suppliers, total_cents,
       CAST((2 * CAST(sumsq AS HUGEINT) * 1000000
             + CAST(total_cents AS HUGEINT) * total_cents)
            // (2 * CAST(total_cents AS HUGEINT) * total_cents)
            AS BIGINT) AS hhi_micro
FROM agg ORDER BY n_name"""

# Registered round 17 (staged round 16).
register("ext_supplier_hhi", supplier_hhi, SUPPLIER_HHI_SQL)


# --- order inter-arrival distribution --------------------------------------------
# STAGED for the round-17 driver window (same staging discipline). The
# BI family's cadence verb: how LONG between a customer's consecutive
# orders, summarized per market segment — the repeat-purchase tempo
# rfm_segments' recency snapshot cannot see (recency is the LAST gap
# only). Exact-integer day gaps; the funnel_latency distribution
# recipe (HALF_UP mean, doubled-rank median, rank order-statistic p90).


def order_interarrival(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r17 window (:func:`order_interarrival_op`)."""
    return order_interarrival_op(
        load_table(spark, sf, "orders"), load_table(spark, sf, "customer")
    )


def order_interarrival_op(
    orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Per-segment distribution of per-customer consecutive-order gaps.

    Exactness: gaps are exact integer DAYS between consecutive
    o_orderdate values in the (o_orderdate, o_orderkey) total order
    per customer (the orderkey tiebreak pins same-day pairs to gap 0
    deterministically); mean is the HALF_UP 4-dp integer ratio; median
    is the doubled rank walk and p90 the rank-⌈0.9·m⌉ order statistic —
    both read off the WEIGHTED (segment, gap) count table, so they are
    exact order statistics of the full gap multiset.

    Plan shape (100 TB) — the weighted-distribution design (r17, the
    ship_latency lesson measured at 11× on 21M rows): one orders scan →
    the per-customer lag window partitions on o_custkey (the natural
    clustering key; one shuffle — this carries the volume) → broadcast
    segment join → integer day gaps live in a tiny domain (thousands of
    values), so the distribution collapses to a map-side-combined
    (segment, gap) COUNT table and median/p90 become a cumulative walk
    over those few thousand rows. The previous per-row rank window
    sorted every gap through |segments| partitions — the sequential
    tail this removes; the per-row recipe stays right only for
    unbounded value domains (funnel_latency's ms latencies)."""
    from dariadb_spark.ext.exact import ratio_round_spark

    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.to_date("o_orderdate").alias("d"),
            "o_orderkey",
        )
        .select(
            "o_custkey",
            F.datediff(F.col("d"), F.lag("d", 1).over(w)).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    seg = customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    counts = (
        gaps.join(F.broadcast(seg), "o_custkey")
        .groupBy("mktsegment", "gap_days")
        .agg(F.count("*").alias("cnt"))
    )
    wcum = (
        Window.partitionBy("mktsegment")
        .orderBy("gap_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("mktsegment")
    picked = counts.select(
        "mktsegment", "gap_days", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("m"),
    ).selectExpr(
        "mktsegment",
        "m AS n_gaps",
        "gap_days * cnt AS wsum",
        "gap_days AS max_cand",
        "CASE WHEN cum - cnt < (m + 1) DIV 2 AND (m + 1) DIV 2 <= cum"
        " THEN gap_days ELSE 0 END AS med_lo",
        "CASE WHEN cum - cnt < (m + 2) DIV 2 AND (m + 2) DIV 2 <= cum"
        " THEN gap_days ELSE 0 END AS med_hi",
        "CASE WHEN cum - cnt < (9 * m + 9) DIV 10"
        " AND (9 * m + 9) DIV 10 <= cum THEN gap_days ELSE 0 END AS p90",
    )
    return (
        picked.groupBy("mktsegment")
        .agg(
            F.max("n_gaps").alias("n_gaps"),
            F.sum("wsum").alias("sum_days"),
            F.sum("med_lo").alias("mlo"),
            F.sum("med_hi").alias("mhi"),
            F.sum("p90").alias("p90_days"),
            F.max("max_cand").alias("max_days"),
        )
        .selectExpr(
            "mktsegment",
            "n_gaps",
            ratio_round_spark("sum_days", "n_gaps", 4) + " AS mean_days",
            "(mlo + mhi) / 2.0d AS median_days",
            "p90_days",
            "max_days",
        )
        .orderBy("mktsegment")
    )


def _interarrival_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
g0 AS (SELECT o_custkey,
              date_diff('day',
                        lag(CAST(o_orderdate AS DATE), 1) OVER (
                          PARTITION BY o_custkey
                          ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                        CAST(o_orderdate AS DATE)) AS gap_days
       FROM orders),
counts AS (SELECT c.c_mktsegment AS mktsegment, gap_days,
                  count(*) AS cnt
           FROM g0 g JOIN customer c ON g.o_custkey = c.c_custkey
           WHERE gap_days IS NOT NULL
           GROUP BY mktsegment, gap_days),
walked AS (SELECT mktsegment, gap_days, cnt,
                  sum(cnt) OVER (PARTITION BY mktsegment ORDER BY gap_days
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(cnt) OVER (PARTITION BY mktsegment) AS m
           FROM counts),
picked AS (SELECT mktsegment, m AS n_gaps, gap_days * cnt AS wsum,
                  gap_days AS max_cand,
                  CASE WHEN cum - cnt < (m + 1) // 2
                        AND (m + 1) // 2 <= cum
                       THEN gap_days ELSE 0 END AS med_lo,
                  CASE WHEN cum - cnt < (m + 2) // 2
                        AND (m + 2) // 2 <= cum
                       THEN gap_days ELSE 0 END AS med_hi,
                  CASE WHEN cum - cnt < (9 * m + 9) // 10
                        AND (9 * m + 9) // 10 <= cum
                       THEN gap_days ELSE 0 END AS p90
           FROM walked),
agg AS (SELECT mktsegment, CAST(max(n_gaps) AS BIGINT) AS n_gaps,
               CAST(sum(wsum) AS BIGINT) AS sum_days,
               CAST(sum(med_lo) AS BIGINT) AS mlo,
               CAST(sum(med_hi) AS BIGINT) AS mhi,
               CAST(sum(p90) AS BIGINT) AS p90_days,
               max(max_cand) AS max_days
        FROM picked GROUP BY mktsegment)
SELECT mktsegment, n_gaps,
       {ratio_round_duck("sum_days", "n_gaps", 4)} AS mean_days,
       (mlo + mhi) / 2.0 AS median_days, p90_days,
       CAST(max_days AS BIGINT) AS max_days
FROM agg ORDER BY mktsegment"""


ORDER_INTERARRIVAL_SQL = _interarrival_sql()

# Registered round 17 (staged round 16).
register("ext_order_interarrival", order_interarrival, ORDER_INTERARRIVAL_SQL)


# --- common-neighbor link prediction (graph family, fourth verb) ----------------
# STAGED for the round-17 driver window (same staging discipline).
# After "which nodes matter" (pagerank/HITS), "how many triangles"
# (census) and "how clustered is each node" (coefficient), this is the
# family's forward-looking verb: which NON-edges have the most common
# neighbors — the classic common-neighbors link-prediction score, the
# baseline every graph-ML paper reports first.

LINKPRED_TOP = 20


def part_link_pred(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r17 window (:func:`part_link_pred_op`)."""
    return part_link_pred_op(load_table(spark, sf, "lineitem"))


def part_link_pred_op(li: DataFrame) -> DataFrame:
    """Top non-adjacent part pairs by common-neighbor count in the
    support-≥2 co-purchase graph (ties: x ASC, y ASC), each with both
    endpoint degrees.

    Exactness: pure int64 (supports, degrees, wedge counts) — nothing
    to round anywhere.

    Plan shape (100 TB): the pair set is the one corpus-sized shuffle;
    the FULL wedge census (adjacency self-join on the center) costs
    Σ deg(u)² candidate rows — the definitional candidate volume of
    ANY exact common-neighbor computation, unlike the triangle count
    where orientation halves the fan-out; on hub-skewed graphs the
    production lever is a degree cap on centers (scores through a
    mega-hub carry no signal), which drops fan-out to Σ min(deg,D)² —
    semantics then change, so the cap stays a documented OPTION, not a
    default. The final anti-join and degree joins are edge- and
    node-sized."""
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= BASKET_MIN_SUP)
        .select("x", "y")
    )
    adj = pairs.selectExpr("x AS u", "y AS v").unionByName(
        pairs.selectExpr("y AS u", "x AS v")
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("deg"))
    w1 = adj.selectExpr("u AS c", "v AS p")
    w2 = adj.selectExpr("u AS c2", "v AS q")
    cand = (
        w1.join(w2, (F.col("c") == F.col("c2")) & (F.col("p") < F.col("q")))
        .groupBy("p", "q")
        .agg(F.count("*").alias("cn"))
    )
    open_pairs = cand.join(
        pairs, (cand.p == pairs.x) & (cand.q == pairs.y), "left_anti"
    )
    dx = deg.selectExpr("u AS p", "deg AS deg_x")
    dy = deg.selectExpr("u AS q", "deg AS deg_y")
    return (
        open_pairs.join(F.broadcast(dx), "p")
        .join(F.broadcast(dy), "q")
        .selectExpr("p AS x", "q AS y", "cn", "deg_x", "deg_y")
        .orderBy(F.desc("cn"), F.asc("x"), F.asc("y"))
        .limit(LINKPRED_TOP)
    )


PART_LINK_PRED_SQL = f"""WITH
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS x, b.l_partkey AS y
          FROM basket a JOIN basket b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY x, y HAVING count(*) >= {BASKET_MIN_SUP}),
adj AS (SELECT x AS u, y AS v FROM pairs
        UNION ALL SELECT y AS u, x AS v FROM pairs),
deg AS (SELECT u, count(*) AS deg FROM adj GROUP BY u),
cand AS (SELECT a1.v AS p, a2.v AS q, count(*) AS cn
         FROM adj a1 JOIN adj a2
           ON a1.u = a2.u AND a1.v < a2.v
         GROUP BY p, q),
open_pairs AS (SELECT c.p, c.q, c.cn FROM cand c
               LEFT JOIN pairs e ON c.p = e.x AND c.q = e.y
               WHERE e.x IS NULL)
SELECT o.p AS x, o.q AS y, CAST(o.cn AS BIGINT) AS cn,
       CAST(dx.deg AS BIGINT) AS deg_x, CAST(dy.deg AS BIGINT) AS deg_y
FROM open_pairs o
JOIN deg dx ON o.p = dx.u
JOIN deg dy ON o.q = dy.u
ORDER BY cn DESC, x ASC, y ASC
LIMIT {LINKPRED_TOP}"""

# Registered round 17 (staged round 16; the graph family's fourth verb).
register("ext_part_link_pred", part_link_pred, PART_LINK_PRED_SQL)


# --- revenue-decile migration matrix ---------------------------------------------
# STAGED for the round-17 driver window (same staging discipline). The
# BI family's MOBILITY verb: rfm_segments snapshots where each customer
# sits NOW, retention_cohorts counts who is still PRESENT — this is the
# matrix between them: how customers MOVE across revenue deciles from
# one period to the next, the Markov-style mobility table a growth
# review reads (mass on the diagonal = a sticky base; mass below it =
# churn risk before it shows up as absence).

#: period A = orders strictly before this year, period B = the rest
MIGRATION_SPLIT = "1998-01-01"


def customer_migration(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r17 window (:func:`customer_migration_op`)."""
    return customer_migration_op(load_table(spark, sf, "orders"))


def customer_migration_op(orders: DataFrame) -> DataFrame:
    """Decile-to-decile migration of per-customer revenue between the
    two halves of the order history (split at ``MIGRATION_SPLIT``),
    over customers active in BOTH periods.

    Exactness: per-period revenue is the exact int64 cent sum from ONE
    scan (two conditional sums); within each period customers rank by
    the tie-safe (cents DESC, custkey ASC) total order over the kept
    set, and the decile is the pure integer 1 + ((rn−1)·10) DIV m (the
    rfm quantile recipe, so ties and short sets land identically on
    both engines); the matrix cells are integer counts and cent sums —
    nothing floats anywhere.

    Plan shape (100 TB): one orders scan → one per-customer partial-agg
    shuffle → two rank windows over the ACTIVE-BOTH customer set
    (dimension-sized; at extreme cardinality each swaps to the
    range-partitioned two-pass of ``plans/prefix.py`` — the pinned
    equality contract) → a ≤100-row aggregate."""
    per = (
        orders.selectExpr(
            "o_custkey",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS rc",
            f"CAST(o_orderdate < TIMESTAMP_NTZ '{MIGRATION_SPLIT}"
            " 00:00:00' AS INT) AS in_a",
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CASE WHEN in_a = 1 THEN rc ELSE 0 END"))
            .alias("cents_a"),
            F.sum(F.expr("CASE WHEN in_a = 0 THEN rc ELSE 0 END"))
            .alias("cents_b"),
        )
        .where((F.col("cents_a") > 0) & (F.col("cents_b") > 0))
    )
    wa = Window.orderBy(F.col("cents_a").desc(), F.col("o_custkey").asc())
    wb = Window.orderBy(F.col("cents_b").desc(), F.col("o_custkey").asc())
    ranked = per.select(
        "o_custkey", "cents_a", "cents_b",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
        F.count("*").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("m"),
    )
    return (
        ranked.selectExpr(
            "cents_a", "cents_b",
            "1 + ((ra - 1) * 10) DIV m AS decile_a",
            "1 + ((rb - 1) * 10) DIV m AS decile_b",
        )
        .groupBy("decile_a", "decile_b")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents_a").alias("a_cents"),
            F.sum("cents_b").alias("b_cents"),
        )
        .orderBy("decile_a", "decile_b")
    )


CUSTOMER_MIGRATION_SQL = f"""WITH
per AS (SELECT o_custkey,
               sum(CASE WHEN o_orderdate < TIMESTAMP '{MIGRATION_SPLIT}'
                        THEN CAST(round(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS cents_a,
               sum(CASE WHEN o_orderdate >= TIMESTAMP '{MIGRATION_SPLIT}'
                        THEN CAST(round(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS cents_b
        FROM orders GROUP BY o_custkey
        HAVING cents_a > 0 AND cents_b > 0),
ranked AS (SELECT cents_a, cents_b,
                  row_number() OVER (ORDER BY cents_a DESC,
                                     o_custkey ASC) AS ra,
                  row_number() OVER (ORDER BY cents_b DESC,
                                     o_custkey ASC) AS rb,
                  count(*) OVER () AS m
           FROM per)
SELECT 1 + ((ra - 1) * 10) // m AS decile_a,
       1 + ((rb - 1) * 10) // m AS decile_b,
       count(*) AS n_customers,
       CAST(sum(cents_a) AS BIGINT) AS a_cents,
       CAST(sum(cents_b) AS BIGINT) AS b_cents
FROM ranked GROUP BY decile_a, decile_b
ORDER BY decile_a, decile_b"""

# Registered round 17 (staged round 16; the BI family's mobility verb).
register("ext_customer_migration", customer_migration, CUSTOMER_MIGRATION_SQL)


# --- edge neighborhood Jaccard (graph family, fifth verb) -------------------------
# STAGED for the round-18 driver window (the staging every late operator
# follows: implemented + oracled + pytest parity + planted stress now,
# registered at the next rotation). link_pred scores the NON-edges; this
# scores the EDGES: neighborhood Jaccard J(x,y) = |N(x)∩N(y)| /
# |N(x)∪N(y)| for adjacent pairs — "how redundant is this edge?", the
# tie-strength screen (an edge whose endpoints share most neighbors is
# embedded in a community; one with J≈0 is a bridge). Convention pinned
# here and in the oracle: the union term is deg_x + deg_y − cn, i.e.
# neighborhoods as-is (each endpoint is a member of the other's
# neighborhood) — stated because the "exclude the endpoints" variant
# differs by 2 in the denominator.

JACCARD_TOP = 20


def part_jaccard_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r18 window (:func:`part_jaccard_sim_op`)."""
    return part_jaccard_sim_op(load_table(spark, sf, "lineitem"))


def part_jaccard_sim_op(li: DataFrame) -> DataFrame:
    """Top adjacent part pairs by neighborhood Jaccard in the
    support-≥2 co-purchase graph (ties: cn DESC, x ASC, y ASC), each
    with cn, both degrees, and the HALF_UP micro-scaled score.

    Exactness: cn/degrees are int64 wedge counts; jac_micro =
    HALF_UP(10⁶·cn / (deg_x + deg_y − cn)) is the shared integer
    closure — the ORDER BY runs on the integer score, so cross-engine
    ordering is exact (never a float sort key).

    Plan shape (100 TB): identical candidate volume to the link-pred
    census (Σ deg² wedges — the definitional cost of exact
    common-neighbor counting), except the final join is a SEMI join
    onto the edge set (edge-sized) instead of an anti join, then two
    broadcast degree joins. Same degree-cap production lever, same
    documented-option status."""
    from dariadb_spark.ext.exact import ratio_round_spark

    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= BASKET_MIN_SUP)
        .select("x", "y")
    )
    adj = pairs.selectExpr("x AS u", "y AS v").unionByName(
        pairs.selectExpr("y AS u", "x AS v")
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("deg"))
    w1 = adj.selectExpr("u AS c", "v AS p")
    w2 = adj.selectExpr("u AS c2", "v AS q")
    cand = (
        w1.join(w2, (F.col("c") == F.col("c2")) & (F.col("p") < F.col("q")))
        .groupBy("p", "q")
        .agg(F.count("*").alias("cn"))
    )
    # LEFT join from the EDGE set, not a semi join from the wedge
    # census: an edge with ZERO common neighbors never appears among
    # the wedges, and a J=0 bridge is exactly what this screen exists
    # to surface — coalesce keeps it.
    edge_cn = pairs.join(
        cand, (pairs.x == cand.p) & (pairs.y == cand.q), "left"
    ).select(
        F.col("x").alias("p"),
        F.col("y").alias("q"),
        F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
    )
    dx = deg.selectExpr("u AS p", "deg AS deg_x")
    dy = deg.selectExpr("u AS q", "deg AS deg_y")
    return (
        edge_cn.join(F.broadcast(dx), "p")
        .join(F.broadcast(dy), "q")
        .selectExpr(
            "p AS x", "q AS y", "cn", "deg_x", "deg_y",
            ratio_round_spark("1000000 * cn", "deg_x + deg_y - cn", 0)
            + " AS jac_micro",
        )
        .selectExpr(
            "x", "y", "cn", "deg_x", "deg_y",
            "CAST(jac_micro AS BIGINT) AS jac_micro",
        )
        .orderBy(
            F.desc("jac_micro"), F.desc("cn"), F.asc("x"), F.asc("y")
        )
        .limit(JACCARD_TOP)
    )


def _jaccard_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS x, b.l_partkey AS y
          FROM basket a JOIN basket b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY x, y HAVING count(*) >= {BASKET_MIN_SUP}),
adj AS (SELECT x AS u, y AS v FROM pairs
        UNION ALL SELECT y AS u, x AS v FROM pairs),
deg AS (SELECT u, count(*) AS deg FROM adj GROUP BY u),
cand AS (SELECT a1.v AS p, a2.v AS q, count(*) AS cn
         FROM adj a1 JOIN adj a2
           ON a1.u = a2.u AND a1.v < a2.v
         GROUP BY p, q),
edge_cn AS (SELECT e.x AS p, e.y AS q, COALESCE(c.cn, 0) AS cn
            FROM pairs e LEFT JOIN cand c
              ON e.x = c.p AND e.y = c.q),
scored AS (SELECT o.p AS x, o.q AS y, CAST(o.cn AS BIGINT) AS cn,
                  CAST(dx.deg AS BIGINT) AS deg_x,
                  CAST(dy.deg AS BIGINT) AS deg_y
           FROM edge_cn o
           JOIN deg dx ON o.p = dx.u
           JOIN deg dy ON o.q = dy.u)
SELECT x, y, cn, deg_x, deg_y,
       CAST({ratio_round_duck("1000000 * cn", "deg_x + deg_y - cn", 0)}
            AS BIGINT) AS jac_micro
FROM scored
ORDER BY jac_micro DESC, cn DESC, x ASC, y ASC
LIMIT {JACCARD_TOP}"""


PART_JACCARD_SIM_SQL = _jaccard_sql()

# Registered round 18 (staged round 17).
register("ext_part_jaccard_sim", part_jaccard_sim, PART_JACCARD_SIM_SQL)


# --- cohort lifetime-value curve ---------------------------------------------------
# STAGED for the round-18 driver window (same staging discipline). The
# BI family's VALUE-over-time verb: retention_cohorts counts who is
# still PRESENT, customer_migration shows how they MOVE between tiers —
# this is the curve finance actually plots: cumulative revenue per
# acquisition cohort as the cohort ages (the LTV curve whose flattening
# point sets the payback window).


def orders_cohort_ltv(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r18 window (:func:`orders_cohort_ltv_op`)."""
    return orders_cohort_ltv_op(load_table(spark, sf, "orders"))


def orders_cohort_ltv_op(orders: DataFrame) -> DataFrame:
    """(cohort_year, age_years, n_active, rev_cents, cum_rev_cents):
    cohort = year of the customer's FIRST order; age = order year −
    cohort year; n_active = distinct cohort customers ordering at that
    age; cum_rev_cents accumulates per cohort over age.

    Exactness: pure int64 — exact cents (the money rule), exact
    distinct counts, and the cumulative sum runs over the ≤|years|²-row
    summary, never the orders.

    Plan shape (100 TB): one orders scan → per-customer min-year
    partial agg (one shuffle on o_custkey, the same key every
    customer-grain query shuffles on) → the cohort tag joins back
    BROADCAST (|customers| rows of (custkey, yr) is dim-sized at any
    realistic scale; if customers outgrow broadcast the join keys on
    the SAME o_custkey partitioning and stays co-located) → the
    (cohort, age) agg is a ≤49-key shuffle with map-side combine → the
    cumulative window runs on the 49-row summary. Nothing re-reads the
    corpus."""
    per = orders.select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cohort = per.groupBy("o_custkey").agg(F.min("yr").alias("cohort_year"))
    tagged = per.join(F.broadcast(cohort), "o_custkey").select(
        "cohort_year",
        (F.col("yr") - F.col("cohort_year")).alias("age_years"),
        "o_custkey",
        "cents",
    )
    return ltv_curve(tagged)


def ltv_curve(tagged: DataFrame) -> DataFrame:
    """The finishing summary over (cohort_year, age_years, o_custkey,
    cents) rows — SHARED verbatim by the batch operator and the
    streaming twin (streaming/ltv.py), whose per-batch delta rows have
    exactly this shape; exact distinct counts and int64 cents survive
    any per-batch pre-aggregation because custkey rides along."""
    summary = tagged.groupBy("cohort_year", "age_years").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("cents").alias("rev_cents"),
    )
    wc = (
        Window.partitionBy("cohort_year")
        .orderBy("age_years")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        summary.select(
            "cohort_year", "age_years", "n_active", "rev_cents",
            F.sum("rev_cents").over(wc).alias("cum_rev_cents"),
        )
        .orderBy("cohort_year", "age_years")
    )


def _ltv_sql(where: str = "") -> str:
    return f"""WITH
per AS (SELECT o_custkey, year(o_orderdate) AS yr,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders{where}),
cohort AS (SELECT o_custkey, min(yr) AS cohort_year FROM per
           GROUP BY o_custkey),
tagged AS (SELECT c.cohort_year, p.yr - c.cohort_year AS age_years,
                  p.o_custkey, p.cents
           FROM per p JOIN cohort c ON p.o_custkey = c.o_custkey),
summary AS (SELECT cohort_year, age_years,
                   count(DISTINCT o_custkey) AS n_active,
                   CAST(sum(cents) AS BIGINT) AS rev_cents
            FROM tagged GROUP BY cohort_year, age_years)
SELECT cohort_year, age_years, n_active, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY cohort_year
                                 ORDER BY age_years
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_rev_cents
FROM summary ORDER BY cohort_year, age_years"""


ORDERS_COHORT_LTV_SQL = _ltv_sql()

#: the streaming twin folds a 1-in-LTV_PARITY_MOD customer slice — the
#: IDS-slice convention every stateful parity row uses: the fold cost
#: is per-GROUP python overhead, so an unsliced fold over every
#: customer measures the harness, not the operator (27 s vs ~3 s at
#: sf0.1). The oracle is the SAME curve SQL over the same slice.
LTV_PARITY_MOD = 20
LTV_PARITY_RESIDUE = 7
ORDERS_COHORT_LTV_PARITY_SQL = _ltv_sql(
    f" WHERE o_custkey % {LTV_PARITY_MOD} = {LTV_PARITY_RESIDUE}"
)

# Registered round 18 (staged round 17).
register("ext_orders_cohort_ltv", orders_cohort_ltv, ORDERS_COHORT_LTV_SQL)


def _streaming_ltv_parity(spark: SparkSession, sf: str) -> DataFrame:
    # Lazy import — same circularity guard as the timeseries twins.
    from dariadb_spark.streaming.ltv import streaming_ltv_parity

    return streaming_ltv_parity(spark, sf)


# Registered round 18 (staged round 17, second pass). The stateful
# cohort-curve twin: 3-int64 per-customer state (cohort year + last
# (epoch-day, orderkey)); append-mode delta rows finish through the
# SHARED ltv_curve projection; in-order contract with equality-accept
# (strictly-before would rewrite the cohort retroactively). Cents are
# rounded HALF-UP in the Spark projection BEFORE the fold (ADVICE r17:
# numpy's banker's rounding diverges on exact .5 cents). Oracle = the
# batch curve SQL over the same 1-in-LTV_PARITY_MOD customer slice.
register(
    "streaming_ltv_parity",
    _streaming_ltv_parity,
    ORDERS_COHORT_LTV_PARITY_SQL,
)

# --- order-to-ship latency distribution -------------------------------------------
# STAGED for the round-18 driver window (same staging discipline). The
# supply-chain cadence verb: how long from order placement to each line
# shipping, summarized per order priority — the SLA screen that says
# whether URGENT actually ships faster (the funnel_latency /
# interarrival distribution recipe on the one join this repo's BI
# family hadn't exercised at distribution grain: lineitem ⋈ orders).


def ship_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r18 window (:func:`ship_latency_op`)."""
    return ship_latency_op(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "orders")
    )


def ship_latency_op(li: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-priority distribution of order→ship day gaps:
    (priority, n_lines, mean_days, median_days, p90_days, max_days).

    Exactness: gaps are exact integer days (datediff on DATE-truncated
    endpoints, identical in both engines); mean is the HALF_UP 4-dp
    ratio; median is the doubled-rank walk and p90 the rank-⌈0.9·m⌉
    order statistic — both read off the WEIGHTED count table, not
    ranked rows (below), so they are exact order statistics of the
    full multiset.

    Plan shape (100 TB) — the weighted-distribution design, not the
    per-row rank recipe: integer day gaps live in a tiny domain
    (hundreds of values), so after the ONE corpus-sized exchange (the
    lineitem ⋈ orders equi-join on l_orderkey — the natural
    co-location key both tables are bucketed on in a production
    layout, making it shuffle-free there) the distribution collapses
    to a map-side-combined (priority, gap) COUNT table of a few
    thousand rows; median/p90 become a cumulative walk over that tiny
    table. The per-row rank-window variant (the funnel_latency
    recipe) sorts the full corpus through |priorities| partitions —
    measured 16× slower at 21M rows — and is only needed when the
    value domain is unbounded; day gaps are not."""
    from dariadb_spark.ext.exact import ratio_round_spark

    gaps = (
        li.select(
            "l_orderkey", F.to_date("l_shipdate").alias("sd")
        )
        .join(
            orders.select(
                "o_orderkey",
                F.to_date("o_orderdate").alias("od"),
                "o_orderpriority",
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff("sd", "od").alias("gap_days"),
        )
    )
    counts = gaps.groupBy("priority", "gap_days").agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("gap_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("priority")
    walked = counts.select(
        "priority", "gap_days", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("m"),
    )
    picked = walked.selectExpr(
        "priority",
        "m AS n_lines",
        "gap_days * cnt AS wsum",
        "gap_days AS max_cand",
        # the two middle ranks and the p90 rank, read off the
        # cumulative interval (cum - cnt, cum] that covers each
        "CASE WHEN cum - cnt < (m + 1) DIV 2 AND (m + 1) DIV 2 <= cum"
        " THEN gap_days ELSE 0 END AS med_lo",
        "CASE WHEN cum - cnt < (m + 2) DIV 2 AND (m + 2) DIV 2 <= cum"
        " THEN gap_days ELSE 0 END AS med_hi",
        "CASE WHEN cum - cnt < (9 * m + 9) DIV 10"
        " AND (9 * m + 9) DIV 10 <= cum THEN gap_days ELSE 0 END AS p90",
    )
    return (
        picked.groupBy("priority")
        .agg(
            F.max("n_lines").alias("n_lines"),
            F.sum("wsum").alias("sum_days"),
            F.sum("med_lo").alias("mlo"),
            F.sum("med_hi").alias("mhi"),
            F.sum("p90").alias("p90_days"),
            F.max("max_cand").alias("max_days"),
        )
        .selectExpr(
            "priority",
            "n_lines",
            ratio_round_spark("sum_days", "n_lines", 4) + " AS mean_days",
            "(mlo + mhi) / 2.0d AS median_days",
            "p90_days",
            "max_days",
        )
        .orderBy("priority")
    )


def _ship_latency_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
gaps AS (SELECT o.o_orderpriority AS priority,
                date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE)) AS gap_days
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
counts AS (SELECT priority, gap_days, count(*) AS cnt
           FROM gaps GROUP BY priority, gap_days),
walked AS (SELECT priority, gap_days, cnt,
                  sum(cnt) OVER (PARTITION BY priority ORDER BY gap_days
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(cnt) OVER (PARTITION BY priority) AS m
           FROM counts),
picked AS (SELECT priority, m AS n_lines, gap_days * cnt AS wsum,
                  gap_days AS max_cand,
                  CASE WHEN cum - cnt < (m + 1) // 2
                        AND (m + 1) // 2 <= cum
                       THEN gap_days ELSE 0 END AS med_lo,
                  CASE WHEN cum - cnt < (m + 2) // 2
                        AND (m + 2) // 2 <= cum
                       THEN gap_days ELSE 0 END AS med_hi,
                  CASE WHEN cum - cnt < (9 * m + 9) // 10
                        AND (9 * m + 9) // 10 <= cum
                       THEN gap_days ELSE 0 END AS p90
           FROM walked),
agg AS (SELECT priority, CAST(max(n_lines) AS BIGINT) AS n_lines,
               CAST(sum(wsum) AS BIGINT) AS sum_days,
               CAST(sum(med_lo) AS BIGINT) AS mlo,
               CAST(sum(med_hi) AS BIGINT) AS mhi,
               CAST(sum(p90) AS BIGINT) AS p90_days,
               max(max_cand) AS max_days
        FROM picked GROUP BY priority)
SELECT priority, n_lines,
       {ratio_round_duck("sum_days", "n_lines", 4)} AS mean_days,
       (mlo + mhi) / 2.0 AS median_days, p90_days,
       CAST(max_days AS BIGINT) AS max_days
FROM agg ORDER BY priority"""


SHIP_LATENCY_SQL = _ship_latency_sql()

# Registered round 18 (staged round 17).
register("ext_ship_latency", ship_latency, SHIP_LATENCY_SQL)


# --- discount → volume response (OLS slope) ----------------------------------------
# STAGED for the round-18 driver window (same staging discipline). The
# BI family's REGRESSION verb: does discounting actually move volume?
# Per return-flag cohort, the OLS slope of quantity on discount — the
# price-response reading next to pricing_summary's static margins.
# ext_series_trend fits value-on-TIME per series; this is the
# cross-sectional twin on a relational slice, same closed-form sums.


def discount_response(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r18 window (:func:`discount_response_op`)."""
    return discount_response_op(load_table(spark, sf, "lineitem"))


def discount_response_op(li: DataFrame) -> DataFrame:
    """(returnflag, n_lines, sum_disc_points, sum_qty_cents,
    slope_micro): the exact-integer OLS slope of quantity (cents) on
    discount (points = hundredths), micro-scaled HALF_UP.

    Exactness: x = round(discount·100) and y = round(quantity·100) are
    exact int64 (both source columns are hundredth-grain doubles well
    inside 2⁵³); the four accumulators are int64 sums; the slope
    numerator n·Σxy − Σx·Σy and denominator n·Σx² − (Σx)² are widened
    to DECIMAL(38,0)/HUGEINT BEFORE the products (n² terms outgrow
    int64 near ~10⁹ lines — the Gini denominator lesson, applied at
    birth instead of by ADVICE), and the single float per row is the
    signed wide HALF_UP 6-dp ratio. Groups with zero discount variance
    are excluded (HAVING den > 0) — the slope does not exist there.

    Plan shape (100 TB): one lineitem scan → ONE partial-aggregated
    shuffle on the 3-key returnflag (map-side combine collapses each
    partition to ≤3 rows of 5 sums); the ratio is a stateless
    projection on the 3-row summary. Scan-bound at any scale."""
    from dariadb_spark.ext.exact import ratio_round_signed_wide_spark

    sums = (
        li.selectExpr(
            "l_returnflag AS returnflag",
            "CAST(round(l_discount * 100) AS BIGINT) AS x",
            "CAST(round(l_quantity * 100) AS BIGINT) AS y",
        )
        .groupBy("returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    num = (
        "n_lines * CAST(sxy AS DECIMAL(38,0))"
        " - CAST(sx AS DECIMAL(38,0)) * sy"
    )
    den = (
        "n_lines * CAST(sxx AS DECIMAL(38,0))"
        " - CAST(sx AS DECIMAL(38,0)) * sx"
    )
    return (
        sums.where(F.expr(f"({den}) > 0"))
        .selectExpr(
            "returnflag",
            "n_lines",
            "sx AS sum_disc_points",
            "sy AS sum_qty_cents",
            ratio_round_signed_wide_spark(num, den, 6) + " AS slope",
        )
        .orderBy("returnflag")
    )


def _discount_response_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_signed_wide_duck

    num = "n_lines * CAST(sxy AS HUGEINT) - CAST(sx AS HUGEINT) * sy"
    den = "n_lines * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx"
    return f"""WITH
pts AS (SELECT l_returnflag AS returnflag,
               CAST(round(l_discount * 100) AS BIGINT) AS x,
               CAST(round(l_quantity * 100) AS BIGINT) AS y
        FROM lineitem),
sums AS (SELECT returnflag, count(*) AS n_lines,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
         FROM pts GROUP BY returnflag)
SELECT returnflag, n_lines, sx AS sum_disc_points, sy AS sum_qty_cents,
       {ratio_round_signed_wide_duck(num, den, 6)} AS slope
FROM sums WHERE ({den}) > 0
ORDER BY returnflag"""


DISCOUNT_RESPONSE_SQL = _discount_response_sql()

# Registered round 18 (staged round 17).
register("ext_discount_response", discount_response, DISCOUNT_RESPONSE_SQL)


# --- k-core decomposition (graph family, sixth verb) -------------------------------
# STAGED for the round-18 driver window (second pass, same staging
# discipline). After "which nodes matter" (pagerank/HITS), the census
# (triangles), the per-node texture (clustering), the forward screen
# (link_pred) and the edge screen (jaccard_sim), this is the COHESION
# verb: the k-core — the maximal subgraph where every node keeps ≥ k
# neighbors — found by iteratively peeling under-degree nodes. The
# recommender reading: parts in the core sell in a self-reinforcing
# bundle (every member keeps ≥ k co-purchase partners after the
# hangers-on are peeled away); parts peeled in round 1 only tag along.

#: k = 2 — the cycle-bound core. The co-purchase graph THINS with
#: scale (per-pair repeat probability falls as the part domain grows),
#: and the sf0.1 support-≥2 graph's 3-core is EMPTY (probed: degree
#: histogram collapses to 83% degree-1); its 2-core holds 3 nodes at
#: sf0.1, 1535 at sf0.01, 200 at sf0.001 — nonempty at every driver
#: scale, peeling in ≤5 rounds everywhere (probed against the exact
#: python fixpoint).
KCORE_K = 2
#: previous call's lazy checkpoints, released on the next call (the
#: _rotate_cms_checkpoint precedent in ext/sketches.py)
_KCORE_PREV_CHECKPOINTS: list = []
#: unrolled peeling rounds — the fixpoint bound for every fixture and
#: stress input (asserted by the planted tests: one more round changes
#: nothing). The pagerank/HITS fixed-iteration precedent: both engines
#: run EXACTLY this many rounds, so the oracle is replayable even when
#: a pathological input hasn't converged (peeling is monotone, so an
#: unconverged answer is a superset of the true core on both engines —
#: identical on both, which is what the driver checks).
KCORE_ROUNDS = 8
KCORE_TOP = 30


def part_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r18 window (:func:`part_kcore_op`)."""
    return part_kcore_op(load_table(spark, sf, "lineitem"))


def part_kcore_op(li: DataFrame) -> DataFrame:
    """Top parts surviving KCORE_ROUNDS rounds of degree-< K peeling on
    the support-≥2 co-purchase graph: (part, deg0, core_deg), ordered
    core_deg DESC, deg0 DESC, part ASC, limit KCORE_TOP.

    Exactness: pure int64 degree counts — nothing to round.

    Plan shape (100 TB): the pair build is the one corpus-sized
    shuffle, materialized ONCE (persist over an explicit src
    repartition — r20; the rotation pattern) whose standing
    partitioning every peeling round's degree aggregate reuses with no
    further exchange; each round is that edge-linear aggregate plus
    TWO semi joins of the edge table against the surviving node set
    (node-sized build side → broadcast at any realistic core size) —
    O(rounds · |E|) total with ONE |E| shuffle, the textbook
    distributed peel. The survivor set is lazily checkpointed per
    round: unlike pagerank, where a fixed edge table carries an
    iterating VECTOR (linear lineage), peeling iterates the EDGE
    predicate itself, so an uncheckpointed unroll nests the previous
    round twice per round — a 2⁸-subtree logical plan that stalls
    Catalyst before execution even starts (measured: the naive unroll
    never finished planning at sf0.001; the checkpointed form runs in
    seconds). Pins are node-/edge-sized and rotation-released on the
    next call."""
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= BASKET_MIN_SUP)
        .select("x", "y")
    )
    edges = pairs.selectExpr("x AS src", "y AS dst").unionByName(
        pairs.selectExpr("y AS src", "x AS dst")
    )
    while _KCORE_PREV_CHECKPOINTS:
        try:
            _KCORE_PREV_CHECKPOINTS.pop().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — nothing retained anyway
    # r20 (guide §2.4): hash-partition the edge table by src ONCE and
    # pin it with persist() rather than localCheckpoint — the cached
    # plan KEEPS its outputPartitioning (a LogicalRDD under AQE reports
    # unknown partitioning: measured, the checkpointed form still paid
    # one degree-agg exchange per round), so every peeling round's
    # degree aggregate (groupBy src) and the final core_deg aggregate
    # run on the standing partitioning with NO exchange: one |E|
    # shuffle total instead of KCORE_ROUNDS + 1 (the semi joins'
    # broadcast build sides are node-sized and preserve the streamed
    # side's partitioning). Lineage is kept, so this pin is also
    # cluster-fault-tolerant (the r20 pin_corpus rationale). Only the
    # per-round `keep` chain still localCheckpoints — that one exists
    # to truncate the 2^rounds logical nesting (see below), which
    # persist does not do.
    ed0 = edges.repartition("src").persist()
    _KCORE_PREV_CHECKPOINTS.append(ed0)
    deg0 = ed0.groupBy("src").agg(F.count("*").alias("deg0"))
    ed = ed0
    for _ in range(KCORE_ROUNDS):
        keep = (
            ed.groupBy("src")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") >= KCORE_K)
            .select("src")
            .localCheckpoint(eager=False)
        )
        _KCORE_PREV_CHECKPOINTS.append(keep)
        ed = ed0.join(F.broadcast(keep), "src", "left_semi").join(
            F.broadcast(keep.selectExpr("src AS dst")), "dst", "left_semi"
        )
    core_deg = ed.groupBy("src").agg(F.count("*").alias("core_deg"))
    return (
        core_deg.where(F.col("core_deg") >= KCORE_K)
        .join(F.broadcast(deg0), "src")
        .selectExpr("src AS part", "deg0", "core_deg")
        .orderBy(F.desc("core_deg"), F.desc("deg0"), F.asc("part"))
        .limit(KCORE_TOP)
    )


def _kcore_sql() -> str:
    # Every CTE in the peel chain is AS MATERIALIZED: DuckDB inlines
    # plain CTEs per reference, and e_r references e_{r-1} three times
    # (twice through k_r) — an un-materialized chain expands 3^ROUNDS
    # plans deep and exhausts file handles on the repeated parquet
    # scans, the exact Spark-side blowup the lazy checkpoints fix.
    rounds = []
    prev = "e0"
    for r in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"""k{r} AS MATERIALIZED (SELECT src FROM {prev}
       GROUP BY src HAVING count(*) >= {KCORE_K}),
e{r} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e
         JOIN k{r} a ON e.src = a.src
         JOIN k{r} b ON e.dst = b.src)"""
        )
        prev = f"e{r}"
    chain = ",\n".join(rounds)
    return f"""WITH
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS MATERIALIZED (SELECT a.l_partkey AS x, b.l_partkey AS y
          FROM basket a JOIN basket b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY x, y HAVING count(*) >= {BASKET_MIN_SUP}),
e0 AS MATERIALIZED (SELECT x AS src, y AS dst FROM pairs
       UNION ALL SELECT y AS src, x AS dst FROM pairs),
deg0 AS (SELECT src, count(*) AS deg0 FROM e0 GROUP BY src),
{chain},
core AS (SELECT src, count(*) AS core_deg FROM {prev}
         GROUP BY src HAVING count(*) >= {KCORE_K})
SELECT c.src AS part, CAST(d.deg0 AS BIGINT) AS deg0,
       CAST(c.core_deg AS BIGINT) AS core_deg
FROM core c JOIN deg0 d ON c.src = d.src
ORDER BY core_deg DESC, deg0 DESC, part ASC
LIMIT {KCORE_TOP}"""


PART_KCORE_SQL = _kcore_sql()

# Registered round 18 (staged round 17, second pass).
register("ext_part_kcore", part_kcore, PART_KCORE_SQL)


# --- degree assortativity (graph family, eighth verb) ------------------------------
# STAGED for the round-19 driver window (the staging every late operator
# follows: implemented + oracled + pytest parity + planted closed-form
# grid + ≥100k-row stress now, registered at the next rotation). After
# importance (pagerank/HITS), census (triangles), texture (clustering),
# screens (link_pred/jaccard_sim) and cohesion (kcore), this is the
# MIXING verb: Newman's degree assortativity — do high-degree parts
# co-purchase with other high-degree parts (r > 0, a hub club) or with
# leaves (r < 0, hub-and-spoke)? One scale-free number a recommender
# planner reads next to the clustering histogram.


def part_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`part_assortativity_op`)."""
    return part_assortativity_op(load_table(spark, sf, "lineitem"))


def part_assortativity_op(li: DataFrame) -> DataFrame:
    """One-row degree-mixing summary of the support-≥2 co-purchase
    graph: (n_nodes, n_edges, sum_deg, assort).

    Newman's r over the symmetrized edge list (each undirected edge
    contributes both (dx, dy) and (dy, dx); M = 2·|E|):
    r = (M·Σdxdy·2 − S1²) / (M·Sq − S1²) with S1 = Σ(dx+dy),
    Sq = Σ(dx²+dy²) — an EXACT rational: degrees are int64, the n²
    products ride DECIMAL(38,0)/HUGEINT (the Gini/HHI wide recipe), and
    the output is the HALF_UP 6-dp signed wide ratio. A
    degree-regular graph has den = 0 (r undefined); the row reports an
    explicit 0.0 there (documented, matched in the oracle) rather than
    NULL — assortativity of a regular graph is conventionally 0.

    Plan shape (100 TB): one basket-pair shuffle (the graph family's
    shared cost), two BROADCAST degree joins (dimension-sized), then a
    single 1-row global aggregate — no window, no iteration, no
    cartesian (the 1-row × 1-row combine is a broadcast join)."""
    from dariadb_spark.ext.exact import ratio_round_signed_wide_spark

    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= BASKET_MIN_SUP)
        .select("x", "y")
    )
    deg = (
        pairs.selectExpr("x AS node").unionByName(pairs.selectExpr("y AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    dx = deg.selectExpr("node AS nx", "deg AS degx")
    dy = deg.selectExpr("node AS ny", "deg AS degy")
    edges = (
        pairs.join(F.broadcast(dx), pairs.x == F.col("nx"))
        .join(F.broadcast(dy), pairs.y == F.col("ny"))
        .selectExpr(
            "CAST(degx AS DECIMAL(38,0)) AS wx",
            "CAST(degy AS DECIMAL(38,0)) AS wy",
            "degx + degy AS s1_term",
        )
    )
    sums = edges.agg(
        F.count("*").alias("n_edges"),
        F.sum("s1_term").alias("s1"),
        F.sum(F.expr("wx * wy")).alias("sxy_half"),
        F.sum(F.expr("wx * wx + wy * wy")).alias("sq"),
    )
    nn = deg.agg(F.count("*").alias("n_nodes"))
    num = (
        "2 * n_edges * (2 * sxy_half)"
        " - CAST(s1 AS DECIMAL(38,0)) * s1"
    )
    den = (
        "2 * n_edges * sq - CAST(s1 AS DECIMAL(38,0)) * s1"
    )
    return (
        F.broadcast(nn).crossJoin(sums)
        .selectExpr(
            "n_nodes",
            "n_edges",
            "s1 AS sum_deg",
            f"CASE WHEN ({den}) = 0 THEN 0.0d ELSE "
            + ratio_round_signed_wide_spark(num, den, 6)
            + " END AS assort",
        )
    )


def _assortativity_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_signed_wide_duck

    num = "2 * n_edges * (2 * sxy_half) - CAST(s1 AS HUGEINT) * s1"
    den = "2 * n_edges * sq - CAST(s1 AS HUGEINT) * s1"
    return f"""WITH
basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (SELECT a.l_partkey AS x, b.l_partkey AS y
          FROM basket a JOIN basket b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY x, y HAVING count(*) >= {BASKET_MIN_SUP}),
deg AS (SELECT node, count(*) AS deg FROM (
          SELECT x AS node FROM pairs
          UNION ALL SELECT y AS node FROM pairs)
        GROUP BY node),
e AS (SELECT dx.deg AS degx, dy.deg AS degy
      FROM pairs p
      JOIN deg dx ON p.x = dx.node
      JOIN deg dy ON p.y = dy.node),
sums AS (SELECT count(*) AS n_edges,
                CAST(sum(degx + degy) AS BIGINT) AS s1,
                sum(CAST(degx AS HUGEINT) * degy) AS sxy_half,
                sum(CAST(degx AS HUGEINT) * degx
                    + CAST(degy AS HUGEINT) * degy) AS sq
         FROM e),
nn AS (SELECT count(*) AS n_nodes FROM deg)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       s1 AS sum_deg,
       CASE WHEN ({den}) = 0 THEN 0.0 ELSE
       {ratio_round_signed_wide_duck(num, den, 6)} END AS assort
FROM nn, sums"""


PART_ASSORTATIVITY_SQL = _assortativity_sql()


# --- order seasonality (calendar mix) -----------------------------------------------
# STAGED for the round-19 driver window (same staging discipline). The
# BI family's CALENDAR verb: how do orders and revenue distribute over
# the month-of-year? The demand-planning baseline read before any
# forecast (Holt) or drift screen (PSI) makes sense — a 12-row summary
# whose shares are exact HALF_UP micro rationals of int64 cents.


def orders_seasonality(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`orders_seasonality_op`)."""
    return orders_seasonality_op(load_table(spark, sf, "orders"))


def orders_seasonality_op(orders: DataFrame) -> DataFrame:
    """(month, n_orders, cents, orders_share_micro, cents_share_micro)
    — calendar-month mix of order count and revenue.

    Exactness: cents are the HALF_UP int64 projection of o_totalprice
    (the house money convention); shares are HALF_UP(10⁶·part/total)
    integer rationals — both engines compute the identical closure, no
    float accumulation anywhere. Months with no orders are absent (an
    explicit 12-row calendar would fabricate zero rows the oracle
    cannot distinguish from data).

    Plan shape (100 TB): one pruned scan (ReadSchema: o_orderdate,
    o_totalprice) → a map-side-combined 12-key aggregate → totals as a
    1-row broadcast join → a stateless share projection. No window, no
    per-row rank, nothing driver-side."""
    monthly = (
        orders.selectExpr(
            "month(o_orderdate) AS month",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("month")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
    )
    return seasonality_report(monthly)


def seasonality_report(monthly: DataFrame) -> DataFrame:
    """The finishing share projection over per-month (n_orders, cents)
    partials — SHARED verbatim by the batch operator and the streaming
    twin (streaming/seasonality.py), so statefulness can only show up
    in the partials, never in the arithmetic."""
    totals = monthly.agg(
        F.sum("n_orders").alias("t_orders"),
        F.sum("cents").alias("t_cents"),
    )
    return (
        monthly.join(F.broadcast(totals))
        .selectExpr(
            "month",
            "n_orders",
            "cents",
            # int64 envelope (ADVICE r18): the 2·mass·10⁶ term caps the
            # per-group mass at ~4.6e12 (≈ $46B in cents) before int64
            # wraps — past it DuckDB errors loudly while non-ANSI Spark
            # wraps silently; route through ext/exact.py's
            # ratio_round_wide / DECIMAL(38,0) when a deployment can
            # approach that mass (part_price_size/vr_test convention)
            "CAST((2 * n_orders * 1000000 + t_orders)"
            " DIV (2 * t_orders) AS BIGINT) AS orders_share_micro",
            "CAST((2 * cents * 1000000 + t_cents)"
            " DIV (2 * t_cents) AS BIGINT) AS cents_share_micro",
        )
        .orderBy("month")
    )


ORDERS_SEASONALITY_SQL = """WITH
monthly AS (SELECT month(o_orderdate) AS month,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY month),
tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS t_orders,
               CAST(sum(cents) AS BIGINT) AS t_cents FROM monthly)
SELECT CAST(month AS BIGINT) AS month, n_orders, cents,
       (2 * n_orders * 1000000 + t_orders) // (2 * t_orders)
         AS orders_share_micro,
       (2 * cents * 1000000 + t_cents) // (2 * t_cents)
         AS cents_share_micro
FROM monthly, tot
ORDER BY month"""


# --- basket-size mix (lines per order) ----------------------------------------------
# STAGED for the round-19 driver window (same staging discipline). The
# BI family's ORDER-SHAPE verb: how many lineitems does an order carry,
# per priority class? The operational sizing read (pick/pack capacity,
# batching policy) next to ship_latency's WHEN and market_basket's
# WHAT-TOGETHER — and a second exercise of the weighted-distribution
# design on a genuinely tiny domain (basket sizes are single digits).


def basket_size_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`basket_size_mix_op`)."""
    return basket_size_mix_op(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "orders")
    )


def basket_size_mix_op(li: DataFrame, orders: DataFrame) -> DataFrame:
    """(priority, n_orders, mean_lines, median_lines, p90_lines,
    max_lines) — the lines-per-order distribution per order priority.

    Exactness: per-order line counts are int64; mean is the HALF_UP
    4-dp ratio; median is the doubled-rank walk and p90 the
    rank-⌈0.9·m⌉ order statistic, both read off the WEIGHTED
    (priority, n_lines) count table — exact order statistics of the
    full multiset (the ship_latency recipe).

    Plan shape (100 TB): one per-order aggregate on l_orderkey (the
    natural bucketing key — shuffle-free on a bucketed layout), the
    equi-join to orders on the same key (co-located there too), then
    a map-side-combined count table of |priorities| × |distinct basket
    sizes| rows — single digits by tens — and a cumulative walk over
    that tiny table. No per-row rank anywhere."""
    from dariadb_spark.ext.exact import ratio_round_spark

    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines")
    )
    sized = per_order.join(
        orders.select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.col("o_orderpriority").alias("priority"), "n_lines"
    )
    counts = sized.groupBy("priority", "n_lines").agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        Window.partitionBy("priority")
        .orderBy("n_lines")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("priority")
    walked = counts.select(
        "priority", "n_lines", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("m"),
    )
    picked = walked.selectExpr(
        "priority",
        "m AS n_orders",
        "n_lines * cnt AS wsum",
        "n_lines AS max_cand",
        "CASE WHEN cum - cnt < (m + 1) DIV 2 AND (m + 1) DIV 2 <= cum"
        " THEN n_lines ELSE 0 END AS med_lo",
        "CASE WHEN cum - cnt < (m + 2) DIV 2 AND (m + 2) DIV 2 <= cum"
        " THEN n_lines ELSE 0 END AS med_hi",
        "CASE WHEN cum - cnt < (9 * m + 9) DIV 10"
        " AND (9 * m + 9) DIV 10 <= cum THEN n_lines ELSE 0 END AS p90",
    )
    return (
        picked.groupBy("priority")
        .agg(
            F.max("n_orders").alias("n_orders"),
            F.sum("wsum").alias("sum_lines"),
            F.sum("med_lo").alias("mlo"),
            F.sum("med_hi").alias("mhi"),
            F.sum("p90").alias("p90_lines"),
            F.max("max_cand").alias("max_lines"),
        )
        .selectExpr(
            "priority",
            "n_orders",
            ratio_round_spark("sum_lines", "n_orders", 4) + " AS mean_lines",
            "(mlo + mhi) / 2.0d AS median_lines",
            "p90_lines",
            "max_lines",
        )
        .orderBy("priority")
    )


def _basket_size_mix_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
per_order AS (SELECT l_orderkey, count(*) AS n_lines
              FROM lineitem GROUP BY l_orderkey),
sized AS (SELECT o.o_orderpriority AS priority, p.n_lines
          FROM per_order p JOIN orders o ON p.l_orderkey = o.o_orderkey),
counts AS (SELECT priority, n_lines, count(*) AS cnt
           FROM sized GROUP BY priority, n_lines),
walked AS (SELECT priority, n_lines, cnt,
                  sum(cnt) OVER (PARTITION BY priority ORDER BY n_lines
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(cnt) OVER (PARTITION BY priority) AS m
           FROM counts),
picked AS (SELECT priority, m AS n_orders, n_lines * cnt AS wsum,
                  n_lines AS max_cand,
                  CASE WHEN cum - cnt < (m + 1) // 2
                        AND (m + 1) // 2 <= cum
                       THEN n_lines ELSE 0 END AS med_lo,
                  CASE WHEN cum - cnt < (m + 2) // 2
                        AND (m + 2) // 2 <= cum
                       THEN n_lines ELSE 0 END AS med_hi,
                  CASE WHEN cum - cnt < (9 * m + 9) // 10
                        AND (9 * m + 9) // 10 <= cum
                       THEN n_lines ELSE 0 END AS p90
           FROM walked)
SELECT priority, CAST(n_orders AS BIGINT) AS n_orders,
       {ratio_round_duck("sum(wsum)", "max(n_orders)", 4)} AS mean_lines,
       (sum(med_lo) + sum(med_hi)) / 2.0 AS median_lines,
       CAST(sum(p90) AS BIGINT) AS p90_lines,
       CAST(max(max_cand) AS BIGINT) AS max_lines
FROM picked GROUP BY priority, n_orders
ORDER BY priority"""


BASKET_SIZE_MIX_SQL = _basket_size_mix_sql()


# --- customer tenure span (lifetime length) -----------------------------------------
# STAGED for the round-19 driver window (same staging discipline). The
# BI family's LIFETIME-LENGTH verb, orthogonal to the LTV curve's
# value-over-age: how LONG does a customer relationship last, per
# market segment? Span = days between first and last order — a
# single-order customer spans 0 days (a real cohort, not noise). Day
# spans live in a small integer domain (the fixture's calendar is a
# few years), so the distribution rides the weighted-count walk — the
# ship_latency/basket_size recipe, never a per-row rank window.


def customer_tenure(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`customer_tenure_op`)."""
    return customer_tenure_op(
        load_table(spark, sf, "orders"), load_table(spark, sf, "customer")
    )


def customer_tenure_op(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, n_customers, mean_days, median_days, p90_days,
    max_days) — the first-to-last-order span distribution per market
    segment.

    Exactness: spans are int64 day counts (datediff of DATE-truncated
    timestamps — both engines truncate identically); mean is the
    HALF_UP 4-dp ratio; median is the doubled-rank walk and p90 the
    rank-⌈0.9·m⌉ order statistic off the WEIGHTED (segment, span)
    count table.

    Plan shape (100 TB): one per-customer min/max aggregate on
    o_custkey (the natural bucketing key), the equi-join to customer
    on the same key (co-located on a bucketed layout), then a
    map-side-combined count table of |segments| × |distinct spans|
    rows — thousands — and the cumulative walk over that tiny table."""
    from dariadb_spark.ext.exact import ratio_round_spark

    spans = (
        orders.groupBy("o_custkey")
        .agg(
            F.min(F.to_date("o_orderdate")).alias("first_d"),
            F.max(F.to_date("o_orderdate")).alias("last_d"),
        )
        .join(
            customer.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff("last_d", "first_d").alias("span_days"),
        )
    )
    counts = spans.groupBy("segment", "span_days").agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        Window.partitionBy("segment")
        .orderBy("span_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("segment")
    walked = counts.select(
        "segment", "span_days", "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("m"),
    )
    picked = walked.selectExpr(
        "segment",
        "m AS n_customers",
        "span_days * cnt AS wsum",
        "span_days AS max_cand",
        "CASE WHEN cum - cnt < (m + 1) DIV 2 AND (m + 1) DIV 2 <= cum"
        " THEN span_days ELSE 0 END AS med_lo",
        "CASE WHEN cum - cnt < (m + 2) DIV 2 AND (m + 2) DIV 2 <= cum"
        " THEN span_days ELSE 0 END AS med_hi",
        "CASE WHEN cum - cnt < (9 * m + 9) DIV 10"
        " AND (9 * m + 9) DIV 10 <= cum THEN span_days ELSE 0 END AS p90",
    )
    return (
        picked.groupBy("segment")
        .agg(
            F.max("n_customers").alias("n_customers"),
            F.sum("wsum").alias("sum_days"),
            F.sum("med_lo").alias("mlo"),
            F.sum("med_hi").alias("mhi"),
            F.sum("p90").alias("p90_days"),
            F.max("max_cand").alias("max_days"),
        )
        .selectExpr(
            "segment",
            "n_customers",
            ratio_round_spark("sum_days", "n_customers", 4)
            + " AS mean_days",
            "(mlo + mhi) / 2.0d AS median_days",
            "p90_days",
            "max_days",
        )
        .orderBy("segment")
    )


def _customer_tenure_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_duck

    return f"""WITH
spans AS (SELECT c.c_mktsegment AS segment,
                 date_diff('day', min(CAST(o.o_orderdate AS DATE)),
                           max(CAST(o.o_orderdate AS DATE))) AS span_days
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY o.o_custkey, c.c_mktsegment),
counts AS (SELECT segment, span_days, count(*) AS cnt
           FROM spans GROUP BY segment, span_days),
walked AS (SELECT segment, span_days, cnt,
                  sum(cnt) OVER (PARTITION BY segment ORDER BY span_days
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(cnt) OVER (PARTITION BY segment) AS m
           FROM counts),
picked AS (SELECT segment, m AS n_customers, span_days * cnt AS wsum,
                  span_days AS max_cand,
                  CASE WHEN cum - cnt < (m + 1) // 2
                        AND (m + 1) // 2 <= cum
                       THEN span_days ELSE 0 END AS med_lo,
                  CASE WHEN cum - cnt < (m + 2) // 2
                        AND (m + 2) // 2 <= cum
                       THEN span_days ELSE 0 END AS med_hi,
                  CASE WHEN cum - cnt < (9 * m + 9) // 10
                        AND (9 * m + 9) // 10 <= cum
                       THEN span_days ELSE 0 END AS p90
           FROM walked)
SELECT segment, CAST(n_customers AS BIGINT) AS n_customers,
       {ratio_round_duck("sum(wsum)", "max(n_customers)", 4)} AS mean_days,
       (sum(med_lo) + sum(med_hi)) / 2.0 AS median_days,
       CAST(sum(p90) AS BIGINT) AS p90_days,
       CAST(max(max_cand) AS BIGINT) AS max_days
FROM picked GROUP BY segment, n_customers
ORDER BY segment"""


CUSTOMER_TENURE_SQL = _customer_tenure_sql()


# --- cross-nation trade flows (Q7 volume-shipping class) -----------------------------
# STAGED for the round-19 driver window (third pass, same staging
# discipline). The BI family's FLOW verb — the classic TPC-H Q7
# question re-asked at matrix grain: how much revenue moves from
# supplier nation X to customer nation Y? The import/export screen a
# trade planner reads as a matrix; top flows by exact cent mass with
# HALF_UP micro shares of the world total.

TRADE_FLOWS_TOP = 25


def trade_flows(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`trade_flows_op`)."""
    return trade_flows_op(
        load_table(spark, sf, "lineitem"),
        load_table(spark, sf, "orders"),
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "supplier"),
        load_table(spark, sf, "nation"),
    )


def trade_flows_op(
    li: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """(supp_nation, cust_nation, n_lines, cents, share_micro) — the
    top cross-nation revenue flows (ties: supp, cust ASC), EXCLUDING
    the domestic diagonal (supp = cust; Q7's cross-border convention).

    Exactness: per-line revenue is the HALF_UP int64 cent projection
    (the supplier-HHI convention — never a float sum); shares are
    HALF_UP(10⁶·flow/total) integer rationals of the OFF-DIAGONAL
    total, so the matrix shares sum to ~10⁶ independent of the
    domestic mass.

    Plan shape (100 TB): lineitem⋈orders shuffles on l_orderkey (the
    co-location key both carry in a bucketed layout); orders⋈customer
    rides o_custkey the same way; supplier and nation (twice) are
    broadcast dims; the flow aggregate is ≤ |nations|² = 625 rows with
    map-side combine; the total is a 1-row broadcast. No window on
    anything corpus-sized."""
    rev = li.select(
        "l_orderkey", "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
            " AS BIGINT)"
        ).alias("rc"),
    )
    sup_nat = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("s_nationkey"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            "s_nationkey",
        )
        .select(F.col("s_suppkey").alias("l_suppkey"), "supp_nation")
    )
    cust_nat = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            "c_nationkey",
        )
        .select(F.col("c_custkey").alias("o_custkey"), "cust_nation")
    )
    flows = (
        rev.join(
            orders.select("o_orderkey", "o_custkey"),
            rev.l_orderkey == F.col("o_orderkey"),
        )
        .join(cust_nat, "o_custkey")
        .join(F.broadcast(sup_nat), "l_suppkey")
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.count("*").alias("n_lines"), F.sum("rc").alias("cents"))
    )
    total = flows.agg(F.sum("cents").alias("t_cents"))
    return (
        flows.join(F.broadcast(total))
        .selectExpr(
            "supp_nation",
            "cust_nation",
            "n_lines",
            "cents",
            # int64 envelope (ADVICE r18): the 2·mass·10⁶ term caps the
            # per-group mass at ~4.6e12 (≈ $46B in cents) before int64
            # wraps — past it DuckDB errors loudly while non-ANSI Spark
            # wraps silently; route through ext/exact.py's
            # ratio_round_wide / DECIMAL(38,0) when a deployment can
            # approach that mass (part_price_size/vr_test convention)
            "CAST((2 * cents * 1000000 + t_cents)"
            " DIV (2 * t_cents) AS BIGINT) AS share_micro",
        )
        .orderBy(
            F.desc("cents"), F.asc("supp_nation"), F.asc("cust_nation")
        )
        .limit(TRADE_FLOWS_TOP)
    )


TRADE_FLOWS_SQL = f"""WITH
rev AS (SELECT l_orderkey, l_suppkey,
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS rc
        FROM lineitem),
flows AS (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                 count(*) AS n_lines, CAST(sum(r.rc) AS BIGINT) AS cents
          FROM rev r
          JOIN orders o ON r.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation cn ON c.c_nationkey = cn.n_nationkey
          JOIN supplier s ON r.l_suppkey = s.s_suppkey
          JOIN nation sn ON s.s_nationkey = sn.n_nationkey
          WHERE sn.n_name <> cn.n_name
          GROUP BY supp_nation, cust_nation),
tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t_cents FROM flows)
SELECT supp_nation, cust_nation, n_lines, cents,
       (2 * cents * 1000000 + t_cents) // (2 * t_cents) AS share_micro
FROM flows, tot
ORDER BY cents DESC, supp_nation ASC, cust_nation ASC
LIMIT {TRADE_FLOWS_TOP}"""


# --- referential fsck (cross-table integrity census) --------------------------------
# STAGED for the round-19 driver window (fourth pass, same staging
# discipline). The DATA-QUALITY verb the storage-level fsck
# (partition_file_stats) doesn't cover: referential integrity between
# the fact tables — orders that never shipped a line, lines whose
# order vanished (a torn ingest's signature), plus the base counts
# that make the two anti-join verdicts auditable. At 100 TB this is
# the nightly pipeline-health query; its plan class (two anti joins on
# the co-location key) is otherwise unrepresented in the registry.


def referential_fsck(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`referential_fsck_op`)."""
    return referential_fsck_op(
        load_table(spark, sf, "orders"), load_table(spark, sf, "lineitem")
    )


def referential_fsck_op(orders: DataFrame, li: DataFrame) -> DataFrame:
    """(metric, cnt) — four exact integrity counters: ``orders_total``,
    ``lines_total``, ``orders_without_lines`` (left-anti orders →
    lineitem), ``orphan_lines`` (left-anti lineitem → orders).

    Plan shape (100 TB): both anti joins hash on the orderkey — the
    key both tables are bucketed on in a production layout, so they
    run co-located and shuffle-free there; the distinct on the
    lineitem side partial-aggregates before the exchange. Output is
    four 1-row aggregates unioned — each row an independent, exactly
    reproducible counter (no sampling, no approximation: an fsck that
    guesses is not an fsck)."""
    li_keys = li.select("l_orderkey").distinct()
    o_keys = orders.select("o_orderkey")
    rows = [
        orders.agg(F.count("*").alias("cnt")).selectExpr(
            "'orders_total' AS metric", "cnt"
        ),
        li.agg(F.count("*").alias("cnt")).selectExpr(
            "'lines_total' AS metric", "cnt"
        ),
        o_keys.join(
            li_keys, o_keys.o_orderkey == li_keys.l_orderkey, "left_anti"
        ).agg(F.count("*").alias("cnt")).selectExpr(
            "'orders_without_lines' AS metric", "cnt"
        ),
        li_keys.join(
            o_keys, li_keys.l_orderkey == o_keys.o_orderkey, "left_anti"
        ).agg(F.count("*").alias("cnt")).selectExpr(
            "'orphan_line_orderkeys' AS metric", "cnt"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("metric")


REFERENTIAL_FSCK_SQL = """
SELECT * FROM (
  SELECT 'orders_total' AS metric, count(*) AS cnt FROM orders
  UNION ALL
  SELECT 'lines_total', count(*) FROM lineitem
  UNION ALL
  SELECT 'orders_without_lines', count(*)
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
  UNION ALL
  SELECT 'orphan_line_orderkeys', count(*)
  FROM (SELECT DISTINCT l_orderkey FROM lineitem) l
  WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
) ORDER BY metric"""


# --- promo revenue share (Q14 class) -------------------------------------------------
# STAGED for the round-19 driver window (fifth pass, same staging
# discipline). The TPC-H Q14 question at calendar grain: what share of
# each ship-month's revenue moved through PROMO-class parts? The
# campaign-effect read next to seasonality's raw mix — and the first
# registry use of the part TYPE attribute (p_type).


def promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`promo_revenue_op`)."""
    return promo_revenue_op(
        load_table(spark, sf, "lineitem"), load_table(spark, sf, "part")
    )


def promo_revenue_op(li: DataFrame, part: DataFrame) -> DataFrame:
    """(month, n_lines, promo_cents, total_cents, promo_share_micro) —
    per ship month, the PROMO-type slice of revenue.

    Exactness: per-line revenue is the HALF_UP int64 cent projection
    at the scan stage (the supplier-HHI convention); the share is the
    HALF_UP(10⁶·promo/total) integer rational. Months with zero total
    revenue cannot occur (cents ≥ 1 per line); months with no lines
    are absent.

    Plan shape (100 TB): one lineitem scan (ReadSchema: l_shipdate,
    l_partkey, l_extendedprice, l_discount) → the part join is a
    BROADCAST (the dimension table, KBs per million parts for the two
    carried columns) → a map-side-combined 12-key aggregate → a
    stateless share projection. No shuffle beyond the 12-key agg."""
    rev = li.select(
        F.month(F.to_date("l_shipdate")).alias("month"),
        "l_partkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
            " AS BIGINT)"
        ).alias("rc"),
    )
    dim = part.select(
        F.col("p_partkey").alias("l_partkey"),
        (F.col("p_type") == "PROMO").cast("int").alias("is_promo"),
    )
    return (
        rev.join(F.broadcast(dim), "l_partkey")
        .groupBy("month")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.expr("rc * is_promo")).alias("promo_cents"),
            F.sum("rc").alias("total_cents"),
        )
        .selectExpr(
            "month",
            "n_lines",
            "promo_cents",
            "total_cents",
            # int64 envelope (ADVICE r18): the 2·mass·10⁶ term caps the
            # per-group mass at ~4.6e12 (≈ $46B in cents) before int64
            # wraps — past it DuckDB errors loudly while non-ANSI Spark
            # wraps silently; route through ext/exact.py's
            # ratio_round_wide / DECIMAL(38,0) when a deployment can
            # approach that mass (part_price_size/vr_test convention)
            "CAST((2 * promo_cents * 1000000 + total_cents)"
            " DIV (2 * total_cents) AS BIGINT) AS promo_share_micro",
        )
        .orderBy("month")
    )


PROMO_REVENUE_SQL = """WITH
rev AS (SELECT month(CAST(l_shipdate AS DATE)) AS month, l_partkey,
               CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT) AS rc
        FROM lineitem),
j AS (SELECT r.month, r.rc,
             CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
      FROM rev r JOIN part p ON r.l_partkey = p.p_partkey)
SELECT CAST(month AS BIGINT) AS month, count(*) AS n_lines,
       CAST(sum(rc * is_promo) AS BIGINT) AS promo_cents,
       CAST(sum(rc) AS BIGINT) AS total_cents,
       (2 * CAST(sum(rc * is_promo) AS BIGINT) * 1000000
        + CAST(sum(rc) AS BIGINT)) // (2 * CAST(sum(rc) AS BIGINT))
         AS promo_share_micro
FROM j GROUP BY month ORDER BY month"""


# --- part size→price correlation (signed r²) -----------------------------------------
# STAGED for the round-19 driver window (seventh pass, same staging
# discipline). The CORRELATION verb next to discount_response's OLS
# slope: per part-type class, does physical size actually predict list
# price? Pearson's r needs a sqrt the exact-arithmetic contract
# forbids, so the emitted statistic is SIGNED r² — sign(cov)·r², an
# exact rational (the seq-ACF trick) carrying the same direction and
# strength reading. First registry use of p_size.


def part_price_size(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`part_price_size_op`)."""
    return part_price_size_op(load_table(spark, sf, "part"))


def part_price_size_op(part: DataFrame) -> DataFrame:
    """(p_type, n_parts, slope_micro, signed_r2_micro) — per type
    class, the OLS slope of price (cents) on size plus the signed
    squared correlation.

    Exactness: x = p_size (int), y = round(p_retailprice·100) int64
    cents; the five accumulators are int64; slope = HALF_UP 6-dp of
    (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) in DECIMAL(38,0)/HUGEINT;
    signed_r2 = sign(num)·HALF_UP 6-dp of num²/(den_x·den_y).
    Envelope: num² needs n ≤ ~10⁶ parts per type at 50-size/$2000
    prices to stay inside DECIMAL(38,0) — past that pre-scale cents to
    dollars (the burstiness pre-scale convention). Types with zero
    size or price variance drop out (neither statistic exists).

    Plan shape (100 TB): one part-dim scan → ONE partial-aggregated
    shuffle on the ≤|types|-key class → a stateless projection on the
    6-row summary. Scan-bound; no join, no window."""
    from dariadb_spark.ext.exact import ratio_round_signed_wide_spark

    sums = (
        part.selectExpr(
            "p_type",
            "CAST(p_size AS BIGINT) AS x",
            "CAST(round(p_retailprice * 100) AS BIGINT) AS y",
        )
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
        )
    )
    num = (
        "n_parts * CAST(sxy AS DECIMAL(38,0))"
        " - CAST(sx AS DECIMAL(38,0)) * sy"
    )
    denx = (
        "n_parts * CAST(sxx AS DECIMAL(38,0))"
        " - CAST(sx AS DECIMAL(38,0)) * sx"
    )
    deny = (
        "n_parts * syy - CAST(sy AS DECIMAL(38,0)) * sy"
    )
    return (
        sums.where(F.expr(f"({denx}) > 0 AND ({deny}) > 0"))
        .selectExpr(
            "p_type",
            "n_parts",
            ratio_round_signed_wide_spark(num, denx, 6)
            + " AS slope_micro",
            "CASE WHEN (" + num + ") < 0 THEN -1.0d ELSE 1.0d END * "
            + ratio_round_signed_wide_spark(
                f"({num}) * ({num})", f"({denx}) * ({deny})", 6
            )
            + " AS signed_r2_micro",
        )
        .orderBy("p_type")
    )


def _part_price_size_sql() -> str:
    from dariadb_spark.ext.exact import ratio_round_signed_wide_duck

    num = (
        "n_parts * CAST(sxy AS HUGEINT) - CAST(sx AS HUGEINT) * sy"
    )
    denx = (
        "n_parts * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx"
    )
    deny = "n_parts * syy - CAST(sy AS HUGEINT) * sy"
    return f"""WITH
sums AS (SELECT p_type, count(*) AS n_parts,
                CAST(sum(p_size) AS BIGINT) AS sx,
                CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                     AS BIGINT) AS sy,
                CAST(sum(p_size * CAST(round(p_retailprice * 100)
                                       AS BIGINT)) AS BIGINT) AS sxy,
                CAST(sum(p_size * p_size) AS BIGINT) AS sxx,
                sum(CAST(round(p_retailprice * 100) AS HUGEINT)
                    * CAST(round(p_retailprice * 100) AS BIGINT)) AS syy
         FROM part GROUP BY p_type)
SELECT p_type, n_parts,
       {ratio_round_signed_wide_duck(num, denx, 6)} AS slope_micro,
       (CASE WHEN ({num}) < 0 THEN -1.0 ELSE 1.0 END) *
       {ratio_round_signed_wide_duck(
           f"({num}) * ({num})", f"({denx}) * ({deny})", 6
       )} AS signed_r2_micro
FROM sums
WHERE ({denx}) > 0 AND ({deny}) > 0
ORDER BY p_type"""


PART_PRICE_SIZE_SQL = _part_price_size_sql()


# --- part dominance skyline (2-D Pareto front) ---------------------------------
# STAGED for the round-19 driver window (eighth pass, same staging
# discipline). The SKYLINE operator family (Börzsönyi et al., ICDE
# 2001) — "which parts are Pareto-optimal on (price, size)?" — a
# classic DB verb the registry lacked: orders_pareto is the 80/20
# concentration CURVE, this is the dominance FRONT. Per brand, a part
# is on the skyline iff no other part of the brand is ≤ on BOTH price
# cents and size with at least one strict <. Duplicated optima all
# stay (distinct-value dominance — a point never dominates its twin).
#
# Plan shape is the published two-phase distributed skyline: phase 1
# filters each (brand, salt) slice to its LOCAL skyline (the global
# front survives any partition-local filter, and dominance is
# transitive so removing dominated points never removes evidence);
# phase 2 re-filters the union per brand. Each phase is ONE window
# sort — two min() frames over the SAME (partition, order) spec
# (RANGE < cents and RANGE ≤ cents), so Catalyst plans a single
# WindowExec per phase, no join anywhere. At 100 TB the brand-level
# phase sorts only local-front survivors (staircase-sized, bounded by
# the distinct-price domain), not the raw scan — the salt is what
# keeps a 5-brand partition spec from becoming 5 straggler tasks.


#: phase-1 fan-out: local skylines per (brand, salt) slice
SKYLINE_SALT = 16


def skyline_filter(df: DataFrame, keys: list[str]) -> DataFrame:
    """Filter ``df`` to the (price_cents, p_size)-minimizing skyline
    within each ``keys`` group. Shared by both phases of the batch
    operator and the streaming twin's finishing pass.

    A row survives iff min(size) over rows with cents ≤ mine is not
    BELOW mine (no cheaper-or-equal part is strictly smaller) AND
    min(size) over rows with cents < mine is strictly above mine (no
    strictly-cheaper part is as small). Both frames share one
    (partition, order) spec → a single WindowExec, one sort, no join."""
    w = Window.partitionBy(*keys).orderBy("price_cents")
    w_lt = w.rangeBetween(Window.unboundedPreceding, -1)
    w_le = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("_m_lt", F.min("p_size").over(w_lt))
        .withColumn("_m_le", F.min("p_size").over(w_le))
        .where("_m_le >= p_size AND (_m_lt IS NULL OR _m_lt > p_size)")
        .drop("_m_lt", "_m_le")
    )


def part_skyline(spark: SparkSession, sf: str) -> DataFrame:
    """Fixture query for the r19 window (:func:`part_skyline_op`)."""
    return part_skyline_op(load_table(spark, sf, "part"))


def part_skyline_op(
    part: DataFrame, n_salt: int = SKYLINE_SALT
) -> DataFrame:
    """(p_brand, p_partkey, price_cents, p_size) — the per-brand
    Pareto front minimizing (price, size), every optimum kept
    (duplicates included).

    Exactness: pure integer comparisons — price quantized to int64
    cents HALF-UP once in the scan projection, size cast to int64; no
    arithmetic beyond min(), so no rounding surface at all. A row with
    a NULL price or size is NOT a point in the dominance plane and is
    excluded in the scan projection on BOTH engines (dominance against
    a NULL coordinate is undefined: the window filter would drop such
    rows while a bare NOT-EXISTS would keep every one of them — the
    NULL-brand totality class, closed the same way).

    Plan shape (100 TB): scan projection → phase-1 window over
    (brand, pmod(hash(partkey), n_salt)) → phase-2 window over brand
    on the survivors. Two sorts, zero joins, zero cartesians; text of
    the dominance test is monotone so the phases compose exactly."""
    pts = part.selectExpr(
        "p_brand",
        "p_partkey",
        "CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents",
        "CAST(p_size AS BIGINT) AS p_size",
    ).where("price_cents IS NOT NULL AND p_size IS NOT NULL")
    local = skyline_filter(
        pts.withColumn(
            "_salt", F.pmod(F.hash("p_partkey"), F.lit(n_salt))
        ),
        ["p_brand", "_salt"],
    ).drop("_salt")
    return skyline_filter(local, ["p_brand"]).orderBy(
        "p_brand", "price_cents", "p_size", "p_partkey"
    )


#: The brand match is IS NOT DISTINCT FROM, not `=`: the Spark side
#: partitions a NULL brand into ONE window group (SQL window-partition
#: semantics), so the definitional oracle must group NULL brands the
#: same way — a bare `=` would exempt every NULL-brand row from
#: dominance and diverge on data the fixture happens not to contain
#: (the totality lesson: parity on a benign fixture says nothing about
#: the error domain).
PART_SKYLINE_SQL = """WITH pts AS (
  SELECT p_brand, p_partkey,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL)
SELECT p.p_brand, p.p_partkey, p.price_cents, p.p_size
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.p_brand IS NOT DISTINCT FROM p.p_brand
    AND q.price_cents <= p.price_cents
    AND q.p_size <= p.p_size
    AND (q.price_cents < p.price_cents OR q.p_size < p.p_size))
ORDER BY p_brand, price_cents, p_size, p_partkey"""
