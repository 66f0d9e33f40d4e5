"""General relational corpus (SURVEY §2.8): the operator families the
reference lacks, provided by Spark built-ins — joins, sorts/limits, set
ops, ranking windows, grouping sets, scalar functions. Each entry has a
DuckDB oracle.

Scale notes: dimension joins broadcast (region/nation/supplier/part are
small at every SF); fact-fact joins hash-shuffle on the join key and
AQE handles skew; top-k = TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


# --- TPC-H Q1-style pricing summary: scan → groupBy agg (A1-A5 over a
# real fact table; partial+final agg, pushdown-friendly) ---


@register(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- Multi-way join through the star schema (broadcast dims), revenue
# per nation — TPC-H Q5 shape ---


@register(
    "join_revenue_by_nation",
    oracle="""
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
""",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- TPC-H Q5 shape (local supplier volume): the hardest join
# topology in the corpus — two fact→dim paths (lineitem→orders→
# customer→nation and lineitem→supplier→nation) that must MEET on the
# same nation. Catalyst broadcasts every dim; the dim-equality
# predicate (c_nationkey = s_nationkey) prunes after the supplier
# broadcast join, no extra shuffle. ---


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY n.n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# --- Sort + limit (top-k): TakeOrderedAndProject, deterministic
# tie-break on the key ---


@register(
    "topk_customers_by_spend",
    oracle="""
WITH s AS (
  SELECT c.c_custkey, c.c_name,
         ROUND(SUM(o.o_totalprice), 2) AS total_spend,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_name
)
SELECT * FROM s
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
""",
)
def topk_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


# --- Outer join + null-aware count: customers with zero orders keep a
# row (COUNT(col) skips nulls on both engines) ---


@register(
    "join_left_order_counts",
    oracle="""
SELECT c.c_custkey,
       c.c_mktsegment,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 2) AS total_spend
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_mktsegment
""",
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


# --- Semi / anti joins (EXISTS / NOT EXISTS) — no fact-side row
# duplication, the scalable existence-check shape ---


@register(
    "join_semi_customers_with_open_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
)
def join_semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti_customers_without_orders",
    oracle="""
SELECT c_custkey, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


# --- Set operations (distinct semantics on both engines) ---


@register(
    "setop_union_intersect_except",
    oracle="""
WITH hi_bal AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'union' AS op, c_custkey FROM (SELECT * FROM hi_bal UNION SELECT * FROM building)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM hi_bal INTERSECT SELECT * FROM building)
UNION ALL
SELECT 'except' AS op, c_custkey FROM (SELECT * FROM hi_bal EXCEPT SELECT * FROM building)
""",
)
def setop_union_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        hi.union(building).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionByName(
            hi.intersect(building).select(F.lit("intersect").alias("op"), "c_custkey")
        )
        .unionByName(
            hi.exceptAll(building).distinct().select(
                F.lit("except").alias("op"), "c_custkey"
            )
        )
    )


# --- Ranking window: top-3 orders per customer (row_number with a
# deterministic tie-break) ---


@register(
    "window_top3_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --- Analytic window: lag/lead deltas along each customer's order
# history ---


@register(
    "window_order_price_delta",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(o_totalprice
             - COALESCE(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey), o_totalprice),
             2) AS price_delta,
       CAST(RANK() OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
FROM orders
""",
)
def window_order_price_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.col("o_totalprice")
            - F.coalesce(F.lag("o_totalprice").over(w), F.col("o_totalprice")),
            2,
        ).alias("price_delta"),
        F.rank().over(w).cast("bigint").alias("order_seq"),
    )


# --- Rollup (grouping-sets family); null grouping keys surfaced via
# COALESCE so both engines emit identical values ---


@register(
    "rollup_lineitem_qty",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def rollup_lineitem_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "cube_orders_status_priority",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       ROUND(SUM(o_totalprice), 2) AS total,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "total",
            "n",
        )
    )


# --- Distinct aggregation ---


@register(
    "distinct_suppliers_per_flag",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- SQL front door: scalar + IN subqueries through spark.sql (the
# reference has no SQL parser at all — SURVEY §2.8) ---


@register(
    "sql_subquery_above_avg_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
)
def sql_subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
          AND o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
        """
    )


# --- String aggregation (deterministic: distinct + sorted) ---


@register(
    "stringagg_statuses_per_flag",
    oracle="""
SELECT l_returnflag,
       (SELECT string_agg(ls, ',' ORDER BY ls)
        FROM (SELECT DISTINCT l2.l_linestatus AS ls FROM lineitem l2
              WHERE l2.l_returnflag = l1.l_returnflag)) AS statuses
FROM (SELECT DISTINCT l_returnflag FROM lineitem) l1
""",
)
def stringagg_statuses_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        )
    )


# --- Full outer join (both-side null preservation) ---


@register(
    "join_full_outer_nation_activity",
    oracle="""
WITH cust_n AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
), supp_n AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_suppliers
FROM cust_n c FULL OUTER JOIN supp_n s ON c.nk = s.nk
""",
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk_c == s.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_customers"),
        F.coalesce("n_supp", F.lit(0)).alias("n_suppliers"),
    )


# --- Correlated scalar subquery through the SQL front door ---


@register(
    "sql_correlated_subquery_share",
    oracle="""
SELECT o_orderkey, o_custkey,
       ROUND(o_totalprice / (SELECT SUM(o2.o_totalprice) FROM orders o2
                             WHERE o2.o_custkey = orders.o_custkey), 6) AS cust_share
FROM orders
WHERE o_totalprice > 400000
""",
)
def sql_correlated_subquery_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice / (SELECT SUM(o2.o_totalprice) FROM orders o2
                                     WHERE o2.o_custkey = orders.o_custkey), 6)
                   AS cust_share
        FROM orders
        WHERE o_totalprice > 400000
        """
    )


# --- BETWEEN / IN composite date-range filtering ---


@register(
    "filter_between_in_dates",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COALESCE(SUM(l_extendedprice), 0.0), 2) AS total,
       CAST(COALESCE(MIN(epoch_ms(CAST(l_shipdate AS TIMESTAMP))), -1) AS BIGINT) AS first_ship_ms
FROM lineitem
WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '2024-03-01' AND DATE '2024-06-30'
  AND l_returnflag IN ('A', 'R')
  AND l_quantity NOT IN (1.0, 2.0)
""",
)
def filter_between_in_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return li.filter(
        d.between("2024-03-01", "2024-06-30")
        & F.col("l_returnflag").isin("A", "R")
        & ~F.col("l_quantity").isin(1.0, 2.0)
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)), 2).alias("total"),
        F.coalesce(
            F.min(F.unix_millis(F.col("l_shipdate").cast("timestamp"))), F.lit(-1)
        ).alias("first_ship_ms"),
    )


# --- TPC-H Q7-style volume shipping: which of two trading nations
# supplied which customer nation, by year. Fact-fact join shuffles on
# orderkey; all four dims broadcast; the nation-pair filter prunes
# BEFORE the fact join via the broadcast hash sides. ---


@register(
    "tpch_q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --- TPC-H Q8-style national market share: one nation's share of
# ECONOMY-part revenue per order year. Ratio-of-sums rounded at 6
# (order-dependent aggregate; float-discipline rule). ---


@register(
    "tpch_q8_market_share",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(CASE WHEN n.n_name = 'NATION_5'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_volume
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_type = 'ECONOMY'
GROUP BY 1
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(p.filter(F.col("p_type") == "ECONOMY")),
              li.l_partkey == p.p_partkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


# --- TPC-H Q10-style returned-item reporting: top 20 customers by
# revenue lost to returns in a fixed window. Deterministic top-k:
# ORDER BY rounded revenue DESC, custkey ASC (TakeOrderedAndProject,
# no global sort). ---


@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "nation")
    )


# --- TPC-H Q14-style promotion effect: PROMO parts' share of revenue
# per order year (100x percentage like the spec; ratio rounded 5). ---


@register(
    "tpch_q14_promo_effect",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 5) AS promo_pct
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
""",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                5,
            ).alias("promo_pct")
        )
    )


# --- TPC-H Q18-style large-volume customers: orders whose total
# quantity exceeds a threshold (HAVING over a per-order agg, then
# dim joins on the small survivor set — both dims broadcast). ---


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 250
)
SELECT c.c_custkey, c.c_name, b.l_orderkey AS o_orderkey,
       o.o_totalprice, b.sum_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            "o_totalprice",
            "sum_qty",
        )
    )


# --- Versioned-table time travel (Delta pattern on parquet): build a
# 3-commit table of order slices in a temp dir, roll back to the
# 2-commit version, and aggregate what a reader sees at the rolled-
# back HEAD. The oracle restates the visible slice (orders before
# 1998) directly. Exercises commit/append/rollback/time-travel read;
# the result is localCheckpointed so the temp table can be deleted
# before returning. ---


@register(
    "timetravel_orders_rollup",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
""",
)
def timetravel_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators.versioned import (
        VersionedTable,
    )

    o = _t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="adw-vtab-")
    try:
        vt = VersionedTable(spark, path)
        vt.commit(o.filter(F.col("o_orderdate") < "1997-01-01"),
                  mode="overwrite", op="initial load", ts=1.0)
        vt.commit(
            o.filter(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            mode="append", op="1997 batch", ts=2.0,
        )
        vt.commit(o.filter(F.col("o_orderdate") >= "1998-01-01"),
                  mode="append", op="1998+ batch", ts=3.0)
        vt.rollback(1, ts=4.0)  # drop the 1998+ batch, zero-copy
        out = (
            vt.read()  # HEAD == version 1's file list
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- Declarative data-quality constraints (expectations layer): six
# constraints over orders compiled into one scan + one uniqueness
# groupBy; the oracle recomputes each violation count directly. The
# 'status_no_P' constraint fails by construction (P exists) so the
# passed flag is exercised both ways. ---


@register(
    "quality_constraints_orders",
    oracle="""
SELECT * FROM (
  SELECT 'custkey_not_null' AS "constraint", 'not_null' AS kind,
         CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS violations
  FROM orders
  UNION ALL
  SELECT 'status_known', 'accepted_values',
         CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                               OR o_orderstatus NOT IN ('F','O','P')) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'status_no_P', 'accepted_values',
         CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                               OR o_orderstatus NOT IN ('F','O')) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'price_in_range', 'in_range',
         CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
                               OR o_totalprice < 0
                               OR o_totalprice > 300000) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'priority_format', 'matches_regex',
         CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NULL
                               OR NOT regexp_matches(o_orderpriority,
                                                     '^[1-5]-[A-Z ]+$')) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orderkey_unique', 'unique',
         CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
)
""",
)
def quality_constraints_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.quality import (
        Constraint,
        check_constraints,
    )

    o = _t(spark, sf_dir, "orders")
    cons = [
        Constraint("custkey_not_null", "not_null", column="o_custkey"),
        Constraint("status_known", "accepted_values", column="o_orderstatus",
                   values=("F", "O", "P")),
        Constraint("status_no_P", "accepted_values", column="o_orderstatus",
                   values=("F", "O")),
        Constraint("price_in_range", "in_range", column="o_totalprice",
                   lo=0.0, hi=300000.0),
        Constraint("priority_format", "matches_regex", column="o_orderpriority",
                   pattern="^[1-5]-[A-Z ]+$"),
        Constraint("orderkey_unique", "unique", keys=("o_orderkey",)),
    ]
    return check_constraints(o, cons).drop("passed")


# --- Shared-text SQL parity: the SAME ANSI-SQL string executes on
# Spark (spark.sql over registered views) AND on DuckDB as the oracle
# — character-for-character. The strongest form of the SQL-surface
# claim: no dialect translation layer at all for the core relational
# dialect (joins, CASE, grouped aggregates, HAVING, set membership).
# Sums are of 2-decimal prices, so ROUND(...,2) is boundary-safe on
# both engines (verify-skill float rule). ---

_SHARED_SQL_TEXT = """
SELECT c.c_mktsegment AS segment,
       o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total_price,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_finished
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
GROUP BY c.c_mktsegment, o.o_orderpriority
HAVING COUNT(*) > 10
"""


@register("sql_shared_text_rollup", oracle=_SHARED_SQL_TEXT)
def sql_shared_text_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SHARED_SQL_TEXT)


# --- CDC merge changelog: a deterministic update batch against a
# deterministic base slice of orders; the changelog (insert /
# update_preimage / update_postimage; no-ops silent) is re-derived
# set-theoretically by the oracle. The +1.5 price bump is a single
# IEEE addition — bit-exact on both engines, no rounding needed. ---


@register(
    "cdc_merge_changelog_orders",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 4 <> 0
),
upd AS (
  SELECT o_orderkey, o_orderstatus,
         o_totalprice + CASE WHEN o_orderkey % 3 = 0 THEN 1.5 ELSE 0 END
           AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT 'insert' AS op, o_orderkey, o_orderstatus, o_totalprice
FROM upd WHERE o_orderkey % 4 = 0
UNION ALL
SELECT 'update_preimage', b.o_orderkey, b.o_orderstatus, b.o_totalprice
FROM base b WHERE b.o_orderkey % 4 = 2 AND b.o_orderkey % 3 = 0
UNION ALL
SELECT 'update_postimage', u.o_orderkey, u.o_orderstatus, u.o_totalprice
FROM upd u WHERE u.o_orderkey % 4 = 2 AND u.o_orderkey % 3 = 0
""",
)
def cdc_merge_changelog_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators.warehouse import (
        merge_upsert_cdc,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") % 4 != 0)
    upd = o.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice",
        F.col("o_totalprice")
        + F.when(F.col("o_orderkey") % 3 == 0, F.lit(1.5)).otherwise(F.lit(0.0)),
    )
    path = tempfile.mkdtemp(prefix="adw-cdc-")
    try:
        tgt = f"{path}/t"
        base.write.parquet(tgt)
        # changelog is localCheckpointed inside, so the temp target can
        # be deleted before returning
        return merge_upsert_cdc(spark, tgt, upd, ["o_orderkey"])
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- Incremental JOIN MV under the oracle gate: three mixed-arrival
# batches of order/customer slices maintained via delta propagation;
# the oracle is simply the DIRECT join of everything that arrived —
# which is exactly what the MV must equal. ---


@register(
    "join_mv_incremental_orders",
    oracle="""
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS o_custkey,
       o.o_totalprice,
       c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 5 <> 4 AND c.c_custkey % 3 <> 2
""",
)
def join_mv_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_join_mv,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        "o_totalprice",
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("o_custkey"), "c_mktsegment"
    )
    # deterministic slices; %5==4 orders and %3==2 customers never arrive
    lb = [
        o.filter(F.col("o_orderkey") % 5 == i) for i in range(4)
    ]
    rb = [
        c.filter(F.col("o_custkey") % 3 == i) for i in range(2)
    ]
    base = tempfile.mkdtemp(prefix="adw-jmv-")
    try:
        mv = None
        batches = [
            (lb[0], rb[0]),        # both sides
            (lb[1], None),         # left only
            (None, rb[1]),         # right only
            (lb[2], None),
            (lb[3], None),
        ]
        for bid, (l, r) in enumerate(batches):
            mv = incremental_join_mv(
                spark, base, ["o_custkey"],
                left_batch=l, right_batch=r, batch_id=bid,
            )
        return mv.select(
            "o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"
        ).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- TPC-H Q4-style order-priority check: orders with at least one
# LATE lineitem (shipped >90 days after the order date) counted per
# priority — the EXISTS/semi-join shape (the fixture has no
# l_commitdate, so lateness is shipdate-vs-orderdate). ---


@register(
    "tpch_q4_late_orders",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o.o_orderpriority
""",
)
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.join(
        o, li.l_orderkey == o.o_orderkey
    ).filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    ).select("o_orderkey").distinct()
    return (
        o.join(late, "o_orderkey", "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
    )


# --- Z-order (Morton) key parity: the bit-interleaving expression
# behind cluster_write(zorder=True), verified value-for-value against
# DuckDB's bit arithmetic over a deterministic 2-D domain. ---


@register(
    "zorder_key_part_layout",
    oracle="""
WITH d AS (
  SELECT p_partkey,
         CAST(p_size % 64 AS BIGINT) AS x,
         CAST(p_partkey % 64 AS BIGINT) AS y
  FROM part
),
z AS (
  SELECT p_partkey,
         CAST((
           (((x >> 0) & 1) << 0) |
           (((y >> 0) & 1) << 1) |
           (((x >> 1) & 1) << 2) |
           (((y >> 1) & 1) << 3) |
           (((x >> 2) & 1) << 4) |
           (((y >> 2) & 1) << 5) |
           (((x >> 3) & 1) << 6) |
           (((y >> 3) & 1) << 7) |
           (((x >> 4) & 1) << 8) |
           (((y >> 4) & 1) << 9) |
           (((x >> 5) & 1) << 10) |
           (((y >> 5) & 1) << 11)
         ) AS BIGINT) AS zk
  FROM d
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT zk) AS BIGINT) AS n_distinct,
       CAST(MIN(zk) AS BIGINT) AS zmin,
       CAST(MAX(zk) AS BIGINT) AS zmax,
       CAST(SUM(zk * (p_partkey % 997)) AS BIGINT) AS zchecksum
FROM z
""",
)
def zorder_key_part_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.warehouse import zorder_key

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_size") % 64).cast("bigint").alias("x"),
        (F.col("p_partkey") % 64).cast("bigint").alias("y"),
    )
    z = p.select("p_partkey", zorder_key(["x", "y"], bits=6).alias("zk"))
    return z.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("zk").cast("bigint").alias("n_distinct"),
        F.min("zk").cast("bigint").alias("zmin"),
        F.max("zk").cast("bigint").alias("zmax"),
        F.sum(F.col("zk") * (F.col("p_partkey") % 997)).cast("bigint").alias(
            "zchecksum"
        ),
    )


# --- Incremental view maintenance UNDER UPDATES, oracle-gated: build
# the order-customer join MV, apply a deterministic CDC batch to the
# ORDER side (price bump for %3 keys, new %5==4 keys previously held
# out), and the maintained MV must equal the direct join of the
# post-update order set — which the oracle computes from scratch. ---


@register(
    "join_mv_cdc_maintenance_orders",
    oracle="""
WITH updated_orders AS (
  SELECT o_orderkey, o_custkey,
         o_totalprice + CASE WHEN o_orderkey % 3 = 0 THEN 1.5 ELSE 0 END
           AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 2 <> 0 AND o_orderkey % 5 <> 4
)
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o.o_custkey AS BIGINT) AS o_custkey,
       o.o_totalprice,
       c.c_mktsegment
FROM updated_orders o
JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_mv_cdc_maintenance_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators.warehouse import (
        apply_cdc_to_join_mv,
        incremental_join_mv,
        merge_upsert_cdc,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        "o_totalprice",
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("o_custkey"), "c_mktsegment"
    )
    # initial left state: everything except the odd %5==4 keys (those
    # never exist on either side); the CDC batch then updates all even
    # keys (+1.5 on %3 multiples) — evens not yet present arrive as
    # inserts, the rest as update pre/post pairs or silent no-ops
    base_left = o.filter(
        (F.col("o_orderkey") % 5 != 4) | (F.col("o_orderkey") % 2 == 0)
    )
    work = tempfile.mkdtemp(prefix="adw-jmvcdc-")
    try:
        jmv_base = f"{work}/jmv"
        incremental_join_mv(
            spark, jmv_base, ["o_custkey"],
            left_batch=base_left, right_batch=c, batch_id=0,
        )
        left_tbl = f"{work}/left_tbl"
        base_left.write.parquet(left_tbl)
        updates = o.filter(F.col("o_orderkey") % 2 == 0).withColumn(
            "o_totalprice",
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 3 == 0, F.lit(1.5)).otherwise(
                F.lit(0.0)
            ),
        )
        log = merge_upsert_cdc(spark, left_tbl, updates, ["o_orderkey"])
        mv = apply_cdc_to_join_mv(
            spark, jmv_base, ["o_custkey"], log, ["o_orderkey"], side="left"
        )
        return mv.select(
            "o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment"
        ).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


# --- Round-5 TPC-H completion: the remaining spec shapes expressible
# over the reduced fixture schema (no partsupp table, no
# shipmode/commitdate/receiptdate/phone/container columns — q2, q11,
# q16 and q20 are partsupp-bound and therefore out of scope; the
# others are adapted to available columns, adaptation noted per
# query). With these the corpus covered 18 of the 22 TPC-H shapes;
# the round-5b block below adapts the remaining four. ---


# Q9 adaptation: profit = net-of-tax discounted revenue (no
# ps_supplycost without partsupp); grouping and join graph unchanged.
@register(
    "tpch_q9_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount) * (1 - l.l_tax)), 2)
         AS sum_profit
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY 1, 2
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 - F.col("l_tax"))
    )
    return (
        li.join(broadcast(p.filter(F.col("p_name").like("%bolt%"))),
                li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


# Q12 adaptation: no l_shipmode — lines bucket by ship YEAR instead;
# the high/low-priority conditional-count core is unchanged.
@register(
    "tpch_q12_priority_shipping",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '2000-01-01'
GROUP BY 1
""",
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "2000-01-01")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# Q13: customer order-count distribution (spec's comment filter swapped
# for an order-priority predicate — same left-join-then-histogram core).
@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "5-LOW"),
            c.c_custkey == o.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# Q15: top supplier(s) by a quarter's revenue — the revenue "view" is a
# CTE on both sides; revenue ROUNDs to 2 before the max comparison so
# the tie set is engine-identical.
@register(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    # MAX as a 1-row broadcast + equality join — no global-window
    # single-partition sort (a rank() with no PARTITION BY funnels
    # every supplier through one task at scale)
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("_mx")
    ).drop("_mx")
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# Q17: small-quantity-order revenue. The correlated per-part 0.2*AVG
# threshold is exact cross-engine: l_quantity is integral, so the sum
# (< 2^53) and the division are the same IEEE values in both engines.
@register(
    "tpch_q17_small_quantity",
    oracle="""
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
""",
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(broadcast(p.filter(F.col("p_brand") == "Brand#3")),
                li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


# Q19 adaptation: the three-arm disjunctive predicate over
# (brand, size band, quantity band) — container/shipmode columns don't
# exist; the OR-of-ANDs pushdown shape is the point.
@register(
    "tpch_q19_discounted_revenue",
    oracle="""
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def arm(brand, size_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            arm("Brand#1", 15, 1, 11)
            | arm("Brand#2", 25, 10, 20)
            | arm("Brand#3", 35, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# Q21 adaptation: "suppliers who kept orders waiting" becomes "lone
# returner": the supplier's line was returned (R) in a multi-supplier
# FINALIZED order where NO other supplier's line was returned — the
# same EXISTS + NOT EXISTS correlated pair as the spec, on available
# columns.
@register(
    "tpch_q21_lone_returner",
    oracle="""
SELECT s.s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = 'NATION_2'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY 1
ORDER BY numwait DESC, s_name ASC
LIMIT 10
""",
)
def tpch_q21_lone_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    others = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
    )
    multi = l1.join(
        others,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    other_returns = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
    )
    lone = multi.join(
        other_returns,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_anti",
    )
    return (
        lone.join(
            broadcast(o.filter(F.col("o_orderstatus") == "F")),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            broadcast(n.filter(F.col("n_name") == "NATION_2")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


# Q22 adaptation: "global sales opportunity" — above-average-balance
# customers with no RECENT orders (the fixture's customers all have
# some order, and there is no phone column: country = nationkey % 5).
@register(
    "tpch_q22_idle_balances",
    oracle="""
WITH idle AS (
  SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cntry, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
)
SELECT cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM idle GROUP BY 1
""",
)
def tpch_q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_pos))  # 1-row scalar subquery
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# --- Round-5b: the four partsupp-bound shapes, adapted. The fixture
# ships no partsupp table; the OBSERVED supplier-part relation from
# lineitem (which pairs actually transacted, their unit prices and
# shipped quantities) stands in for it, preserving each query's join
# graph and subquery shape. With these the corpus covers all 22 TPC-H
# shapes (18 spec-faithful + 4 partsupp-adapted). ---


# Q2 adaptation: ps_supplycost -> min observed unit price
# (l_extendedprice / l_quantity) per (part, supplier); the correlated
# min-cost-supplier-per-part subquery over a region is unchanged.
# Unit costs are per-row IEEE divisions folded with MIN (no sums), so
# values ship UNROUNDED and the equality predicate is engine-exact.
@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s_suppkey, s_acctbal, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
best AS (
  SELECT c.partkey, MIN(c.unit_cost) AS best_cost
  FROM cost c JOIN eu s ON s.s_suppkey = c.suppkey
  GROUP BY 1
)
SELECT s.s_acctbal, s.s_name, s.n_name,
       CAST(p.p_partkey AS BIGINT) AS p_partkey, c.unit_cost
FROM part p
JOIN cost c ON c.partkey = p.p_partkey
JOIN eu s ON s.s_suppkey = c.suppkey
JOIN best b ON b.partkey = p.p_partkey AND c.unit_cost = b.best_cost
WHERE p.p_size IN (3, 4, 5) AND p.p_type = 'STANDARD'
ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
LIMIT 100
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    eu = (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu_cost = cost.join(broadcast(eu), cost.suppkey == eu.s_suppkey)
    # correlated min per part as ONE window pass (a groupBy-min +
    # re-join would be a second fact-fact shuffle join)
    from pyspark.sql import Window

    best = Window.partitionBy("partkey")
    return (
        eu_cost.withColumn("best_cost", F.min("unit_cost").over(best))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(
            broadcast(
                p.filter(F.col("p_size").isin(3, 4, 5) & (F.col("p_type") == "STANDARD"))
            ),
            F.col("partkey") == F.col("p_partkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey")
        )
        .limit(100)
    )


# Q11 adaptation: stock value -> shipped discounted revenue per part
# from one nation's suppliers; the value > fraction * total scalar
# threshold is unchanged.
@register(
    "tpch_q11_important_stock",
    oracle="""
WITH val AS (
  SELECT l.l_partkey AS partkey,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS value_
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY 1
)
SELECT CAST(partkey AS BIGINT) AS partkey,
       ROUND(value_, 2) AS value_
FROM val
WHERE value_ > (SELECT SUM(value_) FROM val) * 0.001
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    val = (
        li.join(
            broadcast(
                s.join(
                    broadcast(n.filter(F.col("n_name") == "NATION_7")),
                    s.s_nationkey == n.n_nationkey,
                ).select("s_suppkey")
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "value_"
            )
        )
    )
    total = val.agg(F.sum("value_").alias("_tot"))
    return (
        val.crossJoin(F.broadcast(total))  # 1-row scalar subquery
        .filter(F.col("value_") > F.col("_tot") * 0.001)
        .select("partkey", F.round("value_", 2).alias("value_"))
    )


# Q16 adaptation: partsupp -> distinct transacting suppliers per part
# attribute group from lineitem; the complaint-supplier NOT IN
# exclusion becomes negative-balance suppliers. Pure counts: exact.
@register(
    "tpch_q16_parts_supplier_relationship",
    oracle="""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 2, 3, 4, 5)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY 1, 2, 3
""",
)
def tpch_q16_parts_supplier_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    complained = s.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    keep_parts = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    return (
        li.join(broadcast(keep_parts), li.l_partkey == p.p_partkey)
        .join(
            broadcast(complained), li.l_suppkey == complained.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# Q20 adaptation: "suppliers with excess stock of green parts" ->
# suppliers in one nation whose 1997 shipped quantity of gear parts
# exceeds a threshold (sums of integral quantities: exact); the
# semi-join through a correlated aggregate is unchanged.
@register(
    "tpch_q20_heavy_gear_suppliers",
    oracle="""
WITH q AS (
  SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%gear%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1
  HAVING SUM(l.l_quantity) > 50
)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
  AND s.s_suppkey IN (SELECT l_suppkey FROM q)
""",
)
def tpch_q20_heavy_gear_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    q = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(
            broadcast(p.filter(F.col("p_name").like("%gear%"))),
            li.l_partkey == p.p_partkey,
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(
            broadcast(n.filter(F.col("n_name").isin("NATION_3", "NATION_4", "NATION_5"))),
            s.s_nationkey == n.n_nationkey,
        )
        .join(q, s.s_suppkey == q.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )
