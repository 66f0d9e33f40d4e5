"""Second analytics batch: percentiles, pivoted aggregation, grouping
sets, conditional aggregation, value-window frames, ntile, and two more
TPC-H shapes — rounding out SURVEY §2.8's built-in operator families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


# --- TPC-H Q6 shape: tight filter → single-row agg (pushdown showcase) ---


@register(
    "tpch_q6_revenue_delta",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""",
)
def tpch_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- TPC-H Q3 shape: 3-way join → group → top-10 (tie-broken) ---


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey AS orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       epoch_ms(o.o_orderdate) AS orderdate_ms
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            # o_orderdate is TIMESTAMP_NTZ; cast → UTC-instant millis,
            # matching the oracle's epoch_ms(naive-as-UTC).
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_ms"
            ),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
        .select("orderkey", "revenue", "orderdate_ms")
    )


# --- Percentiles (linear interpolation on both engines) ---


@register(
    "percentile_order_prices",
    oracle="""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       ROUND(MIN(o_totalprice), 4) AS p_min,
       ROUND(MAX(o_totalprice), 4) AS p_max
FROM orders
GROUP BY o_orderstatus
""",
)
def percentile_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.min("o_totalprice"), 4).alias("p_min"),
        F.round(F.max("o_totalprice"), 4).alias("p_max"),
    )


# --- Pivoted aggregation (portable CASE-sum pivot: identical shape on
# both engines; Spark's df.pivot produces the same plan) ---


@register(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
       CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
       CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
    )


# --- GROUPING SETS through the SQL front door ---


@register(
    "grouping_sets_orders",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --- Value-window frames: running sum + first/last over an explicit
# ROWS frame, per customer ---


@register(
    "window_running_order_totals",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING) AS first_order,
       CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS INT)
           AS price_quartile
FROM orders
""",
)
def window_running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = order.rowsBetween(Window.unboundedPreceding, 0)
    by_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_spend"),
        F.first("o_orderkey").over(frame).alias("first_order"),
        F.ntile(4).over(by_price).alias("price_quartile"),
    )
