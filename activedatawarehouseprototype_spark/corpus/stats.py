"""Statistical aggregates + regex extraction corpus: corr/stddev/var,
boolean aggregates, count_if, regexp_extract, and value histograms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


# --- corr / stddev_samp / var_samp (identical sample definitions in
# both engines; rounded — they divide order-dependent sums) ---


@register(
    "stats_price_quantity",
    oracle="""
SELECT l_returnflag,
       ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
       ROUND(stddev_samp(l_extendedprice), 4) AS price_sd,
       ROUND(var_samp(l_discount), 8) AS disc_var,
       ROUND(AVG(l_tax), 6) AS tax_mean
FROM lineitem
GROUP BY l_returnflag
""",
)
def stats_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_sd"),
        F.round(F.var_samp("l_discount"), 8).alias("disc_var"),
        F.round(F.avg("l_tax"), 6).alias("tax_mean"),
    )


# --- boolean aggregates + count_if ---


@register(
    "bool_aggs_per_segment",
    oracle="""
SELECT c_mktsegment,
       bool_or(c_acctbal > 9000) AS any_rich,
       bool_and(c_acctbal > -900) AS all_above_floor,
       CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative
FROM customer
GROUP BY c_mktsegment
""",
)
def bool_aggs_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
        F.bool_and(F.col("c_acctbal") > -900).alias("all_above_floor"),
        F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
    )


# --- regexp extraction (simple portable pattern) ---


@register(
    "regexp_part_type_tokens",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_type, '^([a-z]+)', 1) AS first_word,
       regexp_extract(p_name, '([0-9]+)', 1) AS first_number,
       CAST(regexp_matches(p_type, 'br') AS BOOLEAN) AS has_br
FROM part
""",
)
def regexp_part_type_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_name", "([0-9]+)", 1).alias("first_number"),
        F.col("p_type").rlike("br").alias("has_br"),
    )


# --- value histogram (width_bucket analogue via floor division) ---


@register(
    "histogram_event_values",
    oracle="""
SELECT event_type,
       CAST(FLOOR(value / 25.0) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(value), 4) AS bucket_avg
FROM events
GROUP BY event_type, bucket
""",
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.floor(F.col("value") / 25.0).cast("int").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("bucket_avg"),
    )


# --- hour-of-day activity profile (date-part grouping over events) ---


@register(
    "hourly_activity_profile",
    oracle="""
SELECT CAST(hour(ts) AS INT) AS hour_of_day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY hour_of_day, event_type
""",
)
def hourly_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.hour("ts").alias("hour_of_day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# --- NULL semantics: aggregates skip nulls, COUNT(col) vs COUNT(*),
# null-safe division — generated via NULLIF since the fixtures are
# null-free; engines must agree on every null rule ---


@register(
    "null_semantics_aggs",
    oracle="""
WITH t AS (
  SELECT o_orderstatus,
         NULLIF(o_totalprice, 0.0) AS price_nz,
         CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
              ELSE o_totalprice END AS price_non_urgent
  FROM orders
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(price_non_urgent) AS BIGINT) AS n_non_urgent,
       ROUND(COALESCE(AVG(price_non_urgent), -1.0), 4) AS avg_non_urgent,
       ROUND(SUM(price_nz) / NULLIF(COUNT(price_nz), 0), 4) AS manual_avg
FROM t
GROUP BY o_orderstatus
""",
)
def null_semantics_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    t = o.select(
        "o_orderstatus",
        F.nullif("o_totalprice", F.lit(0.0)).alias("price_nz"),
        F.when(F.col("o_orderpriority") == "1-URGENT", None)
        .otherwise(F.col("o_totalprice"))
        .alias("price_non_urgent"),
    )
    return t.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count("price_non_urgent").alias("n_non_urgent"),
        F.round(F.coalesce(F.avg("price_non_urgent"), F.lit(-1.0)), 4).alias(
            "avg_non_urgent"
        ),
        F.round(
            F.sum("price_nz") / F.nullif(F.count("price_nz"), F.lit(0)), 4
        ).alias("manual_avg"),
    )


# --- Native pivot (df.groupBy().pivot()) — same result as the
# CASE-pivot entry, exercising Spark's pivot operator itself ---


@register(
    "pivot_native_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
       CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
       CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_native_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot emits null for empty cells; counts must be 0
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("F"),
        F.coalesce("O", F.lit(0)).alias("O"),
        F.coalesce("P", F.lit(0)).alias("P"),
    )


# --- Top bigram frequencies over documents (n-gram frequency table) ---


@register(
    "text_top_bigrams",
    oracle="""
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks WHERE len(t) >= 2
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams
GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
""",
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.text import word_ngrams

    d = _t(spark, sf_dir, "documents")
    grams = d.select(word_ngrams("text", 2).alias("gs")).select(
        F.explode("gs").alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


# --- Approximate sketches, upgraded in round 7 from rows-only to
# oracle-backed: sketch values differ by engine, so the entry outputs
# the EXACT counts (hash-checked against DuckDB) plus booleans
# asserting each estimate lands inside its bound — the oracle emits
# TRUE, so an out-of-bound estimate is a driver hash MISMATCH, not a
# silent pass. Bounds: HLL++ at default rsd 0.05 -> 3-sigma = 15%;
# percentile_approx accuracy 1000 -> rank error <= n/1000, well inside
# the exact p47..p53 band at every fixture SF. ---


@register(
    "sketch_approx_distinct_and_quantiles",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS distinct_ok,
       TRUE AS median_ok
FROM lineitem GROUP BY 1
""",
)
def sketch_approx_distinct_and_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct("l_partkey").cast("bigint").alias("exact_parts"),
            F.approx_count_distinct("l_partkey").alias("_apx"),
            F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias(
                "_amed"
            ),
            F.expr("percentile(l_extendedprice, 0.47)").alias("_p47"),
            F.expr("percentile(l_extendedprice, 0.53)").alias("_p53"),
        )
        .select(
            "l_returnflag",
            "n",
            "exact_parts",
            (
                F.abs(F.col("_apx") - F.col("exact_parts"))
                <= F.col("exact_parts") * F.lit(0.15)
            ).alias("distinct_ok"),
            (
                (F.col("_amed") >= F.col("_p47")) & (F.col("_amed") <= F.col("_p53"))
            ).alias("median_ok"),
        )
    )
