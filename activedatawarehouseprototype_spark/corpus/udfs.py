"""UDF/UDAF registration corpus (SURVEY §2.8): the three UDF tiers —
Arrow-vectorized pandas UDF (the fast Python path), pandas GROUPED_AGG
UDAF, and a row-at-a-time SQL-registered UDF (the documented slow path,
kept off hot paths) — plus the band range join.

Each has a DuckDB oracle: UDF bodies are deterministic arithmetic, so
the oracle expresses the same math in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register
from activedatawarehouseprototype_spark.operators.range_join import band_range_join


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


# --- Arrow-vectorized scalar pandas UDF ---
# (pandas_udf parses its DDL return type against the active session, so
# the decorated functions are built lazily inside each query.)


def _make_log_price_score():
    @pandas_udf("double")
    def log_price_score(price: pd.Series, discount: pd.Series) -> pd.Series:
        # numpy log1p == libm log1p; rounded on both sides (transcendental)
        p = np.asarray(price, dtype="float64")
        d = np.asarray(discount, dtype="float64")
        return pd.Series(np.log1p(p * (1.0 - d)))

    return log_price_score


@register(
    "udf_pandas_log_score",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(LN(1 + l_extendedprice * (1 - l_discount)), 6) AS log_score
FROM lineitem
WHERE l_quantity < 5
""",
)
def udf_pandas_log_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 5)
    score = _make_log_price_score()
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(score("l_extendedprice", "l_discount"), 6).alias("log_score"),
    )


# --- pandas GROUPED_AGG UDAF: discount-weighted average price ---


def _make_weighted_avg():
    @pandas_udf("double")
    def weighted_avg(price: pd.Series, weight: pd.Series) -> float:
        w = np.asarray(weight, dtype="float64")
        p = np.asarray(price, dtype="float64")
        return float(np.dot(p, w) / w.sum())

    return weighted_avg


@register(
    "udaf_weighted_avg_price",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
           AS qty_weighted_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    weighted_avg = _make_weighted_avg()
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_avg("l_extendedprice", "l_quantity"), 4
        ).alias("qty_weighted_price")
    )


# --- SQL-registered row UDF (slow path; registration surface demo) ---


@register(
    "udf_sql_registered_brand_code",
    oracle="""
SELECT p_partkey,
       UPPER(SUBSTRING(p_brand, 1, 2)) || '-' || CAST(p_size % 10 AS VARCHAR)
           AS brand_code
FROM part
""",
)
def udf_sql_registered_brand_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    def brand_code(brand: str, size: int) -> str:
        return f"{brand[:2].upper()}-{size % 10}"

    spark.udf.register("brand_code", brand_code, "string")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        "SELECT p_partkey, brand_code(p_brand, p_size) AS brand_code FROM part"
    )


# --- Band range join: order pairs within a price delta per priority ---


@register(
    "range_join_price_bands",
    oracle="""
SELECT a.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM orders a
JOIN orders b
  ON a.o_orderpriority = b.o_orderpriority
 AND a.o_orderkey < b.o_orderkey
 AND ABS(a.o_totalprice - b.o_totalprice) <= 100.0
GROUP BY a.o_orderpriority
""",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderpriority").alias("prio_a"),
        F.col("o_orderkey").alias("key_a"),
        F.col("o_totalprice").alias("price_a"),
    )
    b = o.select(
        F.col("o_orderpriority").alias("prio_b"),
        F.col("o_orderkey").alias("key_b"),
        F.col("o_totalprice").alias("price_b"),
    )
    pairs = band_range_join(a, b, "price_a", "price_b", delta=100.0)
    return (
        pairs.filter(
            (F.col("prio_a") == F.col("prio_b")) & (F.col("key_a") < F.col("key_b"))
        )
        .groupBy(F.col("prio_a").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- Python UDTF (table function) registration tier: one input row →
# many output rows through a registered, LATERAL-joinable function.
# Row-at-a-time Python like the SQL UDF above — registration-surface
# coverage, deliberately off hot paths (the columnar equivalent is
# posexplode over split()). ---


def _make_token_explode():
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class TokenExplode:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, len(tok)

    return TokenExplode


@register(
    "udtf_token_explode",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id % 100 = 0
)
SELECT doc_id, CAST(t.i AS INT) AS pos,
       toks[t.i + 1] AS token,
       CAST(length(toks[t.i + 1]) AS INT) AS token_len
FROM d, UNNEST(range(0, len(toks))) AS t(i)
""",
)
def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("token_explode", _make_token_explode())
    _load(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token, t.token_len "
        "FROM udtf_docs d, LATERAL token_explode(d.text) t"
    )
