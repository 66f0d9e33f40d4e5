"""Corpus registrations new in round 8: SCD Type-2 replay, Bloom-
pruned semi join, selective small-file compaction, Count-Min sketch
estimates, and market-basket frequent pairs.

Each entry pairs the real operator (not a reimplementation) with an
ANSI-SQL twin DuckDB can run on the same parquet. Where an operator's
output is not SQL-derivable (CMS estimates, file-count effects), the
entry ships the exact SQL-derivable twin columns plus booleans the
oracle pins to TRUE — the sketch-entry pattern established in round 7.

Float discipline (registry contract): o_totalprice is 2-decimal
source data, so ROUND(SUM(o_totalprice), 2) is parity-safe; counts
are exact longs.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


# Entries that build an on-disk artifact (SCD2 dim, compacted table,
# BM25 index, snapshot pair) used to collect() the result so the dir
# could be rmtree'd in `finally` before the caller consumed the
# DataFrame — a driver-memory bottleneck for anything unbounded (the
# SCD2 dim is O(customers x years)). Instead: one session-lifetime
# scratch root, cleaned at interpreter exit, so every entry can return
# the LAZY scan and Spark never funnels rows through the driver.
_SCRATCH_ROOT: str | None = None


def _scratch(prefix: str) -> str:
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="adw-corpus-scratch-")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)


# --- SCD Type-2 replay (operators/warehouse.py::scd2_upsert) -------------
# Orders replayed as a changelog of each customer's order priority,
# one batch per calendar year (latest row per customer per year is
# that batch's update). The oracle reconstructs the same history with
# window functions: versions start where the per-batch value differs
# from the previous batch's, valid_to is the next version's start.


@register(
    "scd2_customer_priority_history",
    oracle="""
WITH latest AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority,
         o_orderdate AS eff, year(o_orderdate) AS b,
         row_number() OVER (PARTITION BY o_custkey, year(o_orderdate)
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders WHERE o_orderdate IS NOT NULL
),
seq AS (SELECT custkey, priority, eff, b FROM latest WHERE rn = 1),
marked AS (
  SELECT *, lag(priority) OVER (PARTITION BY custkey ORDER BY b) AS prev
  FROM seq
),
versions AS (
  SELECT custkey, priority, eff AS valid_from, b
  FROM marked WHERE prev IS NULL OR prev <> priority
),
final AS (
  SELECT custkey, priority, valid_from,
         lead(valid_from) OVER (PARTITION BY custkey ORDER BY b) AS valid_to
  FROM versions
)
SELECT CAST(custkey AS BIGINT) AS custkey, priority, valid_from,
       strftime(COALESCE(valid_to, TIMESTAMP '9999-12-31'), '%Y-%m-%d')
         AS valid_to,
       (valid_to IS NULL) AS is_current
FROM final
""",
)
def scd2_customer_priority_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.warehouse import (
        scd2_upsert,
    )

    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    # ONE pass computes every year's update batch (window keyed on
    # (custkey, year) — identical per-batch pick as windowing each
    # year-filtered slice separately) into a lazily-checkpointed
    # frame; the replay loop below filters the CACHED updates per
    # batch instead of re-scanning + re-sorting the fact table once
    # per year (guide §1.2: remove redundant passes — the REPLAY
    # itself, one MERGE per batch, is the scenario and stays; a
    # parquet round-trip variant measured SLOWER locally, the cache
    # avoids its listing/read overhead while keeping the single scan).
    target = _scratch("adw-scd2-") + "/dim"
    w = Window.partitionBy("o_custkey", "_y").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    upd_all = (
        orders.withColumn("_y", F.year("o_orderdate"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "_y",
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("eff"),
        )
        .localCheckpoint(eager=False)
    )
    # ONE job yields the batch list AND the update-frame size — the
    # size drives the same graph-parallelism decision the CC/kcore
    # loops make (operators/scheduling.py): a replay over a
    # single-shuffle-partition update set runs its per-batch MERGE
    # jobs without AQE/broadcast stage-job overhead (each exchange of
    # the full-outer merge is otherwise its own stage-job per batch).
    # Production-size dims (n_upd >= 200k) keep AQE untouched.
    from activedatawarehouseprototype_spark.operators.scheduling import (
        single_partition_loop,
    )

    stats = upd_all.agg(
        F.count(F.lit(1)).alias("n_upd"),
        F.sort_array(F.collect_set("_y")).alias("years"),
    ).collect()[0]
    n_parts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            int(stats["n_upd"]) // 200_000 + 1,
        ),
    )
    with single_partition_loop(spark, n_parts):
        for y in stats["years"]:
            upd = upd_all.filter(F.col("_y") == y).drop("_y")
            # validate=False: upd is deduplicated (row_number()=1) and
            # NULL-ts-filtered by construction two lines up — the
            # validation job per batch would only re-prove that
            scd2_upsert(
                spark,
                target,
                upd,
                key_cols=["custkey"],
                tracked_cols=["priority"],
                effective_ts_col="eff",
                validate=False,
            )
    # The SCD2 high-date sentinel keeps the open version's valid_to
    # comparable across engines (NULL timestamps render
    # engine-specifically: Spark None vs pandas NaT) — and it is
    # rendered as a STRING on both sides because 9999-12-31 overflows
    # ns-resolution pandas (max 2262-04-11) during the driver's
    # DuckDB-result conversion (the round-8 red row).
    return spark.read.parquet(target).select(
        F.col("custkey").cast("bigint").alias("custkey"),
        "priority",
        "valid_from",
        F.date_format(
            F.coalesce(
                F.col("valid_to"), F.lit("9999-12-31").cast("timestamp")
            ),
            "yyyy-MM-dd",
        ).alias("valid_to"),
        "is_current",
    )


# --- Bloom-pruned semi join (operators/bloom_filter.py) ------------------
# Orders of high-balance customers: the Bloom filter prunes the orders
# scan map-side; the exact semi join keeps the result bit-identical to
# the plain semi join the oracle runs.


@register(
    "bloom_semijoin_hot_customer_orders",
    oracle="""
SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
GROUP BY 1
""",
)
def bloom_semijoin_hot_customer_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.bloom_filter import (
        bloom_semi_join,
    )

    orders = _t(spark, sf_dir, "orders")
    hot = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    return (
        bloom_semi_join(orders, hot, "o_custkey", "c_custkey")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


# --- Selective compaction (operators/warehouse.py::compact_small_files) --
# Orders scattered into 48 tiny files, compacted; the rollup proves no
# row was lost or duplicated, and the oracle pins the two invariants
# the SQL twin cannot observe (file count fell; row count preserved).


@register(
    "compaction_small_files_rollup",
    oracle="""
SELECT o_orderpriority AS priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       TRUE AS files_reduced, TRUE AS rows_preserved
FROM orders
GROUP BY 1
""",
)
def compaction_small_files_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.warehouse import (
        compact_small_files,
    )

    work = _scratch("adw-compact-")
    path = f"{work}/orders"
    orders = _t(spark, sf_dir, "orders")
    # the row count rides the small-files seed write (Observation —
    # the IVF/text-index build-meta recipe): one orders scan, not two
    from pyspark.sql import Observation

    obs = Observation()
    orders.observe(obs, F.count(F.lit(1)).alias("n")).repartition(
        48
    ).write.parquet(path)
    n_rows = int(obs.get["n"])
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    compact_small_files(spark, path, target_bytes=64 << 20)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    compacted = spark.read.parquet(path)
    return (
        compacted.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            "*",
            F.lit(n_after < n_before).alias("files_reduced"),
            (F.lit(compacted.count() == n_rows)).alias("rows_preserved"),
        )
    )


# --- Count-Min sketch estimates (operators/sketches.py) ------------------
# Exact per-type counts are the SQL twin; the CMS estimate rides along
# as the deterministic invariant est >= exact (CMS never
# under-estimates), pinned TRUE by the oracle.


@register(
    "cms_event_type_counts",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
       TRUE AS est_ge_exact
FROM events WHERE event_type IS NOT NULL
GROUP BY 1
""",
)
def cms_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    events = _t(spark, sf_dir, "events")
    exact = (
        events.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
    )
    sketch = cms_build(events, "event_type", width=1024, depth=4)
    est = cms_estimate(
        sketch, exact.select("event_type"), "event_type", width=1024, depth=4
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_cnt",
        (F.col("est") >= F.col("exact_cnt")).alias("est_ge_exact"),
    )


# --- Market-basket frequent pairs (operators/basket.py) ------------------
# Parts co-occurring in the same order; deterministic top-25 by
# (support desc, item_a, item_b).


@register(
    "frequent_part_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS support
  FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2
)
SELECT CAST(item_a AS BIGINT) AS item_a, CAST(item_b AS BIGINT) AS item_b,
       CAST(support AS BIGINT) AS support
FROM pairs
QUALIFY row_number() OVER (ORDER BY support DESC, item_a, item_b) <= 25
""",
)
def frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.basket import (
        frequent_pairs,
    )

    li = _t(spark, sf_dir, "lineitem")
    return (
        frequent_pairs(li, "l_orderkey", "l_partkey")
        .orderBy(F.col("support").desc(), "item_a", "item_b")
        .limit(25)
        .select(
            F.col("item_a").cast("bigint").alias("item_a"),
            F.col("item_b").cast("bigint").alias("item_b"),
            F.col("support").cast("bigint").alias("support"),
        )
    )


# --- CUSUM change points (operators/timeseries.py::cusum) ----------------
# Values quantized to integer cents on BOTH sides, so every statistic
# is exact integer arithmetic — no float discipline needed at all.
# target=2000, slack=500 (cents): d+ = v - 2500, d- = 1500 - v;
# alarm threshold 10000. The oracle computes the SAME cumsum identity
# (S = C - min(0, running-min C)), not the textbook fold — identical
# arithmetic, engine-portable by construction.


@register(
    "cusum_user_value_shifts",
    oracle="""
WITH src AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
walk AS (
  SELECT user_id, ts_ms, event_id,
         SUM(v - 2500) OVER w AS c_pos,
         SUM(1500 - v) OVER w AS c_neg
  FROM src
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
               ROWS UNBOUNDED PRECEDING)
),
s AS (
  SELECT user_id,
         c_pos - LEAST(MIN(c_pos) OVER w2, 0) AS s_pos,
         c_neg - LEAST(MIN(c_neg) OVER w2, 0) AS s_neg
  FROM walk
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                ROWS UNBOUNDED PRECEDING)
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(MAX(s_pos) AS BIGINT) AS max_s_pos,
       CAST(MAX(s_neg) AS BIGINT) AS max_s_neg,
       CAST(COUNT(*) FILTER (WHERE s_pos > 10000) AS BIGINT) AS n_alarms
FROM s GROUP BY user_id
""",
)
def cusum_user_value_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.timeseries import cusum

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    walked = cusum(
        ev, "user_id", "ts", "v", target=2000, slack=500, tie_col="event_id"
    )
    return walked.groupBy(F.col("key").alias("user_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.max("s_pos").cast("bigint").alias("max_s_pos"),
        F.max("s_neg").cast("bigint").alias("max_s_neg"),
        F.sum((F.col("s_pos") > 10000).cast("bigint"))
        .cast("bigint")
        .alias("n_alarms"),
    )


# --- Balanced class downsampling (operators/sampling.py) -----------------
# Documents downsampled to the smallest language's size; the md5 hash
# order (the registry's engine-portable sampling coin) makes the
# surviving subset — hence the exact per-class sums — identical in
# both engines.


@register(
    "balanced_downsample_by_lang",
    oracle="""
WITH f AS (
  SELECT lang, doc_id, n_chars,
         CAST(concat('0x', substr(md5('b1:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS frac
  FROM documents
),
nmin AS (
  SELECT MIN(cnt) AS n
  FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang)
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY frac, doc_id) AS rn
  FROM f
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM ranked, nmin WHERE rn <= nmin.n
GROUP BY lang
""",
)
def balanced_downsample_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.sampling import (
        balanced_downsample,
    )

    docs = _t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    kept = balanced_downsample(docs, ["lang"], ["doc_id"], salt="b1")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


# --- Persisted BM25 inverted index (operators/text_index.py) -------------
# Same output contract as retrieval.bm25_topk (formula, rounding,
# ranking), so the entry REUSES the bm25_topk_docs oracle text — the
# two paths can't drift apart. The index build + bucket-pruned search
# run inside the entry; correctness proves the persisted path returns
# the exact on-the-fly ranking.

from activedatawarehouseprototype_spark.corpus import ORACLES as _ORACLES
from activedatawarehouseprototype_spark.corpus.extensions2 import BM25_QUERIES


@register("bm25_index_search_topk", oracle=_ORACLES["bm25_topk_docs"])
def bm25_index_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.text_index import (
        text_index_build,
        text_index_search,
    )

    work = _scratch("adw-tix-")
    path = f"{work}/bm25"
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    text_index_build(docs, path, n_buckets=32)
    return text_index_search(spark, path, BM25_QUERIES, k=10)


# --- Per-key lag features (operators/timeseries.py::lag_features) --------
# Everything picked or per-row subtracted — no order-dependent sums,
# so values ship UNROUNDED (IEEE-bit-exact across engines). Lag NULLs
# at key starts are COALESCEd to -1 on both sides (values are
# positive; NULL doubles render engine-specifically).


@register(
    "lag_features_user_values",
    oracle="""
WITH src AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(ts_ms AS BIGINT) AS ts_ms,
       CAST(event_id AS BIGINT) AS event_id,
       value,
       COALESCE(lag(value, 1) OVER w, -1) AS lag_1,
       COALESCE(lag(value, 2) OVER w, -1) AS lag_2,
       value - COALESCE(lag(value, 1) OVER w, value) AS delta_1,
       MIN(value) OVER wt AS rmin_3,
       MAX(value) OVER wt AS rmax_3
FROM src
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id),
       wt AS (PARTITION BY user_id ORDER BY ts_ms, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def lag_features_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.timeseries import (
        lag_features,
    )

    out = lag_features(
        _t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        "value",
        lags=(1, 2),
        trail=3,
        tie_col="event_id",
    )
    return out.select(
        F.col("key").cast("bigint").alias("user_id"),
        F.col("ts_ms").cast("bigint").alias("ts_ms"),
        F.col("tie").cast("bigint").alias("event_id"),
        "value",
        F.coalesce(F.col("lag_1"), F.lit(-1.0)).alias("lag_1"),
        F.coalesce(F.col("lag_2"), F.lit(-1.0)).alias("lag_2"),
        "delta_1",
        "rmin_3",
        "rmax_3",
    )


# --- Schema-evolution reader (operators/evolution.py) --------------------
# Orders split into a v1 snapshot (INT orderkey, o_status column name,
# no priority column) and a v2 snapshot (modern schema); read_evolved
# unifies them (rename + widening + NULL fill) and the rollup must
# equal the same rollup on the never-split table. Widening is
# exercised on the integer KEY (value-preserving); prices stay
# 2-decimal doubles so ROUND(SUM, 2) keeps the registry float rule.


@register(
    "schema_evolution_orders_union",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey,
       CAST(COUNT(*) FILTER (WHERE year(o_orderdate) < 1996) AS BIGINT)
         AS n_no_priority
FROM orders
WHERE o_orderdate IS NOT NULL
GROUP BY 1
""",
)
def schema_evolution_orders_union(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.evolution import (
        read_evolved,
    )

    work = _scratch("adw-evolve-")
    v1, v2 = f"{work}/v1", f"{work}/v2"
    # NULL-date rows are excluded on BOTH sides (oracle WHERE above):
    # the year() split would silently drop them only on the Spark side
    # if a future fixture grew dirty dates.
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    orders.filter(F.year("o_orderdate") < 1996).select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        "o_custkey",
        F.col("o_orderstatus").alias("o_status"),
        "o_totalprice",
        "o_orderdate",
    ).write.parquet(v1)
    orders.filter(F.year("o_orderdate") >= 1996).write.parquet(v2)
    unified = read_evolved(
        spark, [v1, v2], renames={"o_status": "o_orderstatus"}
    )
    return unified.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.max("o_orderkey").cast("bigint").alias("max_orderkey"),
        F.sum(F.col("o_orderpriority").isNull().cast("bigint"))
        .cast("bigint")
        .alias("n_no_priority"),
    )
