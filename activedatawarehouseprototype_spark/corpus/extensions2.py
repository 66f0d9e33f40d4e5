"""Corpus registrations for the round-6 operator tier (BM25, EWMA,
PCA, windowed top-k/distinct, stream-stream interval join, Gopher
quality flags, skipping index, PPJoin, recursive CTE, HLL MV).

These operators shipped in round 6 with pytest-only evidence because
the 50-slot driver window was full; this module gives each one a
(spark_fn, oracle_sql) pair so they earn driver CORRECTNESS rows.
Oracle texts are shared with (or mirrored from) the operators' own
test files — the test imports the corpus constant where one exists so
the two can't drift.

Float discipline (registry contract, see corpus/__init__): per-row
arithmetic ships unrounded (IEEE-bit-exact across engines);
order-dependent aggregates are ROUNDed identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register
from activedatawarehouseprototype_spark.corpus.extensions import (
    _CORPUS_NEAR,
    _GRAMS,
    _near_corpus,
)

HOUR = 3_600_000
DAY = 86_400_000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


# --- BM25 retrieval (operators/retrieval.py) ----------------------------
# Fixed query set over the documents corpus; k1=1.2, b=0.75 (the
# operator defaults, written out numerically in the SQL twin:
# tf*(k1+1) = tf*2.2, k1*(1-b) = 0.25*1.2 via 1.2*(0.25+0.75*dl/avgdl)).

BM25_QUERIES = [
    (1, "hash join"),
    (2, "window sort merge"),
    (3, "stream batch data"),
    (4, "zzzabsent spark"),  # one term misses the corpus entirely
]


@register(
    "bm25_topk_docs",
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens),
q(query_id, term) AS (VALUES
  (1, 'hash'), (1, 'join'),
  (2, 'window'), (2, 'sort'), (2, 'merge'),
  (3, 'stream'), (3, 'batch'), (3, 'data'),
  (4, 'zzzabsent'), (4, 'spark')
),
toks AS (SELECT doc_id, unnest(w) AS term FROM d),
posts AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM posts GROUP BY term),
contrib AS (
  SELECT q.query_id, p.doc_id,
         LN((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
         * (p.tf * 2.2)
           / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS c
  FROM posts p
  JOIN q ON q.term = p.term
  JOIN dfreq f ON f.term = p.term
  JOIN lens l ON l.doc_id = p.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT query_id, doc_id, ROUND(SUM(c), 6) AS score
  FROM contrib GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id, score
FROM scores
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id ASC) <= 10
""",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.retrieval import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), BM25_QUERIES, k=10)


# --- Per-key EWMA finals (operators/timeseries.py) -----------------------
# The fold expression acc*(1-a) + a*x is the operator's recurrence;
# only the order-dependent final is ROUNDed (registry float rule).


@register(
    "ewma_final_by_user",
    oracle="""
WITH folded AS (
  -- ORDER BY inside the aggregate: the only list() ordering DuckDB
  -- guarantees (CTE ordering may not survive parallel aggregation)
  SELECT user_id,
         list(value ORDER BY epoch_ms(ts), event_id) AS xs
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(len(xs) AS BIGINT) AS n_obs,
       ROUND(list_reduce(xs, (acc, x) -> acc * 0.75 + 0.25 * x), 6)
         AS ewma_final
FROM folded
""",
)
def ewma_final_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.timeseries import ewma

    out = ewma(
        _t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        "value",
        alpha=0.25,
        tie_col="event_id",
    )
    return out.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.round(F.max_by("ewma", "seq"), 6).alias("ewma_final"),
    ).select(F.col("key").alias("user_id"), "n_obs", "ewma_final")


# --- PCA covariance entries (operators/pca.py) ---------------------------
# The distributed gram/moment pass (one scan, dim^2-sized partials,
# driver merge) probed at 8 fixed (i, j) cells against DuckDB
# recomputing cov(i,j) from scratch. Dimensions 1-based to match
# DuckDB list indexing.

_COV_PAIRS = [(1, 1), (2, 2), (17, 17), (64, 64), (1, 2), (3, 7), (10, 40), (32, 64)]


@register(
    "embedding_covariance_entries",
    oracle="""
WITH e AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
pairs(i, j) AS (VALUES (1, 1), (2, 2), (17, 17), (64, 64),
                       (1, 2), (3, 7), (10, 40), (32, 64)),
m AS (
  SELECT p.i, p.j,
         AVG(v[p.i] * v[p.j]) AS exy,
         AVG(v[p.i]) AS ex, AVG(v[p.j]) AS ey
  FROM e, pairs p GROUP BY p.i, p.j
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       ROUND(exy - ex * ey, 6) AS cov
FROM m
""",
)
def embedding_covariance_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.pca import _merged_moments

    n, mu, M2 = _merged_moments(_t(spark, sf_dir, "embeddings"), "embedding")
    rows = [
        (i, j, round(float(M2[i - 1, j - 1] - mu[i - 1] * mu[j - 1]), 6))
        for i, j in _COV_PAIRS
    ]
    return spark.createDataFrame(rows, "i bigint, j bigint, cov double")


# --- Windowed top-k heavy hitters: the batch twin of the Misra-Gries
# streaming operator (streaming/windowed.py) ------------------------------


@register(
    "windowed_topk_events",
    oracle="""
WITH c AS (
  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
         event_type,
         CAST(user_id AS VARCHAR) AS key,
         COUNT(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT window_start_ms, event_type, key, CAST(n AS BIGINT) AS n,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY window_start_ms, event_type
                               ORDER BY n DESC, key ASC) AS rank
  FROM c
)
WHERE rank <= 5
""",
)
def windowed_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.streaming.windowed import (
        windowed_topk_batch,
    )

    return windowed_topk_batch(
        _t(spark, sf_dir, "events"),
        "user_id",
        HOUR,
        k=5,
        group_cols=("event_type",),
    )


# --- Windowed distinct counts, exact path (streaming/windowed.py) --------


@register(
    "windowed_distinct_users",
    oracle="""
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
       event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_keys
FROM events
WHERE ts IS NOT NULL AND user_id IS NOT NULL
GROUP BY 1, 2
""",
)
def windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.streaming.windowed import (
        windowed_distinct_batch,
    )

    return windowed_distinct_batch(
        _t(spark, sf_dir, "events"), "user_id", HOUR, group_cols=("event_type",)
    )


# --- Stream-stream interval join, batch twin (streaming/stream_join.py):
# for every click, the purchases by the same user within the next hour.
# The oracle is plain SQL over raw events — the operator must be
# invisible relative to it. --------------------------------------------


@register(
    "stream_interval_join_clicks",
    oracle="""
SELECT c.user_id,
       c.event_id  AS click_id,
       p.event_id  AS purchase_id,
       p.value     AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
""",
)
def stream_interval_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.streaming.stream_join import (
        interval_join_batch,
    )

    ev = _t(spark, sf_dir, "events")
    j = interval_join_batch(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        on=["user_id"],
        lower_ms=0,
        upper_ms=HOUR,
    )
    return j.select(
        "user_id",
        F.col("event_id_l").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        F.col("value_r").alias("purchase_value"),
    )


# --- Gopher composite quality flags (operators/text.py) ------------------
# Fixture-tuned thresholds (documents are single-space word salad);
# all ratios are per-row arithmetic -> unrounded by the float rule.


@register(
    "text_gopher_quality",
    oracle="""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / CAST(nullif(len(string_split(text, ' ')), 0) AS DOUBLE)
           AS mean_word_len,
         CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS DOUBLE)
           / CAST(nullif(len(string_split(text, ' ')), 0) AS DOUBLE)
           AS symbol_ratio,
         CAST(len(list_filter(string_split(text, chr(10)),
                  l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) AS DOUBLE)
           / CAST(len(string_split(text, chr(10))) AS DOUBLE)
           AS bullet_line_frac,
         CAST(len(list_filter(string_split(text, chr(10)),
                  l -> rtrim(l) LIKE '%...')) AS DOUBLE)
           / CAST(len(string_split(text, chr(10))) AS DOUBLE)
           AS ellipsis_line_frac,
         CAST(len(list_filter(string_split(text, ' '),
                  w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
           / CAST(nullif(len(string_split(text, ' ')), 0) AS DOUBLE)
           AS alpha_word_frac,
         CAST(len(list_filter(['the', 'a'],
                  s -> list_contains(string_split(text, ' '), s))) AS BIGINT)
           AS stopwords_present
  FROM documents
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
       ellipsis_line_frac, alpha_word_frac, stopwords_present,
       CASE WHEN n_words < 20 THEN 'too_few_words'
            WHEN n_words > 100000 THEN 'too_many_words'
            WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_len'
            WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
            WHEN bullet_line_frac > 0.9 THEN 'bullet_lines'
            WHEN ellipsis_line_frac > 0.3 THEN 'ellipsis_lines'
            WHEN alpha_word_frac < 0.8 THEN 'alpha_words'
            WHEN stopwords_present < 2 THEN 'stopwords'
            ELSE NULL END AS first_fail,
       CASE WHEN n_words < 20 THEN 'too_few_words'
            WHEN n_words > 100000 THEN 'too_many_words'
            WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_len'
            WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
            WHEN bullet_line_frac > 0.9 THEN 'bullet_lines'
            WHEN ellipsis_line_frac > 0.3 THEN 'ellipsis_lines'
            WHEN alpha_word_frac < 0.8 THEN 'alpha_words'
            WHEN stopwords_present < 2 THEN 'stopwords'
            ELSE NULL END IS NULL AS keep
FROM m
""",
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.text import (
        gopher_quality_flags,
    )

    return gopher_quality_flags(
        _t(spark, sf_dir, "documents"),
        min_words=20,
        stopwords=("the", "a"),
        min_stopwords_present=2,
    )


# --- File-skipping index (operators/skipping.py): cluster orders by
# date into a temp table, index it, run a pruned-scan rollup. Pruning
# must be INVISIBLE to results, so the oracle is plain SQL over the
# original orders table. The result is localCheckpoint-ed before the
# temp table is deleted. --------------------------------------------------


@register(
    "skipping_index_pruned_scan",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
WHERE o_orderdate >= DATE '1995-01-01'
  AND o_orderdate <  DATE '1996-01-01'
GROUP BY 1
""",
)
def skipping_index_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators.skipping import (
        Pred,
        build_skipping_index,
        read_with_skipping,
    )
    from activedatawarehouseprototype_spark.operators.warehouse import cluster_write

    path = tempfile.mkdtemp(prefix="adw-skip-") + "/orders"
    try:
        cluster_write(
            _t(spark, sf_dir, "orders"), path, ["o_orderdate"], n_files=8
        )
        build_skipping_index(spark, path, ["o_orderdate", "o_totalprice"])
        res = (
            read_with_skipping(
                spark,
                path,
                [
                    Pred("o_orderdate", ">=", "1995-01-01"),
                    Pred("o_orderdate", "<", "1996-01-01"),
                ],
            )
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            )
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)


# --- PPJoin prefix-filtered EXACT Jaccard (operators/dedup.py):
# same answers as the inverted-index base with NO df-cap approximation,
# so the oracle is the UNCAPPED recompute. -------------------------------


@register(
    "dedup_ppjoin_jaccard",
    oracle=f"""
WITH corpus AS ({_CORPUS_NEAR}),
grams AS ({_GRAMS}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY id_a, id_b
)
SELECT CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.6
""",
)
def dedup_ppjoin_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    return prefix_filtered_jaccard_pairs(
        _near_corpus(spark, sf_dir), "doc_id", "text", n=5, threshold=0.6
    ).select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")


# --- Recursive CTE (Spark 4.x WITH RECURSIVE): the IDENTICAL SQL text
# runs on both engines — the zero-dialect-translation contract
# (sql_shared_text_rollup) extended to recursion. The text below IS
# both the Spark query and its oracle. ------------------------------------

REACHABILITY_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
reach(node, hops) AS (
  SELECT CAST(0 AS INT) AS node, CAST(0 AS INT) AS hops
  UNION ALL
  SELECT e.dst AS node, CAST(r.hops + 1 AS INT) AS hops
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.hops < 3
)
SELECT node, CAST(MIN(hops) AS INT) AS min_hops
FROM reach
GROUP BY node
"""


@register("sql_recursive_reachability", oracle=REACHABILITY_SQL)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "lineitem", "supplier"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(REACHABILITY_SQL)


# --- HLL sketch MV (operators/sketch_mv.py), upgraded from rows-only
# to oracle-backed: sketch binaries are engine-specific, so the entry
# outputs the EXACT per-window distinct count (hash-checked against
# DuckDB) plus a boolean asserting the MV's estimate lands within 5%
# of it — the oracle emits TRUE, so an out-of-bound estimate is a
# driver hash MISMATCH, not a silent pass. lgk=12 => ~1.6% std error;
# small windows are exact (HLL sparse mode). DAILY buckets: the MV
# partitions by bucket, and an hourly grain writes hundreds of
# partition dirs on the fixture's time span — daily keeps the entry
# cheap while exercising the identical build/read/estimate path. ---------


@register(
    "hll_mv_daily_distinct",
    oracle="""
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS window_start_ms,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS est_ok
FROM events
WHERE ts IS NOT NULL AND user_id IS NOT NULL
GROUP BY 1
""",
)
def hll_mv_daily_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators.sketch_mv import hll_mv_build

    ev = _t(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="adw-hllmv-") + "/mv"
    try:
        hll_mv_build(ev, path, "user_id", bucket_ms=DAY)
        mv = spark.read.parquet(path).select(
            F.col("bucket").cast("bigint").alias("window_start_ms"),
            "n_rows",
            F.hll_sketch_estimate("sketch").cast("bigint").alias("_est"),
        )
        exact = (
            ev.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
            .groupBy(
                (
                    F.floor(F.unix_millis("ts") / F.lit(DAY)) * DAY
                ).cast("bigint").alias("window_start_ms")
            )
            .agg(F.count_distinct("user_id").cast("bigint").alias("exact_distinct"))
        )
        res = mv.join(exact, "window_start_ms").select(
            "window_start_ms",
            "n_rows",
            "exact_distinct",
            (
                F.abs(F.col("_est") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * F.lit(0.05)
            ).alias("est_ok"),
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)


# =========================================================================
# Round-7 NEW operator tier: drift detection, triangle counting,
# temperature mixing, HLL set algebra.
# =========================================================================


# --- PSI/KL distribution drift (operators/drift.py): even/odd epoch-ms
# split of events as reference/current, per event_type — the
# data-quality gate shape ("did this batch's value distribution move
# vs the reference period"). Laplace smoothing and fixed
# reference-side bins are part of the metric contract, mirrored in SQL.


@register(
    "drift_psi_event_values",
    oracle="""
WITH src AS (
  SELECT event_type,
         CASE WHEN epoch_ms(ts) % 2 = 0 THEN 'r' ELSE 'c' END AS side,
         CAST(value AS DOUBLE) AS v
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
),
geo AS (
  SELECT event_type, MIN(v) AS lo, MAX(v) AS hi
  FROM src WHERE side = 'r' GROUP BY event_type
),
binned AS (
  SELECT s.event_type, s.side,
         CAST(LEAST(GREATEST(
           CASE WHEN g.hi > g.lo
                THEN FLOOR((s.v - g.lo) / ((g.hi - g.lo) / 10.0))
                ELSE 0 END, 0), 9) AS INT) AS bin
  FROM src s JOIN geo g USING (event_type)
),
per_bin AS (
  SELECT event_type, bin,
         SUM(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS nr,
         SUM(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS nc
  FROM binned GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(nr) AS tr, SUM(nc) AS tc
  FROM per_bin GROUP BY 1
)
SELECT p.event_type,
       CAST(t.tr AS BIGINT) AS n_ref,
       CAST(t.tc AS BIGINT) AS n_cur,
       ROUND(SUM((nc / t.tc + 1e-6 - (nr / t.tr + 1e-6))
                 * LN((nc / t.tc + 1e-6) / (nr / t.tr + 1e-6))), 6) AS psi,
       ROUND(SUM((nc / t.tc + 1e-6)
                 * LN((nc / t.tc + 1e-6) / (nr / t.tr + 1e-6))), 6) AS kl
FROM per_bin p JOIN tot t USING (event_type)
WHERE t.tr > 0 AND t.tc > 0
GROUP BY 1, 2, 3
""",
)
def drift_psi_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.drift import psi_kl_drift

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    side = F.unix_millis("ts") % 2
    return psi_kl_drift(
        ev, side == 0, side == 1, "value", ["event_type"], bins=10
    )


# --- Triangle counts of the nation trade graph (operators/graph.py,
# degree-ordered node-iterator — orientation caps wedge blow-up at
# hub nodes; the oracle is the direct 3-way edge self-join, feasible
# on the 25-node nation graph and deliberately not how the operator
# computes it).


@register(
    "graph_triangle_counts",
    oracle="""
WITH raw AS (
  SELECT c.c_nationkey AS a, s.s_nationkey AS b
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
),
e AS (
  SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM raw
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
per_node AS (
  SELECT node, COUNT(*) AS t FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT CAST(n.node AS BIGINT) AS node,
       CAST(COALESCE(p.t, 0) AS BIGINT) AS triangles
FROM nodes n LEFT JOIN per_node p USING (node)
""",
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.graph import triangle_counts

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    raw = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, s.s_suppkey == l.l_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
    )
    return triangle_counts(raw)


# --- Temperature-based source mixing (operators/sampling.py): tau=0.5
# so the source weight is sqrt(n) — IEEE-correctly-rounded in BOTH
# engines, keeping the per-source rate bit-identical; the md5 coin is
# the module's standard engine-portable draw.


@register(
    "temperature_mix_by_lang",
    oracle="""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents GROUP BY lang
),
z AS (SELECT SUM(SQRT(n)) AS z, SUM(n) AS total FROM counts),
rates AS (
  SELECT lang, LEAST(1.0, z.total * (SQRT(n) / z.z) / n) AS r
  FROM counts, z
),
f AS (
  SELECT d.lang, d.doc_id, d.n_chars,
         CAST(concat('0x',
              substr(md5('tm1:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) / 4294967296.0 AS frac
  FROM documents d
)
SELECT f.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM f JOIN rates USING (lang)
WHERE f.frac < rates.r
GROUP BY 1
""",
)
def temperature_mix_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.sampling import (
        temperature_mix_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        temperature_mix_sample(docs, "lang", ["doc_id"], tau=0.5)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --- HLL set algebra (operators/sketch_mv.py): distinct union /
# intersection of click vs purchase users from the sketch MV, with the
# exact recomputes as the hash-checked twin and the estimate bounds as
# oracle-pinned booleans (|intersection err| <= 5% of the exact UNION —
# the honest inclusion-exclusion contract).


@register(
    "hll_set_algebra_event_types",
    oracle="""
WITH c AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL
),
p AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL
),
u AS (SELECT user_id FROM c UNION SELECT user_id FROM p)
SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS exact_clicks,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS exact_purchases,
       CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS exact_union,
       CAST((SELECT COUNT(*) FROM c) + (SELECT COUNT(*) FROM p)
            - (SELECT COUNT(*) FROM u) AS BIGINT) AS exact_intersection,
       TRUE AS a_ok, TRUE AS b_ok, TRUE AS union_ok, TRUE AS inter_ok
""",
)
def hll_set_algebra_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators.sketch_mv import (
        hll_mv_build,
        hll_mv_set_estimates,
    )

    ev = _t(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="adw-hllset-") + "/mv"
    try:
        hll_mv_build(ev, path, "user_id", bucket_ms=DAY, group_cols=("event_type",))
        est = hll_mv_set_estimates(spark, path, "event_type", "click", "purchase")
        base = ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        # ONE scan + ONE shuffle computes all three exact cardinalities
        # (was: click/purchase distinct subtrees EACH evaluated twice —
        # own count + the union branch — 4 events scans, 4+ shuffles):
        # per-user click/purchase flags, then a 1-row global rollup.
        # Equivalence: a user is in C iff a click row exists (max flag),
        # in the union iff any row survives the isin filter, so |C| =
        # sum(_c), |U| = flag-frame rows — the same sets the oracle's
        # DISTINCT/UNION formulation counts (guide §2.4: one exchange
        # shared by all three aggregates instead of one per subtree).
        flags = (
            base.filter(F.col("event_type").isin("click", "purchase"))
            .groupBy("user_id")
            .agg(
                F.max((F.col("event_type") == "click").cast("long")).alias("_c"),
                F.max((F.col("event_type") == "purchase").cast("long")).alias("_p"),
            )
        )
        exact = (
            flags.agg(
                F.coalesce(F.sum("_c"), F.lit(0))
                .cast("bigint")
                .alias("exact_clicks"),
                F.coalesce(F.sum("_p"), F.lit(0))
                .cast("bigint")
                .alias("exact_purchases"),
                F.count(F.lit(1)).cast("bigint").alias("exact_union"),
            )
            .withColumn("_j", F.lit(1))
        )
        res = (
            est.withColumn("_j", F.lit(1))
            .join(exact, "_j")
            .select(
                "exact_clicks",
                "exact_purchases",
                "exact_union",
                (
                    F.col("exact_clicks") + F.col("exact_purchases")
                    - F.col("exact_union")
                ).cast("bigint").alias("exact_intersection"),
                (
                    F.abs(F.col("est_a") - F.col("exact_clicks"))
                    <= F.col("exact_clicks") * 0.05
                ).alias("a_ok"),
                (
                    F.abs(F.col("est_b") - F.col("exact_purchases"))
                    <= F.col("exact_purchases") * 0.05
                ).alias("b_ok"),
                (
                    F.abs(F.col("est_union") - F.col("exact_union"))
                    <= F.col("exact_union") * 0.05
                ).alias("union_ok"),
                (
                    F.abs(
                        F.col("est_intersection")
                        - (
                            F.col("exact_clicks") + F.col("exact_purchases")
                            - F.col("exact_union")
                        )
                    )
                    <= F.col("exact_union") * 0.05
                ).alias("inter_ok"),
            )
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path.rsplit("/", 1)[0], ignore_errors=True)
