"""Round-6 corpus additions: graph ranking, cohort/funnel analytics,
deterministic sampling variants, entropy scoring, skew-mitigation and
interval joins — each as a (Spark query, independent DuckDB-SQL twin)
pair under the driver's hash-match contract.

Reference parity note: none of these exist in the reference engine
(SURVEY §0 — it has no joins, sorts, or SQL at all); they are the
§2.8 built-in-family and training-pipeline extensions the task brief
mandates, expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


# --- PageRank over the nation trade graph --------------------------------


@register(
    "graph_pagerank_suppliers",
    oracle="""
WITH edges AS (
  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
         CAST(s.s_nationkey AS BIGINT) AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
nodes AS (
  SELECT DISTINCT v FROM (
    SELECT src AS v FROM edges UNION SELECT dst AS v FROM edges
  )
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
ne AS (
  SELECT e.src, e.dst, e.w / o.ow AS nw FROM edges e JOIN outw o USING (src)
),
r0 AS (SELECT v, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
r1 AS (
  SELECT nd.v,
         0.15 / (SELECT n FROM nn)
         + 0.85 * COALESCE(SUM(r0.r * ne.nw), 0) AS r
  FROM nodes nd
  LEFT JOIN ne ON ne.dst = nd.v
  LEFT JOIN r0 ON r0.v = ne.src
  GROUP BY nd.v
),
r2 AS (
  SELECT nd.v,
         0.15 / (SELECT n FROM nn)
         + 0.85 * COALESCE(SUM(r1.r * ne.nw), 0) AS r
  FROM nodes nd
  LEFT JOIN ne ON ne.dst = nd.v
  LEFT JOIN r1 ON r1.v = ne.src
  GROUP BY nd.v
),
r3 AS (
  SELECT nd.v,
         0.15 / (SELECT n FROM nn)
         + 0.85 * COALESCE(SUM(r2.r * ne.nw), 0) AS r
  FROM nodes nd
  LEFT JOIN ne ON ne.dst = nd.v
  LEFT JOIN r2 ON r2.v = ne.src
  GROUP BY nd.v
)
SELECT v AS node, ROUND(r, 6) AS rank FROM r3
""",
)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed supersteps, d=0.85, the leaky variant — see
    operators/graph.py) over the customer-nation -> supplier-nation
    trade graph: which nations' suppliers absorb the most order flow.
    The oracle unrolls the identical three iterations in SQL."""
    from activedatawarehouseprototype_spark.operators.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    edges = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("src"),
            F.col("s_nationkey").cast("bigint").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return pagerank(edges, damping=0.85, iters=3, weight="w", round_to=6)


# --- Monthly retention cohorts --------------------------------------------


@register(
    "retention_cohorts_monthly",
    oracle="""
WITH o AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS am FROM orders
),
f AS (SELECT o_custkey, MIN(am) AS cm FROM o GROUP BY o_custkey)
SELECT strftime(f.cm, '%Y-%m') AS cohort_month,
       CAST((year(o.am) - year(f.cm)) * 12
            + (month(o.am) - month(f.cm)) AS BIGINT) AS months_since,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
FROM o JOIN f USING (o_custkey)
GROUP BY 1, 2
""",
)
def retention_cohorts_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention matrix: customers grouped by first-
    order month, counted in each subsequent activity month. Two
    shuffles total (cohort agg on custkey; final agg on the matrix
    key) — the first-order table re-joins on the SAME custkey
    partitioning."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("am")
    )
    first = o.groupBy("o_custkey").agg(F.min("am").alias("cm"))
    return (
        o.join(first, "o_custkey")
        .groupBy(
            F.date_format("cm", "yyyy-MM").alias("cohort_month"),
            (
                (F.year("am") - F.year("cm")) * 12
                + (F.month("am") - F.month("cm"))
            )
            .cast("bigint")
            .alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


# --- Strict-consecutive funnel (MATCH_RECOGNIZE shape) ---------------------


@register(
    "funnel_match_recognize_strict",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS n1,
         LEAD(event_type, 2) OVER w AS n2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_strict_funnels
FROM s
WHERE event_type = 'view' AND n1 = 'click' AND n2 = 'purchase'
GROUP BY user_id
""",
)
def funnel_match_recognize_strict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MATCH_RECOGNIZE-style STRICT sequence matching: view -> click ->
    purchase with NO intervening event (contrast with the existing
    funnel_view_click_purchase, which allows gaps). Expressed as two
    LEADs over the per-user event order — one shuffle on user_id,
    sequential scan within each partition, the standard Spark
    translation of row-pattern matching for fixed-length patterns."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("n1"),
        F.lead("event_type", 2).over(w).alias("n2"),
    )
    return (
        s.filter(
            (F.col("event_type") == "view")
            & (F.col("n1") == "click")
            & (F.col("n2") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_strict_funnels"))
    )


# --- Deterministic fixed-k "reservoir" sample -------------------------------


@register(
    "reservoir_sample_fixed_k",
    oracle="""
SELECT doc_id, lang
FROM documents
ORDER BY md5('rs:' || CAST(doc_id AS VARCHAR)), doc_id
LIMIT 100
""",
)
def reservoir_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform sample as a deterministic hash-order top-k —
    the distributed replacement for reservoir sampling (same guarantee:
    every row equally likely under the salt; plus reproducibility,
    which an actual RNG reservoir lacks). Executes as
    TakeOrderedAndProject: each partition keeps its local k, the
    driver merges k-sized heaps — no global sort, no full shuffle."""
    d = _t(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(F.lit("rs:"), F.col("doc_id").cast("string")).cast("binary")
    )
    return (
        d.select("doc_id", "lang", key.alias("_k"))
        .orderBy("_k", "doc_id")
        .limit(100)
        .select("doc_id", "lang")
    )


# --- Equi-depth histogram via NTILE ----------------------------------------


@register(
    "ntile_equidepth_histogram",
    oracle="""
WITH b AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM b
GROUP BY bucket
""",
)
def ntile_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram of order prices via NTILE —
    the §2.8 ranking-window family's last uncovered member. NOTE the
    global ORDER BY window is a single-partition operator by
    definition; this entry pins NTILE's exact bucket-boundary
    semantics (count-balanced, earlier buckets absorb remainders).
    The 100 TB path for equi-depth histograms is approx_percentile
    boundaries + a free assign pass — pinned by
    histogram_event_values/percentile_order_prices."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy(F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


# --- Token-entropy quality scores -------------------------------------------


@register(
    "entropy_quality_scores",
    oracle="""
WITH t AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS c
  FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
  )
  WHERE tok <> ''
  GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 6) AS entropy
FROM t
GROUP BY doc_id
""",
)
def entropy_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon token entropy per document — the information-density
    quality signal (repetitive boilerplate scores low, natural prose
    high). One identity used on both sides so the agg is a single
    pass over (doc, token) counts:
    H = log2(N) - sum(c*log2(c))/N."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    cnt = tok.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.round(
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            6,
        ).alias("entropy"),
    )


# --- Skew-mitigated (salted) join, result-identical to the plain join -------


@register(
    "skew_salted_join_topk",
    oracle="""
WITH d AS (
  SELECT user_id, event_type AS first_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT d.first_type, e.event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events e JOIN d USING (user_id)
GROUP BY 1, 2
ORDER BY n DESC, first_type, event_type
LIMIT 10
""",
)
def skew_salted_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key join recipe, hash-checked against the PLAIN join's
    answer: the fact side salts its join key (deterministically, from
    event_id) into S=8 subkeys and the dim side replicates each row
    8x, so one hot user_id spreads over 8 shuffle partitions instead
    of one straggler task. Salting must never change answers — that
    is exactly what the oracle (an unsalted SQL join) certifies. At
    scale, AQE's skew-join split does this adaptively; the explicit
    salt is the static variant for engines/plans AQE can't touch."""
    ev = _t(spark, sf_dir, "events")
    S = 8
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.select(
            "user_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_type"))
        # replicate each dim row once per salt value
        .withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(S)]))
        )
    )
    fact = ev.select(
        "user_id",
        "event_type",
        F.pmod(F.xxhash64("event_id"), F.lit(S)).cast("int").alias("_salt"),
    )
    return (
        fact.join(dim, ["user_id", "_salt"])
        .groupBy("first_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "first_type", "event_type")
        .limit(10)
    )


# --- Same-day interval overlap pairs ----------------------------------------


@register(
    "interval_overlap_sessions",
    oracle="""
WITH iv AS (
  SELECT user_id, date_trunc('day', ts) AS d, MIN(ts) AS lo, MAX(ts) AS hi
  FROM events GROUP BY user_id, date_trunc('day', ts)
)
SELECT strftime(a.d, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM iv a
JOIN iv b ON a.d = b.d AND a.user_id < b.user_id
         AND a.lo <= b.hi AND b.lo <= a.hi
GROUP BY 1
""",
)
def interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day, how many user pairs had overlapping activity
    intervals — computed by the O(n log n) endpoint sweep
    (``interval_overlap_pair_counts``, operators/range_join.py), NOT
    by enumerating pairs: the day-blocked pair join is Θ(Σ block²)
    candidates (26.7M at sf0.1) while the sweep is one window pass.
    The oracle deliberately stays the naive quadratic SQL self-join —
    a fully independent recomputation of the same counts."""
    from activedatawarehouseprototype_spark.operators.range_join import (
        interval_overlap_pair_counts,
    )

    ev = _t(spark, sf_dir, "events")
    iv = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    counts = interval_overlap_pair_counts(iv, "d", "lo", "hi")
    return counts.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"), "n_pairs"
    )


# --- Deterministic weighted (quality-proportional) sampling -----------------


@register(
    "weighted_sample_by_quality",
    oracle="""
WITH f AS (
  SELECT lang, n_chars,
         CAST(concat('0x',
              substr(md5('wq:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) / 4294967296.0 AS frac
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM f
WHERE frac < n_chars / 600.0
GROUP BY lang
""",
)
def weighted_sample_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic Bernoulli sample: a document
    survives with probability proportional to its length score
    (n_chars/600, <1 on this corpus) — the curation shape "keep good
    documents more often", reproducible across engines because the
    coin is the md5 hash fraction, not an RNG (see
    operators/sampling.py)."""
    from activedatawarehouseprototype_spark.operators.sampling import (
        weighted_bernoulli_sample,
    )

    d = _t(spark, sf_dir, "documents")
    kept = weighted_bernoulli_sample(
        d, F.col("n_chars") / F.lit(600.0), ["doc_id"], salt="wq"
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# --- Snapshot diff (added / removed / changed / unchanged) -------------------


@register(
    "snapshot_diff_documents",
    oracle="""
WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0),
new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]' ELSE text END
           AS text
  FROM documents
  WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 23 = 0
),
d AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
              ELSE 'unchanged' END AS op
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT op, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM d GROUP BY op
""",
)
def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snapshot_diff (operators/warehouse.py) over a derived
    old/new pair of the documents table exercising all four classes:
    doc_id%17=0 absent from old (-> added), doc_id%13=0 absent from
    new (-> removed), doc_id%5=0 edited (-> changed), shifted copies
    of doc_id%23=0 inserted (-> added). The oracle recomputes the
    classification with an independent FULL OUTER JOIN."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        snapshot_diff,
    )

    d = _t(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 17 != 0).select("doc_id", "text")
    new = (
        d.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat("text", F.lit(" [edited]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 23 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"
            )
        )
    )
    return (
        snapshot_diff(old, new, ["doc_id"])
        .groupBy("op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").cast("bigint").alias("min_id"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
    )


# --- Per-source quota cap -----------------------------------------------------


@register(
    "source_quota_cap_stats",
    oracle="""
WITH f AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(concat('0x',
                    substr(md5('q1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) / 4294967296.0,
                  doc_id
         ) AS rn
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM f WHERE rn <= 40
GROUP BY source
""",
)
def source_quota_cap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_quota_cap (operators/sampling.py): at most 40 documents
    per source, chosen by the deterministic md5-hash order — the
    per-domain quota primitive. The oracle recomputes the hash rank
    in SQL."""
    from activedatawarehouseprototype_spark.operators.sampling import (
        group_quota_cap,
    )

    d = _t(spark, sf_dir, "documents")
    kept = group_quota_cap(d, ["source"], ["doc_id"], max_per_group=40)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# --- Rolling z-score anomaly detection ---------------------------------------


@register(
    "rolling_zscore_anomalies",
    oracle="""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS d, SUM(value) AS x
  FROM events GROUP BY user_id, date_trunc('day', ts)
),
zz AS (
  SELECT user_id, d, x,
         AVG(x) OVER w AS mu,
         STDDEV_SAMP(x) OVER w AS sd,
         COUNT(x) OVER w AS nb
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
       ROUND((x - mu) / sd, 4) AS zscore,
       ABS(ROUND((x - mu) / sd, 4)) > 3.0 AS anomaly
FROM zz
WHERE nb >= 3 AND sd IS NOT NULL AND sd > 0.0
""",
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rolling_zscore (operators/timeseries.py) over per-user daily
    value totals: each day scored against the user's own trailing
    7-day baseline (current day excluded), |z| > 3 flagged — the
    active-warehouse anomaly-alert shape with a full SQL twin."""
    from activedatawarehouseprototype_spark.operators.timeseries import (
        rolling_zscore,
    )

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum("value").alias("x"))
    z = rolling_zscore(
        daily, key_col="user_id", order_col="d", value_col="x",
        lookback=7, min_periods=3, round_to=4,
    )
    return z.filter(F.col("zscore").isNotNull()).select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "zscore",
        "anomaly",
    )
