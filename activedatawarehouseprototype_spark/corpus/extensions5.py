"""Corpus registrations new in round 9 (second wave): leakage-safe
cluster-level splits, the event transition matrix, the A/B
two-proportion z-test readout, the hash-trick classifier gate,
CUPED variance-reduction components, and k-core decomposition.

Each entry pairs the real operator with an ANSI-SQL twin DuckDB runs
on the same parquet. Float discipline (registry contract): every
double here is either ONE exact-integer IEEE division (transition
probabilities — deterministic, no rounding needed) or the z statistic,
whose formula is written as the identical IEEE expression tree on both
sides AND rounded to 6 decimals before hashing/thresholding; the
classifier gate is all-integer (milli-unit weights), zero float
discipline needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register
from activedatawarehouseprototype_spark.corpus.extensions import (
    _GRAMS_CAPPED,
    _MAX_DOC_FREQ,
    _NGRAM,
    _near_corpus,
)
from activedatawarehouseprototype_spark.operators import dedup, sampling
from activedatawarehouseprototype_spark.operators.abtest import (
    Z_CRIT_95,
    two_proportion_ztest,
)
from activedatawarehouseprototype_spark.operators.timeseries import (
    transition_counts,
)


# --- Leakage-safe cluster-level split (operators/sampling.py) ------------
# The split coin is tossed per NEAR-DUP CLUSTER (MinHash/LSH pairs
# closed transitively), so near-duplicates can never straddle a split
# boundary. The oracle recomputes the identical LSH pairs, closes them
# with a recursive CTE (independent of the Spark label propagation),
# and tosses the identical md5 coin on the cluster id. n_clusters per
# split + the disjointness of the coin make leakage arithmetically
# visible: Σ n_clusters across splits == |clusters|.

@register(
    "cluster_safe_split_stats",
    oracle=f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' zz9' AS text
  FROM documents WHERE doc_id % 101 = 0
),
{_GRAMS_CAPPED},
mh AS (
  SELECT doc_id, s.i AS hash_idx,
         MIN(md5(CAST(s.i AS VARCHAR) || ':' || shingle)) AS minhash
  FROM grams, UNNEST(generate_series(0, 11)) AS s(i)
  GROUP BY doc_id, s.i
),
bands AS (
  SELECT doc_id, hash_idx // 4 AS band,
         md5(string_agg(minhash, ',' ORDER BY minhash)) AS band_sig
  FROM mh GROUP BY doc_id, band
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a
),
comp AS (
  SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a
),
labeled AS (
  SELECT c.doc_id, length(c.text) AS lc,
         COALESCE(k.component, c.doc_id) AS cluster
  FROM corpus c LEFT JOIN comp k USING (doc_id)
),
coin AS (
  SELECT cluster, lc,
         CAST(concat('0x', substr(md5('s1:' || CAST(cluster AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS frac
  FROM labeled
)
SELECT CASE WHEN frac < 0.8 THEN 'train'
            WHEN frac < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters,
       CAST(SUM(lc) AS BIGINT) AS total_chars
FROM coin
GROUP BY split
""",
)
def cluster_safe_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _near_corpus(spark, sf_dir)
    pairs = dedup.lsh_candidates(
        corpus,
        "doc_id",
        "text",
        n=_NGRAM,
        k=12,
        bands=3,
        max_doc_freq=_MAX_DOC_FREQ,
    )
    labeled = sampling.cluster_safe_split(corpus, "doc_id", pairs)
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster").alias("n_clusters"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


# --- First-order Markov transition matrix (operators/timeseries.py) ------
# "What do users do AFTER X?" over per-user event sequences ordered by
# (ts, event_id). p is one exact-integer IEEE division — deterministic
# on both engines, no rounding discipline needed.

@register(
    "event_transition_matrix",
    oracle="""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
),
steps AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM ev
),
counts AS (
  SELECT src, dst, COUNT(*) AS n FROM steps
  WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE)
         AS p
FROM counts
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    )
    return transition_counts(ev, "user_id", "ts", "event_type", "event_id")


# --- A/B two-proportion z-test readout (operators/abtest.py) -------------
# Arms are the deterministic md5 coin on user_id (salt 'ab1'): the
# same engine-portable bucketing every sampler here uses, which is
# exactly how real experiment systems assign stable arms. Unit =
# ACTIVE USER-DAY (epoch-day bucket, the tz-free convention the
# quantile MV uses); one metric per event type: converted = the unit
# emitted that type that day. Units are user-days, never events (the
# classic unit-of-analysis error), and arms cut across user-days of
# the same user identically on both engines. Metrics whose pooled
# variance is zero (everyone or no one converted) are FILTERED on
# both sides — "no evidence", not ±inf — which also keeps nullable
# doubles out of the driver hash. The 5-row metric dimension is
# broadcast (BroadcastNLJ, bounded by |event types| — plan-audit
# allowlisted).

@register(
    "ab_ztest_event_conversion",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS day, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
),
arms AS (
  SELECT user_id, day,
         CASE WHEN CAST(concat('0x', substr(md5('ab1:' || CAST(user_id AS VARCHAR)), 1, 8))
                   AS BIGINT) / 4294967296.0 < 0.5
              THEN 'A' ELSE 'B' END AS arm
  FROM (SELECT DISTINCT user_id, day FROM ev)
),
types AS (SELECT DISTINCT event_type AS metric FROM ev),
presence AS (SELECT DISTINCT user_id, day, event_type AS metric FROM ev),
units AS (
  SELECT a.user_id, a.day, t.metric, a.arm,
         CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS converted
  FROM arms a CROSS JOIN types t
  LEFT JOIN presence p ON p.user_id = a.user_id AND p.day = a.day
                      AND p.metric = t.metric
),
agg AS (
  SELECT metric,
         SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS conv_a,
         SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS conv_b
  FROM units GROUP BY metric
),
stat AS (
  SELECT metric, n_a, n_b, conv_a, conv_b,
         CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pooled,
         CASE WHEN n_a > 0 AND n_b > 0 THEN
           ROUND((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                         / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                                 / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 / CAST(n_a AS DOUBLE)
                           + 1.0 / CAST(n_b AS DOUBLE))), 6)
         END AS z_raw
  FROM agg
)
SELECT metric,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
       z_raw AS z,
       abs(z_raw) > {Z_CRIT_95} AS significant
FROM stat
WHERE n_a > 0 AND n_b > 0
  AND pooled * (1.0 - pooled)
      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)) > 0
""",
)
def ab_ztest_event_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _load(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            "user_id",
            F.floor(F.unix_millis(F.col("ts")) / F.lit(86_400_000)).alias(
                "day"
            ),
            "event_type",
        )
    )
    units_base = ev.select("user_id", "day").distinct().withColumn(
        "arm",
        F.when(
            sampling.hash_fraction(["user_id"], "ab1") < 0.5, "A"
        ).otherwise("B"),
    )
    types = ev.select(F.col("event_type").alias("metric")).distinct()
    presence = ev.select(
        "user_id", "day", F.col("event_type").alias("metric")
    ).distinct().withColumn("_hit", F.lit(1))
    units = (
        units_base.crossJoin(F.broadcast(types))
        .join(presence, ["user_id", "day", "metric"], "left")
        .withColumn("converted", F.coalesce(F.col("_hit"), F.lit(0)))
    )
    return two_proportion_ztest(units, ["metric"]).filter(
        F.col("z").isNotNull()
    )


# --- Hash-trick classifier gate (operators/text.py) -----------------------
# fastText-style linear inference: grams -> md5 buckets -> shared slot
# weights (integer milli-units), per-doc exact sum, keep = score >= 0.
# The oracle re-derives the identical bucket/weight math in SQL over
# an unnested gram stream — a fully independent path to the same
# exact integers.

@register(
    "classifier_gate_stats",
    oracle="""
WITH docs AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ts
  FROM documents WHERE text IS NOT NULL
),
uni AS (SELECT doc_id, unnest(ts) AS g FROM docs),
bi AS (
  SELECT doc_id, ts[s.i] || '_' || ts[s.i + 1] AS g
  FROM docs, UNNEST(generate_series(1, len(ts) - 1)) s(i)
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
w AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5('w:' || CAST(
             CAST(concat('0x', substr(md5('clf1:' || g), 1, 8)) AS BIGINT)
             % 4096 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS wt
  FROM grams
),
scores AS (
  SELECT doc_id, SUM(wt) AS score_milli, COUNT(*) AS n_grams
  FROM w GROUP BY doc_id
)
SELECT d.lang, s.score_milli >= 0 AS keep,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s.score_milli) AS BIGINT) AS sum_score_milli,
       CAST(SUM(s.n_grams) AS BIGINT) AS sum_grams
FROM docs d JOIN scores s USING (doc_id)
GROUP BY d.lang, keep
""",
)
def classifier_gate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.text import (
        hashed_linear_score,
    )

    d = _load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    ).select("doc_id", "lang", "text")
    scored = hashed_linear_score(d)
    return scored.groupBy("lang", "keep").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score_milli").cast("bigint").alias("sum_score_milli"),
        F.sum("n_grams").cast("bigint").alias("sum_grams"),
    )


# --- CUPED variance-reduction components (operators/abtest.py) ------------
# Pre-period covariate x = events BEFORE the fixture's midpoint day;
# outcome y = purchases ON/AFTER it; arms = the same md5 user coin as
# the z-test. Every output is an exact BIGINT (per-arm moment sums +
# pooled theta numerator/denominator) — the float θ and adjusted
# means are consumer-side, because a rounded quotient is never
# parity-safe (grouped-OLS convention). The 1-row midpoint bound and
# the 1-row pooled totals are broadcast literals (plan-audit
# allowlisted).

@register(
    "cuped_arm_components",
    oracle="""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS day, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
),
bounds AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM ev),
units AS (
  SELECT u.user_id,
         CASE WHEN CAST(concat('0x', substr(md5('ab1:' || CAST(u.user_id AS VARCHAR)), 1, 8))
                   AS BIGINT) / 4294967296.0 < 0.5
              THEN 'A' ELSE 'B' END AS arm,
         COALESCE(SUM(CASE WHEN e.day < b.mid THEN 1 ELSE 0 END), 0) AS x_pre,
         COALESCE(SUM(CASE WHEN e.day >= b.mid
                            AND e.event_type = 'purchase'
                           THEN 1 ELSE 0 END), 0) AS y
  FROM (SELECT DISTINCT user_id FROM ev) u
  JOIN ev e ON e.user_id = u.user_id
  CROSS JOIN bounds b
  GROUP BY u.user_id
),
per_arm AS (
  SELECT arm,
         COUNT(*) AS n,
         SUM(x_pre) AS sum_x,
         SUM(y) AS sum_y,
         SUM(x_pre * y) AS sum_xy,
         SUM(x_pre * x_pre) AS sum_xx
  FROM units GROUP BY arm
),
pooled AS (
  SELECT SUM(n) AS n_, SUM(sum_x) AS sx_, SUM(sum_y) AS sy_,
         SUM(sum_xy) AS sxy_, SUM(sum_xx) AS sxx_
  FROM per_arm
)
SELECT p.arm,
       CAST(p.n AS BIGINT) AS n,
       CAST(p.sum_x AS BIGINT) AS sum_x,
       CAST(p.sum_y AS BIGINT) AS sum_y,
       CAST(t.n_ * t.sxy_ - t.sx_ * t.sy_ AS BIGINT) AS theta_num,
       CAST(t.n_ * t.sxx_ - t.sx_ * t.sx_ AS BIGINT) AS theta_den
FROM per_arm p CROSS JOIN pooled t
""",
)
def cuped_arm_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.abtest import (
        cuped_components,
    )

    ev = (
        _load(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            "user_id",
            F.floor(F.unix_millis(F.col("ts")) / F.lit(86_400_000)).alias(
                "day"
            ),
            "event_type",
        )
    )
    bounds = ev.agg(
        F.floor((F.min("day") + F.max("day") + 1) / 2)
        .cast("bigint")
        .alias("mid")
    )
    units = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") < F.col("mid"), 1).otherwise(0)).alias(
                "x_pre"
            ),
            F.sum(
                F.when(
                    (F.col("day") >= F.col("mid"))
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
        .withColumn(
            "arm",
            F.when(
                sampling.hash_fraction(["user_id"], "ab1") < 0.5, "A"
            ).otherwise("B"),
        )
    )
    return cuped_components(units)


# --- k-core decomposition (operators/graph.py) -----------------------------
# Parts that stay in a mutually-reinforced co-purchase web: edges are
# part pairs co-ordered in >= 2 distinct orders (casual one-off pairs
# stripped at the edge level), then the 2-core peels vertices that
# cannot keep two such partners. Peeling is MONOTONE, so the oracle
# unrolls a fixed 8 rounds (measured fixpoint: 0/3/5 rounds at
# sf0.001/0.01/0.1) — rounds past the fixpoint are no-ops — while the
# Spark side runs to the detected fixpoint and RAISES if 8 rounds
# ever stop sufficing (a silent partial peel would be a wrong
# answer, and a silent oracle drift would be a wrong gate).


def _kcore_oracle(k: int = 2, rounds: int = 8) -> str:
    # every CTE is MATERIALIZED: each round references the previous
    # round TWICE (degree + join), so un-materialized CTEs would
    # re-evaluate the whole chain exponentially (observed as DuckDB
    # "too many open files" re-scanning lineitem 2^rounds times)
    sql = ["""
WITH pp AS MATERIALIZED (
  SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
pairs AS MATERIALIZED (
  SELECT pa, pb FROM pp GROUP BY pa, pb HAVING COUNT(*) >= 2
),
e0 AS MATERIALIZED (
  SELECT pa AS a, pb AS b FROM pairs
  UNION
  SELECT pb, pa FROM pairs
)"""]
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        sql.append(f""",
d{r} AS MATERIALIZED (SELECT a, COUNT(*) AS c FROM {prev} GROUP BY a),
e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  JOIN d{r} x ON x.a = e.a AND x.c >= {k}
  JOIN d{r} y ON y.a = e.b AND y.c >= {k}
)""")
    sql.append(f"""
SELECT CAST(a AS BIGINT) AS node,
       CAST(COUNT(*) AS BIGINT) AS degree
FROM e{rounds} GROUP BY a
""")
    return "".join(sql)


@register("kcore_copurchase_parts", oracle=_kcore_oracle())
def kcore_copurchase_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.basket import (
        frequent_pairs,
    )
    from activedatawarehouseprototype_spark.operators.graph import kcore

    li = _load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # pair generation via the basket operator's map-side C(B,2)
    # expansion (ONE collect_set shuffle of lineitem), not a lineitem
    # self-join (which shuffles the fact table twice and explodes
    # before deduplicating) — identical pair table, one corpus
    # shuffle fewer; entry wall time is dominated by the peel loop's
    # per-round barriers, which are graph-sized, not corpus-sized
    pairs = frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=2
    )
    return kcore(pairs, k=2, src="item_a", dst="item_b", max_iter=8)


# --- Audio pipeline exact stats (operators/multimodal.py) -----------------
# The whole binary audio path — FAUD ENCODE (mapInPandas synthesizer)
# -> opaque binary column -> DECODE -> features — checked against
# pure arithmetic: the fake codec's sample formula is
# v(i) = ((doc_id*131 + i*17) % 20001) - 10000, so the oracle
# recomputes peak / zero-crossings / Σv² per document directly from
# the formula, never touching bytes. Exact BIGINTs only (the
# parity-grade twin of decode_audio's float rms/zcr — sum_sq is
# rms²·n·32768² exactly).

@register(
    "audio_exact_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, 50 + doc_id % 97 AS n
  FROM documents WHERE doc_id % 7 = 0
),
s AS (
  SELECT d.doc_id, d.n, g.i,
         (d.doc_id * 131 + g.i * 17) % 20001 - 10000 AS v,
         CASE WHEN g.i > 0
              THEN (d.doc_id * 131 + (g.i - 1) * 17) % 20001 - 10000
         END AS pv
  FROM d, UNNEST(generate_series(0, d.n - 1)) AS g(i)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS channels,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak_i16,
       CAST(SUM(CASE WHEN i > 0 AND (v < 0) != (pv < 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq
FROM s GROUP BY doc_id
""",
)
def audio_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.multimodal import (
        attach_fake_audio,
        audio_exact_int_stats,
    )

    docs = (
        _load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            (F.lit(50) + F.col("doc_id") % 97).alias("n_samples"),
        )
    )
    return audio_exact_int_stats(attach_fake_audio(docs))
