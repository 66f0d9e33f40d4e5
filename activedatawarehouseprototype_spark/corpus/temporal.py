"""Temporal-operator corpus: as-of join and session windows — operator
families absent from the reference AND from Spark's built-in batch
joins, provided as composable operators with DuckDB oracles (DuckDB has
native ASOF JOIN, which makes an independent oracle rather than a plan
restatement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register
from activedatawarehouseprototype_spark.operators.asof import asof_join


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _load(spark, sf_dir, "events")


# --- As-of join: for each click, the latest purchase at-or-before it
# by the same user. Right side deduped to one row per (user, ts) so
# the match is well-defined on both engines. ---


@register(
    "asof_click_latest_purchase",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT c.event_id,
       c.user_id,
       epoch_ms(c.ts) AS click_ts_ms,
       COALESCE(p.purchase_value, -1.0) AS purchase_value_asof
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def asof_click_latest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(
        clicks, purchases, key="user_id", ts="ts", value_cols=["purchase_value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("click_ts_ms"),
        # no-NULL-floats rule: a NULL double round-trips as NaN via
        # pandas on the DuckDB side — sentinel instead of NULL.
        F.coalesce("purchase_value_asof", F.lit(-1.0)).alias("purchase_value_asof"),
    )


# --- Session windows: gaps-and-islands sessionization (30-minute
# inactivity gap) per user. Expressed with window functions so batch
# Spark and DuckDB share exact semantics; Spark's native
# F.session_window gives the same sessions for streaming (merge when
# next_ts < prev_ts + gap). ---

_GAP_MS = 30 * 60 * 1000


@register(
    "session_windows_per_user",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS tms, value FROM events
), flagged AS (
  SELECT user_id, tms, value,
         CASE WHEN tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms)
                   >= {_GAP_MS}
              OR LAG(tms) OVER (PARTITION BY user_id ORDER BY tms) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM e
), numbered AS (
  SELECT user_id, tms, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY tms
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       CAST(session_no AS BIGINT) AS session_no,
       MIN(tms) AS session_start_ms,
       MAX(tms) AS session_last_ms,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS session_value
FROM numbered
GROUP BY user_id, session_no
""",
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select(
        "user_id", F.unix_millis("ts").alias("tms"), "value"
    )
    order = Window.partitionBy("user_id").orderBy("tms")
    flagged = e.withColumn(
        "is_start",
        F.when(
            (F.col("tms") - F.lag("tms").over(order) >= _GAP_MS)
            | F.lag("tms").over(order).isNull(),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("is_start").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("tms").alias("session_start_ms"),
        F.max("tms").alias("session_last_ms"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# --- Funnel analysis: ordered view -> click -> purchase conversion.
# Stage k's timestamp is the FIRST event of that type strictly AFTER
# the user's stage-(k-1) timestamp (the standard strict-order funnel,
# immune to a purchase that precedes the first view). Scale shape:
# per-stage filtered min-aggregates and joins all keyed on user_id —
# one hash partitioning reused across every stage (AQE coalesces),
# never a per-user sort of the whole event stream. ---


@register(
    "funnel_view_click_purchase",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY 1
)
SELECT CAST(v.user_id AS BIGINT) AS user_id,
       epoch_ms(v.t1) AS view_ms,
       epoch_ms(c.t2) AS click_ms,
       epoch_ms(p.t3) AS purchase_ms
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.unix_millis("t1").alias("view_ms"),
            F.unix_millis("t2").alias("click_ms"),
            F.unix_millis("t3").alias("purchase_ms"),
        )
    )


# --- Resample + forward fill (gap filling): every user's value series
# regularized onto a daily grid; a day with no events carries the
# previous observation forward. Values are PICKED (deterministic
# per-bucket last by (ts, event_id)), never summed — bit-exact across
# engines, no rounding needed. ---


@register(
    "resample_ffill_daily_values",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms, value, event_id FROM events
),
lastb AS (
  SELECT user_id, bucket, value
  FROM (
    SELECT user_id, ms // 86400000 AS bucket, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, ms // 86400000
                              ORDER BY ms DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
),
span AS (
  SELECT user_id, MIN(ms // 86400000) AS b0, MAX(ms // 86400000) AS b1
  FROM e GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM span
)
SELECT g.user_id,
       CAST(g.bucket * 86400000 AS BIGINT) AS bucket_ms,
       last_value(l.value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       (l.value IS NOT NULL) AS observed
FROM grid g LEFT JOIN lastb l ON g.user_id = l.user_id AND g.bucket = l.bucket
""",
)
def resample_ffill_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.timeseries import (
        resample_ffill,
    )

    return resample_ffill(
        _events(spark, sf_dir),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        step_ms=86_400_000,
        tie_col="event_id",
    )


# --- Alert burst suppression (cooldown): purchases per user as
# pseudo-alerts; bursts chain firings closer than 1 hour and emit one
# row each (first ts, swallowed count, span). Gaps-and-islands on
# both engines; timestamps are picked/integer-subtracted, bit-exact. ---


@register(
    "alert_cooldown_bursts",
    oracle="""
WITH a AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT user_id, ms, event_id,
         CASE WHEN lag(ms) OVER w IS NULL
                   OR ms - lag(ms) OVER w >= 3600000
              THEN 1 ELSE 0 END AS nb
  FROM a WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
),
b AS (
  SELECT user_id, ms,
         SUM(nb) OVER (PARTITION BY user_id ORDER BY ms, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS burst
  FROM m
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(MIN(ms) AS BIGINT) AS alert_ts_ms,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_suppressed,
       CAST(MAX(ms) - MIN(ms) AS BIGINT) AS burst_span_ms
FROM b GROUP BY user_id, burst
""",
)
def alert_cooldown_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.cooldown import (
        suppress_alert_bursts,
    )

    alerts = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return suppress_alert_bursts(
        alerts, ["user_id"], "ts", cooldown_ms=3_600_000, tie_col="event_id"
    ).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "alert_ts_ms",
        "n_suppressed",
        "burst_span_ms",
    )
