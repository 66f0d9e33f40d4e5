"""Rule-engine corpus: the reference's query semantics (SURVEY §2.4-2.6)
exercised over the ``events`` table, each with a DuckDB oracle.

Window bucketing is done in epoch-millis integer math on both sides so
the oracle is bit-exact:

- tumbling start  = (tms // w) * w                      (Spark window(ts, w))
- sliding starts  = multiples of s in (tms - w, tms]    (Spark window(ts, w, s))
- per-event frame = RANGE BETWEEN w PRECEDING AND CURRENT ROW over tms,
  inclusive both ends — parity with ``isStateValueInWindow``
  (reference DynamicQueryFunction.java:277-280).

Window bounds are emitted as epoch-millis BIGINT (not timestamps) to
keep the hash comparison timezone-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load
from activedatawarehouseprototype_spark.corpus import register
from activedatawarehouseprototype_spark.rules.compiler import evaluate_rule, evaluate_rules
from activedatawarehouseprototype_spark.rules.model import Rule

HOUR_MS = 3_600_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


def _project_eval(df: DataFrame, round_agg: int | None = 4) -> DataFrame:
    """EVAL schema → oracle-friendly projection (epoch-ms bounds)."""
    agg = F.col("agg_value")
    if round_agg is not None:
        agg = F.round(agg, round_agg)
    return df.select(
        "query_id",
        "key",
        F.unix_millis("window_start").alias("window_start_ms"),
        F.unix_millis("window_end").alias("window_end_ms"),
        agg.alias("agg_value"),
        "fired",
    )


# --- W2 tumbling + AVG + filters + HAVING flag (the README congestion
# query shape: AVG(speed) in a box over a window; README.md:102-132) ---

RULE_TUMBLING_AVG = Rule.from_dict(
    {
        "queryId": 101,
        "queryState": "ACTIVE",
        "windowFilterRules": [
            {"field": "event_type", "operator": "=", "value": "click"},
            {"field": "value", "operator": ">", "value": "10"},
        ],
        "groupingKeyNames": ["user_id"],
        "aggregateFieldName": "value",
        "aggregatorFunctionType": "AVG",
        "limitOperatorType": ">",
        "limit": 100,
        "windowMilliseconds": HOUR_MS,
        "frequencyMilliseconds": None,  # freq null → W2 tumbling
    }
)


@register(
    "rule_tumbling_avg",
    oracle=f"""
WITH e AS (
  SELECT * FROM events WHERE event_type = 'click' AND value > 10.0
)
SELECT CAST(101 AS BIGINT) AS query_id,
       '{{user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
       (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS window_start_ms,
       (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} + {HOUR_MS} AS window_end_ms,
       ROUND(AVG(value), 4) AS agg_value,
       AVG(value) > 100.0 AS fired
FROM e
GROUP BY user_id, window_start_ms
""",
)
def rule_tumbling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_eval(evaluate_rule(_events(spark, sf_dir), RULE_TUMBLING_AVG))


# --- W3 sliding + MAX (exact, no rounding needed) ---

RULE_SLIDING_MAX = Rule.from_dict(
    {
        "queryId": 102,
        "queryState": "ACTIVE",
        "windowFilterRules": [{"field": "value", "operator": ">", "value": "5"}],
        "groupingKeyNames": ["user_id"],
        "aggregateFieldName": "value",
        "aggregatorFunctionType": "MAX",
        "limitOperatorType": ">=",
        "limit": 150,
        "windowMilliseconds": 2 * HOUR_MS,
        "frequencyMilliseconds": HOUR_MS,  # 0 < f <= w → W3 sliding
    }
)


@register(
    "rule_sliding_max",
    oracle=f"""
WITH e AS (
  SELECT user_id, value, epoch_ms(ts) AS tms
  FROM events WHERE value > 5.0
), win AS (
  SELECT e.user_id, e.value, t.ws
  FROM e, UNNEST(generate_series(
      (e.tms - {2 * HOUR_MS}) // {HOUR_MS} * {HOUR_MS} + {HOUR_MS},
      e.tms // {HOUR_MS} * {HOUR_MS},
      {HOUR_MS})) AS t(ws)
)
SELECT CAST(102 AS BIGINT) AS query_id,
       '{{user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
       ws AS window_start_ms,
       ws + {2 * HOUR_MS} AS window_end_ms,
       MAX(value) AS agg_value,
       MAX(value) >= 150.0 AS fired
FROM win
GROUP BY user_id, ws
""",
)
def rule_sliding_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_eval(
        evaluate_rule(_events(spark, sf_dir), RULE_SLIDING_MAX), round_agg=None
    )


# --- W1 per-event slide + AVG over trailing [t-w, t] (the README
# speeding query shape: AVG(speed) per carId, freq 0; README.md:71-100) ---

RULE_PER_EVENT_AVG = Rule.from_dict(
    {
        "queryId": 103,
        "queryState": "ACTIVE",
        "windowFilterRules": [
            {"field": "event_type", "operator": "=", "value": "purchase"}
        ],
        "groupingKeyNames": ["user_id"],
        "aggregateFieldName": "value",
        "aggregatorFunctionType": "AVG",
        "limitOperatorType": ">",
        "limit": 120,
        "windowMilliseconds": HOUR_MS,
        "frequencyMilliseconds": 0,  # freq 0 → W1 per-event
    }
)


@register(
    "rule_per_event_avg",
    oracle=f"""
WITH e AS (
  SELECT user_id, value, epoch_ms(ts) AS tms
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(103 AS BIGINT) AS query_id,
       '{{user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
       tms - {HOUR_MS} AS window_start_ms,
       tms AS window_end_ms,
       ROUND(AVG(value) OVER (
           PARTITION BY user_id ORDER BY tms
           RANGE BETWEEN {HOUR_MS} PRECEDING AND CURRENT ROW), 4) AS agg_value,
       AVG(value) OVER (
           PARTITION BY user_id ORDER BY tms
           RANGE BETWEEN {HOUR_MS} PRECEDING AND CURRENT ROW) > 120.0 AS fired
FROM e
""",
)
def rule_per_event_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_eval(evaluate_rule(_events(spark, sf_dir), RULE_PER_EVENT_AVG))


# --- W0 passthrough (window <= 0): per-event row, agg=0, fired=false
# (reference DynamicQueryFunction.java:93-116) ---

RULE_PASSTHROUGH = Rule.from_dict(
    {
        "queryId": 104,
        "queryState": "ACTIVE",
        "windowFilterRules": [
            {"field": "event_type", "operator": "=", "value": "error"},
            {"field": "value", "operator": ">=", "value": "100"},
        ],
        "groupingKeyNames": ["user_id"],
        "aggregateFieldName": "value",
        "aggregatorFunctionType": "MAX",
        "limitOperatorType": ">",
        "limit": 0,
        "windowMilliseconds": 0,  # w <= 0 → W0 passthrough
    }
)


@register(
    "rule_passthrough",
    oracle="""
SELECT CAST(104 AS BIGINT) AS query_id,
       '{user_id=' || CAST(user_id AS VARCHAR) || '}' AS key,
       epoch_ms(ts) AS window_start_ms,
       epoch_ms(ts) AS window_end_ms,
       0.0 AS agg_value,
       FALSE AS fired
FROM events WHERE event_type = 'error' AND value >= 100.0
""",
)
def rule_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_eval(
        evaluate_rule(_events(spark, sf_dir), RULE_PASSTHROUGH), round_agg=None
    )


# --- COUNT sentinel (A5) + tumbling, composite two-column key (P4) ---

RULE_COUNT_TUMBLING = Rule.from_dict(
    {
        "queryId": 105,
        "queryState": "ACTIVE",
        "windowFilterRules": [],
        "groupingKeyNames": ["event_type", "user_id"],
        "aggregateFieldName": "COUNT_FLINK",  # count sentinel
        "aggregatorFunctionType": "SUM",
        "limitOperatorType": ">=",
        "limit": 3,
        "windowMilliseconds": 6 * HOUR_MS,
    }
)


@register(
    "rule_count_tumbling",
    oracle=f"""
SELECT CAST(105 AS BIGINT) AS query_id,
       '{{event_type=' || event_type || ';user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
       (epoch_ms(ts) // {6 * HOUR_MS}) * {6 * HOUR_MS} AS window_start_ms,
       (epoch_ms(ts) // {6 * HOUR_MS}) * {6 * HOUR_MS} + {6 * HOUR_MS} AS window_end_ms,
       CAST(COUNT(*) AS DOUBLE) AS agg_value,
       COUNT(*) >= 3 AS fired
FROM events
GROUP BY event_type, user_id, window_start_ms
""",
)
def rule_count_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _project_eval(
        evaluate_rule(_events(spark, sf_dir), RULE_COUNT_TUMBLING), round_agg=None
    )


# --- N-rule union (evaluate_rules), alerts only (K1 main sink) ---


@register(
    "rule_union_alerts",
    oracle=f"""
WITH a AS (
  SELECT CAST(101 AS BIGINT) AS query_id,
         '{{user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
         (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS window_start_ms,
         (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} + {HOUR_MS} AS window_end_ms,
         ROUND(AVG(value), 4) AS agg_value,
         AVG(value) > 100.0 AS fired
  FROM events WHERE event_type = 'click' AND value > 10.0
  GROUP BY user_id, window_start_ms
), b AS (
  SELECT CAST(105 AS BIGINT) AS query_id,
         '{{event_type=' || event_type || ';user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
         (epoch_ms(ts) // {6 * HOUR_MS}) * {6 * HOUR_MS} AS window_start_ms,
         (epoch_ms(ts) // {6 * HOUR_MS}) * {6 * HOUR_MS} + {6 * HOUR_MS} AS window_end_ms,
         CAST(COUNT(*) AS DOUBLE) AS agg_value,
         COUNT(*) >= 3 AS fired
  FROM events
  GROUP BY event_type, user_id, window_start_ms
)
SELECT * FROM a WHERE fired
UNION ALL
SELECT * FROM b WHERE fired
""",
)
def rule_union_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = evaluate_rules(
        _events(spark, sf_dir),
        [RULE_TUMBLING_AVG, RULE_COUNT_TUMBLING],
        fired_only=True,
    )
    # Round only the AVG rule's value (101); counts are exact.
    rounded = df.withColumn(
        "agg_value",
        F.when(F.col("query_id") == 101, F.round("agg_value", 4)).otherwise(
            F.col("agg_value")
        ),
    )
    return rounded.select(
        "query_id",
        "key",
        F.unix_millis("window_start").alias("window_start_ms"),
        F.unix_millis("window_end").alias("window_end_ms"),
        "agg_value",
        "fired",
    )


# --- J1 data-driven fan-out join: ONE broadcast-join plan evaluates
# every rule's predicates (the dynamic-rules hot path; per-rule
# compiled plans above are the standing-query path) ---

FANOUT_RULES = [
    Rule.from_dict(
        {
            "queryId": 201,
            "queryState": "ACTIVE",
            "windowFilterRules": [
                {"field": "event_type", "operator": "=", "value": "click"},
                {"field": "value", "operator": ">", "value": "50"},
            ],
            "groupingKeyNames": ["user_id"],
            "aggregateFieldName": "COUNT_FLINK",
        }
    ),
    Rule.from_dict(
        {
            "queryId": 202,
            "queryState": "ACTIVE",
            "windowFilterRules": [{"field": "value", "operator": "<=", "value": "20"}],
            "groupingKeyNames": ["event_type"],
            "aggregateFieldName": "COUNT_FLINK",
        }
    ),
    Rule.from_dict(
        {
            "queryId": 203,
            "queryState": "ACTIVE",
            "windowFilterRules": [],
            "groupingKeyNames": ["event_type", "user_id"],
            "aggregateFieldName": "COUNT_FLINK",
        }
    ),
]


@register(
    "rule_fanout_match_counts",
    oracle="""
SELECT CAST(201 AS BIGINT) AS query_id,
       '{user_id=' || CAST(user_id AS VARCHAR) || '}' AS key,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE event_type = 'click' AND value > 50.0
GROUP BY key
UNION ALL
SELECT CAST(202 AS BIGINT), '{event_type=' || event_type || '}', CAST(COUNT(*) AS BIGINT)
FROM events WHERE value <= 20.0
GROUP BY event_type
UNION ALL
SELECT CAST(203 AS BIGINT),
       '{event_type=' || event_type || ';user_id=' || CAST(user_id AS VARCHAR) || '}',
       CAST(COUNT(*) AS BIGINT)
FROM events
GROUP BY event_type, user_id
""",
)
def rule_fanout_match_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.fanout import (
        fan_out,
        rules_to_df,
    )

    events = _events(spark, sf_dir)
    keyed = fan_out(events, rules_to_df(spark, FANOUT_RULES))
    return keyed.groupBy("query_id", "key").agg(F.count(F.lit(1)).alias("n"))


# --- A7 same-timestamp dedup quirk (opt-in): the reference's per-key
# state is a HashSet per millisecond, so value-equal events at the same
# timestamp collapse before aggregation (common/utils/ProcessUtils.java
# :16-25, lombok @Data equals on SHCarRide). Exercised by re-delivering
# a deterministic slice of the events table: with dedup_same_ts=True
# the duplicates count ONCE; the oracle applies SELECT DISTINCT * as
# the pre-pass. ---

RULE_SAME_TS_DEDUP = Rule.from_dict(
    {
        "queryId": 151,
        "queryState": "ACTIVE",
        "windowFilterRules": [
            {"field": "event_type", "operator": "=", "value": "click"}
        ],
        "groupingKeyNames": ["user_id"],
        "aggregateFieldName": "COUNT_FLINK",
        "aggregatorFunctionType": "SUM",
        "limitOperatorType": ">=",
        "limit": 3,
        "windowMilliseconds": 6 * HOUR_MS,
    }
)


@register(
    "rule_same_ts_dedup_quirk",
    oracle=f"""
WITH corpus AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE user_id % 7 = 0
), d AS (
  SELECT DISTINCT * FROM corpus WHERE event_type = 'click'
)
SELECT CAST(151 AS BIGINT) AS query_id,
       '{{user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
       (epoch_ms(ts) // {6 * HOUR_MS}) * {6 * HOUR_MS} AS window_start_ms,
       (epoch_ms(ts) // {6 * HOUR_MS}) * {6 * HOUR_MS} + {6 * HOUR_MS} AS window_end_ms,
       CAST(COUNT(*) AS DOUBLE) AS agg_value,
       COUNT(*) >= 3 AS fired
FROM d
GROUP BY user_id, window_start_ms
""",
)
def rule_same_ts_dedup_quirk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    corpus = e.unionByName(e.filter(F.col("user_id") % 7 == 0))
    return _project_eval(
        evaluate_rule(corpus, RULE_SAME_TS_DEDUP, dedup_same_ts=True),
        round_agg=None,
    )


# --- Pipeline CDC-enrichment flow under the oracle gate: the tumbling
# rule's evaluations arrive in three hour-bucket slices (each tumbling
# window lives wholly in one slice, so per-slice evaluation == batch
# evaluation), each slice appending as a left delta into the
# incrementally-maintained join MV against a user-tier dimension;
# after slice 1 a CDC batch re-tiers the even user_ids — retracting
# and reapplying their already-materialized MV rows. The final MV must
# equal (full evaluation) ⋈ (final dimension), which the oracle
# computes FROM SCRATCH — the incremental path earns equality with the
# recompute. Mirrors ActivePipeline.process_batch's (4b) hook +
# update_enrich_dim (streaming/pipeline.py). ---


@register(
    "cdc_enrich_pipeline_evals",
    oracle=f"""
WITH e AS (
  SELECT * FROM events WHERE event_type = 'click' AND value > 10.0
),
ev AS (
  SELECT CAST(101 AS BIGINT) AS query_id,
         '{{user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
         (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS window_start_ms,
         (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} + {HOUR_MS} AS window_end_ms,
         ROUND(AVG(value), 4) AS agg_value,
         AVG(value) > 100.0 AS fired
  FROM e
  GROUP BY user_id, window_start_ms
),
dim AS (
  SELECT '{{user_id=' || CAST(user_id AS VARCHAR) || '}}' AS key,
         CASE WHEN user_id % 2 = 0 THEN 'vip'
              WHEN user_id % 3 = 0 THEN 'gold'
              WHEN user_id % 3 = 1 THEN 'silver'
              ELSE 'bronze' END AS tier
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT ev.query_id, ev.key, ev.window_start_ms, ev.window_end_ms,
       ev.agg_value, ev.fired, dim.tier
FROM ev JOIN dim USING (key)
""",
)
def cdc_enrich_pipeline_evals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators.warehouse import (
        apply_cdc_to_join_mv,
        incremental_join_mv,
        merge_upsert_cdc,
    )

    e = _events(spark, sf_dir)
    key = F.concat(F.lit("{user_id="), F.col("user_id"), F.lit("}"))
    # ONE distinct-users pass feeds both the dim seed and the CDC
    # update batch (was: two full event scans + two distinct shuffles;
    # the seed commit materializes the cache and dim_update reuses it)
    users = e.select("user_id").distinct().persist()
    dim0 = users.select(
        key.alias("key"),
        F.when(F.col("user_id") % 3 == 0, "gold")
        .when(F.col("user_id") % 3 == 1, "silver")
        .otherwise("bronze")
        .alias("tier"),
    )
    dim_update = users.filter(F.col("user_id") % 2 == 0).select(
        key.alias("key"), F.lit("vip").alias("tier")
    )

    # ONE windowed rule evaluation feeds all three slices — the same
    # one-pass-feeds-all-batches move as the round-11 SCD2 replay
    # (33ac403). Equivalence: the rule's tumbling window is exactly
    # HOUR_MS wide, so every event of a (user, window) group shares
    # floor(ts/HOUR_MS), and filtering the EVALUATED windows by
    # (window_start_ms / HOUR_MS) % 3 partitions the output rows
    # exactly as evaluating the per-slice-filtered events did —
    # same groups, same members, per-group aggregates unchanged.
    # Lazy checkpoint: batch 0's MV-delta commit is the materializing
    # action; batches 1 and 2 filter the cached frame instead of
    # re-scanning events (was: 3 full scan+aggregate passes).
    evals_all = _project_eval(
        evaluate_rule(e, RULE_TUMBLING_AVG)
    ).localCheckpoint(eager=False)
    # pure integer arithmetic on the epoch-ms window start (an exact
    # multiple of HOUR_MS): residue s*HOUR_MS <=> floor(ts/HOUR_MS)%3==s
    def _slice(s: int):
        return F.col("window_start_ms") % (3 * HOUR_MS) == s * HOUR_MS

    work = tempfile.mkdtemp(prefix="adw-cdc-enrich-")
    try:
        base = f"{work}/jmv"
        # seed the dimension OUTSIDE the scope (it materializes the
        # users cache under AQE — the data-plane pass)
        incremental_join_mv(spark, base, ["key"], right_batch=dim0)
        # The replay loop's frames are all slices/joins of evals_all
        # and the dim: measure them (the evals count materializes the
        # lazy checkpoint batch 0 would have materialized anyway; the
        # users count is a cache hit) and make the same
        # graph-parallelism decision as the CC/kcore/SCD2 loops
        # (operators/scheduling.py) — per-batch MERGE/MV jobs on a
        # single-shuffle-partition working set skip the
        # stage-job-per-exchange AQE overhead; production-size inputs
        # keep AQE untouched.
        from activedatawarehouseprototype_spark.operators.scheduling import (
            single_partition_loop,
        )

        n_work = max(evals_all.count(), users.count())
        n_parts = max(
            1,
            min(
                spark.sparkContext.defaultParallelism,
                int(n_work) // 200_000 + 1,
            ),
        )
        with single_partition_loop(spark, n_parts):
            for s in (0, 1):
                incremental_join_mv(
                    spark, base, ["key"],
                    left_batch=evals_all.filter(_slice(s)), batch_id=s,
                )
            # mid-stream dimension CDC: even users become 'vip' — the
            # MV rows slices 0-1 already wrote retract and reapply
            dim_tbl = f"{work}/dim_table"
            dim0.write.parquet(dim_tbl)
            log = merge_upsert_cdc(spark, dim_tbl, dim_update, ["key"])
            apply_cdc_to_join_mv(
                spark, base, ["key"], log, ["key"], side="right"
            )
            mv = incremental_join_mv(
                spark, base, ["key"],
                left_batch=evals_all.filter(_slice(2)), batch_id=2,
            )
            # eager checkpoint INSIDE the scope: the result
            # materializes here (single job); the select below only
            # reads the checkpointed RDD
            out = mv.select(
                "query_id", "key", "window_start_ms", "window_end_ms",
                "agg_value", "fired", "tier",
            ).localCheckpoint()
        return out
    finally:
        users.unpersist()
        shutil.rmtree(work, ignore_errors=True)
