"""Alert burst suppression (cooldown): collapse each burst of
repeated firings per key into ONE emitted alert.

The reference's ECA loop throttles SPAWNS (C7) but re-emits an alert
every time a rule re-fires; real alerting needs storm control. Burst
semantics (gaps-and-islands): consecutive firings closer than
``cooldown_ms`` chain into one burst, and the burst emits its FIRST
alert plus suppression stats. A continuous alert storm therefore
produces exactly one notification until it quiets down for a full
cooldown — the well-defined, single-pass variant of cooldown
(the greedy "re-emit every cooldown_ms during a storm" variant is
inherently sequential per key; if that shape is needed, feed bursts
longer than one cooldown through a second pass).

Plan: one hash shuffle on the key, one sort per key (lag + running
sum + final group-by all ride the same window distribution) — the
same cost class as sessionization, linear in alerts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def suppress_alert_bursts(
    alerts: DataFrame,
    key_cols: list[str],
    ts_col: str,
    cooldown_ms: int,
    tie_col: str | None = None,
) -> DataFrame:
    """(keys..., alert_ts_ms, n_suppressed, burst_span_ms): one row
    per burst — its first firing's epoch-ms timestamp, how many
    subsequent firings it swallowed, and the burst's duration."""
    order = [F.col("_ms").asc()] + (
        [F.col(tie_col).asc()] if tie_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    ms = F.unix_millis(F.col(ts_col))
    marked = (
        alerts.withColumn("_ms", ms)
        .withColumn("_prev", F.lag("_ms").over(w))
        .withColumn(
            "_new_burst",
            (F.col("_prev").isNull())
            | (F.col("_ms") - F.col("_prev") >= cooldown_ms),
        )
        .withColumn(
            "_burst",
            F.sum(F.col("_new_burst").cast("bigint")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        marked.groupBy(*key_cols, "_burst")
        .agg(
            F.min("_ms").alias("alert_ts_ms"),
            (F.count(F.lit(1)) - 1).alias("n_suppressed"),
            (F.max("_ms") - F.min("_ms")).alias("burst_span_ms"),
        )
        .drop("_burst")
    )
