"""Robust statistics for training-data quality gates: MAD outlier
flags and winsorized aggregates.

Mean/stddev gates are themselves corrupted by the outliers they hunt;
the robust pair (median, MAD) and percentile clipping (winsorizing)
are the standard data-cleaning alternatives. Both are one or two
exact-percentile aggregations — no UDF, no collect.

Cross-engine float discipline (the round-8 "integer units" rule
extended to PERCENTILES): interpolated percentiles of arbitrary
doubles are NOT parity-safe (``a + (b - a) * frac`` hits rounding),
but over INTEGER-VALUED doubles with frac 0.5/0.05/0.95 the
subexpressions stay exact well below 2^52, so the result is bit-exact
on any IEEE engine. Callers who need exact replay quantize values to
an integer lattice (e.g. cents) first; these operators take the
already-quantized column and never divide by the scale.

Scale shape: ``F.percentile`` is an exact sort-based aggregate — one
shuffle per groupBy, map-side partial collection. The deviations pass
re-joins the bounded per-group medians via broadcast, so the wide
fact table shuffles only on the group key (twice total: once per
percentile pass — the unavoidable cost of an exact two-pass MAD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outlier_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Per group: n, median, MAD (median absolute deviation), and how
    many rows sit more than ``z * MAD`` from the median. NULL values
    are excluded. ``value_col`` should be integer-valued (quantized)
    for cross-engine exactness; any numeric works for local use."""
    src = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col).cast("double").alias("_v")
    )
    med = src.groupBy(*group_cols).agg(
        F.percentile("_v", F.lit(0.5)).alias("_med")
    )
    dev = src.join(F.broadcast(med), group_cols).withColumn(
        "_ad", F.abs(F.col("_v") - F.col("_med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.percentile("_ad", F.lit(0.5)).alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("_med").alias("median_value"),
            F.max("_mad").alias("mad_value"),
            F.sum(
                (F.col("_ad") > F.lit(float(z)) * F.col("_mad")).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def winsorized_sum(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
    floor_bounds: bool = False,
) -> DataFrame:
    """Per group: sum of values CLIPPED to the group's [lo_p, hi_p]
    exact percentiles, plus how many rows were clipped at each end.
    NULL values are excluded. Same quantize-first contract as
    ``mad_outlier_stats`` for cross-engine exactness.

    ``floor_bounds=True`` clips at ``floor(percentile)`` instead of
    the interpolated percentile: non-.5 interpolation fractions
    produce non-lattice doubles, and a SUM over those is float-
    summation-order dependent; flooring keeps every clipped value on
    the integer lattice, so the sum is exact and order-independent
    (the cross-engine replay mode — a declared semantic, like
    ``fuzzy_join_blocked``'s block cap)."""
    src = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col).cast("double").alias("_v")
    )
    lo = F.percentile("_v", F.lit(float(lo_p)))
    hi = F.percentile("_v", F.lit(float(hi_p)))
    if floor_bounds:
        lo, hi = F.floor(lo).cast("double"), F.floor(hi).cast("double")
    bounds = src.groupBy(*group_cols).agg(
        lo.alias("_lo"), hi.alias("_hi")
    )
    return (
        src.join(F.broadcast(bounds), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("_lo").alias("lo_bound"),
            F.max("_hi").alias("hi_bound"),
            F.sum(
                F.least(F.greatest(F.col("_v"), F.col("_lo")), F.col("_hi"))
            ).alias("winsorized_sum"),
            F.sum((F.col("_v") < F.col("_lo")).cast("bigint"))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum((F.col("_v") > F.col("_hi")).cast("bigint"))
            .cast("bigint")
            .alias("n_clipped_high"),
        )
    )
