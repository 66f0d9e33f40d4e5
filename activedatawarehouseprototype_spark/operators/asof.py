"""As-of (temporal) join — an operator family Spark lacks natively
(SURVEY §2.5 flags range/as-of joins as absent from both the reference
and Spark's built-ins).

``asof_join`` matches each left row to the LATEST right row with
``right.ts <= left.ts`` on the same key (backward as-of). Implemented
as a union + ordered-window carry-forward, NOT a range cross-join:

    union(left, right) → window partitionBy(key) orderBy(ts, right-first)
    → last(right_value, ignoreNulls) over unbounded-preceding frame
    → keep left rows

Cost: one shuffle on the key + an in-partition sort — the same
complexity as a sort-merge join, with no pair explosion regardless of
how many right rows precede each left row. This is the standard
scalable as-of plan (the merge_asof shape) and it degrades gracefully
under skew because AQE splits oversized key partitions.

Ties (right.ts == left.ts) match (<= semantics), like DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts`` which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join. ``value_cols`` are carried from the
    latest right row at-or-before each left row's ``ts`` (null when no
    right row precedes). Right side should be unique per (key, ts)."""
    lcols = left.columns
    tagged_left = left.withColumn("_is_right", F.lit(0))
    for c in value_cols:
        tagged_left = tagged_left.withColumn(f"_r_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]
        ))
    tagged_right = right.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in (key, ts):
            tagged_right = tagged_right.withColumn(c, F.lit(None).cast(
                dict(left.dtypes)[c]
            ))
    unioned = tagged_left.select(
        *lcols, "_is_right", *[f"_r_{c}" for c in value_cols]
    ).unionByName(
        tagged_right.select(*lcols, "_is_right", *[f"_r_{c}" for c in value_cols])
    )
    # right rows sort BEFORE left rows at equal ts → <= (at-or-before)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE struct carries all value columns of the matched right row
    # together: carrying columns independently with last(ignorenulls)
    # would (a) skip a right row whose value is genuinely NULL and
    # carry a STALE older value — DuckDB ASOF JOIN (the oracle) matches
    # the latest row and returns its NULL — and (b) mix columns from
    # different right rows. The struct is non-null exactly on right
    # rows, so ignorenulls selects whole rows, never values.
    row_struct = F.when(
        F.col("_is_right") == 1,
        F.struct(*[F.col(f"_r_{c}").alias(c) for c in value_cols]),
    )
    carried = unioned.select(
        *lcols,
        "_is_right",
        F.last(row_struct, ignorenulls=True).over(w).alias("_match"),
    )
    return (
        carried.filter(F.col("_is_right") == 0)
        .select(
            *lcols,
            *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
    )
