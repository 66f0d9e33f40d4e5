"""One-pass column profiling: the data-quality report card.

Before any 100 TB corpus is trusted, someone asks the same five
questions of every column — how many rows, how many NULLs, how many
distinct values, what are the extremes. Answering them per-column
with ad-hoc queries rescans the table once per question; this
operator answers all of them in a constant number of passes and
returns a tidy (column, metric) table ready for diffing across
snapshots (pairs with ``warehouse.snapshot_diff``).

Shape: ONE aggregate computes n / n_null / min / max for every column
simultaneously (a single scan, map-side combined). Exact distinct
counts need a shuffle per column by nature; they run as one
grouped-by-column aggregate over an unpivoted (column, value) stream
— one scan + one shuffle keyed by (column, value) partials, NOT one
job per column. Output is one row per column, every value rendered
as a string (a profile is a report, not an operand — and strings keep
the row shape uniform across column types).

String rendering is CAST-based: exact for strings/integers/dates,
engine-formatted for floats — the cross-engine corpus entry profiles
only exactly-rendering columns (the float discipline's string
corollary)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column stats: (col, n, n_null, n_distinct, min_str,
    max_str). ``n`` counts all rows; ``n_distinct`` excludes NULLs
    (SQL COUNT(DISTINCT) semantics) and is counted over the STRING
    rendering (identical to the native count wherever the cast is
    injective — strings, integers, dates; document any profiled float
    column accordingly); min/max are NULL-skipping and rendered as
    strings."""
    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if not cols or missing:
        raise ValueError(
            f"profile_table: empty or unknown columns {missing or cols}"
        )
    basic = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        *[
            F.sum(F.col(c).isNull().cast("bigint"))
            .cast("bigint")
            .alias(f"_null_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.min(F.col(c)).cast("string").alias(f"_min_{i}")
            for i, c in enumerate(cols)
        ],
        *[
            F.max(F.col(c)).cast("string").alias(f"_max_{i}")
            for i, c in enumerate(cols)
        ],
    )
    # exact distincts: unpivot to a skinny (col, value) stream, one
    # shuffle keyed by column with per-column distinct aggregation
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.col", "s.v")
    distincts = stacked.filter(F.col("v").isNotNull()).groupBy("col").agg(
        F.count_distinct("v").cast("bigint").alias("n_distinct")
    )
    wide = basic.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col("_n").alias("n"),
                        F.col(f"_null_{i}").alias("n_null"),
                        F.col(f"_min_{i}").alias("min_str"),
                        F.col(f"_max_{i}").alias("max_str"),
                    )
                    for i, c in enumerate(cols)
                ]
            )
        ).alias("s")
    ).select("s.col", "s.n", "s.n_null", "s.min_str", "s.max_str")
    return (
        wide.join(F.broadcast(distincts), "col", "left")
        .select(
            "col",
            "n",
            "n_null",
            F.coalesce("n_distinct", F.lit(0)).cast("bigint").alias(
                "n_distinct"
            ),
            "min_str",
            "max_str",
        )
    )
