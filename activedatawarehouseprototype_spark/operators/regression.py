"""Grouped closed-form OLS: per-group linear trend without MLlib.

A per-key trend (is this user's engagement rising? is this sensor
drifting?) is a one-pass aggregation, not an iterative fit: slope and
intercept of y = a + b*x have the closed form

    b = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
    a = (Sy - b*Sx) / n

so ONE groupBy computing the five sums (n, Sx, Sy, Sxy, Sxx) — all
map-side partially aggregated, one shuffle on the group key — yields
every group's fit. That shape survives any scale: no per-group
iteration, no collect, no UDF.

Cross-engine exactness: with integer-quantized x and y (the round-8
"integer units" rule), the five sums are exact BIGINTs at any
summation order, and the numerator/denominator of the slope are exact
integer expressions — so the operator exposes them (``slope_num``,
``slope_den``) alongside the float ``slope`` (a quotient, NEVER
parity-safe to round — derivable from the exact pair). Overflow
bound: |num| <= n * max|x| * n * max|y|; rescale x (e.g. epoch-days
since the group's min, not epoch-seconds) to stay under 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    rebase_x: bool = True,
) -> DataFrame:
    """Per group: n, the exact sum terms, exact slope numerator /
    denominator, and the float slope/intercept. Rows with a NULL x or
    y are excluded.

    ``rebase_x=True`` (default) replaces x with ``x - min(x)`` within
    each group first — a pure shift that leaves the slope identical
    (OLS is translation-invariant in x) while shrinking every
    x-moment by orders of magnitude, which is what keeps Sxx and the
    slope denominator inside BIGINT for epoch-scaled inputs. The
    min(x) pass rides the SAME group-key shuffle as a window min —
    no extra shuffle. Groups with a single point or zero x-variance
    get NULL slope (den = 0)."""
    src = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *group_cols,
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    if rebase_x:
        w = Window.partitionBy(*group_cols)
        src = src.withColumn("_x", F.col("_x") - F.min("_x").over(w))
    agg = src.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_x").cast("bigint").alias("sx"),
        F.sum("_y").cast("bigint").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("bigint").alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        den != 0, num.cast("double") / den.cast("double")
    )
    return agg.select(
        *group_cols,
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        slope.alias("slope"),
        F.when(
            den != 0,
            (F.col("sy") - slope * F.col("sx")) / F.col("n"),
        ).alias("intercept"),
    )
