"""A/B experiment readout: two-proportion z-test per metric group.

A warehouse serving product experiments answers "did arm B convert
better than arm A, and is the difference noise?" — the readout is a
closed-form aggregate, so at 100 TB it is ONE partial-aggregated
shuffle down to |groups| rows and a handful of scalar expressions;
no sampling, no iteration, no driver-side math beyond the plan.

The z statistic uses the standard pooled-proportion form
(z = (p̂_a − p̂_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)), public
statistics): every input is an exact integer count, and the formula
is written as the identical IEEE expression tree in the SQL twin, so
the double result is bit-reproducible across engines; we additionally
ROUND to 6 decimals (registry float discipline) so the driver hash
can never hinge on a last-ulp future-engine difference.

Degenerate groups (pooled p̂ of 0 or 1, or an empty arm — zero
variance) yield NULL z rather than ±inf: "no evidence", not
"infinitely significant".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# |z| at two-sided α=0.05 (public normal quantile, frozen as part of
# the operator contract with the SQL twin).
Z_CRIT_95 = 1.959964


def two_proportion_ztest(
    units: DataFrame,
    group_cols: list[str],
    arm_col: str = "arm",
    converted_col: str = "converted",
    z_decimals: int = 6,
) -> DataFrame:
    """Per ``group_cols``: arm sizes, conversions, rates, and the
    pooled two-proportion z statistic.

    ``units`` holds ONE row per experimental unit (deduplicate users
    upstream — unit-of-analysis errors, counting events instead of
    users, are the classic way to fake significance), with
    ``arm_col`` ∈ {'A','B'} and ``converted_col`` ∈ {0,1}.
    """
    a = F.col(arm_col)
    c = F.col(converted_col).cast("bigint")
    agg = units.groupBy(*group_cols).agg(
        F.sum(F.when(a == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(a == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(a == "A", c).otherwise(0)).alias("conv_a"),
        F.sum(F.when(a == "B", c).otherwise(0)).alias("conv_b"),
    )
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    p_a = F.col("conv_a").cast("double") / n_a
    p_b = F.col("conv_b").cast("double") / n_b
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    var = pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
    z = F.round((p_a - p_b) / F.sqrt(var), z_decimals)
    return agg.select(
        *group_cols,
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0), z)
        .otherwise(F.lit(None).cast("double"))
        .alias("z"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0),
            F.abs(z) > Z_CRIT_95,
        )
        .otherwise(F.lit(None).cast("boolean"))
        .alias("significant"),
    )


def cuped_components(
    units: DataFrame,
    arm_col: str = "arm",
    x_col: str = "x_pre",
    y_col: str = "y",
) -> DataFrame:
    """CUPED variance reduction for experiment readouts (Deng et al.
    2013, "Improving the Sensitivity of Online Controlled Experiments
    by Utilizing Pre-Experiment Data" — public method): the adjusted
    metric y' = y − θ(x − x̄) with θ = cov(x, y)/var(x) estimated on
    the POOLED population removes the pre-period component of the
    variance, shrinking confidence intervals without biasing the
    lift (x is pre-assignment, so E[x|arm] is equal across arms).

    Cross-engine discipline (the grouped-OLS convention,
    ``regression.py``): with integer-valued x and y every moment sum
    is an exact BIGINT, and θ's numerator/denominator

        theta_num = n·Σxy − Σx·Σy        theta_den = n·Σx² − (Σx)²

    are exact integers too — so the operator ships EXACT per-arm sums
    (n, Σx, Σy) alongside the pooled theta_num/theta_den, and leaves
    the float division θ and the adjusted means to the consumer
    (a rounded quotient is never parity-safe; the exact components
    always are). One row per arm; theta_* repeated on each row.

    Scale: one partial-aggregated shuffle down to |arms| rows plus a
    2-row cross-arm total — the readout over any corpus is a handful
    of counters. Keep x, y in integer units (counts, cents).
    """
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    per_arm = units.groupBy(arm_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sum_x"),
        F.sum(y).alias("sum_y"),
        F.sum(x * y).alias("sum_xy"),
        F.sum(x * x).alias("sum_xx"),
    )
    pooled = per_arm.agg(
        F.sum("n").alias("n_"),
        F.sum("sum_x").alias("sx_"),
        F.sum("sum_y").alias("sy_"),
        F.sum("sum_xy").alias("sxy_"),
        F.sum("sum_xx").alias("sxx_"),
    )
    return per_arm.crossJoin(F.broadcast(pooled)).select(
        arm_col,
        "n",
        "sum_x",
        "sum_y",
        (F.col("n_") * F.col("sxy_") - F.col("sx_") * F.col("sy_"))
        .cast("bigint")
        .alias("theta_num"),
        (F.col("n_") * F.col("sxx_") - F.col("sx_") * F.col("sx_"))
        .cast("bigint")
        .alias("theta_den"),
    )
