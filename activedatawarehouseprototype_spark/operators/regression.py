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


# --- Exact closed-form ridge training (the classifier TRAINER) ------------
#
# Round 9 shipped the hash-trick linear classifier gate (INFERENCE,
# ``text.hashed_linear_score``); this is the matching TRAINER for the
# low-dimensional probe case: a ridge-regularized least-squares fit of
# a +/-1 label on two integer features plus an intercept,
#
#     w = (X'X + lam*I)^-1 X'y,
#
# solved EXACTLY. The distributed part is one aggregation computing
# the nine moment sums (n, Sx1, Sx2, Sx1x1, Sx1x2, Sx2x2, Sy, Sx1y,
# Sx2y) — integer inputs make every sum an exact BIGINT at any
# summation order (the grouped_ols discipline). The 3x3 solve is
# control-plane arithmetic on those nine scalars: Cramer's rule in
# arbitrary-precision Python ints, weights emitted as exact
# floor(1000 * det_i / det) milli-units. X'X + lam*I is positive
# definite for lam >= 1, so det > 0 always — the solve cannot divide
# by zero and floor-division sign rules never see a negative divisor.
#
# Why this shape: a linear probe on cheap features is the standard
# bootstrap for quality/language gates (train on a labeled slice,
# deploy as a pure-projection scorer over 100 TB); the exact integer
# algebra is what lets an independent SQL engine replay training
# bit-for-bit (the DuckDB corpus oracle computes the same nine sums
# and the same Cramer expansion in HUGEINT). Higher-dimensional /
# hashed-feature training is MLlib territory; this operator is the
# exact-oracle seam, and its weights drop straight into
# ``ridge_probe_score`` (same milli-unit convention as
# ``hashed_linear_score``).
#
# Overflow: Python ints never overflow; the ORACLE's HUGEINT (int128)
# bounds the corpus entry — det <= 6 * max(A_ij)^3 and A_ij <= n *
# max(x)^2, so n=1e6 docs with x <= 1e3 gives det ~ 6e36 < 1.7e38.
# Rescale features (cap / bucket) before training anything hotter.


def ridge_probe_sums(
    df: DataFrame, x1_col: str, x2_col: str, y_col: str
) -> DataFrame:
    """ONE distributed aggregation: the nine exact BIGINT moment sums
    of (1, x1, x2) against y. Rows with any NULL are excluded (both
    engines must agree on the training set). Inputs follow the
    integer-units rule (grouped_ols): non-integer values are TRUNCATED
    by the long cast — quantize fractional features (milli-units)
    before training, or the exactness guarantee quietly becomes
    exactness of the truncated problem."""
    src = df.filter(
        F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
        & F.col(y_col).isNotNull()
    ).select(
        F.col(x1_col).cast("long").alias("_x1"),
        F.col(x2_col).cast("long").alias("_x2"),
        F.col(y_col).cast("long").alias("_y"),
    )
    return src.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_x1").cast("bigint").alias("s1"),
        F.sum("_x2").cast("bigint").alias("s2"),
        F.sum(F.col("_x1") * F.col("_x1")).cast("bigint").alias("s11"),
        F.sum(F.col("_x1") * F.col("_x2")).cast("bigint").alias("s12"),
        F.sum(F.col("_x2") * F.col("_x2")).cast("bigint").alias("s22"),
        F.sum("_y").cast("bigint").alias("sy"),
        F.sum(F.col("_x1") * F.col("_y")).cast("bigint").alias("s1y"),
        F.sum(F.col("_x2") * F.col("_y")).cast("bigint").alias("s2y"),
    )


def ridge_probe_solve(
    sums: dict, lam: int = 1000
) -> tuple[int, int, int]:
    """Exact Cramer solve of (X'X + lam*I) w = X'y from the nine
    moment sums; returns (w0, w1, w2) in milli-units,
    floor(1000 * det_i / det), as plain Python ints. Pure control
    plane — no Spark, unit-testable against numpy."""
    if lam < 1:
        raise ValueError("lam must be >= 1 (keeps X'X + lam*I positive definite)")
    n, s1, s2 = int(sums["n"]), int(sums["s1"]), int(sums["s2"])
    s11, s12, s22 = int(sums["s11"]), int(sums["s12"]), int(sums["s22"])
    sy, s1y, s2y = int(sums["sy"]), int(sums["s1y"]), int(sums["s2y"])
    a11, a12, a13 = n + lam, s1, s2
    a22, a23, a33 = s11 + lam, s12, s22 + lam
    b1, b2, b3 = sy, s1y, s2y
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    assert det > 0, "X'X + lam*I is positive definite; det must be > 0"
    det0 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    )
    det1 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    )
    det2 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    )
    return (det0 * 1000 // det, det1 * 1000 // det, det2 * 1000 // det)


def ridge_probe_train(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    y_col: str,
    lam: int = 1000,
) -> tuple[int, int, int]:
    """Train: one distributed moment aggregation + the exact 3x3
    control-plane solve. Returns (w0, w1, w2) milli-unit weights."""
    row = ridge_probe_sums(df, x1_col, x2_col, y_col).head()
    if row is None or row["n"] == 0:
        raise ValueError("ridge_probe_train: empty training set")
    return ridge_probe_solve(row.asDict(), lam=lam)


def ridge_probe_score(w_milli, x1_col: str, x2_col: str):
    """Milli-unit score column w0 + w1*x1 + w2*x2 for trained
    milli-weights — exact BIGINT per row (the deployment half: a pure
    whole-stage-codegen projection, no shuffle, no UDF; `score >= 0`
    is the keep margin, same convention as ``hashed_linear_score``)."""
    w0, w1, w2 = (int(w) for w in w_milli)
    return (
        F.lit(w0)
        + F.lit(w1) * F.col(x1_col).cast("long")
        + F.lit(w2) * F.col(x2_col).cast("long")
    ).cast("bigint")
