"""Time-series regularization: resample an irregular event stream onto
a fixed grid with forward fill (gap filling) — the standard prep step
for joining sensor/metric streams against models or each other.

Neither the reference engine (windowed threshold aggregates only) nor
Spark's built-ins (no native gap-fill) provide this; it composes from
sequence/explode + a per-bucket last + an ignore-nulls window fill,
which keeps everything in whole-stage codegen.

Scale shape: output rows per key are bounded by span/step (the grid),
never by event count; the per-bucket "last observation" collapses the
raw stream BEFORE the grid join (one window over (key, bucket), one
shuffle on key for the fill). No driver-side work at all.

Determinism: the per-bucket winner is ordered by (ts, tie_col) DESC —
two observations in the same millisecond resolve by the tie column,
so both engines pick the same row (float values are then PICKED, not
summed: bit-exact, no rounding discipline needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_ms: int = 86_400_000,
    tie_col: str | None = None,
) -> DataFrame:
    """(key, bucket_ms, value, observed): one row per ``step_ms`` grid
    cell from each key's first to last observation; ``value`` is the
    latest observation at-or-before the cell's end (forward fill),
    ``observed`` marks cells that had their own data."""
    ms = F.unix_millis(F.col(ts_col))
    ev = df.select(
        F.col(key_col),
        ms.alias("_ms"),
        F.col(value_col).alias("_v"),
        *( [F.col(tie_col).alias("_tie")] if tie_col else [] ),
    ).withColumn("bucket", F.floor(F.col("_ms") / F.lit(step_ms)))
    # the bucket's representative is the latest NON-NULL observation:
    # ordering nulls-last first means a trailing NULL reading cannot
    # mask an earlier real value (and mark the bucket unobserved)
    order = [F.col("_v").isNull().asc(), F.col("_ms").desc()] + (
        [F.col("_tie").desc()] if tie_col else []
    )
    wlast = Window.partitionBy(key_col, "bucket").orderBy(*order)
    lastb = (
        ev.withColumn("_rn", F.row_number().over(wlast))
        .filter(F.col("_rn") == 1)
        .select(key_col, "bucket", F.col("_v").alias("_obs"))
    )
    span = ev.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        key_col, F.explode(F.sequence("_b0", "_b1")).alias("bucket")
    )
    wfill = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(lastb, [key_col, "bucket"], "left")
        .select(
            key_col,
            (F.col("bucket") * step_ms).cast("bigint").alias("bucket_ms"),
            F.last("_obs", ignorenulls=True).over(wfill).alias("value"),
            F.col("_obs").isNotNull().alias("observed"),
        )
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str | list[str],
    order_col: str,
    value_col: str,
    lookback: int = 7,
    min_periods: int = 3,
    round_to: int | None = 4,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection — the active-warehouse
    alerting shape ("today's volume is 4 sigma off this key's recent
    baseline"). For each row: z = (x - mean(prev)) / stddev(prev)
    over the ``lookback`` PRECEDING rows only (the current row is
    excluded from its own baseline, so a spike cannot mask itself);
    ``anomaly`` = |z| > ``threshold``.

    NULL z when the baseline has fewer than ``min_periods`` rows or
    zero variance (a constant baseline makes sigma meaningless, and
    dividing by it would crash under ANSI). One shuffle on the key;
    the window is a bounded ROWS frame, so state per key is O(lookback)
    — at 100 TB this is the same plan with more partitions.

    Input must be unique per (key, order) — pre-aggregate to the grid
    (e.g. daily sums) first; the z ordering is then deterministic and
    a SQL twin reproduces it exactly (modulo float rounding, absorbed
    by ``round_to``)."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when(
        (n >= min_periods) & sd.isNotNull() & (sd > 0.0),
        (F.col(value_col) - mu) / sd,
    )
    if round_to is not None:
        z = F.round(z, round_to)
    return df.select(
        "*",
        z.alias("zscore"),
        (F.abs(z) > F.lit(float(threshold))).alias("anomaly"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.25,
    tie_col: str | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the smoothing
    recurrence y_0 = x_0, y_t = (1-α)·y_{t-1} + α·x_t over each key's
    (ts, tie) order. Output: one row per non-NULL input observation,
    ``(key, seq, ts_ms, value, ewma)`` where ``seq`` is the 0-based
    position in the key's fold order (the deterministic "which row is
    last" handle downstream finals/joins need when timestamps repeat).

    An EWMA is an inherently sequential per-key scan. Shape: ONE hash
    shuffle on the key (``repartition``) + a JVM-side
    ``sortWithinPartitions`` (key, ts, tie) + a single ``mapInPandas``
    scan per partition with carry-state across Arrow batches. This
    beats the obvious ``groupBy().applyInPandas`` because that path
    builds a pandas frame PER KEY (measured ~0.9 s of pure per-group
    overhead on 1 500 keys x 67 rows at sf0.1, vs an identical-shuffle
    mapInPandas); here a batch covers many keys and the sort runs in
    the JVM. A key's rows all land in one partition (hash
    partitioning), but a key CAN span consecutive Arrow batches — the
    scan seeds the continued segment with the carried accumulator
    (``ewm`` with ``adjust=False`` is memoryless, so prepending the
    carry and dropping it continues the recurrence bit-exactly).

    The fold runs as ``Series.ewm(alpha, adjust=False).mean()`` —
    vectorized C with the identical recurrence and the identical
    left-to-right order as the DuckDB twin's ``list_reduce``
    ``acc*(1-α) + α*x`` (see tests/test_timeseries_ewma.py ORACLE_SQL —
    per-key FINAL fold + count, the ``ewma_final_by_user`` corpus
    entry). pandas' one extra operation is a divide by ``(1-α)+α`` —
    exactly 1.0 for dyadic alphas, off by ≤1 ulp otherwise — absorbed
    by the final ROUND both sides apply before hashing.

    ``tie_col`` breaks same-millisecond ties deterministically (pass
    the event id; required for an engine-portable order whenever ts
    can repeat)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ewma: alpha must be in (0, 1], got {alpha}")
    import numpy as np
    import pandas

    ms = F.unix_millis(F.col(ts_col))
    src = df.select(
        F.col(key_col).alias("key"),
        ms.alias("ts_ms"),
        F.col(value_col).cast("double").alias("value"),
        *(
            # native type — a cast would turn e.g. a string event id
            # into NULL for every row, silently losing the deterministic
            # same-ts ordering the parameter exists to provide; the JVM
            # sort orders any orderable dtype as-is
            [F.col(tie_col).alias("_tie")]
            if tie_col
            else [F.lit(0).cast("bigint").alias("_tie")]
        ),
    ).filter(
        # a NULL reading would poison every later y_t of its key (NaN
        # propagates through the recurrence); a NULL timestamp has no
        # position in the fold order at all
        F.col("value").isNotNull() & F.col("ts_ms").isNotNull()
    )
    key_t = src.schema["key"].dataType.simpleString()

    _no_carry = object()  # NULL is a legitimate key, so None can't flag "no carry"

    def scan(batches):
        # per-partition sequential scan; rows arrive key-contiguous and
        # (ts, tie)-sorted. Carry = (key, accumulator, rows-so-far) of
        # the partition's last segment, continued if the next batch
        # opens with the same key. NULL keys form ONE segment (GROUP BY
        # semantics, matching the SQL twin) — pandas renders them NaN,
        # and NaN != NaN would otherwise split every null row into its
        # own segment.
        carry_key, carry_acc, carry_n = _no_carry, None, 0

        def same(a, b):
            if b is _no_carry:
                return False
            a_na, b_na = bool(pandas.isna(a)), bool(pandas.isna(b))
            return (a_na and b_na) or (not a_na and not b_na and a == b)

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = pdf["key"].to_numpy()
            x = pdf["value"].to_numpy(dtype="float64")
            y = np.empty(n, dtype="float64")
            seq = np.empty(n, dtype="int64")
            neq = keys[1:] != keys[:-1]
            both_na = pandas.isna(keys[1:]) & pandas.isna(keys[:-1])
            starts = np.flatnonzero(neq & ~both_na) + 1
            bounds = np.concatenate(([0], starts, [n]))
            for s, e in zip(bounds[:-1], bounds[1:]):
                if same(keys[s], carry_key):
                    seeded = np.empty(e - s + 1, dtype="float64")
                    seeded[0] = carry_acc
                    seeded[1:] = x[s:e]
                    y[s:e] = (
                        pandas.Series(seeded)
                        .ewm(alpha=alpha, adjust=False)
                        .mean()
                        .to_numpy()[1:]
                    )
                    seq[s:e] = np.arange(carry_n, carry_n + (e - s))
                else:
                    y[s:e] = (
                        pandas.Series(x[s:e])
                        .ewm(alpha=alpha, adjust=False)
                        .mean()
                        .to_numpy()
                    )
                    seq[s:e] = np.arange(e - s)
                carry_key, carry_acc, carry_n = keys[e - 1], y[e - 1], int(seq[e - 1]) + 1
            out = pdf[["key", "ts_ms", "value"]].copy()
            out.insert(1, "seq", seq)
            out["ewma"] = y
            yield out

    return (
        src.repartition("key")
        .sortWithinPartitions("key", "ts_ms", "_tie")
        .mapInPandas(
            scan,
            f"key {key_t}, seq bigint, ts_ms bigint, value double, ewma double",
        )
    )


def cusum(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    target,
    slack=0,
    tie_col: str | None = None,
) -> DataFrame:
    """Per-key two-sided CUSUM change-point statistic (Page 1954):

        S+_t = max(0, S+_{t-1} + (x_t - target - slack))
        S-_t = max(0, S-_{t-1} + (target - slack - x_t))

    — the standard sequential detector for small persistent mean
    shifts that a per-point z-score misses (complements rolling_zscore
    for spikes and drift.psi_kl_drift for distribution-level shift).

    Plan shape: the reset recurrence is computed WITHOUT any
    sequential UDF via the cumsum identity

        S_t = C_t - min(0, min_{j<=t} C_j),   C_t = cumsum(d_t)

    (truncation at zero == subtracting the running minimum of the
    un-truncated walk) — two running window aggregates over ONE
    (key)-shuffle, all in whole-stage codegen. Output: one row per
    non-NULL observation, ``(key, seq, ts_ms, value, s_pos, s_neg)``.

    Numeric contract: the arithmetic is exactly the input's type —
    feed integer-quantized units (e.g. cents) with integer
    target/slack and every statistic is EXACT (engine-portable with
    no float discipline at all); feed doubles and you accept last-ulp
    summation variation like any running float sum.

    ``tie_col`` breaks same-timestamp ties (pass the event id) —
    required for a deterministic fold order whenever ts can repeat.
    NULL values/timestamps are excluded (a NULL observation has no
    position in the walk).
    """
    ms = F.unix_millis(F.col(ts_col))
    order = [F.col("ts_ms")] + ([F.col("_tie")] if tie_col else [])
    src = df.select(
        F.col(key_col).alias("key"),
        ms.alias("ts_ms"),
        F.col(value_col).alias("value"),
        *([F.col(tie_col).alias("_tie")] if tie_col else []),
    ).filter(F.col("value").isNotNull() & F.col("ts_ms").isNotNull())
    w = (
        Window.partitionBy("key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d_pos = F.col("value") - F.lit(target) - F.lit(slack)
    d_neg = F.lit(target) - F.lit(slack) - F.col("value")
    zero = F.lit(0)
    out = (
        src.withColumn("_c_pos", F.sum(d_pos).over(w))
        .withColumn("_c_neg", F.sum(d_neg).over(w))
        .withColumn("_m_pos", F.min("_c_pos").over(w))
        .withColumn("_m_neg", F.min("_c_neg").over(w))
        .select(
            "key",
            (F.row_number().over(Window.partitionBy("key").orderBy(*order)) - 1)
            .cast("bigint")
            .alias("seq"),
            "ts_ms",
            "value",
            (F.col("_c_pos") - F.least(F.col("_m_pos"), zero)).alias("s_pos"),
            (F.col("_c_neg") - F.least(F.col("_m_neg"), zero)).alias("s_neg"),
        )
    )
    return out


def lag_features(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    lags: "tuple[int, ...]" = (1, 2),
    trail: int = 3,
    tie_col: str | None = None,
) -> DataFrame:
    """Per-key ML feature extraction over an event stream: lagged
    values, the first difference, and trailing-window min/max — the
    standard tabular-model prep (one row per observation, ready to
    join onto a label table).

    Feature set (names fixed so downstream schemas are stable):
    ``lag_<k>`` for each k in ``lags``; ``delta_1`` = value − previous
    value (0 for a key's first row — the window_order_price_delta
    convention: COALESCE, not NULL, keeps the column engine-portable
    and model-ingestible); ``rmin_<trail>`` / ``rmax_<trail>`` over the
    trailing ``trail`` rows INCLUDING the current one.

    Everything is picked or per-row subtracted — no order-dependent
    sums anywhere, so outputs are bit-exact across engines with no
    rounding discipline. One window shuffle on the key; every frame is
    ROWS-bounded (streaming evaluation, no buffering beyond ``trail``).

    NULL values/timestamps are excluded up front: a NULL has no
    position in the lag order, and excluding it here beats poisoning
    ``delta_1`` of the next row. ``tie_col`` (the event id) makes
    same-timestamp order deterministic.
    """
    if trail < 1:
        raise ValueError(f"lag_features: trail must be >= 1, got {trail}")
    if not lags or any(k < 1 for k in lags):
        raise ValueError(f"lag_features: lags must be positive, got {lags}")
    ms = F.unix_millis(F.col(ts_col))
    src = df.select(
        F.col(key_col).alias("key"),
        ms.alias("ts_ms"),
        F.col(value_col).alias("value"),
        *([F.col(tie_col).alias("tie")] if tie_col else []),
    ).filter(F.col("value").isNotNull() & F.col("ts_ms").isNotNull())
    order = [F.col("ts_ms")] + ([F.col("tie")] if tie_col else [])
    w = Window.partitionBy("key").orderBy(*order)
    wt = w.rowsBetween(-(trail - 1), 0)
    feats = [
        F.lag("value", k).over(w).alias(f"lag_{k}") for k in sorted(lags)
    ]
    return src.select(
        "key",
        "ts_ms",
        *(["tie"] if tie_col else []),
        "value",
        *feats,
        (F.col("value") - F.coalesce(F.lag("value", 1).over(w), F.col("value")))
        .alias("delta_1"),
        F.min("value").over(wt).alias(f"rmin_{trail}"),
        F.max("value").over(wt).alias(f"rmax_{trail}"),
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tie_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for every ordered pair of consecutive states within a
    key, (src, dst, n, p) where p = n / Σn over the same src — the
    clickstream path-analysis primitive ("what do users do AFTER an
    error?") and the input to next-event prediction baselines.

    Determinism: sequence order is (ts, tie) — same-timestamp events
    resolve by the tie column, so both engines walk the identical
    sequence. p is one exact-integer IEEE division (deterministic,
    no rounding discipline needed).

    Scale shape: ONE shuffle on key (the lead window), then one
    aggregate on (src, dst) whose cardinality is |states|² — tiny
    regardless of corpus size. The final per-src total is a second
    window over the already-|states|²-sized frame (free).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    steps = (
        df.select(
            F.col(state_col).alias("src"),
            F.lead(state_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_src = Window.partitionBy("src")
    return steps.withColumn(
        "p",
        F.col("n").cast("double") / F.sum("n").over(per_src).cast("double"),
    )
