"""Mergeable quantile-ladder materialized view: percentile rollups
over arbitrary time ranges that never rescan the raw events.

The sketch-MV family's missing member (CMS = counts, HLL = distincts,
Misra-Gries = top-k; this = quantiles): per time bucket the MV stores
the EXACT quantile ladder — the value at every rank i·(n-1)/bins,
i = 0..bins — plus the exact row count. A range query merges the
touched buckets' ladders into a combined CDF and inverts it.

Why a ladder and not a KLL/t-digest: the ladder is DETERMINISTIC (no
sketch randomness), one ``F.percentile`` aggregate builds it (exact,
sort-based, one shuffle), and its error contract is provable and
testable without probability: within a bucket the true CDF at any
value is pinned between the surrounding knots, i.e. known to within
n_b/bins ranks, so a merged estimate's rank error is at most
Σ n_b/bins = N/bins — the query returns that bound alongside the
value. bins=64 → ~1.5% worst-case rank error, 65 doubles + a count
per bucket (KB-scale MV for a 100 TB history).

Scale shape: build is one groupBy(bucket) with an array-of-fractions
exact percentile (map-side partial sort, one shuffle); query reads
ONLY the touched bucket partitions (PartitionFilters) and collects
buckets·(bins+1) doubles — control plane. Append covers NEW buckets
exactly (the time-ordered streaming case) and REFUSES overlapping
buckets: exact ladders are not losslessly mergeable, and silently
degrading exactness is worse than asking the caller to rebuild the
affected bucket from raw data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BINS = 64


def _ladder_rows(
    events: DataFrame,
    value_col: str,
    bucket_ms: int,
    ts_col: str,
    bins: int,
) -> DataFrame:
    if bucket_ms <= 0 or bins < 2:
        raise ValueError("bucket_ms must be positive and bins >= 2")
    b = (
        F.floor(F.unix_millis(F.col(ts_col)) / F.lit(int(bucket_ms)))
        * int(bucket_ms)
    ).cast("bigint")
    fracs = F.array(*[F.lit(i / bins) for i in range(bins + 1)])
    return (
        events.filter(
            F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .select(b.alias("bucket"), F.col(value_col).cast("double").alias("_v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.percentile("_v", fracs).alias("ladder"),
        )
    )


def quantile_mv_build(
    events: DataFrame,
    path: str,
    value_col: str,
    bucket_ms: int = 86_400_000,
    ts_col: str = "ts",
    bins: int = DEFAULT_BINS,
) -> None:
    """One-pass build: (bucket, n, ladder array<double>[bins+1])
    partitioned by ``bucket``."""
    (
        _ladder_rows(events, value_col, bucket_ms, ts_col, bins)
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def quantile_mv_append(
    events: DataFrame,
    path: str,
    value_col: str,
    bucket_ms: int = 86_400_000,
    ts_col: str = "ts",
    bins: int = DEFAULT_BINS,
) -> int:
    """Append NEW buckets' ladders; raises if the batch touches a
    bucket the MV already holds (exact ladders cannot merge
    losslessly — rebuild that bucket from raw data instead). Returns
    the number of buckets appended."""
    spark = events.sparkSession
    new_rows = _ladder_rows(events, value_col, bucket_ms, ts_col, bins)
    existing = {
        r["bucket"] for r in spark.read.parquet(path).select("bucket").distinct().collect()
    }  # bounded: one row per bucket (control plane)
    batch_buckets = {
        r["bucket"] for r in new_rows.select("bucket").distinct().collect()
    }
    overlap = sorted(existing & batch_buckets)
    if overlap:
        raise ValueError(
            f"quantile_mv_append: bucket(s) {overlap[:3]} already in the "
            "MV — exact ladders don't merge losslessly; rebuild those "
            "buckets from raw data"
        )
    if not batch_buckets:
        return 0
    new_rows.repartition("bucket").write.mode("append").partitionBy(
        "bucket"
    ).parquet(path)
    return len(batch_buckets)


def quantile_mv_query(
    spark: SparkSession,
    path: str,
    q: float,
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> dict:
    """Quantile ``q`` over every bucket in [start_ms, end_ms): merge
    the touched ladders into a weighted CDF and invert it. Returns
    ``{"value", "n", "rank_error_bound"}`` — the estimate's rank is
    within ``rank_error_bound`` (= N/bins) of ``q * N``, a
    deterministic worst case, not a probabilistic one."""
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be in [0, 1], got {q}")
    mv = spark.read.parquet(path)
    if start_ms is not None:
        mv = mv.filter(F.col("bucket") >= start_ms)
    if end_ms is not None:
        mv = mv.filter(F.col("bucket") < end_ms)
    rows = mv.select("n", "ladder").collect()  # bounded: buckets rows
    if not rows:
        return {"value": None, "n": 0, "rank_error_bound": 0.0}
    import numpy as np

    total = sum(int(r["n"]) for r in rows)
    bins = len(rows[0]["ladder"]) - 1
    knots = np.unique(
        np.concatenate([np.asarray(r["ladder"], dtype=float) for r in rows])
    )
    # merged CDF at each knot: each bucket's CDF is the piecewise-
    # linear interpolation of its ladder (exact at the knots, within
    # 1/bins of truth between them), weighted by bucket mass
    cdf = np.zeros(len(knots))
    for r in rows:
        lad = np.asarray(r["ladder"], dtype=float)
        frac = np.interp(
            knots, lad, np.linspace(0.0, 1.0, len(lad)),
            left=0.0, right=1.0,
        )
        cdf += frac * (int(r["n"]) / total)
    value = float(np.interp(q, cdf, knots))
    return {
        "value": value,
        "n": total,
        "rank_error_bound": total / bins,
    }
