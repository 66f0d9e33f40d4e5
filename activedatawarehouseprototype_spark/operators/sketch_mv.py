"""Mergeable HLL sketch materialized view: distinct-count rollups over
ARBITRARY time ranges that never rescan the raw events.

The warehouse pattern (Apache DataSketches, public; exposed by Spark
3.5+ as ``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``):

- **Build**: one pass over events aggregates a per-(bucket, groups)
  HLL sketch (a few KB each) into a parquet MV partitioned by
  ``bucket`` — at 100 TB the MV is MB-scale regardless of key
  cardinality, because sketch size is O(2^lgk), not O(distinct).
- **Query**: "distinct users for any [start, end) x group slice" =
  partition-pruned scan of the touched buckets + ``hll_union_agg`` +
  estimate. Cost is O(#buckets in range), never O(events).
- **Append**: sketch the new batch and register-wise-union into the
  affected buckets only (dynamic partition overwrite). HLL registers
  are MAXes, so re-merging a replayed batch is a VALUE no-op —
  replay-idempotent by construction, no marker protocol needed (the
  idempotence test pins this).

Union exactness: union(sketch(A), sketch(B)) == sketch(A ∪ B) exactly
(register-wise max is associative/commutative/idempotent), so range
queries answered from per-bucket sketches equal the one-shot sketch of
the whole range — the merge-algebra test pins estimate equality.

Estimates are approximate (±~1.6% at lgk=12); the accuracy test gates
them against exact COUNT(DISTINCT), and the corpus entries
(``hll_mv_daily_distinct``, ``hll_set_algebra_event_types``) are
oracle-backed via exact-twin columns plus in-bound booleans the DuckDB
twin pins to TRUE — sketch BINARIES are engine-specific, the exactness
contract around them is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LGK = 12


def _bucketed(events: DataFrame, key_col: str, bucket_ms: int,
              group_cols: tuple, ts_col: str) -> DataFrame:
    if bucket_ms <= 0:
        raise ValueError(f"bucket_ms must be positive, got {bucket_ms}")
    b = (
        F.floor(F.unix_millis(F.col(ts_col)) / F.lit(int(bucket_ms)))
        * int(bucket_ms)
    ).cast("bigint")
    return events.filter(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        b.alias("bucket"), *group_cols, F.col(key_col).cast("string").alias("_k")
    )


def hll_mv_build(
    events: DataFrame,
    path: str,
    key_col: str,
    bucket_ms: int = 86_400_000,
    group_cols: tuple = (),
    ts_col: str = "ts",
    lgk: int = DEFAULT_LGK,
) -> None:
    """One-pass build: (bucket, *group_cols, sketch BINARY, n_rows)
    partitioned by ``bucket``. ``n_rows`` (raw event count) rides along
    so ops dashboards get both gauges from one MV."""
    src = _bucketed(events, key_col, bucket_ms, group_cols, ts_col)
    (
        src.groupBy("bucket", *group_cols)
        .agg(
            F.hll_sketch_agg("_k", F.lit(int(lgk))).alias("sketch"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def hll_mv_append(
    spark: SparkSession,
    path: str,
    events: DataFrame,
    key_col: str,
    bucket_ms: int = 86_400_000,
    group_cols: tuple = (),
    ts_col: str = "ts",
    lgk: int = DEFAULT_LGK,
    batch_id: int | None = None,
) -> None:
    """Merge a new batch into the MV touching ONLY its buckets:
    sketch the batch, read the matching existing bucket partitions
    (partition filter — the untouched history is never listed), union
    register-wise, and dynamically overwrite those partitions.

    Exactly-once: pass a MONOTONE ``batch_id`` (the warehouse-MV
    contract, cf. incremental_join_mv) — replays at-or-below the
    recorded watermark are skipped entirely. Even without a batch_id
    the ``distinct_estimate`` is replay-safe (HLL registers are maxes,
    re-merging the same sketch is a value no-op); only the ``n_rows``
    gauge needs the marker, because sums double-count. On a crash
    between the partition write and the marker write, one replay
    re-merges: estimates stay exact, ``n_rows`` over-counts that one
    batch — the documented at-least-once residue of the
    meta-after-data ordering (data loss would be worse the other way
    round)."""
    import json as _json
    import os as _os

    meta_p = _os.path.join(path, "_hll_mv_meta.json")
    if batch_id is not None and _os.path.exists(meta_p):
        with open(meta_p) as f:
            if int(batch_id) <= int(_json.load(f).get("watermark", -(2**62))):
                return
    src = _bucketed(events, key_col, bucket_ms, group_cols, ts_col)
    delta = src.groupBy("bucket", *group_cols).agg(
        F.hll_sketch_agg("_k", F.lit(int(lgk))).alias("sketch"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    buckets = [r["bucket"] for r in delta.select("bucket").distinct().collect()]
    if not buckets:
        return
    gc = list(group_cols)
    existing = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .select("bucket", *gc, "sketch", "n_rows")
    )
    # allowDifferentLgConfigK: an old MV built at another lgk still
    # merges (result downgrades to the smaller k, documented behavior)
    merged = (
        existing.unionByName(delta)
        .groupBy("bucket", *gc)
        .agg(
            F.hll_union_agg("sketch", F.lit(True)).alias("sketch"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
    )
    sql_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", sql_before)
    if batch_id is not None:
        # tmp + os.replace: a crash mid-write must never leave truncated
        # JSON (which would fail every later json.load until manually
        # removed) — same atomic pattern as ActivePipeline._persist_watermarks
        tmp = meta_p + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"watermark": int(batch_id)}, f)
        _os.replace(tmp, meta_p)


def hll_mv_distinct(
    spark: SparkSession,
    path: str,
    start_ms: int | None = None,
    end_ms: int | None = None,
    group_cols: tuple = (),
) -> DataFrame:
    """Distinct-key estimate for [start_ms, end_ms) per ``group_cols``
    slice (pass ``()`` for a single total row): partition-pruned bucket
    scan → ``hll_union_agg`` → estimate. Output: (*group_cols,
    distinct_estimate BIGINT, n_rows BIGINT)."""
    mv = spark.read.parquet(path)
    if start_ms is not None:
        mv = mv.filter(F.col("bucket") >= int(start_ms))
    if end_ms is not None:
        mv = mv.filter(F.col("bucket") < int(end_ms))
    gc = list(group_cols)
    # coalesce: a range touching zero buckets is "0 distinct", not NULL
    # (the grouped form simply returns no rows, which is already right)
    return mv.groupBy(*gc).agg(
        F.coalesce(
            F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(True))),
            F.lit(0),
        ).cast("bigint").alias("distinct_estimate"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("n_rows"),
    )


def hll_mv_set_estimates(
    spark: SparkSession,
    path: str,
    group_col: str,
    a,
    b,
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> DataFrame:
    """Distinct-set ALGEBRA from the sketch MV, never rescanning raw
    events: for two slices ``a`` and ``b`` of ``group_col`` over an
    optional bucket range, estimate |A|, |B|, |A ∪ B| (register-wise
    union of the persisted sketches — exact sketch algebra), and
    |A ∩ B| by inclusion-exclusion (|A| + |B| − |A ∪ B|).

    Output: one row (est_a, est_b, est_union, est_intersection), all
    BIGINT except the intersection (DOUBLE — inclusion-exclusion can
    land slightly negative when the true intersection is ~0; clamping
    would hide that the estimate is an estimate).

    Error contract: union inherits the plain HLL bound
    (±~1.6% at lgk=12); the intersection's ABSOLUTE error is bounded
    by the union terms' errors, so it is small relative to |A ∪ B|,
    NOT relative to |A ∩ B| — a tiny intersection of two huge sets is
    where inclusion-exclusion is honest but noisy (the corpus entry
    pins |err| <= 5% of the exact union). Cost: one partition-pruned
    scan of O(buckets) sketch rows."""
    mv = spark.read.parquet(path)
    if start_ms is not None:
        mv = mv.filter(F.col("bucket") >= int(start_ms))
    if end_ms is not None:
        mv = mv.filter(F.col("bucket") < int(end_ms))
    sel = mv.filter(F.col(group_col).isin([a, b]))
    est = lambda c: F.hll_sketch_estimate(F.hll_union_agg(c, F.lit(True)))  # noqa: E731
    row = sel.agg(
        est(F.when(F.col(group_col) == a, F.col("sketch"))).alias("est_a"),
        est(F.when(F.col(group_col) == b, F.col("sketch"))).alias("est_b"),
        est(F.col("sketch")).alias("est_union"),
    )
    return row.select(
        F.coalesce("est_a", F.lit(0)).cast("bigint").alias("est_a"),
        F.coalesce("est_b", F.lit(0)).cast("bigint").alias("est_b"),
        F.coalesce("est_union", F.lit(0)).cast("bigint").alias("est_union"),
        (
            F.coalesce("est_a", F.lit(0)).cast("double")
            + F.coalesce("est_b", F.lit(0))
            - F.coalesce("est_union", F.lit(0))
        ).alias("est_intersection"),
    )
