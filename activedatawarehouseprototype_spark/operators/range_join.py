"""Band range join: pairs with |left.value - right.value| <= delta
without a quadratic cross-join (SURVEY §2.5 lists range joins among the
families absent from both the reference and Spark's equi-join planner —
a naive inequality join falls back to BroadcastNestedLoopJoin).

Plan: quantize values into delta-wide buckets; each LEFT row is
exploded to its bucket and both neighbors, the join is a plain hash
equi-join on the bucket, and the exact band predicate filters the
survivors. Cost: 3x left explosion + one shuffle — linear in matches,
never |L| x |R|. The same shape handles temporal bands (ts within d)
and is the standard interval-join realization on hash engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def band_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    delta: float,
    extra_key: str | None = None,
) -> DataFrame:
    """Inner join on |left_val - right_val| <= delta (and optional
    equi-key). Caller projects/filters afterwards; columns keep their
    original names (disambiguate before the call if they collide)."""
    if delta <= 0:
        raise ValueError(
            f"band_range_join: delta must be positive, got {delta} "
            f"(the bucket quantization divides by it; for exact value "
            f"equality use a plain equi-join)"
        )
    bucket_l = F.floor(F.col(left_val) / F.lit(delta))
    bucket_r = F.floor(F.col(right_val) / F.lit(delta))
    l = left.withColumn(
        "_bucket", F.explode(F.array(bucket_l - 1, bucket_l, bucket_l + 1))
    )
    r = right.withColumn("_bucket", bucket_r)
    on = [l["_bucket"] == r["_bucket"]]
    if extra_key is not None:
        on.append(l[extra_key] == r[extra_key])
    joined = l.join(r, on[0] if len(on) == 1 else (on[0] & on[1]), "inner")
    return joined.filter(
        F.abs(l[left_val] - r[right_val]) <= F.lit(delta)
    ).drop("_bucket")


def interval_overlap_pair_counts(
    df: DataFrame,
    block_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """(block, n_pairs): how many unordered interval pairs within each
    block overlap (``a.lo <= b.hi AND b.lo <= a.hi``) — WITHOUT
    enumerating pairs. The naive blocked self-join is Θ(Σ block²)
    candidates (26.7M at sf0.1 already; quadratic blow-up at scale);
    when only the COUNT is needed, the endpoint-sweep identity does it
    in one window pass:

        overlapping(block) = C(n, 2) − #{ordered (a, b): a.hi < b.lo}

    (each non-overlapping unordered pair is counted exactly once on
    the right — whichever interval ends first is `a`). The strict-<
    count is a classic merged-endpoint rank: sort each block's lo- and
    hi-endpoints together by (value, type) with lo before hi on ties
    (so a.hi == b.lo — an overlap under <= — is NOT counted), then for
    every lo-endpoint the number of PRECEDING hi-endpoints is exactly
    #{hi < lo}. One shuffle on the block, one ordered window, O(n log n)
    per block, O(1) state per row — this survives the 100× scale-up
    the pair join cannot.

    Blocks with zero overlapping pairs are omitted (matching what a
    pair-enumerating GROUP BY would produce). Intervals must satisfy
    lo <= hi."""
    pts = df.select(
        F.col(block_col).alias("_blk"),
        F.col(lo_col).alias("_val"),
        F.lit(0).alias("_type"),
    ).unionByName(
        df.select(
            F.col(block_col).alias("_blk"),
            F.col(hi_col).alias("_val"),
            F.lit(1).alias("_type"),
        )
    )
    w = (
        Window.partitionBy("_blk")
        .orderBy("_val", "_type")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = pts.withColumn(
        "_hi_before", F.coalesce(F.sum("_type").over(w), F.lit(0))
    )
    per_block = (
        swept.groupBy("_blk")
        .agg(
            # n intervals = half the endpoints; non-overlap = Σ over
            # lo-endpoints of preceding-hi counts
            (F.count(F.lit(1)) / 2).cast("bigint").alias("_n"),
            F.sum(
                F.when(F.col("_type") == 0, F.col("_hi_before")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("_nonov"),
        )
        .select(
            F.col("_blk").alias(block_col),
            (
                (F.col("_n") * (F.col("_n") - 1) / 2).cast("bigint")
                - F.col("_nonov")
            ).alias("n_pairs"),
        )
    )
    return per_block.filter(F.col("n_pairs") > 0)
