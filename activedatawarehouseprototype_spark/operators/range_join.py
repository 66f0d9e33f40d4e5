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

from pyspark.sql import DataFrame
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
