"""Approximate streaming-friendly sketches beyond Spark's built-ins
(HLL ``approx_count_distinct``, ``percentile_approx``): distributed
Misra-Gries heavy hitters.

Finding the items with frequency > n/k exactly needs a full
groupBy-count shuffle of EVERY distinct item — at 100 TB of tokens
that is the shuffle that hurts. Misra-Gries keeps only k counters per
partition (mapInPandas, one pass, no shuffle of the raw items), and
partition summaries merge by summation: the merged count of item x
under-estimates its true frequency by at most n/(k+1) per partition
summary it was evicted from — the classic bound, so any item with true
frequency > n_partitions * n_per_partition/(k+1) is guaranteed present.
The final merge shuffles only ~k rows per partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_partials(col_values: pd.Series, k: int) -> dict[str, int]:
    """One pass of the k-counter Misra-Gries summary over a series."""
    counters: dict[str, int] = {}
    for v in col_values:
        # pd.isna catches pd.NA/NaN from astype('string'), which a
        # bare `is None` does not — a null-heavy column would otherwise
        # burn one of the k counters on <NA> and evict a real item
        if v is None or pd.isna(v):
            continue
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            # decrement-all; drop zeros (the eviction step)
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def approx_heavy_hitters(
    df: DataFrame, col: str, k: int = 64, top: int = 10
) -> DataFrame:
    """(item, approx_count) for the ~top heavy hitters of ``col``.

    Plan: mapInPandas computes one k-counter summary per Arrow batch
    (no shuffle of the raw column), the summaries groupBy-sum (shuffle
    is O(k x partitions) rows), and the top rows come back via
    TakeOrderedAndProject. Counts are under-estimates with the
    Misra-Gries bound; exact counts for the surfaced items can be
    re-computed with one semi-join scan if needed.
    """

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            counters = misra_gries_partials(pdf[col].astype("string"), k)
            if counters:
                yield pd.DataFrame(
                    {"item": list(counters), "c": list(counters.values())}
                )

    partials = df.select(col).mapInPandas(summarize, "item string, c long")
    merged = partials.groupBy("item").agg(F.sum("c").alias("approx_count"))
    return merged.orderBy(
        F.col("approx_count").desc(), F.col("item").asc()
    ).limit(top)
