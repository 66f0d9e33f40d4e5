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


# --- Count-Min Sketch ------------------------------------------------------
#
# The complement of Misra-Gries above: MG under-estimates and keeps k
# counters; CMS OVER-estimates (never under) and supports point queries
# for ANY key after the fact, plus lossless merging of independently
# built sketches (cell-wise sum) — the property that matters for
# incremental/streaming maintenance at scale: each micro-batch or
# partition builds its own depth x width counter grid, and grids add.
#
# Build is pure DataFrame algebra — no UDF: every row explodes into
# `depth` (row, col) cells via seeded xxhash64, and ONE partial-agg
# shuffle of at most depth*width cells sums them. Estimate(key) =
# min over rows of cell[r][h_r(key)], the classic CMS point query:
# est >= true always; est <= true + eps*N with prob 1-delta for
# width = ceil(e/eps), depth = ceil(ln 1/delta).


def cms_build(
    df: DataFrame, col: str, width: int = 2048, depth: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of ``col`` as a cell table ``(r, c, cnt)``
    (zero cells absent). Mergeable: union two sketch tables and
    groupBy(r, c).sum(cnt). NULL keys are excluded (they match no
    point query)."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    cells = df.filter(F.col(col).isNotNull()).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(F.xxhash64(F.col(col), F.lit(r)), F.lit(width)).alias("c"),
                )
                for r in range(depth)
            ])
        ).alias("cell"),
        w.alias("w"),
    )
    return (
        cells.select("cell.r", "cell.c", "w")
        .groupBy("r", "c")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str,
    width: int = 2048, depth: int = 5,
) -> DataFrame:
    """Point-query every row of ``keys``: adds an ``est`` column =
    min over sketch rows of the key's cell. The sketch side is tiny
    (<= depth*width cells) and broadcasts; absent cells count 0.
    Row multiplicity is preserved — duplicate key rows each get their
    own output row (a hidden per-row id keys the final regroup).

    width/depth MUST match the build call — they define the hash
    layout. est is a deterministic function of (data, width, depth)."""
    keyed = keys.withColumn("_cms_row", F.monotonically_increasing_id())
    probes = keyed.select(
        "*",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(
                        F.xxhash64(F.col(key_col), F.lit(r)), F.lit(width)
                    ).alias("c"),
                )
                for r in range(depth)
            ])
        ).alias("probe"),
    )
    joined = probes.join(
        F.broadcast(sketch),
        (F.col("probe.r") == sketch["r"]) & (F.col("probe.c") == sketch["c"]),
        "left",
    ).select(
        "_cms_row",
        *keys.columns,
        F.coalesce(sketch["cnt"], F.lit(0)).alias("cell_cnt"),
    )
    return (
        joined.groupBy("_cms_row", *keys.columns)
        .agg(F.min("cell_cnt").alias("est"))
        .drop("_cms_row")
    )
