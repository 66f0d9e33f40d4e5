"""Blocked fuzzy matching: edit-distance joins without the cross
product.

A levenshtein join is quadratic by nature; the 100 TB formulation is
BLOCKING — pairs are only generated inside a block key (brand,
zipcode, LSH bucket, ...), so the join is an ordinary equi-join on the
block whose per-block expansion is C(|block|, 2), and the distance
predicate runs JVM-side (``F.levenshtein`` is a codegen expression,
no Python in the hot path). Skewed blocks are bounded explicitly with
``max_block_rows`` — a declared semantic, like
``basket.frequent_pairs``'s cap, so an exact SQL twin can apply the
same rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join_blocked(
    df: DataFrame,
    block_col: str,
    id_col: str,
    text_col: str,
    max_dist: int = 4,
    max_block_rows: int | None = None,
) -> DataFrame:
    """Self-match rows within a block: returns one row per unordered
    pair (``a_<id> < b_<id>``) whose texts are within ``max_dist``
    edits, columns ``<block_col>, a_<id>, b_<id>, dist``.

    ``max_block_rows``: if set, blocks with more rows are EXCLUDED
    (mega-blocks are catalog noise, and one 100k-row block alone would
    emit 5e9 candidate pairs)."""
    sel = df.select(block_col, id_col, text_col)
    if max_block_rows is not None:
        counts = sel.groupBy(block_col).agg(
            F.count(F.lit(1)).alias("_bn")
        )
        sel = (
            sel.join(F.broadcast(counts), block_col)
            .filter(F.col("_bn") <= max_block_rows)
            .drop("_bn")
        )
    a = sel.select(
        F.col(block_col),
        F.col(id_col).alias(f"a_{id_col}"),
        F.col(text_col).alias("_a_txt"),
    )
    b = sel.select(
        F.col(block_col),
        F.col(id_col).alias(f"b_{id_col}"),
        F.col(text_col).alias("_b_txt"),
    )
    return (
        a.join(b, block_col)
        .filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
        .withColumn("dist", F.levenshtein("_a_txt", "_b_txt"))
        .filter(F.col("dist") <= max_dist)
        .select(block_col, f"a_{id_col}", f"b_{id_col}", "dist")
    )


def fuzzy_dedup_keeper(
    pairs: DataFrame, df: DataFrame, id_col: str
) -> DataFrame:
    """Keep one row per fuzzy-match group: every row named on the
    ``b_`` side of any pair is dropped, lowest id in each group
    survives (the greedy keeper rule — exact for transitively-closed
    blocks, conservative otherwise)."""
    dropped = pairs.select(
        F.col(f"b_{id_col}").alias(id_col)
    ).distinct()
    return df.join(dropped, id_col, "left_anti")
