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
    strategy: str = "copartition",
) -> DataFrame:
    """Self-match rows within a block: returns one row per unordered
    pair (``a_<id> < b_<id>``) whose texts are within ``max_dist``
    edits, columns ``<block_col>, a_<id>, b_<id>, dist``.

    ``max_block_rows``: if set, blocks with more rows are EXCLUDED
    (mega-blocks are catalog noise, and one 100k-row block alone would
    emit 5e9 candidate pairs).

    ``strategy`` picks the join layout (both measured on the sf0.1
    part self-match, 8M candidate pairs):

    - ``"copartition"`` (default, the 100 TB plan): both sides hash
      to the block key; per-block pair generation + DP run where the
      block lives, nothing is broadcast — a self-match's right side
      is the whole corpus, never broadcastable. Parallelism =
      min(cores, #blocks) (2.2 s on the fixture's degenerate
      25-block corpus; real blocking keys — zipcode, LSH bucket —
      give orders of magnitude more blocks than cores).
    - ``"broadcast"`` (the reference-list fast path): round-robin the
      probe side to full parallelism and broadcast the other — right
      when matching against a SMALL canonical list (1.2 s on the
      fixture), wrong when both sides scale."""
    if strategy not in ("copartition", "broadcast"):
        raise ValueError(f"unknown strategy {strategy!r}")
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
    # The join EXPANDS rows ~|block|-fold and each output row pays an
    # O(len^2) edit-distance DP — a compute-amplifying stage, so the
    # pair generation must be repartitioned EXPLICITLY (the
    # bigram_pairs lesson: byte-based partitioning sizes a
    # single-small-file input at ONE task and serializes all the DP
    # work — measured 9.3 s for the 8M-pair fixture match before
    # either layout below).
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if strategy == "copartition":
        sel = sel.repartition(n_parts, block_col)
    left = sel.repartition(n_parts) if strategy == "broadcast" else sel
    a = left.select(
        F.col(block_col),
        F.col(id_col).alias(f"a_{id_col}"),
        F.col(text_col).alias("_a_txt"),
    )
    b = sel.select(
        F.col(block_col),
        F.col(id_col).alias(f"b_{id_col}"),
        F.col(text_col).alias("_b_txt"),
    )
    right = F.broadcast(b) if strategy == "broadcast" else b
    return (
        a.join(right, block_col)
        .filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
        # levenshtein >= |len(a) - len(b)|: the cheap length test runs
        # first so the DP only prices length-compatible pairs (a no-op
        # on same-length corpora, a big cut on mixed ones)
        .filter(
            F.abs(F.length("_a_txt") - F.length("_b_txt")) <= max_dist
        )
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
