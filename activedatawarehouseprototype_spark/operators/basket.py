"""Market-basket co-occurrence: frequent item PAIRS by support.

The canonical 100 TB formulation matters more than the algebra: a
naive self-join of (basket, item) on basket shuffles the item table
twice and materializes B^2 rows per basket in the join. Instead we
aggregate each basket to a sorted distinct-item array (ONE shuffle,
map-side partial collect_set) and expand the C(B,2) pairs MAP-SIDE
with array `transform`/`slice` inside whole-stage codegen — no second
shuffle before the final (a, b) support count, which touches only
pair rows, not raw items.

Skew is structural here: one pathological basket with 100k items
would alone emit 5e9 pairs. ``max_basket_items`` bounds that —
baskets larger than the cap are EXCLUDED (the A-priori convention:
mega-baskets are catalogs/bots, not signal), and the exclusion is part
of the operator's declared semantics so an exact SQL twin can apply
the same rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Support counts for unordered item pairs co-occurring in a
    basket: columns ``item_a < item_b`` (the canonical orientation),
    ``support``. Duplicate (basket, item) rows count once; NULL items
    and NULL baskets are excluded.

    Returns pairs with ``support >= min_support``.
    """
    baskets = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .groupBy(basket_col)
        .agg(F.sort_array(F.collect_set(item_col)).alias("items"))
    )
    if max_basket_items is not None:
        baskets = baskets.filter(F.size("items") <= max_basket_items)
    # C(B,2) pairs map-side: for items[i], pair with items[i+1:]
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS item_a, y AS item_b)))"
                )
            )
        ).alias("p")
    )
    return (
        pairs.select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= F.lit(min_support))
    )
