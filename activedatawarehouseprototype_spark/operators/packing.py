"""Sequence packing: assign documents to fixed-capacity context-window
bins — the step between a curated corpus and a token-efficient training
run (unpacked short documents waste padding; packing recovers it).

True first-fit/best-fit bin packing is a sequential recurrence, which
is exactly what a 1000-executor cluster cannot run. This implements the
distributed discipline production packers use:

1. SHARD by a hash of the document id (md5-derived, engine-portable):
   shards pack independently — embarrassingly parallel, one window
   cumsum per shard, no global sort.
2. Within a shard, documents take a deterministic order (by id) and a
   running token total; a document's bin is the capacity chunk its
   START falls in (``floor(tokens_before / capacity)``).

This "start-bin" rule is one window function (distributed, spillable)
instead of a driver loop. The trade: a document straddling a chunk
boundary overflows its bin by at most one document's tokens — bounded,
and negligible when capacity >> max document length (the usual regime:
multi-k-token contexts vs. capped documents). The SQL twin repeats the
rule verbatim, so the assignment is oracle-checkable byte for byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_of(id_col: str, n_shards: int = 16, salt: str = "pack") -> Column:
    """Deterministic shard in [0, n_shards): md5-derived, so any engine
    reproduces the sharding. n_shards should be >= cluster parallelism
    at scale; 16 here keeps the oracle's window count readable."""
    hex2 = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")).cast("binary")),
        1,
        2,
    )
    return F.pmod(F.conv(hex2, 16, 10).cast("int"), F.lit(n_shards))


def pack_sequences(
    df: DataFrame,
    capacity: int,
    token_col: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Add (shard, bin) to each document: shard-parallel start-bin
    packing at the given token capacity. Deterministic, one shuffle
    (the shard/order window), no driver involvement."""
    out = df.withColumn("shard", shard_of(id_col, n_shards, salt))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    before = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return out.withColumn("bin", F.floor(before / F.lit(capacity)).cast("bigint"))
