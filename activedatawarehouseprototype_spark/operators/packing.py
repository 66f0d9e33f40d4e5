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
    at scale. Eight hex chars (2^32 values) back the modulus — two
    chars would silently leave every shard past 255 permanently empty
    on a wide cluster."""
    hex8 = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")).cast("binary")),
        1,
        8,
    )
    return F.pmod(F.conv(hex8, 16, 10).cast("bigint"), F.lit(n_shards)).cast("int")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window shaping step of a training/RAG pipeline (long docs
    become stride-overlapped chunks so no span is lost at a boundary).

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk may be short; a
    document that fits in one window yields exactly one chunk. All
    integer arithmetic + one explode — no UDFs, no shuffle (chunking
    is embarrassingly parallel per document), so it runs scan-local at
    any scale. Output: (id, chunk_idx, chunk_text, n_tokens).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} / {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    # ceil((L - chunk) / stride) + 1 in pure integer math
    n_chunks = F.when(n_tok <= chunk_tokens, F.lit(1)).otherwise(
        F.floor(
            (n_tok - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)
        ).cast("bigint")
        + F.lit(1)
    )
    start = F.col("chunk_idx") * stride  # 0-based token offset
    return (
        df.filter(n_tok > 0)
        .select(
            F.col(id_col),
            toks.alias("_toks"),
            n_tok.alias("_n_tok"),
            n_chunks.alias("_n_chunks"),
        )
        .select(
            id_col,
            "_toks",
            "_n_tok",
            F.explode(F.sequence(F.lit(0), F.col("_n_chunks") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("_toks"), start + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.col("_n_tok") - start)
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


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
