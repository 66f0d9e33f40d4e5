"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions via ``mapInPandas``.

The container has no image/audio codecs, so ``decode_image`` is a
clearly-marked stub (NotImplementedError) — but everything Spark-side
is real and tested: the schema contract, the mapInPandas batch shape,
and ``byte_stats`` (a genuine per-blob computation: length, mean byte,
Shannon entropy over the byte histogram).

At 100 TB: blobs ride in parquet binary columns; mapInPandas streams
Arrow batches so peak memory is one batch per core, not one file;
feature extraction parallelizes per partition with zero driver
involvement. Size ``spark.sql.files.maxPartitionBytes`` to a few
hundred blobs per task.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_METADATA = StructType(
    [
        StructField("mime", StringType()),
        StructField("source_id", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("blob_len", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy", DoubleType()),
    ]
)


def attach_blobs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary column (md5 digest bytes of
    the text) plus typed metadata — stands in for real image/audio
    payloads so the downstream plumbing is exercised for real."""
    content = F.unhex(F.md5(F.col(text_col).cast("binary")))
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col(id_col).cast("long").alias("source_id"),
            F.octet_length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _entropy(b: bytes) -> float:
    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def byte_stats(df: DataFrame) -> DataFrame:
    """Per-blob features via Arrow-batched mapInPandas (the real
    multimodal hot path shape: binary in, fixed-width features out)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "blob_len": blobs.map(len).astype("int64"),
                    "byte_mean": blobs.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "byte_entropy": blobs.map(_entropy),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """STUB: image decode requires codecs not present in this
    container. The signature and schema are the contract; swap the
    body for PIL/libvips in a real deployment."""
    raise NotImplementedError(
        "image decode needs an image codec library (e.g. PIL); "
        "not available in this environment — byte_stats() demonstrates "
        "the identical mapInPandas plumbing on raw bytes"
    )
