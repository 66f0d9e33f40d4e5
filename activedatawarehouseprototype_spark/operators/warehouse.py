"""Warehouse table maintenance: partitioned writes, MERGE-style
upsert, and small-file compaction over parquet directories.

This is the storage half of the "active data warehouse": the rules
table, alert history and event archive all live as partitioned
columnar tables. With Delta/Iceberg available these map to MERGE INTO
/ OPTIMIZE with ACID guarantees; this parquet implementation keeps the
exact same call shape (documented swap point) and uses
staging-dir + atomic rename for crash consistency on one node.

Scale notes:
- ``write_partitioned`` partitions by the query-pruning columns
  (e.g. event date) so scans prune directories, and AQE-coalesced
  writes avoid the many-small-files problem.
- ``merge_upsert`` is one broadcast-or-shuffle anti-join + union —
  the standard CDC upsert plan; cost is a scan of target + updates.
- ``compact`` rewrites to ~target file counts via repartition.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def _atomic_swap(spark: SparkSession, new_df: DataFrame, target_path: str) -> None:
    staging = target_path + ".staging"
    new_df.write.mode("overwrite").parquet(staging)
    old = target_path + ".old"
    if os.path.exists(target_path):
        os.replace(target_path, old)
    os.replace(staging, target_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """MERGE semantics: rows in ``updates`` replace target rows with the
    same key; new keys are inserted. (Delta: MERGE INTO ... WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT.)"""
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        kept = target.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    _atomic_swap(spark, merged, target_path)


def delete_where(spark: SparkSession, target_path: str, condition: str) -> int:
    """DELETE FROM target WHERE condition; returns rows deleted."""
    if not os.path.exists(target_path):
        return 0
    target = spark.read.parquet(target_path)
    keep = target.filter(f"NOT ({condition})")
    deleted = target.count() - keep.count()
    if deleted:
        _atomic_swap(spark, keep, target_path)
    return deleted


def compact(spark: SparkSession, path: str, target_files: int = 1) -> None:
    """Rewrite a table directory into ``target_files`` files (OPTIMIZE
    analogue for the many-small-files problem of streaming appends)."""
    df = spark.read.parquet(path)
    _atomic_swap(spark, df.repartition(target_files), path)


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    agg_col: str,
    salt_buckets: int = 16,
):
    """Two-phase salted aggregation for skewed keys: phase 1 aggregates
    (key, salt) partials, phase 2 merges partials per key — the hot key's
    work spreads over ``salt_buckets`` tasks. Returns (sum, count) per
    key; AVG = sum/count at the caller. AQE's skew handling covers joins;
    this covers the groupBy side for power-law keys."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(agg_col).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("n_rows")
    )
