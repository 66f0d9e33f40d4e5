"""Targeted deletion (purge_keys): exact ANSI semantics, file-level
targeting with and without the skipping index, hard-link reuse,
fail-closed staleness, crash recovery via the shared swap protocol."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.skipping import (
    build_skipping_index,
    update_skipping_index,
)
from activedatawarehouseprototype_spark.operators.warehouse import (
    purge_keys,
)


@pytest.fixture()
def table(spark, tmp_path):
    """8 files, keys 0..799 range-clustered so most files can't hold
    the purged keys."""
    path = str(tmp_path / "t")
    (
        spark.range(800)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("v"),
        )
        .withColumn("bucket", (F.col("k") / 100).cast("int"))
        .repartitionByRange(8, "k")
        .drop("bucket")
        .write.parquet(path)
    )
    return path


def _inode_map(path):
    return {
        n: os.stat(os.path.join(path, n)).st_ino
        for n in os.listdir(path)
        if n.endswith(".parquet")
    }


def test_purge_without_index_scan_targeting(spark, table):
    before = spark.read.parquet(table)
    assert before.count() == 800
    res = purge_keys(spark, table, "k", [5, 6, 700])
    assert res["deleted"] == 3
    after = spark.read.parquet(table)
    assert after.count() == 797
    assert after.filter(F.col("k").isin([5, 6, 700])).count() == 0
    # range-clustered: only the files holding 5/6 and 700 rewrote
    assert res["rewritten_files"] <= 2
    assert res["linked_files"] >= 6


def test_purge_with_index_links_untouched_inodes(spark, table):
    build_skipping_index(spark, table, ["k"])
    inodes_before = _inode_map(table)
    res = purge_keys(spark, table, "k", [42])
    assert res["deleted"] == 1
    assert res["rewritten_files"] == 1
    inodes_after = _inode_map(table)
    # every linked file kept its inode: zero bytes moved
    shared = set(inodes_before.values()) & set(inodes_after.values())
    assert len(shared) == res["linked_files"]
    assert spark.read.parquet(table).count() == 799
    # manifest is stale now and the read side fails closed
    with pytest.raises(RuntimeError, match="stale"):
        purge_keys(spark, table, "k", [43])
    update_skipping_index(spark, table)
    assert purge_keys(spark, table, "k", [43])["deleted"] == 1


def test_null_keys_retained_and_null_target_rejected(spark, tmp_path):
    path = str(tmp_path / "n")
    spark.createDataFrame(
        [(1, "a"), (None, "b"), (2, "c")], "k bigint, v string"
    ).write.parquet(path)
    with pytest.raises(ValueError, match="NULL"):
        purge_keys(spark, path, "k", [1, None])
    res = purge_keys(spark, path, "k", [1])
    assert res["deleted"] == 1
    left = spark.read.parquet(path)
    assert left.count() == 2
    assert left.filter(F.col("k").isNull()).count() == 1  # ANSI retain


def test_absent_keys_touch_nothing(spark, table):
    inodes_before = _inode_map(table)
    res = purge_keys(spark, table, "k", [10_000, 10_001])
    assert res == {
        "deleted": 0,
        "rewritten_files": 0,
        "linked_files": len(inodes_before),
    }
    assert _inode_map(table) == inodes_before  # not even a swap


def test_empty_key_list_and_partitioned_layout_raise(spark, tmp_path):
    path = str(tmp_path / "p")
    spark.range(10).withColumn("part", F.col("id") % 2).write.partitionBy(
        "part"
    ).parquet(path)
    with pytest.raises(ValueError, match="empty key list"):
        purge_keys(spark, path, "id", [])
    with pytest.raises(ValueError, match="partitioned"):
        purge_keys(spark, path, "id", [1])
