"""Bucketed (co-located) joins: pre-bucketing fact tables on the join
key removes the per-query shuffle entirely — THE join strategy for
repeated large fact-fact joins at 100 TB (SURVEY §4.2 scale notes).

The test writes orders and lineitem bucketed by the join key into the
session warehouse, joins them, and asserts the physical plan contains
NO shuffle exchange on either side."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load
from activedatawarehouseprototype_spark.plans.explain import formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    import shutil

    orders = load(spark, SF, "orders")
    lineitem = load(spark, SF, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    # a fresh session's catalog doesn't know tables from a previous
    # run, but their warehouse directories survive and block the write
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    return spark.table("orders_b"), spark.table("lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    joined = orders_b.join(
        lineitem_b, orders_b.o_orderkey == lineitem_b.l_orderkey
    ).groupBy("o_orderstatus").agg(F.sum("l_quantity").alias("q"))
    # disable broadcast so the join itself must pick a strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from activedatawarehouseprototype_spark.plans.explain import (
            exchange_count,
        )

        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # bucketing provides the join distribution, so the ONLY shuffle
        # in the whole plan is the final aggregation's. (The old check
        # grepped the text BEFORE the first HashAggregate — which is
        # just the plan header and can never contain an Exchange, so it
        # passed even for a fully-shuffled unbucketed join.)
        n_bucketed = exchange_count(joined)
        assert n_bucketed <= 1, f"join should be shuffle-free:\n{plan[:2000]}"
        # non-vacuous control: the SAME join unbucketed must shuffle
        # BOTH sides — strictly more exchanges than the bucketed plan
        plain_join = (
            load(spark, SF, "orders")
            .join(
                load(spark, SF, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert exchange_count(plain_join) > n_bucketed
        # and the result is still correct
        plain = (
            load(spark, SF, "orders")
            .join(
                load(spark, SF, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        got = {(r.o_orderstatus, round(r.q, 4)) for r in joined.collect()}
        want = {(r.o_orderstatus, round(r.q, 4)) for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
