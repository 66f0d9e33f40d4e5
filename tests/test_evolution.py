"""read_evolved: added columns NULL-fill, integral/fractional widening,
renames, irreconcilable types fail loudly, pruning pushes into each
snapshot's scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.evolution import read_evolved


@pytest.fixture()
def snapshots(spark, tmp_path):
    old = str(tmp_path / "v1")
    new = str(tmp_path / "v2")
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, status string, price float"
    ).write.parquet(old)
    spark.createDataFrame(
        [(3, "c", 3.5, "HIGH"), (4, "d", 4.5, "LOW")],
        "id bigint, state string, price double, priority string",
    ).write.parquet(new)
    return old, new


def test_union_widen_rename_nullfill(spark, snapshots):
    old, new = snapshots
    df = read_evolved(spark, [old, new], renames={"state": "status"})
    types = dict(df.dtypes)
    assert types["id"] == "bigint" and types["price"] == "double"
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[1]["priority"] is None and rows[3]["priority"] == "HIGH"
    assert rows[2]["status"] == "b" and rows[4]["status"] == "d"
    assert rows[1]["price"] == 1.5


def test_int_plus_double_promotes_to_double(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1, 10)], "id int, v int").write.parquet(a)
    spark.createDataFrame([(2, 2.5)], "id int, v double").write.parquet(b)
    df = read_evolved(spark, [a, b])
    assert dict(df.dtypes)["v"] == "double"
    assert sorted(r["v"] for r in df.collect()) == [2.5, 10.0]


def test_irreconcilable_types_raise(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame([(1, "x")], "id int, v string").write.parquet(a)
    spark.createDataFrame([(2, 5)], "id int, v int").write.parquet(b)
    with pytest.raises(ValueError, match="irreconcilable"):
        read_evolved(spark, [a, b])


def test_rename_collision_raises(spark, tmp_path):
    a = str(tmp_path / "a")
    spark.createDataFrame([(1, "x", "y")], "id int, old string, new string").write.parquet(a)
    with pytest.raises(ValueError, match="collides"):
        read_evolved(spark, [a], renames={"old": "new"})


def test_pruning_reaches_each_snapshot_scan(spark, snapshots):
    old, new = snapshots
    df = read_evolved(spark, [old, new], renames={"state": "status"}).select(
        "id", "price"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # neither scan reads the string columns
    import re

    for m in re.finditer(r"ReadSchema: ([^\n]*)", plan):
        assert "status" not in m.group(1) and "priority" not in m.group(1)
