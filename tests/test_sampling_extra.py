"""balanced_downsample: every class ends at exactly the min class
size, survivors are a deterministic function of (salt, key), and NULL
class labels form their own class."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.sampling import (
    balanced_downsample,
)


def _mk(spark, sizes):
    rows = [
        (cls, cls * 1000 + i)
        for cls, n in sizes.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "cls int, id long")


def test_every_class_at_min_size(spark):
    df = _mk(spark, {1: 50, 2: 20, 3: 7})
    out = balanced_downsample(df, ["cls"], ["id"]).collect()
    counts = Counter(r["cls"] for r in out)
    assert counts == {1: 7, 2: 7, 3: 7}


def test_deterministic_and_subset(spark):
    df = _mk(spark, {1: 30, 2: 10})
    a = sorted(tuple(r) for r in balanced_downsample(df, ["cls"], ["id"]).collect())
    b = sorted(
        tuple(r)
        for r in balanced_downsample(
            df.repartition(7), ["cls"], ["id"]
        ).collect()
    )
    assert a == b  # layout-independent
    full = {tuple(r) for r in df.collect()}
    assert set(a) <= full
    # a different salt picks a different (still balanced) subset
    c = sorted(
        tuple(r)
        for r in balanced_downsample(df, ["cls"], ["id"], salt="other").collect()
    )
    assert Counter(r[0] for r in c) == Counter(r[0] for r in a)
    assert c != a


def test_null_class_is_its_own_class(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3), (1, 10), (1, 11)],
        "cls int, id long",
    )
    out = balanced_downsample(df, ["cls"], ["id"]).collect()
    counts = Counter(r["cls"] for r in out)
    assert counts == {None: 2, 1: 2}


def test_empty_input_passthrough(spark):
    df = _mk(spark, {}).limit(0)
    assert balanced_downsample(df, ["cls"], ["id"]).count() == 0
