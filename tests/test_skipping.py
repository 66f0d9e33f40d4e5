"""File-skipping index: pruning must be effective on clustered layouts
and NEVER change results — checked against a full-scan twin, a DuckDB
oracle, and a naive pure-Python pruning interpreter."""

from __future__ import annotations

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.skipping import (
    Pred,
    build_skipping_index,
    prune_files,
    read_with_skipping,
)
from activedatawarehouseprototype_spark.operators.warehouse import cluster_write

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders_table(spark, tmp_path_factory):
    """Orders clustered by o_orderdate into 8 files + skipping index."""
    path = str(tmp_path_factory.mktemp("skip") / "orders")
    df = spark.read.parquet(f"{SF}/orders.parquet")
    cluster_write(df, path, ["o_orderdate"], n_files=8)
    build_skipping_index(spark, path, ["o_orderdate", "o_totalprice"])
    return path


def test_pruned_read_equals_full_scan(spark, orders_table):
    preds = [Pred("o_orderdate", "between", ("1996-01-01", "1996-03-31"))]
    got = read_with_skipping(spark, orders_table, preds)
    want = spark.read.parquet(orders_table).filter(
        F.col("o_orderdate").between("1996-01-01", "1996-03-31")
    )
    assert sorted(got.collect()) == sorted(want.collect())
    assert want.count() > 0  # non-vacuous


def test_clustered_layout_actually_prunes(spark, orders_table):
    """A ~3-month slice of a ~6.6-year clustered table must touch a
    strict minority of the files, and the scan's inputFiles must agree
    with the pruned list."""
    preds = [Pred("o_orderdate", "between", ("1996-01-01", "1996-03-31"))]
    files = prune_files(spark, orders_table, preds)
    total = len(
        [f for f in os.listdir(orders_table) if f.endswith(".parquet")]
    )
    assert 0 < len(files) < total / 2
    got = read_with_skipping(spark, orders_table, preds)
    assert set(os.path.basename(f) for f in got.inputFiles()) == set(
        os.path.basename(f) for f in files
    )


def test_matches_duckdb_oracle(spark, orders_table):
    """Oracle-grade evidence for the queued round-7 corpus entry: the
    pruned-scan aggregate equals DuckDB running plain SQL on the
    ORIGINAL parquet (pruning must be invisible to results)."""
    preds = [
        Pred("o_orderdate", ">=", "1995-01-01"),
        Pred("o_orderdate", "<", "1996-01-01"),
    ]
    got = (
        read_with_skipping(spark, orders_table, preds)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
        .collect()
    )
    want = duckdb.sql(
        f"""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM read_parquet('{SF}/orders.parquet')
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate <  DATE '1996-01-01'
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert [(r.o_orderstatus, r.n_orders, float(r.sum_price)) for r in got] == [
        (s, n, float(p)) for s, n, p in want
    ]


def test_unclustered_layout_is_conservative_not_wrong(spark, tmp_path):
    """Random layout -> wide per-file ranges -> little pruning, but
    results still exact (incl. NULLs never matching predicates)."""
    path = str(tmp_path / "rand")
    df = spark.range(0, 2000).select(
        F.col("id"),
        F.when(F.col("id") % 17 == 0, None)
        .otherwise((F.col("id") * 37) % 1000)
        .alias("v"),
    )
    df.repartition(6).write.parquet(path)
    build_skipping_index(spark, path, ["v"])
    preds = [Pred("v", "in", [5, 250, 999])]
    got = read_with_skipping(spark, path, preds)
    want = df.filter(F.col("v").isin(5, 250, 999))
    assert sorted(got.collect()) == sorted(want.collect())
    assert want.count() > 0


def test_all_null_files_are_skipped(spark, tmp_path):
    path = str(tmp_path / "nulls")
    a = spark.range(0, 100).select(
        F.col("id"), F.lit(None).cast("long").alias("v")
    )
    b = spark.range(100, 200).select(F.col("id"), (F.col("id") * 2).alias("v"))
    a.coalesce(1).write.parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    build_skipping_index(spark, path, ["v"])
    files = prune_files(spark, path, [Pred("v", ">=", 0)])
    assert len(files) == 1  # the all-NULL file is pruned
    got = read_with_skipping(spark, path, [Pred("v", ">=", 0)])
    assert got.count() == 100


def test_empty_survivor_set_returns_empty_with_schema(spark, orders_table):
    got = read_with_skipping(
        spark, orders_table, [Pred("o_totalprice", "<", -1.0)]
    )
    assert got.count() == 0
    assert "o_orderkey" in got.columns


def test_zero_row_file_is_indexed_not_stale(spark, tmp_path):
    """A 0-row parquet file (empty write partition / compactor
    leftover) yields no scan rows, so the manifest must synthesize its
    entry — otherwise every later read would false-positive as stale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "empties")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    ).coalesce(1).write.parquet(path)
    schema = pa.schema([("id", pa.int64()), ("v", pa.int64())])
    pq.write_table(
        schema.empty_table(), os.path.join(path, "part-99999-empty.parquet")
    )
    build_skipping_index(spark, path, ["v"])
    manifest = spark.read.parquet(path + "_skip_index")
    empty_row = manifest.filter(F.col("file").contains("part-99999")).collect()
    assert len(empty_row) == 1 and empty_row[0]["rows"] == 0
    assert empty_row[0]["min_v"] is None
    # the empty file is prunable for any predicate, and reads succeed
    assert not any(
        "part-99999" in f for f in prune_files(spark, path, [Pred("v", ">=", 0)])
    )
    got = read_with_skipping(spark, path, [Pred("v", "between", (30, 60))])
    assert got.count() == 11


def test_stale_manifest_raises(spark, tmp_path):
    path = str(tmp_path / "stale")
    spark.range(0, 50).coalesce(1).write.parquet(path)
    build_skipping_index(spark, path, ["id"])
    spark.range(50, 100).coalesce(1).write.mode("append").parquet(path)
    with pytest.raises(RuntimeError, match="stale"):
        read_with_skipping(spark, path, [Pred("id", ">=", 0)])


def test_unindexed_column_predicate_still_filters_rows(spark, orders_table):
    preds = [
        Pred("o_orderdate", ">=", "1996-01-01"),
        Pred("o_orderpriority", "=", "1-URGENT"),  # not in the index
    ]
    got = read_with_skipping(spark, orders_table, preds)
    want = spark.read.parquet(orders_table).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderpriority") == "1-URGENT")
    )
    assert got.count() == want.count() > 0


def _naive_prune(stats, preds):
    """Pure-Python pruning interpreter over [(file, min, max)] for a
    single int column; None/None = all-NULL file."""
    out = []
    for f, mn, mx in stats:
        if mn is None:
            continue
        keep = True
        for p in preds:
            if p.op in ("=", "=="):
                keep &= mn <= p.value <= mx
            elif p.op == "<":
                keep &= mn < p.value
            elif p.op == "<=":
                keep &= mn <= p.value
            elif p.op == ">":
                keep &= mx > p.value
            elif p.op == ">=":
                keep &= mx >= p.value
            elif p.op == "between":
                keep &= mx >= p.value[0] and mn <= p.value[1]
            else:
                keep &= any(mn <= v <= mx for v in p.value)
        if keep:
            out.append(f)
    return out


pred_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.sampled_from(["=", "<", "<=", ">", ">="]), st.integers(-5, 105)
        ),
        st.tuples(
            st.just("between"),
            st.tuples(st.integers(-5, 60), st.integers(40, 105)),
        ),
        st.tuples(
            st.just("in"),
            st.lists(st.integers(-5, 105), min_size=1, max_size=4),
        ),
    ),
    min_size=1,
    max_size=3,
)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.integers(0, 100), st.none()), min_size=4, max_size=60
    ),
    raw_preds=pred_strategy,
)
@pytest.mark.slow
def test_pruning_property_vs_naive(spark, tmp_path_factory, vals, raw_preds):
    """Spark-side pruning == the naive interpreter on the SAME stats,
    and the pruned read == the unpruned filter, for random data and
    random conjunctions."""
    preds = [Pred("v", op, v) for op, v in raw_preds]
    path = str(tmp_path_factory.mktemp("prop") / "t")
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    df.repartition(3).write.parquet(path)
    build_skipping_index(spark, path, ["v"])
    manifest = spark.read.parquet(path + "_skip_index")
    stats = [
        (r["file"], r["min_v"], r["max_v"]) for r in manifest.collect()
    ]
    # prune_files returns reader-ready DECODED paths; the naive
    # interpreter works on the manifest's raw (URI-encoded) values
    from activedatawarehouseprototype_spark.operators.skipping import _raw_path

    assert sorted(prune_files(spark, path, preds)) == sorted(
        _raw_path(f) for f in _naive_prune(stats, preds)
    )
    got = sorted(read_with_skipping(spark, path, preds).collect())
    exact = _naive_filter(vals, preds)
    assert [tuple(r) for r in got] == exact


def _naive_filter(vals, preds):
    out = []
    for i, v in enumerate(vals):
        if v is None:
            continue
        ok = True
        for p in preds:
            if p.op in ("=", "=="):
                ok &= v == p.value
            elif p.op == "<":
                ok &= v < p.value
            elif p.op == "<=":
                ok &= v <= p.value
            elif p.op == ">":
                ok &= v > p.value
            elif p.op == ">=":
                ok &= v >= p.value
            elif p.op == "between":
                ok &= p.value[0] <= v <= p.value[1]
            else:
                ok &= v in p.value
        if ok:
            out.append((i, v))
    return sorted(out)


def test_nested_partitioned_layout_roundtrip_and_staleness(spark, tmp_path):
    """A partitionBy layout puts data files in SUBDIRECTORIES; the
    index must (a) see them (round-trip correctness), (b) flag a file
    appended into a subdir as stale — the round-6 basename-only
    os.listdir guard was blind to both."""
    path = str(tmp_path / "nested")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    ).write.partitionBy("part").parquet(path)
    build_skipping_index(spark, path, ["id"])
    got = read_with_skipping(spark, path, [Pred("id", "between", (10, 29))])
    assert got.count() == 20
    # append into ONE partition subdir: must now raise, not drop rows
    spark.range(100, 120).select(
        F.col("id"), F.lit(1).alias("part")
    ).write.mode("append").partitionBy("part").parquet(path)
    with pytest.raises(RuntimeError, match="stale"):
        read_with_skipping(spark, path, [Pred("id", ">=", 0)])


def test_same_basename_in_different_subdirs_not_conflated(spark, tmp_path):
    """Two partition subdirectories holding files with IDENTICAL
    basenames (e.g. after a compactor rewrite) must be tracked as
    distinct files — basename identity would conflate them."""
    import shutil

    path = str(tmp_path / "twins")
    os.makedirs(path)
    staging = str(tmp_path / "stage")
    spark.range(0, 10).coalesce(1).write.parquet(staging)
    src = [f for f in os.listdir(staging) if f.endswith(".parquet")][0]
    for part in ("part=0", "part=1"):
        os.makedirs(os.path.join(path, part))
        shutil.copy(
            os.path.join(staging, src), os.path.join(path, part, "data.parquet")
        )
    build_skipping_index(spark, path, ["id"])
    got = read_with_skipping(spark, path, [Pred("id", ">=", 0)])
    assert got.count() == 20  # both copies read, neither flagged stale


def test_update_index_scans_only_new_files_and_drops_gone(spark, tmp_path):
    """Incremental maintenance: new appends indexed without a full
    rebuild, deleted files' rows dropped, untouched rows preserved
    byte-identical; the staleness guard passes again afterwards."""
    import shutil

    from activedatawarehouseprototype_spark.operators.skipping import (
        update_skipping_index,
    )

    path = str(tmp_path / "inc")
    spark.range(0, 50).coalesce(2).write.parquet(path)
    build_skipping_index(spark, path, ["id"])
    before = {
        r["file"]: tuple(r)
        for r in spark.read.parquet(path + "_skip_index").collect()
    }

    # append new data: staleness guard must trip, update must fix it
    spark.range(100, 160).coalesce(1).write.mode("append").parquet(path)
    with pytest.raises(RuntimeError, match="stale"):
        read_with_skipping(spark, path, [Pred("id", ">=", 0)])
    res = update_skipping_index(spark, path)
    assert res["added"] == 1 and res["removed"] == 0
    after = {
        r["file"]: tuple(r)
        for r in spark.read.parquet(path + "_skip_index").collect()
    }
    for f, row in before.items():
        assert after[f] == row  # untouched rows byte-identical
    got = read_with_skipping(spark, path, [Pred("id", "between", (40, 120))])
    assert got.count() == 10 + 21

    # delete one original file (compaction shape): update drops its row
    victim = [
        f for f in os.listdir(path) if f.endswith(".parquet")
    ][0]
    os.remove(os.path.join(path, victim))
    res2 = update_skipping_index(spark, path)
    assert res2["removed"] == 1 and res2["added"] == 0
    # results reflect the surviving files, no stale error, no ghost file
    total = read_with_skipping(spark, path, [Pred("id", ">=", 0)]).count()
    assert total == spark.read.parquet(path).count()


def test_update_index_noop_when_unchanged(spark, tmp_path):
    from activedatawarehouseprototype_spark.operators.skipping import (
        update_skipping_index,
    )

    path = str(tmp_path / "noop")
    spark.range(0, 10).coalesce(1).write.parquet(path)
    build_skipping_index(spark, path, ["id"])
    assert update_skipping_index(spark, path) == {"added": 0, "removed": 0}


def test_update_index_handles_zero_row_new_file(spark, tmp_path):
    from activedatawarehouseprototype_spark.operators.skipping import (
        update_skipping_index,
    )

    path = str(tmp_path / "z")
    spark.range(0, 10).coalesce(1).write.parquet(path)
    build_skipping_index(spark, path, ["id"])
    spark.range(0, 10).filter("id < 0").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    res = update_skipping_index(spark, path)
    assert res["added"] == 1
    # zero-row file indexed with NULL stats: pruned for any predicate,
    # and the staleness guard stays quiet
    assert read_with_skipping(spark, path, [Pred("id", ">=", 0)]).count() == 10


def test_update_index_many_deleted_files_antijoin_path(spark, tmp_path):
    """>64 deleted files switches the manifest cleanup to the
    broadcast anti-join (an IN-list that size bloats the plan);
    results identical to the literal path."""
    from activedatawarehouseprototype_spark.operators.skipping import (
        update_skipping_index,
    )

    path = str(tmp_path / "many")
    spark.range(0, 700).repartition(70).write.parquet(path)
    build_skipping_index(spark, path, ["id"])
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 66
    for f in files[:66]:
        os.remove(os.path.join(path, f))
    res = update_skipping_index(spark, path)
    assert res["removed"] == 66 and res["added"] == 0
    total = read_with_skipping(spark, path, [Pred("id", ">=", 0)]).count()
    assert total == spark.read.parquet(path).count()


def test_update_index_partitioned_layout_partition_column_stats(spark, tmp_path):
    """Appending to a PARTITIONED table where a stats column IS the
    partition column: the update must re-derive partition values from
    the paths (basePath), not read NULL stats that would make the new
    files wrongly prunable — wrong pruning loses rows."""
    from activedatawarehouseprototype_spark.operators.skipping import (
        update_skipping_index,
    )

    path = str(tmp_path / "part")
    spark.range(0, 40).selectExpr("id", "id % 2 AS part").write.partitionBy(
        "part"
    ).parquet(path)
    build_skipping_index(spark, path, ["part", "id"])
    spark.range(100, 120).selectExpr("id", "CAST(2 AS bigint) AS part").write.mode(
        "append"
    ).partitionBy("part").parquet(path)
    res = update_skipping_index(spark, path)
    assert res["added"] >= 1
    got = read_with_skipping(spark, path, [Pred("part", "=", 2)])
    assert got.count() == 20  # the new partition's rows must survive pruning
    manifest = spark.read.parquet(path + "_skip_index")
    new_rows = manifest.filter(F.col("file").contains("part=2")).collect()
    assert new_rows and all(r["min_part"] == 2 for r in new_rows)


def test_table_root_with_url_hostile_chars(spark, tmp_path):
    """A table root containing spaces / % / '+' / non-ASCII: the
    relative-path extraction must URL-decode input_file_name() URIs
    (protecting literal '+', which Hadoop leaves unencoded) or the
    zero-row anti-join synthesizes duplicate manifest rows and the
    staleness check misclassifies every file (round-7 ADVICE,
    skipping.py). Covers build, incremental update, and pruned read."""
    from activedatawarehouseprototype_spark.operators.skipping import (
        update_skipping_index,
    )

    root = tmp_path / "dir with space 100% weird+ü"
    root.mkdir()
    path = str(root / "tbl")
    spark.range(0, 100).selectExpr("id", "id * 2 AS v").repartition(4).write.parquet(
        path
    )
    build_skipping_index(spark, path, ["id"])
    manifest = spark.read.parquet(path + "_skip_index")
    n_disk = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    # no duplicate synthesized rows: one manifest row per data file
    assert manifest.count() == n_disk
    assert manifest.filter(F.col("rows") == 0).count() == 0
    # read path: staleness check must accept the manifest as complete
    got = read_with_skipping(spark, path, [Pred("id", "<", 50)])
    assert got.count() == 50
    # incremental update after an append sees exactly the new files
    spark.range(100, 120).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(path)
    res = update_skipping_index(spark, path)
    assert res["added"] == 1 and res["removed"] == 0
    assert read_with_skipping(spark, path, [Pred("id", ">=", 100)]).count() == 20
