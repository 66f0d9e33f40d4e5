"""Warehouse maintenance operator tests: partitioned writes, MERGE
upsert, DELETE, compaction, salted aggregation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load
from activedatawarehouseprototype_spark.operators import warehouse

SF = "/root/testdata/sf0.001"


def test_write_partitioned_prunes(spark, tmp_path):
    orders = load(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    warehouse.write_partitioned(orders, path, ["o_orderstatus"])
    assert os.path.isdir(os.path.join(path, "o_orderstatus=F"))
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()


def test_merge_upsert_and_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, k string, v double"
    )
    warehouse.merge_upsert(spark, path, base, ["id"])
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, k string, v double"
    )
    warehouse.merge_upsert(spark, path, updates, ["id"])
    got = {r.id: (r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    deleted = warehouse.delete_where(spark, path, "v >= 30.0")
    assert deleted == 2
    assert {r.id for r in spark.read.parquet(path).collect()} == {1, 2}


def test_compact_reduces_files(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(1000).repartition(8).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    warehouse.compact(spark, path, target_files=1)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 8 and n_after == 1
    assert spark.read.parquet(path).count() == 1000


def test_salted_agg_matches_plain(spark):
    events = load(spark, SF, "events")
    salted = {
        r.event_type: (round(r.sum_value, 6), r.n_rows)
        for r in warehouse.salted_agg(events, ["event_type"], "value").collect()
    }
    plain = {
        r.event_type: (round(r.s, 6), r.n)
        for r in events.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


def test_rules_table_merge_roundtrip(spark, tmp_path):
    """Rules-as-a-table (C1 MERGE mapping): upserts, deletes, and
    restart recovery through the warehouse table, queryable with SQL."""
    import json

    from activedatawarehouseprototype_spark.streaming.registry import RuleRegistry
    from activedatawarehouseprototype_spark.streaming.rule_table import (
        load_rules_table,
        save_rules_table,
    )

    path = str(tmp_path / "rules_table")

    def rule(qid, limit):
        return json.dumps({
            "queryId": qid, "queryState": "ACTIVE", "lastTime": -1,
            "windowMilliseconds": 10_000, "frequencyMilliseconds": 0,
            "groupingKeyNames": ["carId"], "windowFilterRules": [],
            "aggregatorFunctionType": "AVG", "limitOperatorType": ">",
            "limit": limit, "aggregateFieldName": "speed",
        })

    reg = RuleRegistry()
    reg.apply_json(rule(1, 100))
    reg.apply_json(rule(2, 200))
    save_rules_table(spark, reg, path)
    assert spark.read.parquet(path).count() == 2

    # upsert rule 1 (new threshold), delete rule 2, insert rule 3
    reg.apply_json(rule(1, 150))
    del reg.rules[2]
    reg.apply_json(rule(3, 300))
    save_rules_table(spark, reg, path)

    table = spark.read.parquet(path)
    assert {r.query_id for r in table.collect()} == {1, 3}
    # the table is plain data: SQL over it works
    table.createOrReplaceTempView("rules_tbl")
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM rules_tbl WHERE query_state = 'ACTIVE'"
    ).head().n == 2

    # restart recovery
    reg2 = load_rules_table(spark, path)
    assert set(reg2.rules) == {1, 3}
    assert reg2.rules[1].limit == 150.0


def test_scd2_upsert_history(spark, tmp_path):
    """Type-2 SCD: changes close the current version and open a new
    one; identical re-delivery is a no-op; history accumulates."""
    import datetime as dt

    from activedatawarehouseprototype_spark.operators.warehouse import scd2_upsert

    path = str(tmp_path / "dim_customer")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)

    def upd(rows, ts):
        return spark.createDataFrame(
            [(k, seg, ts) for k, seg in rows],
            "cust_id int, segment string, eff_ts timestamp",
        )

    scd2_upsert(spark, path, upd([(1, "gold"), (2, "silver")], t0),
                ["cust_id"], ["segment"], "eff_ts")
    assert spark.read.parquet(path).count() == 2

    # 1 changes, 2 unchanged (re-delivered), 3 is new
    scd2_upsert(spark, path, upd([(1, "platinum"), (2, "silver"), (3, "bronze")], t1),
                ["cust_id"], ["segment"], "eff_ts")
    rows = {(r.cust_id, r.segment): r for r in spark.read.parquet(path).collect()}
    assert len(rows) == 4  # closed gold + open platinum + silver + bronze
    closed = rows[(1, "gold")]
    assert closed.is_current is False and closed.valid_to == t1
    open_new = rows[(1, "platinum")]
    assert open_new.is_current is True and open_new.valid_to is None
    assert rows[(2, "silver")].is_current is True  # untouched, still t0
    assert rows[(2, "silver")].valid_from == t0
    assert rows[(3, "bronze")].valid_from == t1

    # idempotent re-delivery of the same batch changes nothing
    scd2_upsert(spark, path, upd([(1, "platinum"), (2, "silver"), (3, "bronze")], t1),
                ["cust_id"], ["segment"], "eff_ts")
    assert spark.read.parquet(path).count() == 4


def test_scd2_upsert_input_validation(spark, tmp_path):
    """SCD2 input contract: empty tracked_cols raises (the change
    predicate would vanish), and >1 update row per key raises instead
    of silently writing overlapping open versions."""
    import datetime as dt

    import pytest

    from activedatawarehouseprototype_spark.operators.warehouse import scd2_upsert

    path = str(tmp_path / "dim_bad")
    t0 = dt.datetime(2024, 1, 1)
    upd = spark.createDataFrame(
        [(1, "gold", t0)], "cust_id int, segment string, eff_ts timestamp"
    )
    with pytest.raises(ValueError, match="tracked_cols"):
        scd2_upsert(spark, path, upd, ["cust_id"], [], "eff_ts")

    dup = spark.createDataFrame(
        [(1, "gold", t0), (1, "silver", t0), (2, "gold", t0)],
        "cust_id int, segment string, eff_ts timestamp",
    )
    with pytest.raises(ValueError, match="more than one row"):
        scd2_upsert(spark, path, dup, ["cust_id"], ["segment"], "eff_ts")
    # nothing was written by either rejected call
    import os

    assert not os.path.exists(path)


def test_incremental_agg_mv_matches_direct_aggregate(spark, tmp_path):
    """Feeding batches through the MV must equal one direct aggregate
    over the concatenated input — for COUNT/SUM/MIN/MAX exactly, and
    AVG derived as total/n."""
    from pyspark.sql import functions as F

    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_agg_mv,
    )

    mv = str(tmp_path / "mv")
    batches = [
        [(i % 7, float((i * 13) % 101)) for i in range(lo, hi)]
        for lo, hi in ((0, 400), (400, 650), (650, 1000))
    ]
    all_rows = [r for b in batches for r in b]
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "k int, v double")
        out = incremental_agg_mv(spark, mv, df, ["k"], "v", batch_id=bid)
    direct = (
        spark.createDataFrame(all_rows, "k int, v double")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
    )
    got = {r.k: (r.n, round(r.total, 6), r.mn, r.mx) for r in out.collect()}
    want = {r.k: (r.n, round(r.total, 6), r.mn, r.mx) for r in direct.collect()}
    assert got == want

    # replaying an already-applied batch must be a no-op (idempotence)
    replay = spark.createDataFrame(batches[1], "k int, v double")
    out2 = incremental_agg_mv(spark, mv, replay, ["k"], "v", batch_id=1)
    got2 = {r.k: (r.n, round(r.total, 6), r.mn, r.mx) for r in out2.collect()}
    assert got2 == want


def test_incremental_agg_mv_hll_distinct(spark, tmp_path):
    """distinct_col maintains a mergeable HLL sketch: the estimate
    after batch-wise merging matches exact COUNT(DISTINCT) within HLL
    tolerance (~2% at default lgConfigK=12; exact here at tiny n)."""
    from pyspark.sql import functions as F

    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_agg_mv,
    )

    mv = str(tmp_path / "mv")
    batches = [
        [(i % 3, float(i % 50), i % 61) for i in range(lo, hi)]
        for lo, hi in ((0, 300), (300, 700))
    ]
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "k int, v double, u int")
        out = incremental_agg_mv(
            spark, mv, df, ["k"], "v", batch_id=bid, distinct_col="u"
        )
    est = {
        r.k: r.est
        for r in out.select(
            "k", F.hll_sketch_estimate("hll").alias("est")
        ).collect()
    }
    exact = {
        r.k: r.d
        for r in spark.createDataFrame(
            [x for b in batches for x in b], "k int, v double, u int"
        )
        .groupBy("k")
        .agg(F.countDistinct("u").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(2, 0.05 * exact[k]), (k, est[k], exact[k])


# --- VersionedTable: Delta-style time travel over plain parquet ---


def _vt(spark, tmp_path, name):
    from activedatawarehouseprototype_spark.operators.versioned import (
        VersionedTable,
    )

    return VersionedTable(spark, str(tmp_path / name))


def test_versioned_commit_read_versions(spark, tmp_path):
    vt = _vt(spark, tmp_path, "t1")
    v0 = vt.commit(spark.range(3).toDF("id"), mode="overwrite", ts=100.0)
    v1 = vt.commit(
        spark.range(3, 5).toDF("id"), mode="append", op="batch-2", ts=200.0
    )
    assert (v0, v1) == (0, 1)
    assert {r.id for r in vt.read(version=0).collect()} == {0, 1, 2}
    assert {r.id for r in vt.read().collect()} == {0, 1, 2, 3, 4}
    # overwrite starts a fresh file list
    vt.commit(spark.range(9, 10).toDF("id"), mode="overwrite", ts=300.0)
    assert {r.id for r in vt.read().collect()} == {9}
    # ...but old versions still read in full
    assert {r.id for r in vt.read(version=1).collect()} == {0, 1, 2, 3, 4}


def test_versioned_as_of_ts(spark, tmp_path):
    import pytest as _pytest

    vt = _vt(spark, tmp_path, "t2")
    vt.commit(spark.range(1).toDF("id"), ts=100.0)
    vt.commit(spark.range(1, 2).toDF("id"), ts=200.0)
    assert {r.id for r in vt.read(as_of_ts=150.0).collect()} == {0}
    assert {r.id for r in vt.read(as_of_ts=200.0).collect()} == {0, 1}
    with _pytest.raises(ValueError):
        vt.read(as_of_ts=50.0)


def test_versioned_rollback_is_zero_copy(spark, tmp_path):
    import os

    vt = _vt(spark, tmp_path, "t3")
    vt.commit(spark.range(2).toDF("id"), ts=1.0)
    vt.commit(spark.range(2, 4).toDF("id"), ts=2.0)
    data_dirs_before = set(os.listdir(f"{vt.path}/data"))
    v = vt.rollback(0, ts=3.0)
    assert v == 2
    assert set(os.listdir(f"{vt.path}/data")) == data_dirs_before  # no copy
    assert {r.id for r in vt.read().collect()} == {0, 1}
    ops = [h["op"] for h in vt.history()]
    assert ops[0] == "rollback to 0"


def test_versioned_vacuum_drops_unreferenced(spark, tmp_path):
    import os

    vt = _vt(spark, tmp_path, "t4")
    vt.commit(spark.range(2).toDF("id"), mode="overwrite", ts=1.0)
    vt.commit(spark.range(5).toDF("id"), mode="overwrite", ts=2.0)
    vt.commit(spark.range(5, 7).toDF("id"), mode="append", ts=3.0)
    removed = vt.vacuum(retain_last=2)
    # v0's dir is referenced by nothing retained (v1, v2 share c1+c2)
    assert removed == ["c00000000"]
    assert {r.id for r in vt.read().collect()} == {0, 1, 2, 3, 4, 5, 6}
    assert {r.id for r in vt.read(version=1).collect()} == {0, 1, 2, 3, 4}
    assert [h["version"] for h in vt.history()] == [2, 1]


def test_versioned_empty_commit_readable(spark, tmp_path):
    vt = _vt(spark, tmp_path, "t5")
    empty = spark.range(1).toDF("id").filter("id < 0")
    vt.commit(empty, mode="overwrite", ts=1.0)
    got = vt.read()
    assert got.count() == 0 and got.columns == ["id"]
    vt.commit(spark.range(3).toDF("id"), mode="append", ts=2.0)
    assert vt.read().count() == 3


def test_cluster_write_narrow_file_ranges(spark, tmp_path):
    """Range-clustered write: each parquet file's (min,max) span of the
    cluster column is a small slice of the domain, so stats-based file
    skipping prunes selective filters (verified from the footers, the
    same stats the reader consults)."""
    import os

    import pyarrow.parquet as pq

    from activedatawarehouseprototype_spark.operators import warehouse

    df = spark.range(100_000).selectExpr(
        "CAST(id % 1000 AS BIGINT) AS user_id", "id AS payload"
    )
    out = str(tmp_path / "clustered")
    warehouse.cluster_write(df, out, ["user_id"], n_files=8)
    spans = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out, f))
        lo = min(md.row_group(i).column(0).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(0).statistics.max
                 for i in range(md.num_row_groups))
        spans.append((lo, hi))
    assert len(spans) >= 4
    # each file covers a narrow slice (range partitioning): well under
    # half the domain; an unclustered write would span ~the whole 0-999
    assert all(hi - lo <= 250 for lo, hi in spans), spans
    # and the slices are ordered + essentially disjoint
    spans.sort()
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2, spans


def test_zorder_key_interleaves_and_clusters_both_columns(spark, tmp_path):
    """Z-order: both clustered columns get narrow per-file ranges —
    neither column's span approaches the full domain in any file, which
    a single-column sort can't deliver for the second column."""
    import os

    import pyarrow.parquet as pq

    from activedatawarehouseprototype_spark.operators import warehouse

    # known interleave: x=0b11, y=0b01 -> z = y1 x1 y0 x0 = 0b0111
    row = (
        spark.createDataFrame([(3, 1)], "x bigint, y bigint")
        .select(warehouse.zorder_key(["x", "y"], bits=2).alias("z"))
        .collect()
    )
    assert row[0]["z"] == 0b0111

    df = spark.range(65_536).selectExpr(
        "CAST(id % 256 AS BIGINT) AS x",
        "CAST(CAST(id / 256 AS BIGINT) % 256 AS BIGINT) AS y",
        "id AS payload",
    )
    out = str(tmp_path / "zordered")
    warehouse.cluster_write(df, out, ["x", "y"], n_files=16, zorder=True, bits=8)
    for col_idx, name in ((0, "x"), (1, "y")):
        spans = []
        for f in os.listdir(out):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(out, f))
            lo = min(md.row_group(i).column(col_idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(col_idx).statistics.max
                     for i in range(md.num_row_groups))
            spans.append(hi - lo)
        # Z-order's guarantee is STATISTICAL: a z-slice straddling a
        # high-bit boundary legitimately spans a full dimension (same
        # for Delta's ZORDER), but most files are ~quad-sized. Under a
        # plain x-sort every file's y-span is the full 255 (measured);
        # here both columns' mean span must be a fraction of that.
        assert sum(spans) / len(spans) <= 140, (name, sorted(spans))
        assert sum(1 for s in spans if s > 200) <= 2, (name, sorted(spans))


def test_versioned_optimize_and_delete_where(spark, tmp_path):
    import os

    from activedatawarehouseprototype_spark.operators import versioned as V

    vt = _vt(spark, tmp_path, "t6")
    for i in range(4):  # four appends -> four commit dirs in HEAD
        vt.commit(spark.range(i * 10, (i + 1) * 10).toDF("id"), ts=float(i))
    assert len(vt.history()[0]["dirs"]) == 4
    v_opt = V.optimize(vt, n_files=2, ts=10.0)
    assert len(vt.history()[0]["dirs"]) == 1  # one compacted commit dir
    assert vt.read().count() == 40
    assert {r.id for r in vt.read(version=3).collect()} == set(range(40))

    v_del = V.delete_where(vt, "id >= 30", ts=11.0)
    assert vt.read().count() == 30
    # audit trail: pre-delete versions still show the erased rows...
    assert vt.read(version=v_opt).count() == 40
    # ...until vacuum drops them past retention
    vt.vacuum(retain_last=1)
    assert vt.read().count() == 30
    import pytest as _pytest
    with _pytest.raises(Exception):
        vt.read(version=v_opt).collect()


def test_incremental_agg_mv_histogram_percentiles(spark, tmp_path):
    """The hist_bins column merges across batches exactly (element-wise
    sums equal a one-shot histogram of the concatenated input) and the
    percentile estimate lands within one bin width of the true value."""
    import numpy as np

    from activedatawarehouseprototype_spark.operators.warehouse import (
        estimate_percentile,
        incremental_agg_mv,
    )

    mv = str(tmp_path / "mv_hist")
    rng = np.random.RandomState(7)
    all_vals = []
    bins = (0.0, 100.0, 25)
    for b in range(3):
        vals = rng.uniform(0, 100, 400).round(3).tolist()
        all_vals += vals
        batch = spark.createDataFrame(
            [("k", float(v)) for v in vals], "k string, value double"
        )
        out = incremental_agg_mv(
            spark, mv, batch, ["k"], "value", batch_id=b, hist_bins=bins
        )
    row = out.collect()[0]
    # exact merge: histogram of the union == summed per-batch histograms
    lo, hi, nb = bins
    width = (hi - lo) / nb
    expect = [0] * nb
    for v in all_vals:
        expect[min(nb - 1, max(0, int((v - lo) // width)))] += 1
    assert list(row["hist"]) == expect
    for p in (0.1, 0.5, 0.9):
        est = estimate_percentile(list(row["hist"]), p, lo, hi)
        true = float(np.percentile(all_vals, p * 100))
        assert abs(est - true) <= width + 1e-9, (p, est, true)


def test_merge_upsert_cdc_changelog(spark, tmp_path):
    """CDC merge: inserts and real updates produce changelog rows
    (pre+post images); identical re-deliveries produce none; the
    merged target matches plain merge_upsert semantics."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        merge_upsert_cdc,
    )

    path = str(tmp_path / "cdc")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, k string, v double"
    )
    log0 = merge_upsert_cdc(spark, path, base, ["id"])
    assert {(r.op, r.id) for r in log0.collect()} == {("insert", 1), ("insert", 2)}

    updates = spark.createDataFrame(
        [(2, "b", 20.0),     # identical -> no changelog
         (1, "a2", 11.0),    # real update -> pre+post
         (3, "c", 30.0)],    # new key -> insert
        "id long, k string, v double",
    )
    log1 = merge_upsert_cdc(spark, path, updates, ["id"])
    got = {(r.op, r.id, r.k, r.v) for r in log1.collect()}
    assert got == {
        ("insert", 3, "c", 30.0),
        ("update_preimage", 1, "a", 10.0),
        ("update_postimage", 1, "a2", 11.0),
    }
    final = {r.id: (r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert final == {1: ("a2", 11.0), 2: ("b", 20.0), 3: ("c", 30.0)}


def test_incremental_join_mv_matches_direct_join(spark, tmp_path):
    """Delta-propagated join MV == direct join of all accumulated
    input, under mixed arrival orders (left-only, right-only, both),
    with batch-id replay idempotence."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_join_mv,
    )

    base = str(tmp_path / "jmv")

    def L(rows):
        return spark.createDataFrame(rows, "k bigint, lval string")

    def R(rows):
        return spark.createDataFrame(rows, "k bigint, rval double")

    all_l, all_r = [], []
    batches = [
        (L([(1, "a"), (2, "b")]), None),
        (None, R([(1, 10.0), (3, 30.0)])),
        (L([(3, "c")]), R([(2, 20.0), (1, 11.0)])),
        (None, R([(3, 31.0)])),
    ]
    mv = None
    for bid, (lb, rb) in enumerate(batches):
        if lb is not None:
            all_l += lb.collect()
        if rb is not None:
            all_r += rb.collect()
        mv = incremental_join_mv(
            spark, base, ["k"], left_batch=lb, right_batch=rb, batch_id=bid
        )
    got = {(r.k, r.lval, r.rval) for r in mv.collect()}
    direct = {
        (r.k, r.lval, r.rval)
        for r in spark.createDataFrame(all_l)
        .join(spark.createDataFrame(all_r), "k")
        .collect()
    }
    assert got == direct and len(got) == 5
    # replay of the last batch is a no-op
    n = mv.count()
    mv2 = incremental_join_mv(
        spark, base, ["k"],
        left_batch=None, right_batch=R([(3, 31.0)]), batch_id=3,
    )
    assert mv2.count() == n


def test_cli_table_verbs(spark, tmp_path, capsys):
    """table commit/read/history/rollback/vacuum round-trip via CLI."""
    import json as _json

    from activedatawarehouseprototype_spark.cli import main

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    spark.range(5).toDF("id").write.parquet(a)
    spark.range(5, 8).toDF("id").write.parquet(b)
    tbl = str(tmp_path / "vt")

    assert main(["table", "--path", tbl, "commit", "--input", a,
                 "--mode", "overwrite"]) == 0
    assert main(["table", "--path", tbl, "commit", "--input", b]) == 0
    out = str(tmp_path / "head")
    assert main(["table", "--path", tbl, "read", "--output", out]) == 0
    assert spark.read.parquet(out).count() == 8

    capsys.readouterr()
    assert main(["table", "--path", tbl, "history"]) == 0
    hist = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [h["version"] for h in hist] == [1, 0]

    assert main(["table", "--path", tbl, "rollback", "--version", "0"]) == 0
    out0 = str(tmp_path / "rolled")
    assert main(["table", "--path", tbl, "read", "--output", out0]) == 0
    assert spark.read.parquet(out0).count() == 5
    assert main(["table", "--path", tbl, "vacuum", "--retain-last", "1"]) == 0


def test_versioned_commit_retry_after_crash(spark, tmp_path):
    """A crash between the data write and the log write leaves an
    orphan commit dir with NO log entry; the retried commit must
    succeed (clearing the orphan) and readers never see the half
    state."""
    import os
    import shutil

    from activedatawarehouseprototype_spark.operators import versioned as V

    vt = _vt(spark, tmp_path, "t7")
    vt.commit(spark.range(3).toDF("id"), ts=1.0)
    # simulate the crash: write version 1's data dir, no log entry
    orphan = os.path.join(vt.path, "data", "c00000001")
    spark.range(100, 105).toDF("id").write.parquet(orphan)
    assert vt.latest_version() == 0  # reader: half-commit invisible
    assert vt.read().count() == 3
    # the retry (same version number) succeeds
    v = vt.commit(spark.range(3, 6).toDF("id"), ts=2.0)
    assert v == 1
    assert {r.id for r in vt.read().collect()} == {0, 1, 2, 3, 4, 5}


def test_versioned_schema_diff(spark, tmp_path):
    from activedatawarehouseprototype_spark.operators import versioned as V

    vt = _vt(spark, tmp_path, "t8")
    vt.commit(
        spark.range(2).selectExpr("id", "CAST(id AS STRING) AS name"),
        mode="overwrite", ts=1.0,
    )
    vt.commit(
        spark.range(2).selectExpr(
            "CAST(id AS INT) AS id", "id * 1.0 AS score"
        ),
        mode="overwrite", ts=2.0,
    )
    d = V.schema_diff(vt, 0, 1)
    assert [n for n, _ in d["added"]] == ["score"]
    assert [n for n, _ in d["removed"]] == ["name"]
    assert [n for n, *_ in d["changed"]] == ["id"]  # long -> int


def test_join_mv_cdc_update_maintenance(spark, tmp_path):
    """Join MV stays equal to the direct join after LEFT-side updates
    and inserts applied via the CDC changelog (retract pre-image rows,
    add post-image joins) — incremental view maintenance beyond
    append-only."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        apply_cdc_to_join_mv,
        incremental_join_mv,
        merge_upsert_cdc,
    )

    base = str(tmp_path / "jmv2")
    L0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 10, "c")],
        "pk bigint, k bigint, lval string",
    )
    R0 = spark.createDataFrame(
        [(10, 1.0), (20, 2.0)], "k bigint, rval double"
    )
    incremental_join_mv(spark, base, ["k"], left_batch=L0, right_batch=R0)

    # updates: pk 1 moves to join key 20; pk 4 inserted at key 10;
    # pk 2 re-delivered identically (no changelog rows)
    left_tbl = str(tmp_path / "left_tbl")
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 10, "c")],
        "pk bigint, k bigint, lval string",
    ).write.parquet(left_tbl)
    updates = spark.createDataFrame(
        [(1, 20, "a2"), (2, 20, "b"), (4, 10, "d")],
        "pk bigint, k bigint, lval string",
    )
    log = merge_upsert_cdc(spark, left_tbl, updates, ["pk"])
    mv = apply_cdc_to_join_mv(spark, base, ["k"], log, ["pk"], side="left")

    got = {(r.pk, r.k, r.lval, r.rval) for r in mv.collect()}
    direct = {
        (r.pk, r.k, r.lval, r.rval)
        for r in spark.read.parquet(left_tbl).join(R0, "k").collect()
    }
    assert got == direct and (1, 20, "a2", 2.0) in got
    # and a later RIGHT delta joins against the PATCHED left snapshot
    mv2 = incremental_join_mv(
        spark, base, ["k"],
        right_batch=spark.createDataFrame([(10, 9.0)], "k bigint, rval double"),
    )
    got2 = {(r.pk, r.k, r.lval, r.rval) for r in mv2.collect()}
    assert (4, 10, "d", 9.0) in got2 and (3, 10, "c", 9.0) in got2
    assert (1, 10, "a", 9.0) not in got2  # pre-image left row is gone


def test_join_mv_cdc_right_side_updates(spark, tmp_path):
    """Symmetric case: RIGHT-side updates retract and re-add through
    the same machinery with side='right'."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        apply_cdc_to_join_mv,
        incremental_join_mv,
        merge_upsert_cdc,
    )

    base = str(tmp_path / "jmv3")
    L0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "pk bigint, k bigint, lval string"
    )
    R0 = spark.createDataFrame(
        [(100, 10, 1.0), (200, 20, 2.0)], "rpk bigint, k bigint, rval double"
    )
    incremental_join_mv(spark, base, ["k"], left_batch=L0, right_batch=R0)

    right_tbl = str(tmp_path / "right_tbl")
    R0.write.parquet(right_tbl)
    updates = spark.createDataFrame(
        [(100, 20, 1.5), (300, 10, 3.0)], "rpk bigint, k bigint, rval double"
    )
    log = merge_upsert_cdc(spark, right_tbl, updates, ["rpk"])
    mv = apply_cdc_to_join_mv(spark, base, ["k"], log, ["rpk"], side="right")
    got = {(r.pk, r.rpk, r.k) for r in mv.collect()}
    direct = {
        (r.pk, r.rpk, r.k)
        for r in L0.join(spark.read.parquet(right_tbl), "k").collect()
    }
    assert got == direct
    assert (2, 100, 20) in got and (1, 300, 10) in got
    assert (1, 100, 10) not in got  # retracted pre-image


def test_incremental_agg_mv_marker_is_atomic_with_data(spark, tmp_path):
    """The batch-id marker rides the same atomic rename as the merged
    data: after a successful merge the marker is INSIDE the MV dir, so
    the crash window between 'data swapped' and 'marker written' that
    would double-apply a replayed batch does not exist."""
    import os

    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_agg_mv,
    )

    mv = str(tmp_path / "mv_atomic")
    batch = spark.createDataFrame([("k", 1.0), ("k", 2.0)], "k string, value double")
    incremental_agg_mv(spark, mv, batch, ["k"], "value", batch_id=0)
    assert os.path.exists(os.path.join(mv, "_mv_meta.json"))
    row = spark.read.parquet(mv).collect()[0]
    assert (row["n"], row["total"]) == (2, 3.0)
    # replay of batch 0 is a no-op
    incremental_agg_mv(spark, mv, batch, ["k"], "value", batch_id=0)
    row = spark.read.parquet(mv).collect()[0]
    assert (row["n"], row["total"]) == (2, 3.0)
    # next batch applies once
    incremental_agg_mv(
        spark, mv,
        spark.createDataFrame([("k", 4.0)], "k string, value double"),
        ["k"], "value", batch_id=1,
    )
    row = spark.read.parquet(mv).collect()[0]
    assert (row["n"], row["total"]) == (3, 7.0)


def test_join_mv_partial_replay_after_crash(spark, tmp_path):
    """Crash between the MV commit and the input commits: the replay
    must commit ONLY the missing components — the MV delta is not
    re-applied (its marker exists) and the inputs arrive exactly
    once."""
    from activedatawarehouseprototype_spark.operators import versioned as V
    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_join_mv,
    )

    base = str(tmp_path / "jmv4")
    L0 = spark.createDataFrame([(1, "a")], "k bigint, lval string")
    R0 = spark.createDataFrame([(1, 1.0)], "k bigint, rval double")
    incremental_join_mv(spark, base, ["k"], left_batch=L0, right_batch=R0,
                        batch_id=0)

    # simulate the crash for batch 1: MV delta committed WITH marker,
    # left/right commits lost
    L1 = spark.createDataFrame([(2, "b")], "k bigint, lval string")
    R1 = spark.createDataFrame([(2, 2.0)], "k bigint, rval double")
    V.VersionedTable(spark, f"{base}/mv").commit(
        L1.join(R1, ["k"]), mode="append", op="jmv-batch:1"
    )
    mv = incremental_join_mv(spark, base, ["k"], left_batch=L1,
                             right_batch=R1, batch_id=1)  # the replay
    got = sorted((r.k, r.lval, r.rval) for r in mv.collect())
    assert got == [(1, "a", 1.0), (2, "b", 2.0)]  # no duplicate delta
    # inputs arrived exactly once
    assert V.VersionedTable(spark, f"{base}/left").read().count() == 2
    assert V.VersionedTable(spark, f"{base}/right").read().count() == 2
    # and a full re-replay of batch 1 is a complete no-op
    mv2 = incremental_join_mv(spark, base, ["k"], left_batch=L1,
                              right_batch=R1, batch_id=1)
    assert mv2.count() == 2


def test_recover_swap_rolls_back_mid_swap_crash(spark, tmp_path):
    """Crash between os.replace(target, old) and os.replace(staging,
    target): the next entry must restore the last committed state and
    the interrupted batch must APPLY on replay (the rolled-back marker
    carries the previous batch id), not be skipped."""
    path = str(tmp_path / "mv")
    b0 = spark.createDataFrame([("a", 1.0), ("a", 3.0)], "k string, v double")
    warehouse.incremental_agg_mv(spark, path, b0, ["k"], "v", batch_id=0)

    # simulate the crash window of the batch-1 swap: staging fully
    # written, target renamed away, commit rename never happened
    b1 = spark.createDataFrame([("a", 5.0)], "k string, v double")
    staging = path + ".staging"
    b1.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    ).write.mode("overwrite").parquet(staging)
    os.replace(path, path + ".old")
    assert not os.path.exists(path)

    # replay of batch 1 recovers (rolls back to the committed batch-0
    # MV) and then applies batch 1 exactly once
    mv = warehouse.incremental_agg_mv(spark, path, b1, ["k"], "v", batch_id=1)
    row = mv.collect()[0]
    assert (row.n, row.total, row.mn, row.mx) == (3, 9.0, 1.0, 5.0)
    assert not os.path.exists(path + ".old")
    assert not os.path.exists(staging)


def test_recover_swap_clears_stale_old_dir(spark, tmp_path):
    """Crash after the commit rename but before rmtree(old): the stale
    non-empty .old must not wedge the next swap with ENOTEMPTY."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame([(1, 1.0)], "id long, v double")
    warehouse.merge_upsert(spark, path, base, ["id"])
    # plant the stale garbage a crash-after-commit leaves behind
    old = path + ".old"
    os.makedirs(old)
    with open(os.path.join(old, "leftover.parquet"), "w") as f:
        f.write("garbage")
    upd = spark.createDataFrame([(2, 2.0)], "id long, v double")
    warehouse.merge_upsert(spark, path, upd, ["id"])  # must not raise
    assert spark.read.parquet(path).count() == 2
    assert not os.path.exists(old)


def test_delete_where_null_predicate_retains_rows(spark, tmp_path):
    """ANSI DELETE semantics: rows whose predicate evaluates to NULL
    are retained, not erased (GDPR flow must not drop unrelated rows
    with NULLs in the predicate columns)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id long, tag string"
    )
    warehouse.merge_upsert(spark, path, df, ["id"])
    deleted = warehouse.delete_where(spark, path, "tag = 'x'")
    assert deleted == 1
    # id=2 (NULL tag → predicate NULL) survives
    assert {r.id for r in spark.read.parquet(path).collect()} == {2, 3}

    # same contract on the versioned table
    from activedatawarehouseprototype_spark.operators import versioned as V

    vt = V.VersionedTable(spark, str(tmp_path / "vt"))
    vt.commit(df, mode="overwrite", op="seed")
    V.delete_where(vt, "tag = 'x'")
    assert {r.id for r in vt.read().collect()} == {2, 3}


def test_zorder_key_bits_guard():
    import pytest

    with pytest.raises(ValueError, match="sign bit"):
        warehouse.zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 63
    # the documented maximum is fine
    warehouse.zorder_key(["a", "b", "c", "d"], bits=15)
    warehouse.zorder_key(["a"], bits=63)


@pytest.mark.slow
def test_join_mv_replay_idempotence_survives_vacuum(spark, tmp_path):
    """The batch-id watermark lives OUTSIDE the commit log, so
    vacuuming old versions (which destroys their jmv-batch markers)
    must not re-open old batches for replay — before the meta file, a
    replay of a vacuumed batch silently re-appended its delta."""
    from activedatawarehouseprototype_spark.operators import versioned as V
    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_join_mv,
    )

    base = str(tmp_path / "jmv_vac")
    for b in range(4):
        L = spark.createDataFrame([(b, f"l{b}")], "k bigint, lval string")
        R = spark.createDataFrame([(b, float(b))], "k bigint, rval double")
        incremental_join_mv(
            spark, base, ["k"], left_batch=L, right_batch=R, batch_id=b
        )
    mv = V.VersionedTable(spark, f"{base}/mv")
    n_before = mv.read().count()
    assert n_before == 4
    # vacuum every table down to the latest version: all old log
    # entries (and their markers) are gone
    for side in ("mv", "left", "right"):
        V.VersionedTable(spark, f"{base}/{side}").vacuum(retain_last=1)
    # replay an OLD batch: still a no-op
    L0 = spark.createDataFrame([(0, "l0")], "k bigint, lval string")
    R0 = spark.createDataFrame([(0, 0.0)], "k bigint, rval double")
    incremental_join_mv(
        spark, base, ["k"], left_batch=L0, right_batch=R0, batch_id=0
    )
    assert mv.read().count() == n_before
    assert V.VersionedTable(spark, f"{base}/left").read().count() == 4


def test_jmv_vacuum_closes_commit_meta_crash_window(spark, tmp_path):
    """Round-5 ADVICE: a crash AFTER a jmv commit but BEFORE its meta
    watermark write leaves the batch's only record in the log; a raw
    vacuum then destroys that marker and a replay re-appends the
    delta. jmv_vacuum must fold log markers into the meta watermark
    before dropping log entries, so the replay stays a no-op."""
    import glob
    import os as _os

    from activedatawarehouseprototype_spark.operators import versioned as V
    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_join_mv,
        jmv_vacuum,
    )

    base = str(tmp_path / "jmv_crash")
    for b in range(3):
        L = spark.createDataFrame([(b, f"l{b}")], "k bigint, lval string")
        R = spark.createDataFrame([(b, float(b))], "k bigint, rval double")
        incremental_join_mv(
            spark, base, ["k"], left_batch=L, right_batch=R, batch_id=b
        )
    # simulate the crash window: the commits (and their log markers)
    # exist but every meta watermark write was lost
    for mp in glob.glob(str(tmp_path / "jmv_crash" / "*_jmv_meta.json")):
        _os.remove(mp)

    jmv_vacuum(spark, base, retain_last=1)

    mv = V.VersionedTable(spark, f"{base}/mv")
    n_before = mv.read().count()
    assert n_before == 3
    # replay the newest batch (the one whose marker a raw vacuum
    # would have destroyed): must be a no-op
    L2 = spark.createDataFrame([(2, "l2")], "k bigint, lval string")
    R2 = spark.createDataFrame([(2, 2.0)], "k bigint, rval double")
    incremental_join_mv(
        spark, base, ["k"], left_batch=L2, right_batch=R2, batch_id=2
    )
    assert mv.read().count() == n_before
    assert V.VersionedTable(spark, f"{base}/left").read().count() == 3


def test_scd2_upsert_rejects_null_effective_ts(spark, tmp_path):
    """A NULL effective_ts row would silently vanish or duplicate
    through the full-outer presence logic — rejected loudly instead."""
    import datetime as dt

    import pytest as _pytest

    from activedatawarehouseprototype_spark.operators.warehouse import (
        scd2_upsert,
    )

    tgt = str(tmp_path / "scd2_null")
    ok = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1))],
        "k bigint, attr string, eff timestamp",
    )
    scd2_upsert(spark, tgt, ok, ["k"], ["attr"], "eff")
    bad = spark.createDataFrame(
        [(2, "b", None)], "k bigint, attr string, eff timestamp"
    )
    with _pytest.raises(ValueError, match="NULL eff"):
        scd2_upsert(spark, tgt, bad, ["k"], ["attr"], "eff")


def test_jmv_seed_marker_prevents_duplicate_seed_delta(spark, tmp_path):
    """Round-6 review finding 6: a dimension SEED that crashes between
    the MV commit and the right-side commit must not re-append the
    L_old ⋈ ΔR delta on retry — the named seed marker makes the MV
    commit detectable even though numbered left batches already
    advanced the MV watermark."""
    import shutil as _sh

    import pytest

    from activedatawarehouseprototype_spark.operators import versioned as V
    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_join_mv,
    )

    base = str(tmp_path / "jmv_seed")
    # left side accumulates first (numbered batches)
    for b in range(3):
        L = spark.createDataFrame([(b % 2, f"l{b}")], "k bigint, lval string")
        incremental_join_mv(spark, base, ["k"], left_batch=L, batch_id=b)
    R = spark.createDataFrame([(0, 1.0), (1, 2.0)], "k bigint, rval double")
    incremental_join_mv(spark, base, ["k"], right_batch=R,
                        seed_marker="jmv-seed")
    mv = V.VersionedTable(spark, f"{base}/mv")
    n = mv.read().count()
    assert n == 3  # every left row found its dim partner

    # simulate the crash window: the right-side commit is lost, the MV
    # commit (with its marker) survives
    _sh.rmtree(f"{base}/right")
    retry = incremental_join_mv(spark, base, ["k"], right_batch=R,
                                seed_marker="jmv-seed")
    assert mv.read().count() == n, "seed retry duplicated the MV delta"
    # and the retry completed the missing right-side state
    assert V.VersionedTable(spark, f"{base}/right").read().count() == 2
    assert retry.count() == n

    with pytest.raises(ValueError):
        incremental_join_mv(spark, base, ["k"], right_batch=R,
                            batch_id=9, seed_marker="x")


def test_jmv_verify_clean_corrupted_and_sampled(spark, tmp_path):
    """The anti-entropy checker: a freshly-maintained MV verifies
    consistent; a surgically corrupted MV (one row dropped, one row
    duplicated) reports exactly that as missing/extra; a key-hash
    sampled audit at fraction 1.0 equals the full audit, and a partial
    sample still finds the corruption iff its key is sampled."""
    from activedatawarehouseprototype_spark.operators.sampling import (
        hash_fraction,
    )
    from activedatawarehouseprototype_spark.operators.versioned import (
        VersionedTable,
    )
    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_join_mv,
        jmv_verify,
    )

    base = str(tmp_path / "jmv")
    L = spark.createDataFrame(
        [(k, f"l{k}") for k in range(20)], "k bigint, lval string"
    )
    R = spark.createDataFrame(
        [(k, float(k) * 2) for k in range(0, 20, 2)], "k bigint, rval double"
    )
    incremental_join_mv(spark, base, ["k"], right_batch=R)
    incremental_join_mv(spark, base, ["k"], left_batch=L, batch_id=0)

    clean = jmv_verify(spark, base, ["k"])
    assert clean["consistent"] and clean["mv_rows"] == clean["expected_rows"] == 10
    assert (clean["missing"], clean["extra"]) == (0, 0)

    # corrupt the MV: drop the k=4 row, duplicate the k=6 row
    vt_mv = VersionedTable(spark, f"{base}/mv")
    mv = vt_mv.read()
    corrupted = mv.filter("k != 4").unionByName(mv.filter("k = 6"))
    vt_mv.commit(corrupted, mode="overwrite", op="test-corruption")

    bad = jmv_verify(spark, base, ["k"])
    assert not bad["consistent"]
    assert (bad["missing"], bad["extra"]) == (1, 1)
    assert bad["mv_rows"] == 10  # 10 - 1 dropped + 1 duplicate

    # fraction 1.0 == full audit
    assert jmv_verify(spark, base, ["k"], sample_fraction=1.0) == bad

    # a partial audit is exact ON ITS SAMPLE: find a fraction that
    # includes k=4 but not k=6 (or vice versa) and assert one-sided
    import hashlib

    frac4 = int(hashlib.md5(b"v1:4").hexdigest()[:8], 16) / 2**32
    sampled = jmv_verify(
        spark, base, ["k"], sample_fraction=frac4 + 1e-9
    )
    assert sampled["missing"] >= 1  # k=4's shortfall is in the sample
    import pytest as _pytest

    with _pytest.raises(ValueError):
        jmv_verify(spark, base, ["k"], sample_fraction=0.0)


def test_compact_small_files_preserves_rows_and_reduces_files(spark, tmp_path):
    from activedatawarehouseprototype_spark.operators.warehouse import (
        compact_small_files,
    )

    path = str(tmp_path / "tiny")
    spark.range(0, 10_000).selectExpr("id", "id * 3 AS v").repartition(
        40
    ).write.parquet(path)
    before = spark.read.parquet(path)
    before_rows = before.count()
    before_sum = before.selectExpr("sum(v) AS s").collect()[0]["s"]
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 40
    res = compact_small_files(spark, path, target_bytes=64 << 20)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert after.selectExpr("sum(v) AS s").collect()[0]["s"] == before_sum
    assert n_after < n_before and n_after == res["output_files"]
    assert res["compacted"] == n_before and res["untouched"] == 0


def test_compact_small_files_leaves_big_files_alone(spark, tmp_path):
    """Files already >= target_bytes must be HARD-LINKED, not
    rewritten — same inode, zero IO."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        compact_small_files,
    )

    path = str(tmp_path / "mixed")
    spark.range(0, 200_000).selectExpr(
        "id", "repeat(CAST(id AS STRING), 8) AS pad"
    ).coalesce(1).write.parquet(path)
    big = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(big) == 1
    big_inode = os.stat(os.path.join(path, big[0])).st_ino
    big_size = os.path.getsize(os.path.join(path, big[0]))
    spark.range(0, 100).selectExpr(
        "id + 1000000 AS id", "CAST(id AS STRING) AS pad"
    ).repartition(6).write.mode("append").parquet(path)
    res = compact_small_files(
        spark, path, target_bytes=max(1024, big_size // 2)
    )
    assert res["untouched"] == 1 and res["compacted"] == 6
    assert os.stat(os.path.join(path, big[0])).st_ino == big_inode
    assert spark.read.parquet(path).count() == 200_100


def test_compact_small_files_noop_below_min_and_rejects_partitioned(
    spark, tmp_path
):
    from activedatawarehouseprototype_spark.operators.warehouse import (
        compact_small_files,
    )

    path = str(tmp_path / "one")
    spark.range(0, 10).coalesce(1).write.parquet(path)
    res = compact_small_files(spark, path, target_bytes=1 << 20)
    assert res == {"compacted": 0, "untouched": 1, "output_files": 0}

    part = str(tmp_path / "part")
    spark.range(0, 10).selectExpr("id", "id % 2 AS p").write.partitionBy(
        "p"
    ).parquet(part)
    with pytest.raises(ValueError, match="partitioned"):
        compact_small_files(spark, part, target_bytes=1 << 20)


def test_compact_small_files_then_update_skipping_index(spark, tmp_path):
    """The documented interplay: compaction staleness fails CLOSED and
    update_skipping_index repairs the manifest."""
    from activedatawarehouseprototype_spark.operators.skipping import (
        Pred,
        build_skipping_index,
        read_with_skipping,
        update_skipping_index,
    )
    from activedatawarehouseprototype_spark.operators.warehouse import (
        compact_small_files,
    )

    path = str(tmp_path / "skip")
    spark.range(0, 5_000).selectExpr("id", "id % 7 AS v").repartition(
        10
    ).write.parquet(path)
    build_skipping_index(spark, path, ["id"])
    compact_small_files(spark, path, target_bytes=64 << 20)
    with pytest.raises(RuntimeError, match="stale"):
        read_with_skipping(spark, path, [Pred("id", "<", 100)])
    update_skipping_index(spark, path)
    got = read_with_skipping(spark, path, [Pred("id", "<", 100)])
    assert got.count() == 100


def test_scd2_upsert_key_absent_from_batch_stays_open_once(spark, tmp_path):
    """Regression (round 8): a current version whose key receives NO
    update in a batch must stay open EXACTLY once. changed_pred
    evaluated over the absent update's NULLs is TRUE, so without the
    _up guard the row was both kept open AND 'closed' with a NULL
    valid_to — a duplicated, self-contradicting version pair."""
    target = str(tmp_path / "dim")
    b1 = spark.createDataFrame(
        [(1, "A", "2020-01-01"), (2, "B", "2020-01-01")],
        "k int, v string, eff_s string",
    ).selectExpr("k", "v", "CAST(eff_s AS TIMESTAMP) AS eff")
    warehouse.scd2_upsert(spark, target, b1, ["k"], ["v"], "eff")
    # batch 2 updates ONLY key 2; key 1 is absent
    b2 = spark.createDataFrame(
        [(2, "C", "2020-02-01")], "k int, v string, eff_s string"
    ).selectExpr("k", "v", "CAST(eff_s AS TIMESTAMP) AS eff")
    warehouse.scd2_upsert(spark, target, b2, ["k"], ["v"], "eff")
    rows = sorted(
        (r["k"], r["v"], str(r["valid_to"]), r["is_current"])
        for r in spark.read.parquet(target).collect()
    )
    assert rows == [
        (1, "A", "None", True),
        (2, "B", "2020-02-01 00:00:00", False),
        (2, "C", "None", True),
    ]
