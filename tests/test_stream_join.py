"""Stream-stream interval join: the streaming result must equal the
batch twin on in-watermark data, the batch twin must equal a DuckDB SQL
oracle, and watermark eviction must drop (only) genuinely late rows."""

from __future__ import annotations

import os
import time

import duckdb
import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.streaming.stream_join import (
    interval_join_batch,
    stream_interval_join,
)

SF = "/root/testdata/sf0.001"

# Queued round-7 corpus entry: for every click, the purchases by the
# same user in the following hour. The oracle is plain SQL over the
# raw events table — the operator must be invisible relative to it.
CLICK_PURCHASE_SQL = """
SELECT c.user_id,
       c.event_id  AS click_id,
       p.event_id  AS purchase_id,
       p.value     AS purchase_value
FROM (SELECT * FROM read_parquet('{sf}/events.parquet')
      WHERE event_type = 'click') c
JOIN (SELECT * FROM read_parquet('{sf}/events.parquet')
      WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY 1, 2, 3
"""


def _click_purchase_spark(spark, sf_dir):
    ev = catalog.load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    j = interval_join_batch(
        clicks,
        purchases,
        on=["user_id"],
        lower_ms=0,
        upper_ms=3_600_000,
    )
    return j.select(
        "user_id",
        F.col("event_id_l").alias("click_id"),
        F.col("event_id_r").alias("purchase_id"),
        F.col("value_r").alias("purchase_value"),
    ).orderBy("user_id", "click_id", "purchase_id")


def test_batch_twin_matches_duckdb_oracle(spark):
    got = [tuple(r) for r in _click_purchase_spark(spark, SF).collect()]
    want = duckdb.sql(CLICK_PURCHASE_SQL.format(sf=SF)).fetchall()
    assert len(got) == len(want) > 0
    assert got == want


def _two_streams(spark, tmp_path, left_rows, right_rows):
    schema = "k long, ts timestamp, v double"
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    lb = spark.createDataFrame(left_rows, schema)
    rb = spark.createDataFrame(right_rows, schema)
    lb.coalesce(1).write.parquet(ldir)
    rb.coalesce(1).write.parquet(rdir)
    ls = spark.readStream.schema(lb.schema).parquet(ldir)
    rs = spark.readStream.schema(rb.schema).parquet(rdir)
    return lb, rb, ls, rs


def _ts(minute, second=0):
    from datetime import datetime

    return datetime(2024, 1, 1, 12, minute, second)


def _collect_stream(spark, out, tmp_path, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize("join_type", ["inner", "left_outer"])
def test_stream_equals_batch_twin(spark, tmp_path, join_type):
    left_rows = [
        (1, _ts(0), 1.0),
        (1, _ts(10), 2.0),
        (2, _ts(5), 3.0),
        (3, _ts(7), 4.0),  # no partner -> only in left_outer
    ]
    right_rows = [
        (1, _ts(1), 10.0),  # joins l(0) with band +-2min
        (1, _ts(11, 30), 20.0),  # joins l(10)
        (1, _ts(30), 30.0),  # out of band for every left row
        (2, _ts(4), 40.0),  # joins l(5) (negative side of the band)
    ]
    lb, rb, ls, rs = _two_streams(spark, tmp_path, left_rows, right_rows)
    kw = dict(
        on=["k"], lower_ms=-120_000, upper_ms=120_000, join_type=join_type
    )
    # tight watermarks so outer-side NULL rows flush in the no-data
    # batch availableNow runs after the last data batch
    got = _collect_stream(
        spark,
        stream_interval_join(
            ls, rs, left_watermark="0 seconds", right_watermark="0 seconds", **kw
        ),
        tmp_path,
        f"sj_{join_type}",
    )
    want = interval_join_batch(lb, rb, **kw)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.columns == want.columns
    n_want = {"inner": 3, "left_outer": 4}[join_type]
    assert want.count() == n_want  # non-vacuous, incl. the outer row


def test_collision_suffixing_and_key_coalesce(spark):
    left = spark.createDataFrame([(1, 5.0)], "k long, v double")
    right = spark.createDataFrame([(2, 6.0)], "k long, v double")
    lts = left.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    rts = right.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    out = interval_join_batch(
        lts, rts, on=["k"], lower_ms=0, upper_ms=0, join_type="full_outer"
    )
    assert set(out.columns) == {"k", "v_l", "ts_l", "v_r", "ts_r"}
    rows = {r["k"]: (r["v_l"], r["v_r"]) for r in out.collect()}
    assert rows == {1: (5.0, None), 2: (None, 6.0)}  # keys coalesced


def test_late_right_row_is_evicted_not_joined(spark, tmp_path):
    """Feed the right stream in three single-row files with a tight
    watermark. Spark's state cleanup is LAZY — removal runs at the END
    of a batch — so the contract under test is: a late row arriving
    after an intervening batch has evicted its would-be partners joins
    nothing, while the batch twin (which sees everything) keeps the
    pair. Sequence (maxFilesPerTrigger=1):

      batch 0: on-time 12:41 joins left 12:40; wm -> 12:39 at end
      batch 1: filler 12:50 (matches nothing); wm 12:39 now evicts
               left 12:00 (12:00 + 2min band < 12:39) at batch end
      batch 2: late 12:01 finds left state = {12:40} only -> no pair
    """
    schema = "k long, ts timestamp, v double"
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    lb = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(40), 2.0)], schema
    )
    lb.coalesce(1).write.parquet(ldir)
    # value -> position in the file-source's mtime order
    right_files = [
        (20.0, _ts(41)),  # on-time, joins l(40)
        (99.0, _ts(50)),  # filler: no match, advances the watermark
        (10.0, _ts(1)),  # late: partners already evicted
    ]
    for v, ts in right_files:
        spark.createDataFrame([(1, ts, v)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(rdir)
    # file source orders by modification time: pin the order above
    import duckdb as _dk

    now = time.time()
    for f in os.listdir(rdir):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(rdir, f)
        v = _dk.sql(f"SELECT v FROM read_parquet('{p}')").fetchone()[0]
        i = next(i for i, (fv, _) in enumerate(right_files) if fv == v)
        os.utime(p, (now + 10 * i, now + 10 * i))
    ls = spark.readStream.schema(lb.schema).parquet(ldir)
    rs = (
        spark.readStream.schema(lb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(rdir)
    )
    kw = dict(on=["k"], lower_ms=-120_000, upper_ms=120_000)
    out = stream_interval_join(
        ls,
        rs,
        right_watermark="1 minutes",
        left_watermark="1 minutes",
        **kw,
    )
    got = _collect_stream(spark, out, tmp_path, "sj_late").collect()
    vals = sorted(r["v_r"] for r in got)
    # batch twin sees both pairs; the stream must see only the on-time one
    rb_all = spark.read.parquet(rdir)
    assert interval_join_batch(lb, rb_all, **kw).count() == 2
    assert vals == [20.0]


def test_argument_validation(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "k long, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="equi-key"):
        interval_join_batch(df, df, on=[])
    with pytest.raises(ValueError, match="time columns"):
        interval_join_batch(df, df, on=["ts"])
    with pytest.raises(ValueError, match="empty band"):
        interval_join_batch(df, df, on=["k"], lower_ms=5, upper_ms=-5)
    with pytest.raises(ValueError, match="join_type"):
        interval_join_batch(df, df, on=["k"], join_type="cross")
    with pytest.raises(ValueError, match="streaming"):
        stream_interval_join(df, df, on=["k"])
