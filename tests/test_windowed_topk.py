"""Windowed top-k heavy hitters: the batch twin vs a DuckDB oracle
(ORACLE_SQL — queued for round-7 driver registration as
``windowed_topk_events``), the Misra-Gries streaming operator vs the
batch twin when capacity covers the cardinality (exact regime),
the MG guarantee under overflow (planted skew), and the late-row /
re-open guard."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.streaming.windowed import (
    windowed_topk_batch,
    windowed_topk_stream,
)

SF = "/root/testdata/sf0.001"
HOUR = 3_600_000

ORACLE_SQL = """
WITH c AS (
  SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
         event_type,
         CAST(user_id AS VARCHAR) AS key,
         COUNT(*) AS n
  FROM read_parquet('{sf}/events.parquet')
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT window_start_ms, event_type, key, CAST(n AS BIGINT) AS n,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY window_start_ms, event_type
                               ORDER BY n DESC, key ASC) AS rank
  FROM c
)
WHERE rank <= 5
ORDER BY window_start_ms, event_type, rank
"""


def test_batch_twin_matches_duckdb_oracle(spark):
    ev = catalog.load(spark, SF, "events")
    got = [
        tuple(r)
        for r in windowed_topk_batch(
            ev, "user_id", HOUR, k=5, group_cols=("event_type",)
        )
        .orderBy("window_start_ms", "event_type", "rank")
        .collect()
    ]
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(got) == len(want) > 0
    assert got == want


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second)


def _stream_from_batches(spark, tmp_path, batches, schema):
    import os
    import time

    d = str(tmp_path / "ev")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    now = time.time()
    for f in files:
        first = duckdb.sql(
            f"SELECT min(user_id) FROM read_parquet('{d}/{f}')"
        ).fetchone()[0]
        i = next(
            i
            for i, rows in enumerate(batches)
            if min(r[0] for r in rows) == first
        )
        os.utime(f"{d}/{f}", (now + 10 * i, now + 10 * i))
    batch_df = spark.read.parquet(d)
    stream_df = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return batch_df, stream_df


def _run(spark, out, tmp_path, name):
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


SCHEMA = "user_id long, ts timestamp, event_type string"


def test_stream_exact_regime_equals_batch_twin(spark, tmp_path):
    """Counts accumulate across micro-batches into one window; with
    capacity >= cardinality MG is exact, so emitted windows must equal
    the batch twin. Batch markers: min user_id 1 then 2."""
    win = 600_000
    batches = [
        [
            (1, _ts(0), "click"),
            (7, _ts(1), "click"),
            (7, _ts(2), "click"),
            (3, _ts(11), "view"),
        ],
        [
            (2, _ts(3), "click"),
            (7, _ts(4), "click"),  # cross-batch accumulation: 7 -> 3
            (7, _ts(12), "click"),  # next window
            (9, _ts(59), "closer"),  # watermark closer
        ],
    ]
    batch_df, stream_df = _stream_from_batches(spark, tmp_path, batches, SCHEMA)
    got = _run(
        spark,
        windowed_topk_stream(
            stream_df, "user_id", win, k=3, capacity=16, watermark="0 seconds"
        ),
        tmp_path,
        "wt_exact",
    )
    closer_ms = int(_ts(59).timestamp() * 1000)
    want = windowed_topk_batch(batch_df, "user_id", win, k=3).filter(
        F.col("window_start_ms") + win <= closer_ms
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # non-vacuous: window 0's winner is user 7 with count 3
    rows = {
        (r["window_start_ms"], r["rank"]): (r["key"], r["n"])
        for r in got.collect()
    }
    ms0 = int(_ts(0).timestamp() * 1000)
    assert rows[(ms0, 1)] == ("7", 3)


def test_planted_skew_survives_capacity_overflow(spark, tmp_path):
    """1000 rows in one hour window, one key carries 40%: with
    capacity=8 the heavy key must still rank 1 and its count may
    undercount by at most total/(capacity+1). The closer row sits in
    the NEXT hour so the final watermark passes the planted window."""
    win = HOUR
    rows = [(777, _ts(0, 0), "e")] * 400
    rows += [
        ((i % 300) + 1000, _ts(1 + (i % 8), i % 60), "e") for i in range(600)
    ]
    rows.append((9999, datetime(2024, 1, 1, 13, 59), "closer"))
    batch_df, stream_df = _stream_from_batches(
        spark, tmp_path, [rows], SCHEMA
    )
    got = _run(
        spark,
        windowed_topk_stream(
            stream_df, "user_id", win, k=3, capacity=8, watermark="0 seconds"
        ),
        tmp_path,
        "wt_skew",
    ).collect()
    ms0 = int(_ts(0).timestamp() * 1000)
    planted = [r for r in got if r["window_start_ms"] == ms0]
    assert planted, got
    top = min(planted, key=lambda r: r["rank"])
    assert top["key"] == "777"
    assert 400 - (1000 // 9) <= top["n"] <= 400


def test_validation_and_null_handling(spark):
    ev = catalog.load(spark, SF, "events")
    with pytest.raises(ValueError):
        windowed_topk_batch(ev, "user_id", 0)
    with pytest.raises(ValueError):
        windowed_topk_batch(ev, "user_id", HOUR, k=0)
    with pytest.raises(ValueError):
        windowed_topk_stream(ev, "user_id", HOUR, k=5, capacity=2)
    df = spark.createDataFrame(
        [(1, _ts(0), "a"), (None, _ts(0), "a"), (2, None, "a")], SCHEMA
    )
    out = windowed_topk_batch(df, "user_id", HOUR).collect()
    assert len(out) == 1 and out[0]["key"] == "1"


def test_transform_with_state_env_gap_documented():
    """Spark 4 ships transformWithStateInPandas (the successor arbitrary
    -state API), but its state-server protocol needs `google.protobuf`,
    which this sandbox lacks (verified: the TWS driver worker crashes
    with ImportError at query start). applyInPandasWithState is the
    supported stateful API here — windowed_topk_stream and the W1 path
    ride it. If protobuf appears in the env, this skip turns into a
    reminder to add a TWS-based twin."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf absent: transformWithStateInPandas "
                    "unavailable in this environment (documented gap)")
    raise AssertionError(
        "protobuf is now available — port a stateful operator to "
        "transformWithStateInPandas and drop this tripwire"
    )
