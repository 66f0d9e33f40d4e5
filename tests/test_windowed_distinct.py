"""Distinct-per-window: the streaming chained dedup+count must equal
the batch twin on in-watermark data (including cross-batch duplicate
suppression), the batch twin must match a DuckDB oracle, and the HLL
path must land within its error bound."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.streaming.windowed import (
    windowed_distinct_batch,
    windowed_distinct_stream,
)

SF = "/root/testdata/sf0.001"
HOUR = 3_600_000

ORACLE_SQL = """
SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_start_ms,
       event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_keys
FROM read_parquet('{sf}/events.parquet')
WHERE ts IS NOT NULL AND user_id IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def test_batch_twin_matches_duckdb_oracle(spark):
    ev = catalog.load(spark, SF, "events")
    got = [
        tuple(r)
        for r in windowed_distinct_batch(
            ev, "user_id", HOUR, group_cols=("event_type",)
        )
        .orderBy("window_start_ms", "event_type")
        .collect()
    ]
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(got) == len(want) > 0
    assert got == want


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 12, minute, second)


def _stream_rows(spark, tmp_path, batches):
    """Write each batch as its own file; maxFilesPerTrigger=1 replays
    them as separate micro-batches (mtimes pinned to the given order)."""
    import os
    import time

    schema = "user_id long, ts timestamp, event_type string"
    d = str(tmp_path / "ev")
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    # pin file order by first row's user_id marker per batch
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
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
        import os as _os

        _os.utime(f"{d}/{f}", (now + 10 * i, now + 10 * i))
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


def test_stream_equals_batch_twin_across_batches(spark, tmp_path):
    """User 10 appears in BOTH micro-batches inside one window — the
    cross-batch dedup state must count it once. Distinct batch markers:
    batch 0 min user_id=1, batch 1 min user_id=2."""
    win = 600_000  # 10 min
    batches = [
        [
            (1, _ts(0), "click"),
            (10, _ts(1), "click"),
            (10, _ts(2), "click"),  # in-batch dup
            (3, _ts(11), "view"),
        ],
        [
            (2, _ts(3), "click"),
            (10, _ts(4), "click"),  # cross-batch dup, same window
            (10, _ts(12), "click"),  # same user, NEXT window: counts
            (4, _ts(13), "view"),
            # watermark closer: append mode only emits windows the
            # watermark has PASSED, so push it beyond every real window
            (99, _ts(59), "closer"),
        ],
    ]
    batch_df, stream_df = _stream_rows(spark, tmp_path, batches)
    got = _run(
        spark,
        windowed_distinct_stream(
            stream_df,
            "user_id",
            win,
            group_cols=("event_type",),
            watermark="0 seconds",
        ),
        tmp_path,
        "wd_exact",
    )
    closer_ms = int(_ts(59).timestamp() * 1000)
    want = windowed_distinct_batch(
        batch_df, "user_id", win, group_cols=("event_type",)
    ).filter(F.col("window_start_ms") + win <= closer_ms)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # non-vacuous: the shared window's click count is 3 (users 1,2,10)
    w0 = {
        (r["window_start_ms"], r["event_type"]): r["distinct_keys"]
        for r in want.collect()
    }
    ms0 = int(_ts(0).timestamp() * 1000)
    assert w0[(ms0, "click")] == 3


def test_approximate_path_within_rsd(spark, tmp_path):
    ev = catalog.load(spark, SF, "events")
    exact = {
        r["window_start_ms"]: r["distinct_keys"]
        for r in windowed_distinct_batch(ev, "user_id", HOUR).collect()
    }
    # run the approximate STREAMING path over the fixture as one batch
    d = str(tmp_path / "evfix")
    ev.select("user_id", "ts", "event_type").write.parquet(d)
    stream = spark.readStream.schema(
        spark.read.parquet(d).schema
    ).parquet(d)
    got = _run(
        spark,
        windowed_distinct_stream(
            stream, "user_id", HOUR, watermark="0 seconds",
            approximate=True, rsd=0.02,
        ),
        tmp_path,
        "wd_approx",
    )
    rows = got.collect()
    # trailing window(s) past the final watermark never emit in append
    # mode; everything emitted must match its exact count within bound
    assert len(exact) >= len(rows) >= len(exact) - 2 and len(rows) > 0
    for r in rows:
        e = exact[r["window_start_ms"]]
        assert abs(r["distinct_keys"] - e) <= max(3, 0.1 * e), (
            r["window_start_ms"],
            r["distinct_keys"],
            e,
        )


def test_validation(spark):
    ev = catalog.load(spark, SF, "events")
    with pytest.raises(ValueError, match="window_ms"):
        windowed_distinct_batch(ev, "user_id", 0)
    with pytest.raises(ValueError, match="window_ms"):
        windowed_distinct_stream(ev, "user_id", -5)


def test_null_keys_and_ts_are_dropped(spark):
    schema = "user_id long, ts timestamp, event_type string"
    df = spark.createDataFrame(
        [
            (1, _ts(0), "a"),
            (None, _ts(0), "a"),
            (2, None, "a"),
        ],
        schema,
    )
    out = windowed_distinct_batch(df, "user_id", HOUR).collect()
    assert len(out) == 1 and out[0]["distinct_keys"] == 1
