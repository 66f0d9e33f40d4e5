"""Per-key EWMA: the recurrence vs a naive Python interpreter on the
fixture, a DuckDB ``list_reduce`` twin for the per-key final fold
(ORACLE_SQL — queued for round-7 driver registration as
``ewma_final_by_user``), and NULL/tie/alpha edge semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.operators.timeseries import ewma

SF = "/root/testdata/sf0.001"
ALPHA = 0.25

# Per-key FINAL smoothed value + observation count. The fold expression
# acc*(1-a) + a*x is written IDENTICALLY to the operator's inner loop,
# over the identical (ts, event_id) order, so only the final ROUND is
# needed to absorb engine formatting.
ORACLE_SQL = """
WITH ordered AS (
  SELECT user_id, value
  FROM read_parquet('{sf}/events.parquet')
  WHERE value IS NOT NULL
  ORDER BY user_id, epoch_ms(ts), event_id
),
folded AS (
  SELECT user_id,
         list(value) AS xs
  FROM ordered GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(len(xs) AS BIGINT) AS n_obs,
       ROUND(list_reduce(xs, (acc, x) -> acc * 0.75 + 0.25 * x), 6)
         AS ewma_final
FROM folded ORDER BY user_id
"""


def _events(spark):
    return catalog.load(spark, SF, "events")


def test_recurrence_matches_naive_interpreter(spark):
    """Every per-row EWMA equals the hand fold over the same order."""
    rows = (
        _events(spark)
        .select("user_id", F.unix_millis("ts").alias("ms"), "value", "event_id")
        .filter("value is not null")
        .collect()
    )
    series = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ms"], r["event_id"])):
        series.setdefault(r["user_id"], []).append((r["ms"], r["value"]))
    want = {}
    for k, xs in series.items():
        acc = xs[0][1]
        out = [acc]
        for _, x in xs[1:]:
            acc = acc * 0.75 + 0.25 * x
            out.append(acc)
        want[k] = out

    got = ewma(
        _events(spark), "user_id", "ts", "value", alpha=ALPHA, tie_col="event_id"
    ).collect()
    got_series = {}
    for r in sorted(got, key=lambda r: (r["key"], r["seq"])):
        got_series.setdefault(r["key"], []).append(r["ewma"])
    assert set(got_series) == set(want)
    for k in want:
        assert got_series[k] == pytest.approx(want[k], rel=1e-12), k


def test_final_fold_matches_duckdb_oracle(spark):
    out = ewma(
        _events(spark), "user_id", "ts", "value", alpha=ALPHA, tie_col="event_id"
    )
    w_last = (
        out.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.round(F.max_by("ewma", "seq"), 6).alias("ewma_final"),
        )
        .orderBy("key")
        .collect()
    )
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(w_last) == len(want) > 0
    for g, (uid, n, fin) in zip(w_last, want):
        assert (g["key"], g["n_obs"]) == (uid, n)
        assert g["ewma_final"] == pytest.approx(fin, abs=1e-9), uid


def test_null_values_are_skipped_not_poisoning(spark):
    df = spark.createDataFrame(
        [(1, 1000, 10.0, 1), (1, 2000, None, 2), (1, 3000, 20.0, 3)],
        "user_id bigint, ms bigint, value double, event_id bigint",
    ).select(
        "user_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        "value",
        "event_id",
    )
    got = sorted(
        ewma(df, "user_id", "ts", "value", alpha=0.5, tie_col="event_id").collect(),
        key=lambda r: r["ts_ms"],
    )
    assert [r["ts_ms"] for r in got] == [1000, 3000]
    assert got[0]["ewma"] == 10.0
    assert got[1]["ewma"] == pytest.approx(15.0)


def test_null_timestamps_are_dropped(spark):
    """A NULL ts has no fold position; it must be excluded, not crash
    the bigint cast or perturb neighbors."""
    df = spark.createDataFrame(
        [(1, 1000, 10.0, 1), (1, None, 99.0, 2), (1, 3000, 20.0, 3)],
        "user_id bigint, ms bigint, value double, event_id bigint",
    ).select(
        "user_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        "value",
        "event_id",
    )
    got = sorted(
        ewma(df, "user_id", "ts", "value", alpha=0.5, tie_col="event_id").collect(),
        key=lambda r: r["seq"],
    )
    assert [r["ts_ms"] for r in got] == [1000, 3000]
    assert got[1]["ewma"] == pytest.approx(15.0)


def test_same_ts_ties_resolve_by_tie_col(spark):
    df = spark.createDataFrame(
        [(1, 1000, 100.0, 2), (1, 1000, 0.0, 1)],
        "user_id bigint, ms bigint, value double, event_id bigint",
    ).select(
        "user_id", F.timestamp_millis("ms").alias("ts"), "value", "event_id"
    )
    got = ewma(df, "user_id", "ts", "value", alpha=0.5, tie_col="event_id").collect()
    by_val = {r["value"]: r["ewma"] for r in got}
    assert by_val[0.0] == 0.0  # event_id=1 first: y_0 = x_0
    assert by_val[100.0] == pytest.approx(50.0)


def test_alpha_one_is_identity_and_bad_alpha_raises(spark):
    ev = _events(spark).limit(50)
    out = ewma(ev, "user_id", "ts", "value", alpha=1.0, tie_col="event_id")
    for r in out.collect():
        assert r["ewma"] == r["value"]
    with pytest.raises(ValueError):
        ewma(ev, "user_id", "ts", "value", alpha=0.0)
    with pytest.raises(ValueError):
        ewma(ev, "user_id", "ts", "value", alpha=1.5)


def test_one_shuffle_on_key(spark):
    from activedatawarehouseprototype_spark.plans.explain import exchange_count

    out = ewma(_events(spark), "user_id", "ts", "value", tie_col="event_id")
    assert exchange_count(out) == 1


def test_string_tie_col_orders_deterministically(spark):
    """A non-numeric tie column must keep its native type and still
    break same-ts ties (the round-6 bigint cast NULLed it out)."""
    df = spark.createDataFrame(
        [(1, 1000, 100.0, "b"), (1, 1000, 0.0, "a")],
        "user_id bigint, ms bigint, value double, event_id string",
    ).select(
        "user_id", F.timestamp_millis("ms").alias("ts"), "value", "event_id"
    )
    got = ewma(df, "user_id", "ts", "value", alpha=0.5, tie_col="event_id").collect()
    by_val = {r["value"]: r["ewma"] for r in got}
    assert by_val[0.0] == 0.0  # "a" sorts first: y_0 = x_0
    assert by_val[100.0] == pytest.approx(50.0)


def test_carry_across_arrow_batches_bit_exact(spark):
    """A key spanning consecutive Arrow batches must continue its
    recurrence exactly (the mapInPandas scan seeds the next batch with
    the carried accumulator). Forced by shrinking the Arrow batch size
    below one key's row count."""
    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        rows = [(1, 1000 * i, float((i * 37) % 101), i) for i in range(100)]
        rows += [(2, 1000 * i, float((i * 17) % 89), i) for i in range(50)]
        df = spark.createDataFrame(
            rows, "user_id bigint, ms bigint, value double, event_id bigint"
        ).select(
            "user_id", F.timestamp_millis("ms").alias("ts"), "value", "event_id"
        )
        got = ewma(df, "user_id", "ts", "value", alpha=0.25, tie_col="event_id")
        series = {}
        for r in sorted(got.collect(), key=lambda r: (r["key"], r["seq"])):
            series.setdefault(r["key"], []).append(r["ewma"])
        for k, xs in {1: range(100), 2: range(50)}.items():
            mod = 101 if k == 1 else 89
            mul = 37 if k == 1 else 17
            acc = None
            want = []
            for i in xs:
                v = float((i * mul) % mod)
                acc = v if acc is None else acc * 0.75 + 0.25 * v
                want.append(acc)
            assert series[k] == pytest.approx(want, rel=1e-12), k
        # seq must be globally consecutive per key despite batch splits
        seqs = sorted(r["seq"] for r in got.collect() if r["key"] == 1)
        assert seqs == list(range(100))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", before)


def test_null_keys_form_one_group(spark):
    """NULL keys are ONE group (GROUP BY semantics, matching the SQL
    twin) — pandas renders them NaN and naive NaN != NaN comparison
    would split every null row into its own segment."""
    df = spark.createDataFrame(
        [(None, 1000, 10.0, 1), (None, 2000, 20.0, 2), (1, 1000, 5.0, 3)],
        "user_id bigint, ms bigint, value double, event_id bigint",
    ).select(
        "user_id", F.timestamp_millis("ms").alias("ts"), "value", "event_id"
    )
    got = ewma(df, "user_id", "ts", "value", alpha=0.5, tie_col="event_id")
    nulls = sorted(
        (r for r in got.collect() if r["key"] is None), key=lambda r: r["seq"]
    )
    assert [r["seq"] for r in nulls] == [0, 1]
    assert nulls[1]["ewma"] == pytest.approx(15.0)  # 10 then (10+20)/2
