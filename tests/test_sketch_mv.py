"""HLL sketch MV: merge-algebra exactness (range query from per-bucket
sketches == one-shot sketch), accuracy vs exact COUNT(DISTINCT),
replay idempotence, incremental-equals-rebuild, and partition pruning
on the bucket range."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.operators.sketch_mv import (
    hll_mv_append,
    hll_mv_build,
    hll_mv_distinct,
)

SF = "/root/testdata/sf0.001"
HOUR = 3_600_000


def _events(spark):
    return catalog.load(spark, SF, "events")


def _span(spark):
    row = (
        _events(spark)
        .agg(
            F.min(F.unix_millis("ts")).alias("lo"),
            F.max(F.unix_millis("ts")).alias("hi"),
        )
        .head()
    )
    return int(row["lo"]), int(row["hi"])


def test_range_estimate_equals_one_shot_sketch(spark, tmp_path):
    """Union of hourly sketches over [lo, mid) must estimate exactly
    what a single sketch built over the same slice estimates —
    register-wise max loses nothing to bucketing."""
    ev = _events(spark)
    p = str(tmp_path / "mv")
    hll_mv_build(ev, p, "user_id", bucket_ms=HOUR)
    lo, hi = _span(spark)
    mid = lo + ((hi - lo) // (2 * HOUR)) * HOUR  # bucket-aligned
    got = hll_mv_distinct(spark, p, start_ms=None, end_ms=mid).head()
    one_shot = (
        ev.filter(F.unix_millis("ts") < mid)
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
            ).cast("bigint")
        )
        .head()[0]
    )
    assert got["distinct_estimate"] == one_shot


def test_estimate_accuracy_vs_exact(spark, tmp_path):
    ev = _events(spark)
    p = str(tmp_path / "mv")
    hll_mv_build(ev, p, "user_id", bucket_ms=HOUR, group_cols=("event_type",))
    exact = {
        r["event_type"]: r["d"]
        for r in ev.filter("user_id is not null and ts is not null")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    got = hll_mv_distinct(spark, p, group_cols=("event_type",)).collect()
    assert {r["event_type"] for r in got} == set(exact)
    for r in got:
        e = exact[r["event_type"]]
        # lgk=12 => rse ~1.6%; allow 5% + slack for tiny groups
        assert abs(r["distinct_estimate"] - e) <= max(3, 0.05 * e), (
            r["event_type"], r["distinct_estimate"], e,
        )
    # n_rows rides along exactly
    n_exact = {
        r["event_type"]: r["n"]
        for r in ev.filter("user_id is not null and ts is not null")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["event_type"]: r["n_rows"] for r in got} == n_exact


@pytest.mark.slow
def test_append_replay_is_idempotent_and_matches_rebuild(spark, tmp_path):
    ev = _events(spark)
    lo, hi = _span(spark)
    cut = lo + ((hi - lo) // (2 * HOUR)) * HOUR
    first = ev.filter(F.unix_millis("ts") < cut)
    second = ev.filter(F.unix_millis("ts") >= cut)

    inc = str(tmp_path / "inc")
    hll_mv_build(first, inc, "user_id", bucket_ms=HOUR)
    hll_mv_append(spark, inc, second, "user_id", bucket_ms=HOUR, batch_id=1)
    # replay with the same batch_id: skipped by the marker watermark,
    # so BOTH gauges stay exactly-once
    hll_mv_append(spark, inc, second, "user_id", bucket_ms=HOUR, batch_id=1)

    full = str(tmp_path / "full")
    hll_mv_build(ev, full, "user_id", bucket_ms=HOUR)

    gi = hll_mv_distinct(spark, inc).head()
    gf = hll_mv_distinct(spark, full).head()
    assert gi["distinct_estimate"] == gf["distinct_estimate"]
    assert gi["n_rows"] == gf["n_rows"]


def test_unmarked_replay_keeps_estimate_but_overcounts_rows(spark, tmp_path):
    """Without a batch_id the sketch union is still a value no-op
    (distinct estimate unchanged) while n_rows double-counts — the
    documented contract split."""
    ev = _events(spark)
    lo, hi = _span(spark)
    cut = lo + ((hi - lo) // (2 * HOUR)) * HOUR
    first = ev.filter(F.unix_millis("ts") < cut)
    second = ev.filter(F.unix_millis("ts") >= cut)
    p = str(tmp_path / "mv")
    hll_mv_build(first, p, "user_id", bucket_ms=HOUR)
    hll_mv_append(spark, p, second, "user_id", bucket_ms=HOUR)
    once = hll_mv_distinct(spark, p).head()
    hll_mv_append(spark, p, second, "user_id", bucket_ms=HOUR)
    twice = hll_mv_distinct(spark, p).head()
    assert twice["distinct_estimate"] == once["distinct_estimate"]
    n2 = second.filter("user_id is not null and ts is not null").count()
    assert twice["n_rows"] == once["n_rows"] + n2


def test_bucket_range_scan_is_partition_pruned(spark, tmp_path):
    ev = _events(spark)
    p = str(tmp_path / "mv")
    hll_mv_build(ev, p, "user_id", bucket_ms=HOUR)
    lo, hi = _span(spark)
    q = hll_mv_distinct(spark, p, start_ms=lo, end_ms=lo + 2 * HOUR)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the pruned scan must reference the bucket bounds
    assert "bucket" in plan


def test_empty_range_is_zero_not_null(spark, tmp_path):
    ev = _events(spark)
    p = str(tmp_path / "mv")
    hll_mv_build(ev, p, "user_id", bucket_ms=HOUR)
    row = hll_mv_distinct(spark, p, start_ms=0, end_ms=1).head()
    assert (row["distinct_estimate"], row["n_rows"]) == (0, 0)
    # grouped form: zero touched buckets => zero rows
    pg = str(tmp_path / "mvg")
    hll_mv_build(ev, pg, "user_id", bucket_ms=HOUR, group_cols=("event_type",))
    assert (
        hll_mv_distinct(
            spark, pg, start_ms=0, end_ms=1, group_cols=("event_type",)
        ).count()
        == 0
    )


def test_rejects_bad_bucket(spark, tmp_path):
    with pytest.raises(ValueError):
        hll_mv_build(_events(spark), str(tmp_path / "x"), "user_id", bucket_ms=0)


def test_meta_write_is_atomic_no_tmp_left_and_valid_json(spark, tmp_path):
    """The watermark meta must be written via tmp + os.replace so a
    crash can never leave truncated JSON wedging every later append;
    verify the committed file parses and no .tmp residue remains."""
    import json
    import os

    ev = _events(spark)
    path = str(tmp_path / "mv")
    hll_mv_build(ev, path, "user_id", bucket_ms=HOUR)
    hll_mv_append(spark, path, ev.limit(10), "user_id", bucket_ms=HOUR, batch_id=7)
    meta = os.path.join(path, "_hll_mv_meta.json")
    with open(meta) as f:
        assert json.load(f)["watermark"] == 7
    assert not os.path.exists(meta + ".tmp")
    # and a PRE-EXISTING truncated meta (crash before this fix) must
    # surface as a clear error on the next append, not silent skip
    with open(meta, "w") as f:
        f.write('{"waterm')
    with pytest.raises(Exception):
        hll_mv_append(
            spark, path, ev.limit(10), "user_id", bucket_ms=HOUR, batch_id=8
        )


def test_set_estimates_match_exact_within_bounds(spark, tmp_path):
    """Union/intersection estimates from the MV's sketch algebra vs
    exact recomputes: |err| <= 5% of the respective exact (union bound
    for the intersection — the inclusion-exclusion contract)."""
    from activedatawarehouseprototype_spark.operators.sketch_mv import (
        hll_mv_set_estimates,
    )

    ev = _events(spark)
    path = str(tmp_path / "mv")
    hll_mv_build(ev, path, "user_id", bucket_ms=HOUR, group_cols=("event_type",))
    got = hll_mv_set_estimates(spark, path, "event_type", "click", "purchase").head()

    clicks = ev.filter("event_type = 'click' and user_id is not null")
    purch = ev.filter("event_type = 'purchase' and user_id is not null")
    ex_a = clicks.select("user_id").distinct().count()
    ex_b = purch.select("user_id").distinct().count()
    ex_u = clicks.select("user_id").union(purch.select("user_id")).distinct().count()
    ex_i = ex_a + ex_b - ex_u
    assert abs(got["est_a"] - ex_a) <= 0.05 * ex_a
    assert abs(got["est_b"] - ex_b) <= 0.05 * ex_b
    assert abs(got["est_union"] - ex_u) <= 0.05 * ex_u
    assert abs(got["est_intersection"] - ex_i) <= 0.05 * ex_u
    assert ex_i > 0  # non-vacuous: the fixture has cross-type users


def test_set_estimates_disjoint_and_identical_slices(spark, tmp_path):
    """Algebra sanity at the extremes: A vs A has intersection ~ |A|;
    two disjoint planted slices have intersection ~ 0."""
    from activedatawarehouseprototype_spark.operators.sketch_mv import (
        hll_mv_set_estimates,
    )
    from pyspark.sql import functions as F

    rows = spark.range(2000).select(
        F.when(F.col("id") < 1000, "g1").otherwise("g2").alias("g"),
        F.col("id").alias("user_id"),  # ids 0-999 vs 1000-1999: disjoint
        F.timestamp_millis(F.lit(0) + F.col("id")).alias("ts"),
    )
    path = str(tmp_path / "mv2")
    hll_mv_build(rows, path, "user_id", bucket_ms=HOUR, group_cols=("g",))
    d = hll_mv_set_estimates(spark, path, "g", "g1", "g2").head()
    assert abs(d["est_intersection"]) <= 0.05 * d["est_union"]
    s = hll_mv_set_estimates(spark, path, "g", "g1", "g1").head()
    assert s["est_union"] == s["est_a"]  # union with self is a no-op
    assert s["est_intersection"] == pytest.approx(s["est_a"], rel=1e-9)
