"""PSI/KL drift detection: hand-computed planted shifts, identity
(no-drift) behavior, out-of-range clamping, and a DuckDB oracle twin
on the fixture (the ``drift_psi_event_values`` corpus entry)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.operators.drift import psi_kl_drift

SF = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "side string, grp string, v double")


def _hand_psi_kl(ref, cur, bins, lo, hi, eps=1e-6):
    width = (hi - lo) / bins

    def binof(v):
        if width <= 0:
            return 0
        return min(max(int((v - lo) // width), 0), bins - 1)

    from collections import Counter

    rc, cc = Counter(binof(v) for v in ref), Counter(binof(v) for v in cur)
    psi = kl = 0.0
    for b in set(rc) | set(cc):
        r = rc.get(b, 0) / len(ref) + eps
        c = cc.get(b, 0) / len(cur) + eps
        psi += (c - r) * math.log(c / r)
        kl += c * math.log(c / r)
    return psi, kl


def test_identical_distributions_score_zero(spark):
    rows = [("r", "g", float(i % 10)) for i in range(100)]
    rows += [("c", "g", float(i % 10)) for i in range(100)]
    out = psi_kl_drift(
        _df(spark, rows),
        F.col("side") == "r",
        F.col("side") == "c",
        "v",
        ["grp"],
        bins=10,
    ).collect()
    assert len(out) == 1
    assert out[0]["psi"] == 0.0 and out[0]["kl"] == 0.0
    assert out[0]["n_ref"] == 100 and out[0]["n_cur"] == 100


def test_planted_shift_matches_hand_formula(spark):
    ref = [float(i % 10) for i in range(200)]
    cur = [float((i % 10) + (3 if i % 2 == 0 else 0)) for i in range(150)]
    rows = [("r", "g", v) for v in ref] + [("c", "g", v) for v in cur]
    out = psi_kl_drift(
        _df(spark, rows),
        F.col("side") == "r",
        F.col("side") == "c",
        "v",
        ["grp"],
        bins=5,
    ).collect()[0]
    want_psi, want_kl = _hand_psi_kl(ref, cur, 5, min(ref), max(ref))
    assert out["psi"] == pytest.approx(round(want_psi, 6), abs=1e-6)
    assert out["kl"] == pytest.approx(round(want_kl, 6), abs=1e-6)
    assert out["psi"] > 0.1  # reads as at least "drifting" (industry bands)


def test_out_of_range_current_mass_clamps_to_edge_bins(spark):
    """Current values beyond the reference [min, max] land in the
    extreme bins (not dropped) and inflate PSI."""
    rows = [("r", "g", float(v)) for v in range(10)]
    rows += [("c", "g", 1000.0)] * 10  # all far above the reference max
    out = psi_kl_drift(
        _df(spark, rows),
        F.col("side") == "r",
        F.col("side") == "c",
        "v",
        ["grp"],
        bins=5,
    ).collect()[0]
    assert out["n_cur"] == 10
    assert out["psi"] > 1.0


def test_groups_missing_a_side_are_absent(spark):
    rows = [("r", "only_ref", 1.0), ("c", "only_cur", 1.0), ("r", "both", 1.0),
            ("c", "both", 1.0)]
    out = psi_kl_drift(
        _df(spark, rows),
        F.col("side") == "r",
        F.col("side") == "c",
        "v",
        ["grp"],
    )
    assert [r["grp"] for r in out.collect()] == ["both"]


def test_constant_reference_degenerate_width(spark):
    """hi == lo: one bin; identical current scores 0, shifted current
    still registers via the clamp."""
    rows = [("r", "g", 5.0)] * 20 + [("c", "g", 5.0)] * 20
    out = psi_kl_drift(
        _df(spark, rows), F.col("side") == "r", F.col("side") == "c", "v", ["grp"]
    ).collect()[0]
    assert out["psi"] == 0.0


ORACLE_SQL = """
WITH src AS (
  SELECT event_type,
         CASE WHEN epoch_ms(ts) % 2 = 0 THEN 'r' ELSE 'c' END AS side,
         CAST(value AS DOUBLE) AS v
  FROM read_parquet('{sf}/events.parquet')
  WHERE value IS NOT NULL AND ts IS NOT NULL
),
geo AS (
  SELECT event_type, MIN(v) AS lo, MAX(v) AS hi
  FROM src WHERE side = 'r' GROUP BY event_type
),
binned AS (
  SELECT s.event_type, s.side,
         CAST(LEAST(GREATEST(
           CASE WHEN g.hi > g.lo
                THEN FLOOR((s.v - g.lo) / ((g.hi - g.lo) / 10.0))
                ELSE 0 END, 0), 9) AS INT) AS bin
  FROM src s JOIN geo g USING (event_type)
),
per_bin AS (
  SELECT event_type, bin,
         SUM(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS nr,
         SUM(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS nc
  FROM binned GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(nr) AS tr, SUM(nc) AS tc
  FROM per_bin GROUP BY 1
)
SELECT p.event_type,
       CAST(t.tr AS BIGINT) AS n_ref,
       CAST(t.tc AS BIGINT) AS n_cur,
       ROUND(SUM((nc / t.tc + 1e-6 - (nr / t.tr + 1e-6))
                 * LN((nc / t.tc + 1e-6) / (nr / t.tr + 1e-6))), 6) AS psi,
       ROUND(SUM((nc / t.tc + 1e-6)
                 * LN((nc / t.tc + 1e-6) / (nr / t.tr + 1e-6))), 6) AS kl
FROM per_bin p JOIN tot t USING (event_type)
WHERE t.tr > 0 AND t.tc > 0
GROUP BY 1, 2, 3
ORDER BY 1
"""


def test_fixture_matches_duckdb_oracle(spark):
    """The exact query the corpus entry registers: even/odd epoch-ms
    split of events as reference/current, per event_type."""
    ev = catalog.load(spark, SF, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    side = F.unix_millis("ts") % 2
    got = (
        psi_kl_drift(
            ev, side == 0, side == 1, "value", ["event_type"], bins=10
        )
        .orderBy("event_type")
        .collect()
    )
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["event_type"], g["n_ref"], g["n_cur"]) == w[:3]
        assert g["psi"] == pytest.approx(w[3], abs=2e-6)
        assert g["kl"] == pytest.approx(w[4], abs=2e-6)


def test_null_group_values_are_excluded_like_the_sql_twin(spark):
    """NULL group values have no slice (the joins are null-strict,
    matching the oracle's USING join) — pinned so it's a contract,
    not an accident. Coalesce a sentinel upstream to score them."""
    rows = [("r", None, 1.0)] * 60 + [("c", None, 9.0)] * 60
    rows += [("r", "g", 1.0)] * 60 + [("c", "g", 1.0)] * 60
    out = psi_kl_drift(
        _df(spark, rows), F.col("side") == "r", F.col("side") == "c", "v", ["grp"]
    )
    assert [r["grp"] for r in out.collect()] == ["g"]
