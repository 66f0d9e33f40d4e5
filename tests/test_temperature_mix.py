"""Temperature-based source mixing: rate math vs hand computation,
nesting/determinism of the md5 coin, tail up-sampling direction, and
the DuckDB oracle twin (``temperature_mix_by_lang`` corpus entry —
tau = 0.5 so the weight is sqrt(n), IEEE-correctly-rounded in BOTH
engines, keeping the rate bit-identical)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.operators.sampling import (
    temperature_mix_sample,
)

SF = "/root/testdata/sf0.001"


def _df(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((s, i))
            i += 1
    return spark.createDataFrame(rows, "src string, id bigint")


def test_tau_one_is_identity_rates(spark):
    """tau = 1: every source's rate is min(1, target/total) — with the
    default target (= total) nothing is filtered."""
    df = _df(spark, {"a": 400, "b": 100})
    out = temperature_mix_sample(df, "src", ["id"], tau=1.0)
    assert out.count() == 500


def test_low_tau_upsamples_tail_relatively(spark):
    """tau < 1 shifts mix toward the tail: the tail keeps (nearly) all
    rows while the head is thinned."""
    df = _df(spark, {"head": 3000, "tail": 100})
    out = temperature_mix_sample(df, "src", ["id"], tau=0.3)
    kept = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert kept["tail"] == 100  # rate clamped at 1.0
    assert kept["head"] < 3000  # head thinned
    # mixture moved toward uniform: tail share rose above its natural 100/3100
    assert kept["tail"] / (kept["tail"] + kept["head"]) > 100 / 3100


def test_rates_match_hand_formula(spark):
    sizes = {"a": 1000, "b": 100, "c": 10}
    df = _df(spark, sizes)
    tau = 0.5
    total = sum(sizes.values())
    z = sum(n**tau for n in sizes.values())
    out = temperature_mix_sample(df, "src", ["id"], tau=tau)
    kept = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    for s, n in sizes.items():
        rate = min(1.0, total * ((n**tau) / z) / n)
        # the md5 coin is uniform: kept/n within a loose binomial band
        assert kept.get(s, 0) / n == pytest.approx(rate, abs=0.15), s


def test_deterministic_and_nested(spark):
    df = _df(spark, {"a": 500, "b": 50})
    a = {r["id"] for r in temperature_mix_sample(df, "src", ["id"], tau=0.5).collect()}
    b = {r["id"] for r in temperature_mix_sample(df, "src", ["id"], tau=0.5).collect()}
    assert a == b  # same salt, same draw — no RNG
    # smaller target nests inside larger (same salt, lower rates)
    small = {
        r["id"]
        for r in temperature_mix_sample(
            df, "src", ["id"], tau=0.5, target_rows=200
        ).collect()
    }
    assert small <= a


def test_bad_tau_raises(spark):
    df = _df(spark, {"a": 10})
    with pytest.raises(ValueError):
        temperature_mix_sample(df, "src", ["id"], tau=0.0)
    with pytest.raises(ValueError):
        temperature_mix_sample(df, "src", ["id"], tau=1.5)


ORACLE_SQL = """
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
  FROM read_parquet('{sf}/documents.parquet') GROUP BY lang
),
z AS (SELECT SUM(SQRT(n)) AS z, SUM(n) AS total FROM counts),
rates AS (
  SELECT lang, LEAST(1.0, z.total * (SQRT(n) / z.z) / n) AS r
  FROM counts, z
),
f AS (
  SELECT d.lang, d.doc_id, d.n_chars,
         CAST(concat('0x',
              substr(md5('tm1:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) / 4294967296.0 AS frac
  FROM read_parquet('{sf}/documents.parquet') d
)
SELECT f.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM f JOIN rates USING (lang)
WHERE f.frac < rates.r
GROUP BY 1 ORDER BY 1
"""


def test_fixture_matches_duckdb_oracle(spark):
    docs = catalog.load(spark, SF, "documents")
    got = (
        temperature_mix_sample(docs, "lang", ["doc_id"], tau=0.5)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang")
        .collect()
    )
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(got) == len(want) > 0
    assert [tuple(r) for r in got] == want


def test_many_sources_broadcast_path_equals_when_chain(spark):
    """>64 sources switches to the broadcast rate join; the selection
    must be IDENTICAL to the few-sources CASE-chain path (same coin,
    same rates)."""
    rows = []
    i = 0
    for s in range(80):
        for _ in range(5 + s):
            rows.append((f"s{s}", i))
            i += 1
    df = spark.createDataFrame(rows, "src string, id bigint")
    many = {
        r["id"] for r in temperature_mix_sample(df, "src", ["id"], tau=0.5).collect()
    }
    # recompute by hand with the same formula and the same md5 coin
    import hashlib

    from collections import Counter

    counts = Counter(s for s, _ in rows)
    total = sum(counts.values())
    z = sum(n**0.5 for n in counts.values())
    rates = {s: min(1.0, total * ((n**0.5) / z) / n) for s, n in counts.items()}

    def frac(key):
        h = hashlib.md5(f"tm1:{key}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    want = {i for s, i in rows if frac(i) < rates[s]}
    assert many == want and len(want) > 0
