"""BM25 retrieval: hand-computable planted rankings, a cell-for-cell
DuckDB oracle on the fixture corpus (queued for round-7 driver
registration — ORACLE_SQL below is the ready-made twin), and plan
hygiene (no SortMergeJoin: every join side is broadcast-sized by
construction; the query-term filter prunes before the shuffle)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.operators.retrieval import bm25_topk
from activedatawarehouseprototype_spark.plans.explain import (
    sort_merge_join_count,
)

SF = "/root/testdata/sf0.001"

FIXTURE_QUERIES = [
    (1, "hash join"),
    (2, "window sort merge"),
    (3, "stream batch data"),
    (4, "zzzabsent spark"),  # one term misses the corpus entirely
]

ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM read_parquet('{sf}/documents.parquet')
),
lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM lens),
q(query_id, term) AS (VALUES
  (1, 'hash'), (1, 'join'),
  (2, 'window'), (2, 'sort'), (2, 'merge'),
  (3, 'stream'), (3, 'batch'), (3, 'data'),
  (4, 'zzzabsent'), (4, 'spark')
),
toks AS (SELECT doc_id, unnest(w) AS term FROM d),
posts AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks
  WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM posts GROUP BY term),
contrib AS (
  SELECT q.query_id, p.doc_id,
         LN((s.n - f.df + 0.5) / (f.df + 0.5) + 1.0)
         * (p.tf * 2.2)
           / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS c
  FROM posts p
  JOIN q ON q.term = p.term
  JOIN dfreq f ON f.term = p.term
  JOIN lens l ON l.doc_id = p.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT query_id, doc_id, ROUND(SUM(c), 6) AS score
  FROM contrib GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id, score
FROM scores
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id ASC) <= 10
ORDER BY query_id, score DESC, doc_id
"""


def _tiny(spark):
    rows = [
        (0, "rare common common filler filler"),
        (1, "rare rare rare common filler"),
        (2, "common common common common common"),
        (3, "filler filler filler filler filler"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_ranking_tf_and_idf(spark):
    """'rare' (df=2) outranks 'common' (df=3); within 'rare', tf=3
    beats tf=1 at equal dl."""
    out = bm25_topk(_tiny(spark), [(7, "rare")], k=4).collect()
    assert [r["doc_id"] for r in out] == [1, 0]  # tf=3 first, misses absent
    both = bm25_topk(_tiny(spark), [(7, "rare common")], k=4).collect()
    # doc 1: rare tf=3 + common tf=1 must outrank doc 2: common tf=5 only
    assert both[0]["doc_id"] == 1
    assert {r["doc_id"] for r in both} == {0, 1, 2}


def test_scores_match_hand_formula(spark):
    """One term, one doc: score == idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))."""
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_tiny(spark), [(1, "rare")], k=4).collect()
    }
    n, df = 4, 2
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    avgdl = 5.0
    for doc, tf in ((0, 1), (1, 3)):
        want = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * 5.0 / avgdl))
        assert out[doc] == pytest.approx(round(want, 6), abs=1e-9)


def test_absent_term_query_contributes_nothing(spark):
    """A query whose only term misses the corpus returns no rows; a
    mixed query scores exactly as if the missing term weren't there."""
    assert bm25_topk(_tiny(spark), [(1, "zzz")], k=3).count() == 0
    mixed = bm25_topk(_tiny(spark), [(1, "zzz rare")], k=3).collect()
    alone = bm25_topk(_tiny(spark), [(1, "rare")], k=3).collect()
    assert [(r["doc_id"], r["score"]) for r in mixed] == [
        (r["doc_id"], r["score"]) for r in alone
    ]


def test_fixture_topk_matches_duckdb_oracle(spark):
    docs = catalog.load(spark, SF, "documents")
    got = (
        bm25_topk(docs, FIXTURE_QUERIES, k=10)
        .orderBy("query_id", F.col("score").desc(), "doc_id")
        .collect()
    )
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["query_id"], g["doc_id"], g["score"]) == w
    # non-vacuous: queries 1-3 each filled their k; query 4's live term
    # ('spark', present in the corpus) still returns rows
    per_q = {}
    for g in got:
        per_q[g["query_id"]] = per_q.get(g["query_id"], 0) + 1
    assert per_q[1] == per_q[2] == per_q[3] == 10
    assert per_q[4] == 10


def test_topk_is_prefix_of_larger_k(spark):
    """k=3 must be exactly the first 3 rows of k=10 under the rank
    order (score DESC, doc_id ASC) — the top-k cut is a prefix, not a
    resample."""
    docs = catalog.load(spark, SF, "documents")

    def ranked(k):
        rows = bm25_topk(docs, FIXTURE_QUERIES, k=k).collect()
        out = {}
        for r in sorted(rows, key=lambda r: (r["query_id"], -r["score"], r["doc_id"])):
            out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
        return out

    top3, top10 = ranked(3), ranked(10)
    assert set(top3) == set(top10)
    for q, rows in top3.items():
        assert len(rows) <= 3
        assert rows == top10[q][: len(rows)]


def test_plan_no_sort_merge_join(spark):
    """Every join side is broadcast-sized (query terms, dfreq, 1-row
    stats): a SortMergeJoin would mean the corpus got shuffled for a
    KB-scale side."""
    docs = catalog.load(spark, SF, "documents")
    out = bm25_topk(docs, FIXTURE_QUERIES, k=5)
    assert sort_merge_join_count(out) == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_rejects_empty_queries(spark):
    docs = catalog.load(spark, SF, "documents")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, [(1, " ")])
