"""Gopher-style composite quality rules: every rule must fire on a
planted row, the reason priority order must hold, the fixture pass
must match a DuckDB SQL twin cell-for-cell, and the plan must stay
shuffle-free (a quality pass at 100 TB is scan-bound or it's wrong)."""

from __future__ import annotations

import duckdb
import pytest

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.operators.text import (
    gopher_quality_flags,
)

SF = "/root/testdata/sf0.001"

# Each case: (text, kwargs overriding defaults, expected first_fail).
# Later-rule cases relax the earlier rules (min_words=1 etc.) so the
# rule under test is the first to fire.
CASES = [
    ("hello world", {}, "too_few_words"),
    (" ".join(["word"] * 10), {"min_words": 1, "max_words": 5}, "too_many_words"),
    (" ".join(["a"] * 60), {}, "word_len"),
    (" ".join(["word#"] * 60), {}, "symbol_ratio"),
    ("- item one\n- item two", {"min_words": 1}, "bullet_lines"),
    (
        "hello there friend...",
        {"min_words": 1, "max_symbol_ratio": 10.0},
        "ellipsis_lines",
    ),
    ("1234 5678 9999", {"min_words": 1}, "alpha_words"),
    ("word word word", {"min_words": 1}, "stopwords"),
    (
        " ".join(["the", "be", "to", "of", "and"] + ["word"] * 55),
        {},
        None,  # clean: every rule passes
    ),
]


@pytest.mark.parametrize("text,kwargs,expected", CASES)
def test_each_rule_fires_on_planted_row(spark, text, kwargs, expected):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = gopher_quality_flags(df, **kwargs).collect()[0]
    assert row["first_fail"] == expected
    assert row["keep"] == (expected is None)


def test_metrics_values_on_planted_row(spark):
    df = spark.createDataFrame(
        [(1, "the cat... sat\n- on a #mat")], "doc_id long, text string"
    )
    row = gopher_quality_flags(df, min_words=1).collect()[0]
    # tokens: the, cat..., sat\n-, on, a, #mat
    assert row["n_words"] == 6
    assert row["mean_word_len"] == pytest.approx(21 / 6)  # incl. \n
    assert row["symbol_ratio"] == pytest.approx(2 / 6)  # 1 '#' + 1 '...'
    assert row["bullet_line_frac"] == pytest.approx(1 / 2)
    assert row["ellipsis_line_frac"] == pytest.approx(0.0)  # mid-line only
    assert row["alpha_word_frac"] == pytest.approx(1.0)
    assert row["stopwords_present"] == 1  # 'the' ('a' not in GOPHER list)


# Fixture-tuned thresholds (documents are single-space word salad):
FIXTURE_KW = dict(min_words=20, stopwords=("the", "a"), min_stopwords_present=2)

ORACLE_SQL = """
WITH m AS (
  SELECT doc_id,
         string_split(text, ' ')    AS words,
         string_split(text, chr(10)) AS lines,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / CAST(nullif(len(string_split(text, ' ')), 0) AS DOUBLE)
           AS mean_word_len,
         CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS DOUBLE)
           / CAST(nullif(len(string_split(text, ' ')), 0) AS DOUBLE)
           AS symbol_ratio,
         CAST(len(list_filter(string_split(text, chr(10)),
                  l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) AS DOUBLE)
           / CAST(len(string_split(text, chr(10))) AS DOUBLE)
           AS bullet_line_frac,
         CAST(len(list_filter(string_split(text, chr(10)),
                  l -> rtrim(l) LIKE '%...')) AS DOUBLE)
           / CAST(len(string_split(text, chr(10))) AS DOUBLE)
           AS ellipsis_line_frac,
         CAST(len(list_filter(string_split(text, ' '),
                  w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
           / CAST(nullif(len(string_split(text, ' ')), 0) AS DOUBLE)
           AS alpha_word_frac,
         CAST(len(list_filter(['the', 'a'],
                  s -> list_contains(string_split(text, ' '), s))) AS BIGINT)
           AS stopwords_present
  FROM read_parquet('{sf}/documents.parquet')
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
       ellipsis_line_frac, alpha_word_frac, stopwords_present,
       CASE WHEN n_words < 20 THEN 'too_few_words'
            WHEN n_words > 100000 THEN 'too_many_words'
            WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_len'
            WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
            WHEN bullet_line_frac > 0.9 THEN 'bullet_lines'
            WHEN ellipsis_line_frac > 0.3 THEN 'ellipsis_lines'
            WHEN alpha_word_frac < 0.8 THEN 'alpha_words'
            WHEN stopwords_present < 2 THEN 'stopwords'
            ELSE NULL END AS first_fail,
       CASE WHEN n_words < 20 THEN 'too_few_words'
            WHEN n_words > 100000 THEN 'too_many_words'
            WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'word_len'
            WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
            WHEN bullet_line_frac > 0.9 THEN 'bullet_lines'
            WHEN ellipsis_line_frac > 0.3 THEN 'ellipsis_lines'
            WHEN alpha_word_frac < 0.8 THEN 'alpha_words'
            WHEN stopwords_present < 2 THEN 'stopwords'
            ELSE NULL END IS NULL AS keep
FROM m ORDER BY doc_id
"""


def test_fixture_pass_matches_duckdb_oracle(spark):
    docs = catalog.load(spark, SF, "documents")
    got = (
        gopher_quality_flags(docs, **FIXTURE_KW)
        .orderBy("doc_id")
        .collect()
    )
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert tuple(g) == w, f"doc {g['doc_id']}: {tuple(g)} != {w}"
    # non-vacuous: both kept docs and >=2 distinct failure reasons
    reasons = {g["first_fail"] for g in got}
    assert None in reasons and len(reasons - {None}) >= 2


def test_plan_is_shuffle_free(spark):
    docs = catalog.load(spark, SF, "documents")
    plan = (
        gopher_quality_flags(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
