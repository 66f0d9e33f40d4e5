"""BM25 full-text retrieval over the document corpus — the ranking
primitive behind RAG candidate pull, benchmark-decontamination lookups,
and "find training docs about X" curation queries.

Okapi BM25 (Robertson et al., TREC-3, public) with the Lucene idf
variant ln((N - df + 0.5) / (df + 0.5) + 1), which is strictly
positive even when a term appears in more than half the corpus — the
classic formula goes negative there and breaks top-k intuition.

Spark-first shape, designed for the 100 TB corpus:

- ONE tokenize+explode pass over the documents; the broadcast literal
  query-term filter lands BEFORE the (doc, term) aggregation, so the
  only shuffled rows are occurrences of query terms — at 100 TB the
  shuffle is proportional to the match set, never the corpus.
- Corpus stats (N, avgdl) are a 1-row aggregate cross-joined back as a
  broadcast (the unigram-LM pattern, text.py:unigram_logprobs); per-
  term document frequencies are a tiny (≤ |query terms| rows) aggregate
  broadcast back. No SortMergeJoin anywhere (plan-asserted).
- Document length rides the explode (max over the group — constant per
  doc), so postings never join back to the corpus for dl.

The reference engine has no retrieval tier; this is part of the
training-data-pipeline surface the task brief mandates. Tokenization is
the corpus-wide single-space contract (text.py:32) so the DuckDB twin
(tests/test_retrieval.py ORACLE_SQL) reproduces scores exactly; the
final per-(query, doc) sum is ROUNDed to 6 decimals on both sides
(order-dependent double sum — the registry float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.text import tokens


def bm25_topk(
    docs: DataFrame,
    queries: "list[tuple[int, str]]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query by BM25: (query_id, doc_id, score)
    with score DESC, doc_id ASC rank order inside each query.

    ``queries`` is a control-plane literal list of (query_id, text) —
    the rules-as-data shape: a batch of thousands of queries still
    broadcasts in KB. Query terms are deduplicated per query (standard
    short-query BM25 drops the query-side tf saturation term).

    A query term absent from the corpus has no postings and simply
    contributes nothing; a query whose terms ALL miss returns no rows
    for that query_id.
    """
    if not queries:
        raise ValueError("bm25_topk: empty query list")
    spark = docs.sparkSession
    qpairs = sorted(
        {(int(qid), t) for qid, text in queries for t in text.split(" ") if t}
    )
    if not qpairs:
        raise ValueError("bm25_topk: no non-empty query terms")
    all_terms = sorted({t for _, t in qpairs})
    q_df = spark.createDataFrame(qpairs, "query_id bigint, term string")

    # one pass: dl rides the explode so postings never rejoin the corpus
    toks = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("_dl"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    posts = (
        toks.filter(F.col("term").isin(all_terms))  # prune BEFORE the shuffle
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"), F.max("_dl").alias("dl"))
    )

    # corpus stats: 1 row, broadcast back (N from ALL docs, not matches)
    stats = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.avg(F.size(tokens(F.col(text_col))).cast("bigint")).alias("_avgdl"),
    )
    # per-term document frequency: ≤ |query terms| rows, broadcast back
    dfreq = posts.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("_df"))

    idf = F.log(
        (F.col("_n") - F.col("_df") + F.lit(0.5)) / (F.col("_df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    )
    contrib = (
        posts.join(F.broadcast(q_df), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", id_col, (idf * tf_sat).alias("_c"))
    )
    scores = contrib.groupBy("query_id", id_col).agg(
        F.round(F.sum("_c"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )
