"""LLM-data-pipeline corpus: dedup (exact / n-gram Jaccard /
MinHash-LSH / SimHash), similarity search (brute-force + LSH-bucketed
ANN, blocked pairwise cosine), text analysis, and multimodal byte
plumbing — over the ``documents`` and ``embeddings`` tables.

The fixture corpus has no natural duplicates, so the dedup queries
plant deterministic ones INSIDE the query (a union of modified copies
of every k-th document) identically on both engines — results are
non-trivial and still oracle-checkable.

Every query here has a DuckDB oracle, including ``ann_lsh_bucket_topk``
(the deterministic sign-LSH buckets restate cleanly as SQL sign
expressions), ``ann_ivf_topk`` (centroids are deterministic seed rows,
so the oracle recomputes the same assignment) and
``multimodal_byte_stats`` (byte stats via DuckDB blob functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register
from activedatawarehouseprototype_spark.operators import dedup, multimodal, similarity
from activedatawarehouseprototype_spark.operators import text as T


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _load(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _load(spark, sf_dir, "embeddings")


# SQL snippets shared by the dedup oracles -------------------------------

_CORPUS_EXACT = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 97 = 0
"""

_CORPUS_NEAR = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' zz9' AS text
  FROM documents WHERE doc_id % 101 = 0
"""

# 5-gram shingles: with a small vocabulary, trigrams are near-uniform
# across documents (df ~ docs/space) and the inverted-index join goes
# quadratic; 5-grams are discriminative (production dedup uses 5-13
# grams). Same n on both sides — part of the operator contract.
_NGRAM = 5

_GRAMS = f"""
  SELECT doc_id, unnest(list_distinct(
           list_transform(generate_series(1, len(string_split(text, ' ')) - {_NGRAM - 1}),
             i -> {" || ' ' || ".join(f"string_split(text, ' ')[i+{j}]" for j in range(_NGRAM))})))
         AS shingle
  FROM corpus
  WHERE len(string_split(text, ' ')) >= {_NGRAM}
"""

# df cap (anti-skew; see operators/dedup.py module doc). Same constant
# on both sides — part of the operator contract.
_MAX_DOC_FREQ = 64

_GRAMS_CAPPED = f"""
grams_all AS ({_GRAMS}),
dfreq AS (SELECT shingle, COUNT(*) AS df_ FROM grams_all GROUP BY shingle),
grams AS (
  SELECT g.doc_id, g.shingle FROM grams_all g
  JOIN dfreq USING (shingle) WHERE df_ <= {_MAX_DOC_FREQ}
)
"""


def _exact_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = (
        d.filter(F.col("doc_id") % 97 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return d.unionByName(planted)


def _near_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 101 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
    )
    return d.unionByName(planted)


# --- Exact dedup: hash-groupBy on text ---


@register(
    "dedup_exact_text",
    oracle=f"""
WITH corpus AS ({_CORPUS_EXACT})
SELECT CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM corpus GROUP BY text HAVING COUNT(*) > 1
""",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_exact_corpus(spark, sf_dir), "doc_id", "text").select(
        "keeper_id", "n_copies"
    )


# --- Fingerprint dedup: case/punctuation-insensitive (normalize→md5);
# planted copies are UPPERCASED with a trailing '.' and still collide ---


@register(
    "dedup_fingerprint",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, UPPER(text) || '.' AS text
  FROM documents WHERE doc_id % 89 = 0
), fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                 ' +', ' ', 'g'))) AS fingerprint
  FROM corpus
)
SELECT fingerprint,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM fp GROUP BY fingerprint HAVING COUNT(*) > 1
""",
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = d.filter(F.col("doc_id") % 89 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit(".")).alias("text"),
    )
    corpus = d.unionByName(planted)
    return (
        corpus.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


# --- N-gram Jaccard near-dup pairs (inverted-index join, no all-pairs) ---


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH corpus AS ({_CORPUS_NEAR}),
{_GRAMS_CAPPED},
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM grams a JOIN grams b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY id_a, id_b
)
SELECT CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.6
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _near_corpus(spark, sf_dir),
        "doc_id",
        "text",
        n=_NGRAM,
        threshold=0.6,
        max_doc_freq=_MAX_DOC_FREQ,
    ).select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")


# --- Benchmark decontamination: containment of a benchmark doc's
# n-grams in training docs (the pre-training leak check). Bench = every
# 53rd doc; train = all docs (the full-copy leak, overlap 1.0) plus a
# 12-token truncation of each bench doc (partial leak — flagged only
# when it still covers >= half the bench doc's shingles). ---

@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 53 = 0),
train AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         array_to_string(string_split(text, ' ')[1:12], ' ') AS text
  FROM documents
  WHERE doc_id % 53 = 0 AND len(string_split(text, ' ')) >= 15
),
tg_all AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(generate_series(1, len(string_split(text, ' ')) - {_NGRAM - 1}),
             i -> {" || ' ' || ".join(f"string_split(text, ' ')[i+{j}]" for j in range(_NGRAM))})))
         AS shingle
  FROM train
  WHERE len(string_split(text, ' ')) >= {_NGRAM}
),
hot AS (
  SELECT shingle FROM (
    SELECT shingle, COUNT(*) AS df_ FROM tg_all GROUP BY shingle
  ) WHERE df_ > {_MAX_DOC_FREQ}
),
tg AS (SELECT * FROM tg_all WHERE shingle NOT IN (SELECT shingle FROM hot)),
bg_all AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(generate_series(1, len(string_split(text, ' ')) - {_NGRAM - 1}),
             i -> {" || ' ' || ".join(f"string_split(text, ' ')[i+{j}]" for j in range(_NGRAM))})))
         AS shingle
  FROM bench
  WHERE len(string_split(text, ' ')) >= {_NGRAM}
),
bg AS (SELECT * FROM bg_all WHERE shingle NOT IN (SELECT shingle FROM hot)),
bsz AS (SELECT doc_id, COUNT(*) AS n_bench FROM bg GROUP BY doc_id),
inter AS (
  SELECT t.doc_id AS train_id, b.doc_id AS bench_id, COUNT(*) AS n_inter
  FROM tg t JOIN bg b USING (shingle)
  GROUP BY 1, 2
)
SELECT CAST(train_id AS BIGINT) AS train_id,
       CAST(bench_id AS BIGINT) AS bench_id,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(bsz.n_bench AS BIGINT) AS n_bench,
       CAST(n_inter AS DOUBLE) / CAST(bsz.n_bench AS DOUBLE) AS overlap
FROM inter JOIN bsz ON bsz.doc_id = inter.bench_id
WHERE CAST(n_inter AS DOUBLE) / CAST(bsz.n_bench AS DOUBLE) >= 0.5
""",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 53 == 0)
    planted = bench.filter(F.size(F.split(F.col("text"), " ")) >= 15).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 12), " ").alias(
            "text"
        ),
    )
    train = d.unionByName(planted)
    return dedup.contamination_pairs(
        train,
        bench,
        "doc_id",
        "text",
        n=_NGRAM,
        threshold=0.5,
        max_doc_freq=_MAX_DOC_FREQ,
    )


# --- Winnowing (rolling-hash) fingerprint overlap: the MOSS local-
# fingerprinting family. Plant a PARTIAL copy (first 14 tokens of every
# 103rd doc + a junk tail) — whole-doc hashing misses it, but the
# shared 14-token run (>= w + k - 1 = 8) guarantees shared winnowed
# fingerprints. The oracle recomputes k-gram md5s, window-mins and the
# df-cap independently in DuckDB list SQL. ---

_WINNOW_W = 4  # window size over the k-gram hash sequence (k = _NGRAM)

_5GRAM_MD5 = "md5(" + " || ' ' || ".join(
    f"string_split(text, ' ')[i+{j}]" for j in range(1, _NGRAM + 1)
) + ")"


@register(
    "dedup_winnow_overlap",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id,
         array_to_string(string_split(text, ' ')[1:14], ' ')
           || ' qq1 qq2 qq3 qq4 qq5 qq6' AS text
  FROM documents
  WHERE doc_id % 103 = 0 AND len(string_split(text, ' ')) >= 20
),
h AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) < {_NGRAM} THEN []
              ELSE list_transform(
                  range(0, len(string_split(text, ' ')) - {_NGRAM - 1}),
                  i -> {_5GRAM_MD5})
         END AS hs
  FROM corpus
),
fp_arr AS (
  SELECT doc_id,
         CASE WHEN len(hs) <= 0 THEN []
              WHEN len(hs) < {_WINNOW_W} THEN [list_min(hs)]
              ELSE list_distinct(list_transform(
                  range(1, len(hs) - {_WINNOW_W - 2}),
                  i -> list_min(hs[i : i + {_WINNOW_W - 1}])))
         END AS fps
  FROM h
),
fps_all AS (SELECT doc_id, unnest(fps) AS fp FROM fp_arr),
hot AS (
  SELECT fp FROM (SELECT fp, COUNT(*) AS df_ FROM fps_all GROUP BY fp)
  WHERE df_ > {_MAX_DOC_FREQ}
),
fps AS (SELECT * FROM fps_all WHERE fp NOT IN (SELECT fp FROM hot)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM fps GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(n_shared AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) AS containment
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_shared AS DOUBLE) / CAST(LEAST(sa.n, sb.n) AS DOUBLE) >= 0.3
""",
)
def dedup_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    planted = d.filter(
        (F.col("doc_id") % 103 == 0) & (F.size(F.split("text", " ")) >= 20)
    ).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(F.split("text", " "), 1, 14), " "),
            F.lit(" qq1 qq2 qq3 qq4 qq5 qq6"),
        ).alias("text"),
    )
    return dedup.winnow_overlap_pairs(
        d.unionByName(planted),
        "doc_id",
        "text",
        k=_NGRAM,
        w=_WINNOW_W,
        threshold=0.3,
        max_doc_freq=_MAX_DOC_FREQ,
    )


# --- MinHash + LSH candidate pairs (the 100 TB dedup path) ---


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH corpus AS ({_CORPUS_NEAR}),
{_GRAMS_CAPPED},
mh AS (
  SELECT doc_id, s.i AS hash_idx,
         MIN(md5(CAST(s.i AS VARCHAR) || ':' || shingle)) AS minhash
  FROM grams, UNNEST(generate_series(0, 11)) AS s(i)
  GROUP BY doc_id, s.i
),
bands AS (
  SELECT doc_id, hash_idx // 4 AS band,
         md5(string_agg(minhash, ',' ORDER BY minhash)) AS band_sig
  FROM mh GROUP BY doc_id, band
)
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b
FROM bands a
JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
            AND a.doc_id < b.doc_id
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidates(
        _near_corpus(spark, sf_dir),
        "doc_id",
        "text",
        n=_NGRAM,
        k=12,
        bands=3,
        max_doc_freq=_MAX_DOC_FREQ,
    )


# --- Near-dup CLUSTERS: candidate pairs → connected components →
# keeper per component (the decision step of dedup). The oracle
# recomputes the same MinHash/LSH pairs and closes them transitively
# with a recursive CTE — fully independent of the iterative Spark
# label-propagation. ---


@register(
    "dedup_minhash_components",
    oracle=f"""
WITH RECURSIVE corpus AS ({_CORPUS_NEAR}),
{_GRAMS_CAPPED},
mh AS (
  SELECT doc_id, s.i AS hash_idx,
         MIN(md5(CAST(s.i AS VARCHAR) || ':' || shingle)) AS minhash
  FROM grams, UNNEST(generate_series(0, 11)) AS s(i)
  GROUP BY doc_id, s.i
),
bands AS (
  SELECT doc_id, hash_idx // 4 AS band,
         md5(string_agg(minhash, ',' ORDER BY minhash)) AS band_sig
  FROM mh GROUP BY doc_id, band
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a
)
SELECT CAST(a AS BIGINT) AS doc_id, CAST(MIN(b) AS BIGINT) AS component
FROM reach GROUP BY a
""",
)
def dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.lsh_candidates(
        _near_corpus(spark, sf_dir),
        "doc_id",
        "text",
        n=_NGRAM,
        k=12,
        bands=3,
        max_doc_freq=_MAX_DOC_FREQ,
    )
    comps = dedup.connected_components(pairs)
    return comps.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


# --- Deterministic train/val/test split (curation primitive): the
# split is a pure function of md5(salt:doc_id), so any engine assigns
# every document to the same split on every run — the property that
# keeps train/test contamination out of multi-tool pipelines. Exact
# totals (no rounding: counts + char sums). ---


@register(
    "sample_split_stats",
    oracle="""
WITH f AS (
  SELECT lang, length(text) AS lc,
         CAST(concat('0x', substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS frac
  FROM documents
)
SELECT CASE WHEN frac < 0.8 THEN 'train'
            WHEN frac < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(lc) AS BIGINT) AS total_chars
FROM f
GROUP BY split, lang
""",
)
def sample_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators import sampling

    d = _docs(spark, sf_dir)
    return (
        d.withColumn("split", sampling.assign_split(["doc_id"]))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        )
    )


# --- SimHash-16 collision groups ---

_SIMHASH_BITS_SQL = ",\n".join(
    f"SUM(CASE WHEN substr(h, {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s{j}"
    for j in range(16)
)
_SIMHASH_SIG_SQL = " || ".join(
    f"CASE WHEN s{j} > 0 THEN '1' ELSE '0' END" for j in range(16)
)


@register(
    "dedup_simhash16",
    oracle=f"""
WITH corpus AS ({_CORPUS_EXACT}),
toks AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM corpus
),
bits AS (
  SELECT doc_id, {_SIMHASH_BITS_SQL}
  FROM toks GROUP BY doc_id
),
sigs AS (SELECT doc_id, {_SIMHASH_SIG_SQL} AS simhash FROM bits)
SELECT simhash,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM sigs GROUP BY simhash HAVING COUNT(*) > 1
""",
)
def dedup_simhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup.simhash16(_exact_corpus(spark, sf_dir), "doc_id", "text")
    return (
        sigs.groupBy("simhash")
        .agg(F.min("sid").alias("keeper_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


# --- Brute-force ANN: top-10 cosine neighbors of vec_id 0 ---


@register(
    "ann_topk_cosine",
    oracle="""
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6)
           AS score
FROM embeddings
WHERE vec_id != 0
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # Parameter fetch (1 row) — the query vector is an input, not data
    # movement; at scale this is a broadcast of the query matrix.
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    return similarity.topk_brute_force(emb, qv, k=10, exclude_id=0)


# --- Blocked pairwise cosine histogram (IVF-style: pairs never cross
# the blocking key) ---


@register(
    "emb_blocked_cosine_hist",
    oracle="""
SELECT a.label AS label,
       CAST(FLOOR(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 20) AS INT)
           AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
GROUP BY a.label, bucket
""",
)
def emb_blocked_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = similarity.blocked_pairs_cosine(_emb(spark, sf_dir), "label")
    return pairs.groupBy(
        F.col("blk").alias("label"),
        F.floor(F.col("cos") * 20).cast("int").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# --- Text analysis: per-doc stats (pure codegen expressions) ---

_SW_SQL = "('" + "','".join(T.EN_STOPWORDS) + "')"


@register(
    "text_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len,
       CAST(len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL})) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
       LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) * 0.4
         + (1.0 - ABS(CAST(len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL})) AS DOUBLE)
                      / CAST(len(string_split(text, ' ')) AS DOUBLE) - 0.4)) * 0.3
         + LEAST(1.0, CAST(n_chars AS DOUBLE) / 500.0) * 0.3 AS quality
FROM documents
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(t).alias("token_count"),
        T.mean_token_len(t).alias("mean_token_len"),
        T.stopword_ratio(t).alias("stopword_ratio"),
        T.quality_score(t, F.col("n_chars")).alias("quality"),
    )


# --- Language-ID heuristic vs the fixture's lang label (confusion counts) ---


@register(
    "text_lang_id",
    oracle=f"""
SELECT lang,
       CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL})) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.08
            THEN 'en' ELSE 'und' END AS lang_guess,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents
GROUP BY lang, lang_guess
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.groupBy(
        "lang", T.lang_id(F.col("text")).alias("lang_guess")
    ).agg(F.count(F.lit(1)).alias("n"))


# --- Stratified (per-stratum rate) sampling: the corpus-mixing /
# source-re-weighting primitive; same md5-hash decision as the splits,
# so mixes are stable across runs and engines. ---


@register(
    "stratified_sample_by_lang",
    oracle="""
WITH f AS (
  SELECT lang,
         CAST(concat('0x', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS frac
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept
FROM f
WHERE frac < (CASE WHEN lang = 'en' THEN 0.5
                   WHEN lang = 'de' THEN 1.0
                   ELSE 0.2 END)
GROUP BY lang
""",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators import sampling

    d = _docs(spark, sf_dir)
    kept = sampling.stratified_sample(
        d, {"en": 0.5, "de": 1.0}, "lang", ["doc_id"],
        default_rate=0.2, salt="mix",
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


# --- int8 embedding quantization (4x storage/IO for the 100 TB
# embedding store): floor-form rounding (engine-identical on IEEE
# doubles), reconstruction MSE rounded 6dp (order-dependent sum). ---


@register(
    "emb_quantized_int8_stats",
    oracle="""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e
), q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CASE WHEN scale = 0.0 THEN 0
             ELSE CAST(FLOOR(x / scale + 0.5) AS INT) END) AS qv
  FROM s
)
SELECT vec_id,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       ROUND(list_sum(list_transform(range(1, len(v) + 1),
           i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale)))
           / len(v), 6) AS mse
FROM q
""",
)
def emb_quantized_int8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    qs = e.select("vec_id", "embedding", similarity.quantize_int8(F.col("embedding")).alias("qz"))
    v = similarity.as_double_array(F.col("embedding"))
    scale = F.col("qz.scale")
    qv = F.col("qz.q")
    err_sq = F.zip_with(
        v, qv, lambda x, qi: (x - qi.cast("double") * scale) * (x - qi.cast("double") * scale)
    )
    return qs.select(
        "vec_id",
        F.aggregate(qv, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.round(
            F.aggregate(err_sq, F.lit(0.0), lambda a, x: a + x) / F.size(v), 6
        ).alias("mse"),
    )


# --- Blocked fuzzy matching (entity resolution): same-(brand, type)
# part names within edit distance 3. Levenshtein with unit costs is
# engine-standard, so the distances compare exactly; the Spark side
# uses the thresholded variant (DP short-circuits past the bound).
# Blocking on two keys instead of one is the scale lever: pair count
# drops ~6x here while keeping tens of thousands of candidates. ---


@register(
    "fuzzy_part_name_pairs",
    oracle="""
SELECT a.p_brand AS brand,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_type = b.p_type
           AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
GROUP BY brand, dist
""",
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.dedup import fuzzy_pairs

    p = _load(spark, sf_dir, "part")
    pairs = fuzzy_pairs(
        p, ["p_brand", "p_type"], "p_partkey", "p_name", max_dist=3
    )
    return pairs.groupBy(
        F.col("p_brand").alias("brand"), F.col("dist").cast("int").alias("dist")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


# --- Sequence packing (docs → fixed-capacity context bins):
# shard-parallel start-bin packing, capacity 512 tokens. The oracle
# recomputes the sharding, the per-shard running totals, and the bin
# rule verbatim; per-bin totals are exact integer sums. ---


@register(
    "pack_sequences_stats",
    oracle="""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
         CAST(concat('0x', substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 16 AS shard
  FROM documents
), p AS (
  SELECT shard,
         (SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tok) // 512 AS bin,
         n_tok
  FROM t
)
SELECT shard, CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM p GROUP BY shard, bin
""",
)
def pack_sequences_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators import packing

    d = _docs(spark, sf_dir).select(
        "doc_id", T.token_count(F.col("text")).alias("n_tok")
    )
    packed = packing.pack_sequences(d, capacity=512, token_col="n_tok")
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    )


# --- Overlapping context-window chunking (docs → stride-overlapped
# token chunks, the other half of context shaping next to packing).
# Chunk 32 / overlap 8 → stride 24; the oracle recomputes chunk count,
# offsets, and the chunk text itself via lateral unnest. ---


@register(
    "chunk_documents_tokens",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
n AS (
  SELECT doc_id, t, len(t) AS n_tok,
         CASE WHEN len(t) <= 32 THEN 1
              ELSE (len(t) - 32 + 23) // 24 + 1 END AS nc
  FROM d WHERE len(t) > 0
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(t[i*24 + 1 : i*24 + 32], ' ') AS chunk_text,
       CAST(LEAST(32, n_tok - i*24) AS BIGINT) AS n_tokens
FROM n, UNNEST(range(0, nc)) AS u(i)
""",
)
def chunk_documents_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators import packing

    return packing.chunk_documents(
        _docs(spark, sf_dir), "doc_id", "text", chunk_tokens=32, overlap=8
    )


# --- Reason-coded quality filter (curation gate): the first failing
# rule names the drop reason; the CASE priority order is the contract,
# repeated verbatim in the oracle. ---


@register(
    "text_quality_filter",
    oracle=f"""
WITH r AS (
  SELECT length(text) AS lc,
         CASE WHEN len(string_split(text, ' ')) < 20 THEN 'too_short'
              WHEN n_chars > 450 THEN 'too_long'
              WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN {{SW}})) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) < 0.04 THEN 'low_stopword'
              ELSE 'kept' END AS reason
  FROM documents
)
SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(lc) AS BIGINT) AS total_chars
FROM r GROUP BY reason
""".replace("{SW}", _SW_SQL),
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    reason = F.coalesce(
        T.filter_reason(
            F.col("text"),
            F.col("n_chars"),
            min_tokens=20,
            max_chars=450,
            min_stopword_ratio=0.04,
        ),
        F.lit("kept"),
    )
    return (
        d.groupBy(reason.alias("reason"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        )
    )


# --- PII redaction (privacy scrub before data leaves curation):
# planted emails / IPv4s / phone tokens are replaced by typed tags and
# counted. PII_PATTERNS is the single source of truth — the oracle SQL
# interpolates the same regexes (ASCII \b and \d behave identically in
# Java regex and RE2) and replays the same replace order with 'g'. ---

_PII_PLANT = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact u' || CAST(doc_id AS VARCHAR)
                      || '@ex.com from 10.0.' || CAST(doc_id % 250 AS VARCHAR) || '.7'
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN ' call 555-867-5309' ELSE '' END AS text
  FROM documents
"""

_PII_REDACT_SQL = "text"
for _name, _pat, _repl in T.PII_PATTERNS:
    _PII_REDACT_SQL = (
        f"regexp_replace({_PII_REDACT_SQL}, '{_pat}', '{_repl}', 'g')"
    )

_PII_COUNT_SQL = ", ".join(
    f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
    for name, pat, _ in T.PII_PATTERNS
)


@register(
    "pii_redaction_scrub",
    oracle=f"""
WITH corpus AS ({_PII_PLANT})
SELECT doc_id,
       {_PII_REDACT_SQL} AS redacted,
       {_PII_COUNT_SQL}
FROM corpus
""",
)
def pii_redaction_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@ex.com from 10.0."),
                    (F.col("doc_id") % 250).cast("string"),
                    F.lit(".7"),
                ),
            ).otherwise(""),
            F.when(F.col("doc_id") % 13 == 0, " call 555-867-5309").otherwise(
                ""
            ),
        ).alias("text"),
    )
    return d.select(
        "doc_id",
        T.redact_pii(F.col("text")).alias("redacted"),
        *T.pii_counts(F.col("text")),
    )


# --- Intra-document repetition (boilerplate / degenerate-text signal):
# 1 - distinct/total word trigrams, exact IEEE division both sides. ---


@register(
    "text_repetition",
    oracle="""
WITH g AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) < 3 THEN []
              ELSE list_transform(
                  range(0, len(string_split(text, ' ')) - 2),
                  i -> string_split(text, ' ')[i + 1] || ' '
                    || string_split(text, ' ')[i + 2] || ' '
                    || string_split(text, ' ')[i + 3])
         END AS grams
  FROM documents
)
SELECT doc_id,
       CASE WHEN len(grams) <= 0 THEN 0.0
            ELSE 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                       / CAST(len(grams) AS DOUBLE) END AS rep_ratio
FROM g
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select(
        "doc_id", T.repeated_ngram_ratio("text", 3).alias("rep_ratio")
    )


# --- LSH-bucketed ANN (scale path). The oracle recomputes the
# deterministic sign-LSH bucket (md5-derived ±1 plane signs — pure
# math, reproducible in any engine) and the cosine within the query's
# bucket, independently in DuckDB list SQL. ---


@register(
    "ann_lsh_bucket_topk",
    oracle="""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         array_to_string(list_transform(range(0, 8), p ->
           CASE WHEN list_sum(list_transform(range(1, 65), d ->
                  v[d] * (CASE WHEN substr(md5(concat(p, ':', d)), 1, 1) >= '8'
                          THEN 1.0 ELSE -1.0 END))) > 0
           THEN '1' ELSE '0' END), '') AS bucket
  FROM embeddings
), q AS (SELECT bucket AS qbucket, v AS qv FROM b WHERE vec_id = 0)
SELECT b.vec_id, b.bucket,
       ROUND(list_cosine_similarity(b.v, q.qv), 6) AS score
FROM b, q
WHERE b.bucket = q.qbucket AND b.vec_id != 0
ORDER BY score DESC, vec_id ASC
LIMIT 5
""",
)
def ann_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    bucketed = emb.withColumn(
        "bucket", similarity.random_hyperplane_bucket(F.col("embedding"))
    )
    q = bucketed.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qbucket"),
        similarity.as_double_array(F.col("embedding")).alias("qv"),
    )
    cands = bucketed.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).filter(F.col("vec_id") != 0)
    scored = cands.select(
        "vec_id",
        "bucket",
        F.round(
            similarity.cosine(
                similarity.as_double_array(F.col("embedding")), F.col("qv")
            ),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(5)


# --- Embedding-cosine near-dup (semantic dedup): sign-LSH bucket
# restriction + thresholded cosine. Planted: scaled copies (x*1.5 —
# same bucket BY CONSTRUCTION since plane sums scale positively,
# cosine 1.0) and additively perturbed copies (x+0.02 — near-dup that
# may straddle a plane; whatever bucket it lands in, the oracle
# recomputes the identical assignment). ---


@register(
    "emb_near_dup_pairs",
    oracle="""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5) AS v
  FROM embeddings WHERE vec_id % 11 = 0
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.02) AS v
  FROM embeddings WHERE vec_id % 17 = 0
),
b AS (
  SELECT vec_id, v,
         array_to_string(list_transform(range(0, 8), p ->
           CASE WHEN list_sum(list_transform(range(1, 65), d ->
                  v[d] * (CASE WHEN substr(md5(concat(p, ':', d)), 1, 1) >= '8'
                          THEN 1.0 ELSE -1.0 END))) > 0
           THEN '1' ELSE '0' END), '') AS bucket
  FROM base
)
SELECT CAST(a.vec_id AS BIGINT) AS id_a,
       CAST(bb.vec_id AS BIGINT) AS id_b,
       a.bucket AS bucket,
       ROUND(list_cosine_similarity(a.v, bb.v), 6) AS score
FROM b a
JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
WHERE ROUND(list_cosine_similarity(a.v, bb.v), 6) >= 0.95
""",
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", similarity.as_double_array(F.col("embedding")).alias("v")
    )
    scaled = e.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x * F.lit(1.5)).alias("v"),
    )
    shifted = e.filter(F.col("vec_id") % 17 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.02)).alias("v"),
    )
    base = e.unionByName(scaled).unionByName(shifted)
    return similarity.embedding_near_dup_pairs(
        base, "vec_id", "v", n_planes=8, dim=64, threshold=0.95
    )


# --- IVF-flat ANN (the second scale path next to the LSH buckets):
# deterministic coarse quantizer (k lowest-id vectors as centroids),
# search probes only the query's cell. The oracle recomputes the
# assignment (min squared-L2, ties by centroid id) and the in-cell
# top-k independently. ---


@register(
    "ann_ivf_topk",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seeds AS (SELECT vec_id AS sid, v AS sv FROM e ORDER BY vec_id LIMIT 16),
dists AS (
  SELECT e.vec_id, s.sid,
         CAST(FLOOR(list_sum(list_transform(range(1, 65),
             d -> (e.v[d] - s.sv[d]) * (e.v[d] - s.sv[d]))) * 1e12) AS BIGINT) AS dist
  FROM e, seeds s
),
cells AS (
  SELECT vec_id, sid AS cell FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, sid) = 1
),
q AS (
  SELECT c.cell AS qcell, e.v AS qv
  FROM cells c JOIN e USING (vec_id) WHERE vec_id = 0
)
SELECT e.vec_id, c.cell,
       ROUND(list_cosine_similarity(e.v, q.qv), 6) AS score
FROM e JOIN cells c USING (vec_id), q
WHERE c.cell = q.qcell AND e.vec_id != 0
ORDER BY score DESC, vec_id ASC
LIMIT 5
""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = similarity.ivf_assign(_emb(spark, sf_dir), k=16)
    # Parameter fetch (1 row): the query's cell + vector are inputs.
    qrow = assigned.filter(F.col("vec_id") == 0).head()
    qv = [float(x) for x in qrow["embedding"]]
    qcell = int(qrow["cell"])
    cands = assigned.filter(
        (F.col("cell") == qcell) & (F.col("vec_id") != 0)
    )
    scored = cands.select(
        "vec_id",
        "cell",
        F.round(
            similarity.cosine(
                similarity.as_double_array(F.col("embedding")),
                F.array(*[F.lit(x) for x in qv]),
            ),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id").asc()).limit(5)


# --- Batch-query ANN (the many-queries form): top-k for EVERY row of
# a query set in ONE plan — queries broadcast into a bucket/cell equi
# join, no per-query driver roundtrip. Multi-probe (LSH: own bucket +
# all Hamming-1 neighbors; IVF: top-2 centroids) fixes the recall lost
# at bucket boundaries; the oracle recomputes the same probe set. ---


@register(
    "ann_lsh_batch_multiprobe_topk",
    oracle="""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         array_to_string(list_transform(range(0, 8), p ->
           CASE WHEN list_sum(list_transform(range(1, 65), d ->
                  v[d] * (CASE WHEN substr(md5(concat(p, ':', d)), 1, 1) >= '8'
                          THEN 1.0 ELSE -1.0 END))) > 0
           THEN '1' ELSE '0' END), '') AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS qid, v AS qv, bucket AS qb FROM b WHERE vec_id < 3),
probes AS (
  SELECT qid, qv, unnest(list_prepend(qb,
    list_transform(range(0, 8), i ->
      substr(qb, 1, i) ||
      (CASE WHEN substr(qb, i + 1, 1) = '1' THEN '0' ELSE '1' END) ||
      substr(qb, i + 2, 8)))) AS pb
  FROM q
),
cand AS (
  SELECT p.qid, b.vec_id,
         ROUND(list_cosine_similarity(b.v, p.qv), 6) AS score
  FROM b JOIN probes p ON b.bucket = p.pb
  WHERE b.vec_id != p.qid
)
SELECT qid, vec_id, score FROM cand
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) <= 5
""",
)
def ann_lsh_batch_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return similarity.lsh_topk_for_queries(emb, queries, k=5, probes=2)


@register(
    "ann_ivf_batch_topk",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seeds AS (SELECT vec_id AS sid, v AS sv FROM e ORDER BY vec_id LIMIT 16),
dists AS (
  SELECT e.vec_id, s.sid,
         CAST(FLOOR(list_sum(list_transform(range(1, 65),
             d -> (e.v[d] - s.sv[d]) * (e.v[d] - s.sv[d]))) * 1e12) AS BIGINT) AS dist
  FROM e, seeds s
),
cells AS (
  SELECT vec_id, sid AS cell FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, sid) = 1
),
qprobes AS (
  SELECT d.vec_id AS qid, e.v AS qv, d.sid AS pcell
  FROM dists d JOIN e USING (vec_id)
  WHERE d.vec_id < 3
  QUALIFY row_number() OVER (PARTITION BY d.vec_id ORDER BY d.dist, d.sid) <= 2
),
cand AS (
  SELECT p.qid, e.vec_id,
         ROUND(list_cosine_similarity(e.v, p.qv), 6) AS score
  FROM e JOIN cells c USING (vec_id)
  JOIN qprobes p ON c.cell = p.pcell
  WHERE e.vec_id != p.qid
)
SELECT qid, vec_id, score FROM cand
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) <= 5
""",
)
def ann_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return similarity.ivf_topk_for_queries(
        emb, queries, k=5, n_centroids=16, probes=2
    )


# --- Multimodal plumbing. The blob is the md5 digest bytes of the
# text (attach_blobs), so the oracle re-derives the 16 byte values
# from the md5 hex string and recomputes length / mean / Shannon
# entropy in DuckDB list SQL — an independent check of the
# mapInPandas byte path. Entropy is rounded to 6dp on both sides
# (summation order over the byte histogram differs between engines). ---


@register(
    "multimodal_byte_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, md5(text) AS h
  FROM documents WHERE doc_id % 10 = 0
), e AS (
  SELECT doc_id,
         list_transform(range(1, 17), i ->
           16*(strpos('0123456789abcdef', substr(h, 2*i-1, 1)) - 1)
             + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1)) AS bs
  FROM d
)
SELECT doc_id, CAST(len(bs) AS BIGINT) AS blob_len,
       list_sum(bs) / 16.0 AS byte_mean,
       ROUND(-list_sum(list_transform(list_distinct(bs), v ->
           (len(list_filter(bs, x -> x = v)) / 16.0)
           * log2(len(list_filter(bs, x -> x = v)) / 16.0))), 6) AS byte_entropy
FROM e
""",
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    blobs = multimodal.attach_blobs(d)
    return multimodal.byte_stats(blobs).withColumn(
        "byte_entropy", F.round("byte_entropy", 6)
    )


# --- Array functions over the embedding column (size / element-wise
# transform / fold / min-max) — nested-type expression coverage ---


@register(
    "array_embedding_stats",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6)
           AS l2_norm,
       ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_elem,
       ROUND(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding), 6) AS mean_elem
FROM embeddings
""",
)
def array_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    v = similarity.as_double_array(F.col("embedding"))
    total = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(similarity.norm(v), 6).alias("l2_norm"),
        F.round(F.array_max(v), 6).alias("max_elem"),
        F.round(total / F.size("embedding"), 6).alias("mean_elem"),
    )


# --- Token-budget corpus mixing: sample each source down to a TOKEN
# budget (the "200B tokens of web, 30B of code" recipe shape), selection
# ranked by the deterministic hash fraction so budgets nest. The oracle
# replays the identical window cumsum; the registered query uses the
# exact (window) variant — token_budget_threshold is the skew-safe
# 100 TB path, equivalence-tested in tests/test_extensions.py. ---


@register(
    "token_budget_mix_stats",
    oracle="""
WITH t AS (
  SELECT source, doc_id, len(string_split(text, ' ')) AS tok,
         CAST(concat('0x', substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS frac
  FROM documents
), c AS (
  SELECT source, tok,
         SUM(tok) OVER (PARTITION BY source ORDER BY frac, doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       CAST(SUM(tok) AS BIGINT) AS tokens_kept
FROM c
WHERE cum <= CASE source WHEN 'src0' THEN 2000.0
                         WHEN 'src1' THEN 500.0
                         ELSE 800.0 END
GROUP BY source
""",
)
def token_budget_mix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators import sampling

    d = _docs(spark, sf_dir).withColumn("tok", T.token_count(F.col("text")))
    mixed = sampling.token_budget_mix(
        d,
        budgets={"src0": 2000, "src1": 500},
        source_col="source",
        token_col="tok",
        key_cols=["doc_id"],
        default_budget=800,
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("tok").cast("bigint").alias("tokens_kept"),
    )


# --- Deterministic shard manifest: the training-data writer's routing
# (md5 shard in [0,8)) and within-shard shuffle order (independent md5
# rank), pinned by an order checksum so the oracle verifies the exact
# permutation, not just shard counts. write_training_shards materializes
# this same (shard, _pos) layout via repartition + sortWithinPartitions. ---


@register(
    "shard_manifest",
    oracle="""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS tok,
         CAST(FLOOR(CAST(concat('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 * 8) AS INT) AS shard,
         CAST(concat('0x', substr(md5('pos:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS pfrac
  FROM documents
), p AS (
  SELECT shard, doc_id, tok,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY pfrac, doc_id) AS pos
  FROM t
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM(doc_id * pos) AS BIGINT) AS order_checksum
FROM p GROUP BY shard
""",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from activedatawarehouseprototype_spark.operators import sampling

    d = _docs(spark, sf_dir).select(
        "doc_id",
        T.token_count(F.col("text")).alias("tok"),
        sampling.shard_assignment(["doc_id"], n_shards=8).alias("shard"),
    )
    d = d.withColumn(
        "pos", sampling.shuffle_position(["doc_id"], partition_cols=["shard"])
    )
    return d.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("total_tokens"),
        F.sum(F.col("doc_id") * F.col("pos")).cast("bigint").alias("order_checksum"),
    )


# --- Adaptive quality gating: per-language exact p25 threshold on the
# quality score (two-pass: tiny per-lang threshold table broadcast back
# onto the corpus — the shape that survives 100 TB, vs a global sort).
# Both engines compute the identical IEEE score expression; the
# interpolated percentile lands strictly between two score values, so a
# last-ulp interpolation difference cannot flip a >= comparison. ---


@register(
    "quality_percentile_gate",
    oracle=f"""
WITH s AS (
  SELECT lang, len(string_split(text, ' ')) AS tok,
         LEAST(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) * 0.4
           + (1.0 - ABS(CAST(len(list_filter(string_split(text, ' '), t -> t IN {_SW_SQL})) AS DOUBLE)
                        / CAST(len(string_split(text, ' ')) AS DOUBLE) - 0.4)) * 0.3
           + LEAST(1.0, CAST(n_chars AS DOUBLE) / 500.0) * 0.3 AS score
  FROM documents
), t AS (
  SELECT lang, quantile_cont(score, 0.25) AS thr FROM s GROUP BY lang
)
SELECT s.lang AS lang,
       ROUND(ANY_VALUE(thr), 6) AS p25_score,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN score >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN score >= thr THEN tok ELSE 0 END) AS BIGINT) AS tokens_kept
FROM s JOIN t USING (lang)
GROUP BY s.lang
""",
)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "lang",
        T.token_count(F.col("text")).alias("tok"),
        T.quality_score(F.col("text"), F.col("n_chars")).alias("score"),
    )
    thr = d.groupBy("lang").agg(F.percentile("score", F.lit(0.25)).alias("thr"))
    kept = F.col("score") >= F.col("thr")
    return (
        d.join(F.broadcast(thr), on="lang", how="inner")
        .groupBy("lang")
        .agg(
            F.round(F.first("thr"), 6).alias("p25_score"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept.cast("bigint")).alias("n_kept"),
            F.sum(F.when(kept, F.col("tok")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("tokens_kept"),
        )
    )


# --- Semantic cluster dedup (SemDeDup): IVF-cell blocking -> in-cell
# cosine threshold vs any lower-id member -> survivors. Near-dups are
# INJECTED (scaled x*1.001 and shifted x+0.02 copies under offset ids)
# so the query provably removes rows; the oracle recomputes the
# deterministic seed-centroid assignment (same FLOOR(dist*1e12)
# quantization as the ann_ivf_* oracles) and the survivor rule. ---


@register(
    "semantic_cluster_dedup",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
base AS (
  SELECT vec_id, v FROM e
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, list_transform(v, x -> x * 1.001) AS v
  FROM e WHERE vec_id % 7 = 0
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id, list_transform(v, x -> x + 0.02) AS v
  FROM e WHERE vec_id % 13 = 0
),
seeds AS (SELECT vec_id AS sid, v AS sv FROM base ORDER BY vec_id LIMIT 8),
dists AS (
  SELECT b.vec_id, s.sid,
         CAST(FLOOR(list_sum(list_transform(range(1, 65),
             d -> (b.v[d] - s.sv[d]) * (b.v[d] - s.sv[d]))) * 1e12) AS BIGINT) AS dist
  FROM base b, seeds s
),
cells AS (
  SELECT vec_id, sid AS cell FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, sid) = 1
),
a AS (SELECT c.vec_id, c.cell, b.v FROM cells c JOIN base b USING (vec_id)),
dups AS (
  SELECT DISTINCT y.vec_id
  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) >= 0.95
)
SELECT CAST(a.vec_id AS BIGINT) AS vec_id, CAST(a.cell AS BIGINT) AS cell
FROM a WHERE NOT EXISTS (SELECT 1 FROM dups d WHERE d.vec_id = a.vec_id)
""",
)
def semantic_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", similarity.as_double_array(F.col("embedding")).alias("v")
    )
    scaled = e.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x * F.lit(1.001)).alias("v"),
    )
    shifted = e.filter(F.col("vec_id") % 13 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.02)).alias("v"),
    )
    base = e.unionByName(scaled).unionByName(shifted)
    surv = dedup.semantic_cluster_survivors(
        base, id_col="vec_id", vec_col="v", k=8, threshold=0.95
    )
    return surv.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("cell").cast("bigint").alias("cell"),
    )


# --- Unigram-LM document scoring (CCNet-style quality gate): train an
# add-0.5-smoothed unigram LM on the corpus itself, score every doc by
# cross-entropy (nats/token). The LM join is a BROADCAST (vocab is
# control-plane-sized next to the corpus; shuffling the exploded token
# stream by token would be stopword-skewed). ---


@register(
    "lm_unigram_doc_scores",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM cnt),
lm AS (
  SELECT token,
         ln((CAST(c AS DOUBLE) + 0.5) / (CAST(n AS DOUBLE) + 0.5 * v)) AS lp
  FROM cnt, tot
),
sc AS (
  SELECT t.doc_id, count(*) AS n_tokens, -avg(lp) AS ce
  FROM tok t JOIN lm USING (token)
  GROUP BY t.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       d.lang,
       CAST(sc.n_tokens AS BIGINT) AS n_tokens,
       ROUND(sc.ce, 6) AS ce_nats
FROM sc JOIN documents d USING (doc_id)
""",
)
def lm_unigram_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    counts = T.unigram_counts(d, "text")
    lm = T.unigram_logprobs(counts, alpha=0.5)
    ce = T.doc_cross_entropy(d, lm, id_col="doc_id", text_col="text")
    return ce.join(d.select("doc_id", "lang"), "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("ce_nats", 6).alias("ce_nats"),
    )


# --- TF-IDF keyword extraction: top-3 characteristic terms per doc.
# idf = ln(D/df_t); one window rank; ties (score desc, term asc). ---


@register(
    "tfidf_top_terms_per_doc",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
d AS (SELECT count(*) AS d_ FROM documents),
idf AS (
  SELECT term, ln(CAST(d_ AS DOUBLE) / CAST(df_t AS DOUBLE)) AS idf
  FROM dft, d
),
sc AS (
  SELECT t.doc_id, t.term,
         ROUND(CAST(t.tf AS DOUBLE) * i.idf, 6) AS score
  FROM tf t JOIN idf i USING (term)
),
r AS (
  SELECT doc_id, term, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
  FROM sc
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, term, score, CAST(rnk AS INT) AS rnk
FROM r WHERE rnk <= 3
""",
)
def tfidf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    out = T.tfidf_top_terms(d, id_col="doc_id", text_col="text", top_n=3)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "term", "score", "rnk"
    )


# --- Incremental-MV merge algebra: three event-time "micro-batches"
# are partially aggregated then MERGED (sum of sums / min of mins /
# max of maxes), which must equal the direct one-shot aggregate — the
# algebra operators/warehouse.py::incremental_agg_mv applies per batch
# against the persisted view (filesystem side tested in pytest). ---


@register(
    "mv_incremental_merge_algebra",
    oracle="""
WITH b AS (
  SELECT user_id, value,
         CAST(FLOOR(CAST(epoch(ts) AS DOUBLE) / 86400) AS BIGINT) % 3 AS batch
  FROM events
),
partials AS (
  SELECT batch, user_id,
         COUNT(*) AS n, SUM(value) AS total,
         MIN(value) AS mn, MAX(value) AS mx
  FROM b GROUP BY 1, 2
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(n) AS BIGINT) AS n,
       ROUND(SUM(total), 2) AS total,
       MIN(mn) AS mn,
       MAX(mx) AS mx
FROM partials
GROUP BY user_id
""",
)
def mv_incremental_merge_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events").select(
        "user_id",
        "value",
        (
            F.floor(F.col("ts").cast("double") / F.lit(86400.0)).cast("bigint")
            % 3
        ).alias("batch"),
    )
    partials = ev.groupBy("batch", "user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("total"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        partials.groupBy("user_id")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            # total at the data's own decimal precision; NO rounded
            # avg column — a quotient of 2-decimal values can sit
            # exactly on a round-4 half-boundary where the engines'
            # rounding modes disagree (sf0.1 stress-mirror finding,
            # round 7); total and n carry the same information exactly
            F.round(F.sum("total"), 2).alias("total"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "n",
            "total",
            "mn",
            "mx",
        )
    )


# --- Persisted LSH dedup index: incremental batch-vs-corpus lookup.
# The Spark side actually BUILDS the on-disk index (bucket-partitioned
# banded signatures + persisted hot-shingle list) in a temp dir and
# runs the partition-pruned lookup; the oracle restates the semantics
# directly: batch bands (computed under the CORPUS's hot-shingle cap)
# equi-joined against corpus bands. ---

_GRAMS_BATCH = _GRAMS.replace("FROM corpus", "FROM batch")


@register(
    "dedup_index_incremental",
    oracle=f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
batch AS (
  SELECT doc_id + 1000000 AS doc_id, text || ' zz9' AS text
  FROM documents WHERE doc_id % 101 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 97 = 0
),
grams_c_all AS ({_GRAMS}),
hot AS (
  SELECT shingle
  FROM (SELECT shingle, COUNT(*) AS df_ FROM grams_c_all GROUP BY shingle)
  WHERE df_ > {_MAX_DOC_FREQ}
),
grams_c AS (
  SELECT * FROM grams_c_all WHERE shingle NOT IN (SELECT shingle FROM hot)
),
grams_b_all AS ({_GRAMS_BATCH}),
grams_b AS (
  SELECT * FROM grams_b_all WHERE shingle NOT IN (SELECT shingle FROM hot)
),
mh_c AS (
  SELECT doc_id, s.i AS hash_idx,
         MIN(md5(CAST(s.i AS VARCHAR) || ':' || shingle)) AS minhash
  FROM grams_c, UNNEST(generate_series(0, 11)) AS s(i)
  GROUP BY doc_id, s.i
),
bands_c AS (
  SELECT doc_id, hash_idx // 4 AS band,
         md5(string_agg(minhash, ',' ORDER BY minhash)) AS band_sig
  FROM mh_c GROUP BY doc_id, band
),
mh_b AS (
  SELECT doc_id, s.i AS hash_idx,
         MIN(md5(CAST(s.i AS VARCHAR) || ':' || shingle)) AS minhash
  FROM grams_b, UNNEST(generate_series(0, 11)) AS s(i)
  GROUP BY doc_id, s.i
),
bands_b AS (
  SELECT doc_id, hash_idx // 4 AS band,
         md5(string_agg(minhash, ',' ORDER BY minhash)) AS band_sig
  FROM mh_b GROUP BY doc_id, band
)
SELECT DISTINCT CAST(b.doc_id AS BIGINT) AS id_new,
       CAST(c.doc_id AS BIGINT) AS id_indexed
FROM bands_b b
JOIN bands_c c ON b.band = c.band AND b.band_sig = c.band_sig
""",
)
def dedup_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.operators import dedup_index as DI

    d = _docs(spark, sf_dir).select("doc_id", "text")
    batch = (
        d.filter(F.col("doc_id") % 101 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
    )
    path = tempfile.mkdtemp(prefix="adw-dedupidx-")
    try:
        DI.dedup_index_build(
            d, path, n=_NGRAM, k=12, bands=3, max_doc_freq=_MAX_DOC_FREQ
        )
        # lookup localCheckpoints its (small) result, so the temp index
        # can be deleted before returning
        return DI.dedup_index_lookup(spark, path, batch)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- Cross-table semantic decontamination: "benchmark" vectors are
# planted perturbations of training vectors (scale by 1.5 preserves
# cosine exactly; +0.02 shifts it slightly) — pairs across the two
# tables within a shared sign-LSH bucket at cosine >= 0.95. The
# n-gram containment check (decontaminate_ngram_overlap) misses
# paraphrases; this is the embedding-side complement. ---


@register(
    "cross_decontaminate_embeddings",
    oracle="""
WITH train AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
bench AS (
  SELECT vec_id + 5000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5) AS v
  FROM embeddings WHERE vec_id % 13 = 0
  UNION ALL
  SELECT vec_id + 6000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.02) AS v
  FROM embeddings WHERE vec_id % 19 = 0
),
bt AS (
  SELECT vec_id, v,
         array_to_string(list_transform(range(0, 8), p ->
           CASE WHEN list_sum(list_transform(range(1, 65), d ->
                  v[d] * (CASE WHEN substr(md5(concat(p, ':', d)), 1, 1) >= '8'
                          THEN 1.0 ELSE -1.0 END))) > 0
           THEN '1' ELSE '0' END), '') AS bucket
  FROM train
),
bb AS (
  SELECT vec_id, v,
         array_to_string(list_transform(range(0, 8), p ->
           CASE WHEN list_sum(list_transform(range(1, 65), d ->
                  v[d] * (CASE WHEN substr(md5(concat(p, ':', d)), 1, 1) >= '8'
                          THEN 1.0 ELSE -1.0 END))) > 0
           THEN '1' ELSE '0' END), '') AS bucket
  FROM bench
)
SELECT CAST(t.vec_id AS BIGINT) AS id_left,
       CAST(b.vec_id AS BIGINT) AS id_right,
       t.bucket AS bucket,
       ROUND(list_cosine_similarity(t.v, b.v), 6) AS score
FROM bt t
JOIN bb b ON t.bucket = b.bucket
WHERE ROUND(list_cosine_similarity(t.v, b.v), 6) >= 0.95
""",
)
def cross_decontaminate_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select(
        "vec_id", similarity.as_double_array(F.col("embedding")).alias("v")
    )
    bench = (
        e.filter(F.col("vec_id") % 13 == 0)
        .select(
            (F.col("vec_id") + 5000000).alias("vec_id"),
            F.transform("v", lambda x: x * F.lit(1.5)).alias("v"),
        )
        .unionByName(
            e.filter(F.col("vec_id") % 19 == 0).select(
                (F.col("vec_id") + 6000000).alias("vec_id"),
                F.transform("v", lambda x: x + F.lit(0.02)).alias("v"),
            )
        )
    )
    return similarity.cross_near_dup_pairs(
        e, bench, "vec_id", "v", n_planes=8, dim=64, threshold=0.95
    )


# --- Product quantization (rows-only: the numpy-trained codebooks
# have no SQL twin — quality is pinned by tests/test_pq.py recall and
# reconstruction gates instead). Deterministic end-to-end: sample =
# lowest-id vectors, fixed Lloyd iterations, IEEE argmin with
# first-index ties, so the code checksum is stable run to run. ---


@register(
    "pq_codes_stats",
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS iv
  FROM embeddings
),
sample AS (SELECT * FROM q ORDER BY vec_id LIMIT 1024),
subs AS (
  SELECT vec_id, s,
         list_transform(range(1, 9), j -> iv[s * 8 + j]) AS subvec
  FROM sample, (SELECT UNNEST(generate_series(0, 7)) AS s)
),
firsts AS (
  SELECT s, subvec, MIN(vec_id) AS first_id FROM subs GROUP BY s, subvec
),
codebook AS (
  SELECT s, subvec,
         ROW_NUMBER() OVER (PARTITION BY s ORDER BY first_id) - 1 AS code
  FROM firsts
  QUALIFY code < 16
),
vsubs AS (
  SELECT vec_id, s,
         list_transform(range(1, 9), j -> iv[s * 8 + j]) AS subvec
  FROM q, (SELECT UNNEST(generate_series(0, 7)) AS s)
),
dists AS (
  SELECT v.vec_id, v.s, cb.code,
         list_sum(list_transform(range(1, 9),
           j -> (v.subvec[j] - cb.subvec[j])
                * (v.subvec[j] - cb.subvec[j]))) AS d2
  FROM vsubs v JOIN codebook cb ON v.s = cb.s
),
assign AS (
  SELECT vec_id, s, code,
         ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn
  FROM dists
),
codes AS (SELECT vec_id, s, code FROM assign WHERE rn = 1),
per_vec AS (
  SELECT vec_id,
         string_agg(CAST(code AS VARCHAR), ',' ORDER BY s) AS cs,
         SUM(code * (s + 1)) AS w
  FROM codes GROUP BY vec_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(DISTINCT cs) AS BIGINT) AS n_distinct_codes,
       CAST(SUM(w * (vec_id % 997)) AS BIGINT) AS code_checksum
FROM per_vec
""",
)
def pq_codes_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ENCODE under the exact oracle gate: embeddings are quantized
    to integers (floor(x*1000) — exact on the binary double in both
    engines), codebooks are the deterministic init (first-16-distinct
    subvectors of the 1024-lowest-id sample, ``iters=0``), so every
    sub-distance is exact integer arithmetic and the argmin assignment
    is engine-reproducible — DuckDB recomputes codebook selection AND
    code assignment independently. Lloyd-trained (float) codebooks
    can't hash-match across engines (mean summation order); training
    quality is gated by the recall@10 pytest instead (tests/test_pq.py).
    """
    from activedatawarehouseprototype_spark.operators import pq as PQ

    e = _emb(spark, sf_dir)
    qv = e.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000).cast("double"),
        ).alias("embedding"),
    )
    cbs = PQ.pq_train(qv, m=8, ksub=16, iters=0, sample_n=1024)
    enc = PQ.pq_encode(qv, cbs)
    weighted = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(1), F.size("codes")),
            lambda c, i: c.cast("bigint") * i,
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return enc.select(
        "vec_id",
        F.concat_ws(",", F.col("codes")).alias("_cs"),
        weighted.alias("_w"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.countDistinct("_cs").cast("bigint").alias("n_distinct_codes"),
        F.sum(F.col("_w") * (F.col("vec_id") % 997)).cast("bigint").alias(
            "code_checksum"
        ),
    )


# --- Fused IVF+PQ search under the oracle gate. The production path
# is prune -> ADC shortlist -> exact re-rank; with a shortlist that
# covers every candidate in the probed cells, ADC cannot drop anyone
# and the OUTPUT is exactly the cosine top-k restricted to the probed
# cells — which DuckDB recomputes independently (seed centroids +
# the same floor(dist*1e12) probe-order quantization the other IVF
# oracles use; PQ's approximation quality is gated separately by
# tests/test_ann_recall.py::test_ivf_pq_search_recall...). ---


@register(
    "ivf_pq_search_topk",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
seeds AS (SELECT vec_id AS sid, v AS sv FROM e ORDER BY vec_id LIMIT 16),
dists AS (
  SELECT e.vec_id, s.sid,
         CAST(FLOOR(list_sum(list_transform(range(1, 65),
             d -> (e.v[d] - s.sv[d]) * (e.v[d] - s.sv[d]))) * 1e12) AS BIGINT)
           AS dist
  FROM e, seeds s
),
cells AS (
  SELECT vec_id, sid AS cell FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, sid) = 1
),
queries AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
qdists AS (
  SELECT q.qid, s.sid,
         CAST(FLOOR(list_sum(list_transform(range(1, 65),
             d -> (q.qv[d] - s.sv[d]) * (q.qv[d] - s.sv[d]))) * 1e12) AS BIGINT)
           AS dist
  FROM queries q, seeds s
),
probed AS (
  SELECT qid, sid AS cell FROM qdists
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dist, sid) <= 2
),
scored AS (
  SELECT p.qid, e.vec_id,
         ROUND(list_cosine_similarity(e.v, q.qv), 6) AS score
  FROM probed p
  JOIN cells c ON c.cell = p.cell
  JOIN e ON e.vec_id = c.vec_id
  JOIN queries q ON q.qid = p.qid
  WHERE e.vec_id != p.qid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id, score
FROM scored
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC)
        <= 5
""",
)
def ivf_pq_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused persisted-index ANN (`ivf_pq_index_build` ->
    `ivf_pq_search`, similarity.py): every vec_id % 100 == 0 vector
    queries the index for its cosine top-5 at probes=2. Seed centroids
    + an all-covering shortlist make the result exactly SQL-checkable
    (see the block comment above); the driver row therefore gates the
    whole fused plumbing — cell assignment, probe selection, codes-only
    ADC stage, broadcast semi-join re-rank — not just the happy path.
    """
    import shutil
    import tempfile

    e = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="adw-ivfpq-")
    try:
        similarity.ivf_pq_index_build(
            e, path, k=16, m=8, ksub=16, use_kmeans=False
        )
        queries = e.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        res = similarity.ivf_pq_search(
            spark, path, queries, k=5, probes=2, shortlist=1_000_000
        )
        # the temp index dies on return: cut lineage to the scans
        return res.localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- Histogram-MV merge algebra under the oracle gate: three
# day-slice batches of events feed the incremental MV with a
# 16-bin [0, 500) histogram; the oracle recomputes the per-key bin
# counts directly over the full table (merging partial histograms
# element-wise MUST equal the one-shot histogram — the mergeability
# property itself). Bin indices are exact integer math on both
# engines (floor of value/31.25 clamped), so no rounding. ---


@register(
    "mv_histogram_merge_algebra",
    oracle="""
WITH e AS (
  SELECT user_id,
         LEAST(15, GREATEST(0, CAST(FLOOR(value / 31.25) AS INTEGER))) AS bin
  FROM events
),
grid AS (
  SELECT u.user_id, g.bin
  FROM (SELECT DISTINCT user_id FROM e) u,
       (SELECT UNNEST(generate_series(0, 15)) AS bin) g
),
counts AS (
  SELECT user_id, bin, COUNT(*) AS c FROM e GROUP BY user_id, bin
)
SELECT CAST(g.user_id AS BIGINT) AS user_id,
       CAST(SUM(COALESCE(c.c, 0)) AS BIGINT) AS n,
       string_agg(CAST(COALESCE(c.c, 0) AS VARCHAR), ',' ORDER BY g.bin)
         AS hist
FROM grid g LEFT JOIN counts c ON g.user_id = c.user_id AND g.bin = c.bin
GROUP BY g.user_id
""",
)
def mv_histogram_merge_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from activedatawarehouseprototype_spark.catalog import load as _load2
    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_agg_mv,
    )

    ev = _load2(spark, sf_dir, "events").select(
        "user_id",
        "value",
        (
            F.floor(F.col("ts").cast("double") / F.lit(10 * 86400.0)).cast(
                "bigint"
            )
            % 3
        ).alias("_b"),
    )
    base = tempfile.mkdtemp(prefix="adw-histmv-")
    try:
        mv = None
        for b in range(3):
            mv = incremental_agg_mv(
                spark,
                f"{base}/mv",
                ev.filter(F.col("_b") == b),
                ["user_id"],
                "value",
                batch_id=b,
                hist_bins=(0.0, 500.0, 16),
            )
        return mv.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("n").cast("bigint").alias("n"),
            F.concat_ws(",", F.col("hist")).alias("hist"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --- Repeated-span (bounded ExactSubstr) dedup: rewrite docs, not drop them ---

_SPAN_W = 8  # words per chunk; stride = chunk size


@register(
    "dedup_repeated_spans",
    oracle=f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS nw,
         CAST(floor(len(string_split(text, ' ')) / {_SPAN_W}) AS INT) AS nc
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(t.i AS INT) AS chunk_idx,
         array_to_string(
             w[(CAST(t.i AS INT) * {_SPAN_W} + 1):(CAST(t.i AS INT) * {_SPAN_W} + {_SPAN_W})],
             ' ') AS chunk
  FROM base, UNNEST(range(nc)) AS t(i)
  WHERE nc > 0
),
dup AS (
  SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 2
),
kept AS (SELECT * FROM chunks WHERE chunk NOT IN (SELECT chunk FROM dup)),
reass AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS kept_text,
         COUNT(*) AS kept_chunks
  FROM kept GROUP BY doc_id
)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
       CAST(b.nc AS INT) AS n_chunks,
       CAST(b.nc - COALESCE(r.kept_chunks, 0) AS INT) AS chunks_removed,
       COALESCE(array_to_string(
           list_filter(
               [COALESCE(r.kept_text, ''),
                CASE WHEN b.nw > b.nc * {_SPAN_W}
                     THEN array_to_string(w[(b.nc * {_SPAN_W} + 1):b.nw], ' ')
                     ELSE '' END],
               x -> x <> ''),
           ' '), '') AS clean_text
FROM base b LEFT JOIN reass r USING (doc_id)
""",
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated 8-word spans removed in place; the
    fixture corpus genuinely shares spans (135 duplicated chunks at
    sf0.01), so no planting is needed."""
    return dedup.repeated_span_dedup(
        _docs(spark, sf_dir).select("doc_id", "text"),
        "doc_id",
        "text",
        chunk_words=_SPAN_W,
        min_docs=2,
    )


# --- DSIR importance weights: bigram-LM log-ratio data selection ---


@register(
    "dsir_importance_weights",
    oracle="""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
bg AS (
  SELECT doc_id, lang, w[CAST(t.i AS INT)] AS w1, w[CAST(t.i AS INT) + 1] AS w2
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents) s,
       UNNEST(range(1, len(w))) AS t(i)
),
tbi AS (SELECT w1, w2, COUNT(*) AS cb FROM bg WHERE lang = 'en' GROUP BY w1, w2),
tctx AS (SELECT w1, SUM(cb) AS cw FROM tbi GROUP BY w1),
tuni AS (SELECT tok, COUNT(*) AS cu FROM toks WHERE lang = 'en' GROUP BY tok),
ttot AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_, CAST(COUNT(*) AS DOUBLE) AS v_ FROM tuni),
rbi AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
rctx AS (SELECT w1, SUM(cb) AS cw FROM rbi GROUP BY w1),
runi AS (SELECT tok, COUNT(*) AS cu FROM toks GROUP BY tok),
rtot AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_, CAST(COUNT(*) AS DOUBLE) AS v_ FROM runi),
ts AS (
  SELECT doc_id, COUNT(*) AS nb,
         AVG(ln(0.75 * COALESCE(CAST(cb AS DOUBLE) / CAST(cw AS DOUBLE), 0.0)
                + 0.25 * ((CAST(COALESCE(cu2, 0) AS DOUBLE) + 0.5) / (n_ + 0.5 * v_)))) AS lp
  FROM bg
  LEFT JOIN tbi USING (w1, w2)
  LEFT JOIN tctx USING (w1)
  LEFT JOIN (SELECT tok AS w2, cu AS cu2 FROM tuni) USING (w2)
  CROSS JOIN ttot
  GROUP BY doc_id
),
rs AS (
  SELECT doc_id, COUNT(*) AS nb,
         AVG(ln(0.75 * COALESCE(CAST(cb AS DOUBLE) / CAST(cw AS DOUBLE), 0.0)
                + 0.25 * ((CAST(COALESCE(cu2, 0) AS DOUBLE) + 0.5) / (n_ + 0.5 * v_)))) AS lp
  FROM bg
  LEFT JOIN rbi USING (w1, w2)
  LEFT JOIN rctx USING (w1)
  LEFT JOIN (SELECT tok AS w2, cu AS cu2 FROM runi) USING (w2)
  CROSS JOIN rtot
  GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(COALESCE(ts.nb, 0) AS BIGINT) AS n_bigrams,
       ROUND(COALESCE(ts.lp, 0.0) - COALESCE(rs.lp, 0.0), 6) AS log_weight
FROM documents d
LEFT JOIN ts USING (doc_id)
LEFT JOIN rs USING (doc_id)
""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection toward the 'en' slice of the corpus: log
    importance weight per document under target-vs-raw interpolated
    bigram LMs (see operators/text.py dsir_log_weights)."""
    d = _docs(spark, sf_dir)
    out = T.dsir_log_weights(
        d.select("doc_id", "text"),
        d.filter(F.col("lang") == "en").select("doc_id", "text"),
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("log_weight", 6).alias("log_weight"),
    )


# --- Contrastive pair mining: positives + hard negatives in one pass ---


@register(
    "contrastive_pairs_mining",
    oracle="""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5) AS v
  FROM embeddings WHERE vec_id % 11 = 0
),
b AS (
  SELECT vec_id, v,
         array_to_string(list_transform(range(0, 8), p ->
           CASE WHEN list_sum(list_transform(range(1, 65), d ->
                  v[d] * (CASE WHEN substr(md5(concat(p, ':', d)), 1, 1) >= '8'
                          THEN 1.0 ELSE -1.0 END))) > 0
           THEN '1' ELSE '0' END), '') AS bucket
  FROM base
),
pairs AS (
  SELECT CAST(a.vec_id AS BIGINT) AS id_a,
         CAST(bb.vec_id AS BIGINT) AS id_b,
         ROUND(list_cosine_similarity(a.v, bb.v), 6) AS score
  FROM b a
  JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
)
SELECT id_a, id_b, score,
       CAST(CASE WHEN score >= 0.9 THEN 1 ELSE 0 END AS INT) AS label
FROM pairs
WHERE score >= 0.9
   OR (score < 0.5 AND (id_a + id_b) % 3 = 0)
""",
)
def contrastive_pairs_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positives = planted scaled copies (same direction, cos 1.0) +
    natural near-dups; hard negatives = same-bucket dissimilar pairs,
    deterministically thinned (see similarity.contrastive_pairs)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", similarity.as_double_array(F.col("embedding")).alias("v")
    )
    scaled = e.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("v", lambda x: x * F.lit(1.5)).alias("v"),
    )
    return similarity.contrastive_pairs(
        e.unionByName(scaled),
        "vec_id",
        "v",
        n_planes=8,
        dim=64,
        pos_threshold=0.9,
        neg_threshold=0.5,
        neg_mod=3,
    )
