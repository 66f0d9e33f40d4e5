"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token stats, stopword-based language ID, quality scoring,
and document fingerprinting.

All pure Column expressions (whole-stage codegen, no Python UDFs) so
they run JVM-side at 100 TB scale; each has an exact SQL twin for the
DuckDB oracle. Tokenization is single-space split — the fixtures are
space-joined tokens — with a regex variant for real text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small English stopword list (public knowledge). Deliberately tiny
# and frozen: it is part of the operator contract with the SQL oracle.
EN_STOPWORDS = (
    "the",
    "a",
    "of",
    "and",
    "to",
    "in",
    "is",
    "it",
    "for",
    "on",
)


def tokens(text: Column) -> Column:
    """Split on single spaces (fixture contract)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def stopword_count(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords))).cast("bigint")


def mean_token_len(text: Column) -> Column:
    """Average token length = non-space chars / token count (exact
    IEEE division, identical in the SQL twin)."""
    return F.length(F.replace(text, F.lit(" "), F.lit(""))).cast(
        "double"
    ) / token_count(text).cast("double")


def stopword_ratio(text: Column) -> Column:
    return stopword_count(text).cast("double") / token_count(text).cast("double")


def quality_score(text: Column, n_chars: Column) -> Column:
    """Composite quality heuristic in [0, 1]: length credit + stopword
    naturalness + raw size credit. The formula is the contract; the SQL
    twin repeats it verbatim."""
    tc = token_count(text).cast("double")
    swr = stopword_ratio(text)
    return (
        F.least(F.lit(1.0), tc / F.lit(50.0)) * 0.4
        + (F.lit(1.0) - F.abs(swr - F.lit(0.4))) * 0.3
        + F.least(F.lit(1.0), n_chars.cast("double") / F.lit(500.0)) * 0.3
    )


def lang_id(text: Column, threshold: float = 0.08) -> Column:
    """Stopword-ratio language heuristic: 'en' when the English
    stopword ratio clears the threshold, else 'und' (undetermined).
    N-gram profiles would slot in the same shape for more languages."""
    return F.when(stopword_ratio(text) > threshold, "en").otherwise("und")


def normalize(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics, collapse runs of spaces —
    the canonical form for fingerprinting."""
    t = F.lower(text)
    t = F.regexp_replace(t, "[^a-z0-9 ]", "")
    t = F.regexp_replace(t, " +", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.
    (The rolling/winnowing variant for partial-overlap detection lives
    in dedup.shingles + minhash.)"""
    return F.md5(normalize(text).cast("binary"))


def repeated_ngram_ratio(text_col: str, n: int = 3) -> Column:
    """1 - distinct/total word n-grams: the intra-document repetition
    signal quality pipelines filter on (boilerplate, template spam, and
    model-degenerate text repeat themselves). 0 = no repetition; →1 as
    the doc degenerates into a loop. Pure Column expression; docs
    shorter than n grams score 0."""
    grams = word_ngrams(text_col, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double") / total.cast("double")
    )


def filter_reason(
    text: Column,
    n_chars: Column,
    min_tokens: int = 5,
    max_chars: int = 2_000,
    min_stopword_ratio: float = 0.05,
) -> Column:
    """Reason-coded quality gate: the FIRST failing rule names the drop
    reason, NULL means kept. Priority order is the contract (mirrored
    verbatim in the SQL twin): too_short → too_long → low_stopword."""
    return (
        F.when(token_count(text) < min_tokens, "too_short")
        .when(n_chars > max_chars, "too_long")
        .when(stopword_ratio(text) < min_stopword_ratio, "low_stopword")
        .otherwise(F.lit(None).cast("string"))
    )


# PII scrub patterns (public-format regexes, ASCII word boundaries —
# valid in both Java regex (Spark) and RE2 (DuckDB), which is the
# portability contract that lets the oracle re-run the scrub verbatim).
# Order is part of the contract: email first (an email contains no IP /
# phone match, but scrubbing it first keeps the rule unambiguous).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
)


def pii_counts(text: Column) -> list[Column]:
    """Per-pattern match counts (before redaction), one bigint column
    per PII_PATTERNS entry, aliased n_<name>."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact_pii(text: Column) -> Column:
    """Scrub emails / IPv4s / phone-shaped tokens to typed placeholder
    tags — the privacy pass every training-data pipeline runs before
    anything leaves curation. Chained regexp_replace (JVM-side, no
    UDF); patterns and order are the contract shared with the SQL twin."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def kgram_hashes(text_col: str, k: int = 5) -> Column:
    """md5 of every word k-gram, in document order — the rolling hash
    sequence winnowing selects from. (md5-of-string is the repo's
    engine-portable hash: DuckDB's md5(varchar) matches Spark's
    md5(cast as binary) byte for byte.)"""
    return F.transform(word_ngrams(text_col, k), lambda g: F.md5(g.cast("binary")))


def winnow_fingerprints(text_col: str, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local-fingerprinting algorithm) as one pure
    Column expression: hash every word k-gram, slide a w-hash window,
    keep each window's MINIMUM hash, return the sorted distinct
    selections.

    Guarantee: any shared token run of length >= w + k - 1 between two
    documents puts at least one IDENTICAL fingerprint in both sets — so
    a fingerprint equi-join finds PARTIAL overlap that whole-document
    hashing (``fingerprint``) misses — while keeping only ~2/(w+1) of
    the k-gram hashes, which is what keeps the inverted fingerprint
    index tractable at 100 TB (vs indexing every shingle).

    Edge contract (mirrored in the SQL twin): < k tokens → empty set;
    fewer hashes than one window → the single global minimum.
    """
    h = kgram_hashes(text_col, k)
    mins = F.transform(
        F.sequence(F.lit(1), F.size(h) - F.lit(w - 1)),
        lambda i: F.array_min(F.slice(h, i, w)),
    )
    return (
        F.when(F.size(h) <= 0, F.array().cast("array<string>"))
        .when(F.size(h) < w, F.array(F.array_min(h)))
        .otherwise(F.array_sort(F.array_distinct(mins)))
    )


def word_ngrams(text_col: str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (basis for Jaccard /
    MinHash dedup). Pure SQL expression over a named column — no UDF,
    so it stays inside codegen at any scale."""
    toks = f"split({text_col}, ' ')"
    joined = ", ".join(f"{toks}[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({toks}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', {joined})) END"
    )


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token counts — the training pass of the unigram LM.
    One explode + one groupBy (map-side partial aggregation does the
    heavy lifting; the shuffle carries only distinct tokens/partition)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )


def unigram_logprobs(counts: DataFrame, alpha: float = 0.5) -> DataFrame:
    """Add-alpha-smoothed unigram log-probabilities from token counts:
    lp(t) = ln((c_t + alpha) / (N + alpha * V)).

    N/V are a 1-row aggregate cross-joined back (broadcast, no
    shuffle). All inputs to the division are exact integers (+ an
    exactly-representable alpha), so the ratio — and hence ln — is
    bit-identical in the SQL twin."""
    tot = counts.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "token",
        F.log(
            (F.col("c") + F.lit(alpha))
            / (F.col("n") + F.lit(alpha) * F.col("v"))
        ).alias("lp"),
    )


def unigram_oov_logprob(counts: DataFrame, alpha: float = 0.5) -> float:
    """The add-alpha-smoothed log-probability an UNSEEN token gets
    under ``unigram_logprobs``'s model: ln(alpha / (N + alpha * V)).
    One 1-row control-plane aggregate — pass the result to
    ``doc_cross_entropy(oov_lp=...)`` for open-vocabulary scoring."""
    import math

    row = counts.agg(F.sum("c").alias("n"), F.count("*").alias("v")).head()
    return math.log(alpha / (int(row["n"]) + alpha * int(row["v"])))


def doc_cross_entropy(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_lp: float | None = None,
) -> DataFrame:
    """Per-document cross-entropy (nats/token) under a unigram LM —
    the CCNet-style LM quality gate: fluent in-domain text scores low,
    gibberish / boilerplate / wrong-language text scores high, and the
    percentile of this column is the standard keep/drop knob.

    ``oov_lp`` is the log-probability assigned to tokens OUTSIDE the
    LM's vocabulary (use ``unigram_oov_logprob`` for the smoothed
    value consistent with the LM). Pass it whenever the scored corpus
    can diverge from the LM's training corpus: without it (None, the
    closed-vocabulary form the same-corpus oracle entries use), OOV
    tokens are EXCLUDED from the average — a wholly-OOV document
    yields no row and a half-gibberish document is scored only on its
    fluent half, inverting the gate for exactly the documents it
    exists to catch.

    Returns (id_col, n_tokens, ce_nats). The LM side is BROADCAST:
    a natural-language vocabulary is millions of rows (~tens of MB) —
    small against a 100 TB corpus — and broadcasting removes both the
    shuffle of the exploded token stream (|corpus| * tokens rows) and
    the stopword hot-key skew a shuffle join would suffer. If the
    vocab ever outgrows broadcast, pre-prune it to the doc side's
    distinct tokens first; never shuffle the token stream by token.

    ce is -avg(lp); summation order varies run-to-run, so consumers
    round before hashing/comparing (corpus float discipline)."""
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
    if oov_lp is None:
        scored = tok.join(F.broadcast(lm), "token")
    else:
        scored = tok.join(F.broadcast(lm), "token", "left").withColumn(
            "lp", F.coalesce("lp", F.lit(float(oov_lp)))
        )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (-F.avg("lp")).alias("ce_nats"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Top-N characteristic terms per document by TF-IDF — the
    standard keyword-extraction / topic-labeling primitive for corpus
    curation.

    tf = term count within the document; idf = ln(D / df_t) with D =
    |docs| and df_t = number of docs containing the term. score =
    tf * idf, ROUNDed to 6 by the consumer; ties break (score desc,
    term asc) so selection is deterministic and engine-stable.

    Scale shape: one explode + groupBy(doc, term) for tf (map-side
    partial agg shrinks the shuffle to distinct doc-terms), df_t as a
    second agg over that same skinny table, D as a 1-row broadcast
    cross join, the idf table BROADCAST back onto doc-terms (vocab is
    control-plane-sized next to the corpus — same discipline as the
    unigram LM), and ONE per-doc window rank for the top-N. No joins
    keyed by the raw token stream, no driver loops."""
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    d_total = df.agg(F.count("*").alias("d_"))
    idf = dft.crossJoin(F.broadcast(d_total)).select(
        "term",
        F.log(F.col("d_").cast("double") / F.col("df_t").cast("double")).alias(
            "idf"
        ),
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        F.col(id_col),
        "term",
        F.round(F.col("tf").cast("double") * F.col("idf"), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select(id_col, "term", "score", F.col("rnk").cast("int").alias("rnk"))
    )


def bigram_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Every (w1, w2) adjacent-token occurrence per document (with
    multiplicity), via the relational posexplode + ``lead`` form the
    shingle pass established as the codegen-friendly one. The
    ``repartition(id)`` feeds the lead window's required distribution,
    so the explode spread costs no extra exchange."""
    from pyspark.sql import Window

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartition(n_parts, id_col)
        .select(
            F.col(id_col).alias("sid"),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "w1"),
        )
    )
    wl = Window.partitionBy("sid").orderBy("pos")
    return (
        base.withColumn("w2", F.lead("w1").over(wl))
        .filter(F.col("w2").isNotNull())
        .select("sid", "w1", "w2")
    )


def bigram_interp_scores(
    df: DataFrame,
    lm_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated bigram
    LM trained on ``lm_df``:

        p(w2 | w1) = lam * c(w1,w2)/c(w1·)  +  (1-lam) * p_uni(w2)

    with add-alpha-smoothed unigram backoff p_uni(t) = (c_t + alpha) /
    (N + alpha * V). ``lam``/``alpha`` default to exactly-representable
    binary fractions so every per-row product is IEEE-bit-identical in
    the SQL twin; only the per-doc mean is order-dependent (consumers
    round it, corpus float discipline).

    Returns (id_col, n_bigrams, avg_lp) — one row per input document;
    documents with < 2 tokens carry n_bigrams = 0 and avg_lp = 0.0.

    Scale: LM tables (bigram counts, context counts, unigram counts)
    are vocabulary-bounded and BROADCAST; the exploded corpus bigram
    stream is never shuffled by token (same discipline as the unigram
    LM / TF-IDF passes). If the bigram vocabulary ever outgrows
    broadcast, pre-prune it to the scored side's distinct pairs first.
    """
    lm_pairs = bigram_pairs(lm_df, id_col, text_col)
    bi = lm_pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    ctx = bi.groupBy("w1").agg(F.sum("cb").alias("cw"))
    uni = unigram_counts(lm_df, text_col).withColumnRenamed("c", "cu")
    tot = uni.agg(F.sum("cu").alias("n_"), F.count("*").alias("v_"))

    dbg = bigram_pairs(df, id_col, text_col)
    p_bi = F.coalesce(
        F.col("cb").cast("double") / F.col("cw").cast("double"), F.lit(0.0)
    )
    p_uni = (F.coalesce(F.col("cu2"), F.lit(0)).cast("double") + F.lit(alpha)) / (
        F.col("n_").cast("double") + F.lit(alpha) * F.col("v_").cast("double")
    )
    scored = (
        dbg.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(
            F.broadcast(
                uni.select(F.col("token").alias("w2"), F.col("cu").alias("cu2"))
            ),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select("sid", F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni).alias("lp"))
        .groupBy("sid")
        .agg(F.count("*").alias("n_bigrams"), F.avg("lp").alias("avg_lp"))
    )
    return (
        df.select(F.col(id_col).alias("sid"))
        .join(scored, "sid", "left")
        .select(
            F.col("sid").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("avg_lp", F.lit(0.0)).alias("avg_lp"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.,
    "Data Selection for Language Models via Importance Resampling",
    NeurIPS 2023): log w(x) = mean log p_target(x) - mean log p_raw(x)
    under bigram LMs trained on the target domain vs the raw corpus
    itself. Documents resembling the target domain score > 0; sampling
    proportional to w resamples the raw corpus toward the target
    distribution. Published method, re-expressed as two broadcast-LM
    scoring passes over one exploded bigram stream each.

    Returns (id_col, n_bigrams, log_weight); zero-bigram docs carry
    weight 0.0. Consumers round log_weight (order-dependent means).
    """
    t = bigram_interp_scores(df, target_df, id_col, text_col, lam, alpha)
    r = bigram_interp_scores(df, df, id_col, text_col, lam, alpha)
    return (
        t.alias("t")
        .join(r.alias("r"), id_col)
        .select(
            F.col(id_col),
            F.col("t.n_bigrams").alias("n_bigrams"),
            (F.col("t.avg_lp") - F.col("r.avg_lp")).alias("log_weight"),
        )
    )


# Gopher-rule stopword presence list (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", table A1 heuristics — public
# knowledge). Distinct-PRESENCE is counted, not occurrences.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stopwords_present: int = 2,
) -> DataFrame:
    """Gopher-style composite quality rules (Rae et al. 2021; the same
    heuristic family C4/Dolma/RefinedWeb pipelines use). Emits the raw
    per-document metrics, a reason-coded ``first_fail`` (rule order is
    the contract, NULL = clean), and ``keep``.

    Rules, in failure-priority order:
      too_few_words / too_many_words   — word count outside bounds
      word_len                         — mean word length outside bounds
      symbol_ratio                     — ('#' chars + '...' runs)/words
      bullet_lines / ellipsis_lines    — line-shape boilerplate
      alpha_words                      — frac of words containing [A-Za-z]
      stopwords                        — < N distinct required stopwords

    Everything is a pure Column expression (one codegen'd projection,
    no shuffle, no UDF) so the pass is scan-bound at 100 TB; divisions
    are per-row IEEE arithmetic, bit-identical in the DuckDB SQL twin
    (ship unrounded). Tokenization is the fixture contract:
    single-space word split, '\\n' line split.
    """
    text = F.col(text_col)
    words = F.split(text, " ")
    lines = F.split(text, "\n")
    n_words = F.size(words).cast("bigint")
    n_lines = F.size(lines).cast("double")
    nonspace = F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("double")
    mean_wl = nonspace / F.nullif(n_words, F.lit(0)).cast("double")
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / F.nullif(
        n_words, F.lit(0)
    ).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda x: F.ltrim(x).startswith("-")
                | F.ltrim(x).startswith("*"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda x: F.rtrim(x).endswith("..."))).cast(
            "double"
        )
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / F.nullif(n_words, F.lit(0)).cast("double")
    )
    sw_present = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stopwords]),
            lambda s: F.array_contains(words, s),
        )
    ).cast("bigint")
    first_fail = (
        F.when(n_words < min_words, "too_few_words")
        .when(n_words > max_words, "too_many_words")
        .when(
            (mean_wl < min_mean_word_len) | (mean_wl > max_mean_word_len),
            "word_len",
        )
        .when(symbol_ratio > max_symbol_ratio, "symbol_ratio")
        .when(bullet_frac > max_bullet_frac, "bullet_lines")
        .when(ellipsis_frac > max_ellipsis_frac, "ellipsis_lines")
        .when(alpha_frac < min_alpha_word_frac, "alpha_words")
        .when(sw_present < min_stopwords_present, "stopwords")
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        sw_present.alias("stopwords_present"),
        first_fail.alias("first_fail"),
        first_fail.isNull().alias("keep"),
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by pointwise mutual
    information: PMI(x, y) = ln(P(x,y) / (P(x) P(y))) with pair
    probabilities over adjacent-bigram occurrences and word
    probabilities over all tokens. The standard collocation extractor
    for training-corpus analysis (multiword expressions, boilerplate
    phrases); ``min_count`` drops the rare-pair noise PMI is known to
    amplify.

    Shape at scale: bigram pairs via the posexplode + lead form
    (``bigram_pairs``), ONE groupBy each for pair and unigram counts,
    then an equi-join of pair counts to the two unigram counts —
    Catalyst/AQE picks broadcast when the vocabulary fits (it almost
    always does: vocab grows ~log corpus). The only collects are the
    two 1-row totals (control plane).

    Float discipline: counts are exact; the PMI argument is one
    fixed-association product/quotient of exactly-representable
    integers-in-double, so both engines feed ln the identical double;
    ln is rounded at 6 (transcendental — never a terminating decimal,
    registry convention)."""
    pairs = bigram_pairs(df, id_col, text_col)
    pc = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_xy")
    )
    uni = df.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    n_tok = uni.agg(F.sum("c")).collect()[0][0]  # 1 row (control plane)
    n_pair = pc.agg(F.sum("c_xy")).collect()[0][0]  # 1 row
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    arg = (
        F.col("c_xy").cast("double")
        * F.lit(float(n_tok))
        * F.lit(float(n_tok))
    ) / (
        F.col("c_x").cast("double")
        * F.col("c_y").cast("double")
        * F.lit(float(n_pair))
    )
    return (
        pc.filter(F.col("c_xy") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(F.log(arg), 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def _hashed_gram_weight(g: Column, n_buckets: int, salt: str) -> Column:
    """Weight (integer milli-units) of one gram under the hashing
    trick: gram -> bucket via md5(salt:g) mod n_buckets, bucket ->
    weight via md5('w:'bucket) mapped to [-1000, 1000]. Two grams
    colliding into a bucket SHARE a weight — the real collision
    semantics of a hash-trick model, not an approximation of it."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), g).cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % n_buckets
    )
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("w:"), bucket.cast("string")).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2001
    ) - 1000


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "clf1",
    bigrams: bool = True,
) -> DataFrame:
    """fastText-style linear classifier INFERENCE under the hashing
    trick (Joulin et al. 2016, "Bag of Tricks for Efficient Text
    Classification" — public method): every unigram (and adjacent
    bigram) hashes into one of ``n_buckets`` weight slots; the
    document's score is the sum of its grams' slot weights, and
    ``score_milli >= 0`` is the keep margin. This is the quality /
    safety / domain classifier gate of a training-data pipeline, run
    at corpus scale.

    The environment ships no trained model, so slot weights are the
    deterministic md5-derived table in :func:`_hashed_gram_weight` —
    the PLUMBING (hash-trick bucketing, shared-slot collision
    semantics, codegen scoring) is the real thing; a trained model
    drops in by swapping that one function for a broadcast-array
    lookup (the same fake-payload convention as the multimodal
    codecs). Weights stay INTEGER milli-units so per-doc sums are
    exact at any summation order — cross-engine bit parity with zero
    float discipline.

    Scale: ZERO shuffle and zero UDF — gram construction
    (zip_with/slice), bucketing, weights and the per-doc sum
    (aggregate) are one whole-stage-codegen projection; md5 cost is
    ~the cost of reading the bytes. Inference over 100 TB is a pure
    map.
    """
    ts = tokens(F.col(text_col))
    grams = ts
    if bigrams:
        bi = F.filter(
            F.zip_with(
                ts,
                F.slice(ts, 2, F.size(ts)),
                lambda a, b: F.concat(a, F.lit("_"), b),
            ),
            lambda x: x.isNotNull(),
        )
        grams = F.concat(ts, bi)
    return df.select(
        "*",
        F.size(grams).cast("bigint").alias("n_grams"),
        F.aggregate(
            grams,
            F.lit(0).cast("bigint"),
            lambda acc, g: acc + _hashed_gram_weight(g, n_buckets, salt),
        ).alias("score_milli"),
    ).withColumn("keep", F.col("score_milli") >= 0)
