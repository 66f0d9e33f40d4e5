"""Deduplication operators for large-scale corpora.

Candidate generation (four families), clustering, and streaming — all
shuffle-friendly (no all-pairs comparison, no driver-side state), each
with an exact SQL twin in the corpus or an e2e streaming test:

- ``exact_dedup``: hash-groupBy on the text (or fingerprint) — one
  shuffle, keeper = min id.
- ``ngram_jaccard_pairs``: inverted-index join on word n-gram shingles
  → per-pair intersection counts → Jaccard. Candidate generation is
  |shingle| bounded, never |docs|².
- ``minhash_signatures`` / ``lsh_candidates``: MinHash over shingles
  (k independent hash functions realized as md5(seed:shingle), min by
  lexicographic order — engine-portable, no integer-hash parity
  issues), banded into LSH buckets; candidate pairs share a band.
  This is the 100 TB path: cost is linear in corpus size + bucket
  collisions.
- ``simhash16``: 16-bit SimHash from per-token md5 bits (hex char >=
  '8' ⇔ high bit); near-dups collide on the signature.
- ``connected_components``: candidate pairs → clusters with a keeper
  each (distributed min-label propagation) — the decision step.
- ``stream_exact_dedup``: first-arrival-wins dedup on a live stream
  (watermark-bounded keyed state).

At 100 TB: shingle explosion is the dominant shuffle; the
``max_doc_freq`` cap drops shingles that occur in more than N
documents BEFORE the self-join — a hot shingle shared by k documents
generates k^2/2 candidate pairs, so uncapped common shingles are the
quadratic blow-up. Capped shingles are also the non-discriminative
ones (they carry ~no Jaccard signal), which is why production dedup
pipelines drop them. Jaccard/minhash are then computed over the
surviving (rare, discriminative) shingle sets on BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, id_col: str, key_col: str) -> DataFrame:
    """Exact duplicate groups: key → keeper (min id), copy count.
    One hash shuffle on the key; at scale pre-hash long texts to
    md5(text) so the shuffle key is 16 bytes, not the document."""
    return (
        df.groupBy(F.col(key_col).alias("dup_key"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def shingle_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id, shingle) with distinct word n-grams per document.

    ``max_doc_freq`` drops shingles occurring in more than that many
    documents (anti-skew + quadratic-pair control; see module doc).

    Relational formulation (posexplode tokens → ``lead``-composed
    n-grams → distinct), matching ``winnow_fingerprint_table``: the
    array/lambda Column form (``explode(word_ngrams(...))``) evaluates
    the higher-order transform INTERPRETED and re-runs ``split(text)``
    for every one of the n element accesses per position — measured
    ~5s vs ~1s at sf0.1 for the same 250k-shingle output. Every step
    here is whole-stage codegen; ``word_ngrams`` remains the
    specification form (equivalence pinned in
    test_shingle_table_matches_column_expression). The
    ``repartition(n, id_col)`` both spreads the CPU-amplifying explode
    AND satisfies the lead window's hash distribution, so no extra
    exchange; the per-doc distinct is a groupBy(sid) collect_set —
    clustered on sid, so it ALSO rides that partitioning (a plain
    ``.distinct()`` on (sid, shingle) re-shuffled the whole shingle
    table; set size is bounded by document length, same bound the old
    per-row ``array_distinct`` had)."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    from pyspark.sql import Window

    base = (
        df.repartition(n_parts, id_col)
        .select(
            F.col(id_col).alias("sid"),
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        .select(
            "sid",
            F.size("_toks").alias("_n"),
            F.posexplode("_toks").alias("pos", "_t"),
        )
    )
    wl = Window.partitionBy("sid").orderBy("pos")
    sh = (
        base.withColumn(
            "_g",
            F.concat_ws(" ", "_t", *[F.lead("_t", j).over(wl) for j in range(1, n)]),
        )
        .filter(F.col("pos") <= F.col("_n") - n)  # complete n-grams only
        .groupBy("sid")
        .agg(F.collect_set("_g").alias("_gs"))
        .select("sid", F.explode("_gs").alias("shingle"))
    )
    if max_doc_freq is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        sh = (
            sh.join(df_counts.filter(F.col("df_") <= max_doc_freq), "shingle")
            .select("sid", "shingle")
        )
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard >= threshold.

    Plan: explode distinct shingles → self-equi-join on shingle (the
    inverted index) → groupBy (a, b) count = |A ∩ B| → join per-doc
    shingle counts → Jaccard = inter / (|A| + |B| - inter).
    """
    # the shingle table feeds the size aggregate AND both sides of the
    # self-join — a lazy localCheckpoint computes the explode+window
    # pipeline once instead of three times (at 100 TB the shingle pass
    # is the dominant CPU; recomputing it per consumer tripled it)
    sh = shingle_table(df, id_col, text_col, n, max_doc_freq).localCheckpoint(
        eager=False
    )
    sizes = sh.groupBy("sid").agg(F.count(F.lit(1)).alias("n_shingles"))
    # User-specified repartition on the join key: candidate-pair
    # generation explodes AFTER this join, so AQE's byte-based
    # coalescing would under-parallelize it.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    sh_spread = sh.repartition(n_parts, "shingle")
    a = sh_spread.alias("a")
    b = sh_spread.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.sid") < F.col("b.sid")))
        .groupBy(F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("sid").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("sid").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT word-n-gram Jaccard >= threshold pairs via prefix
    filtering (SSJoin/PPJoin family — Chaudhuri et al. ICDE 2006,
    Xiao et al. WWW 2008, public): same answers as
    ``ngram_jaccard_pairs`` with NO ``max_doc_freq`` approximation,
    and the hot-shingle quadratic blow-up killed structurally instead
    of by dropping data.

    Principle: order every document's shingles by a global canonical
    order (ascending document frequency, ties by shingle — rarest
    first). For Jaccard >= t, a qualifying pair must share at least
    ``ceil(t*|d|)`` shingles with any partner, so two documents whose
    FIRST ``|d| - ceil(t*|d|) + 1`` shingles (the "prefix") are
    disjoint cannot qualify — the inverted index only needs prefix
    tokens. Hot boilerplate shingles have the HIGHEST df, sort last,
    and rarely make any prefix: the skew that forced the df cap
    disappears from the index by construction.

    Plan: shingle table (computed once, lazily checkpointed) → df
    join + per-doc rank window → prefix rows → prefix-prefix
    self-join with the symmetric size filter (t*|A| <= |B| and
    t*|B| <= |A|) → distinct candidate pairs → exact verification
    (count the full intersection for candidates only) → Jaccard.
    Candidate count is linear in true matches plus prefix collisions,
    never Σ df² over hot shingles.

    When to use which: on skew-free corpora the plain inverted index
    is cheaper (fewer passes — measured 5.4s vs 7.1s at sf0.1); under
    boilerplate skew this one wins and the gap grows quadratically
    with corpus size (7 universal shingles planted into every sf0.1
    doc: 10.1s here vs 22.5s for the exact base; the df-capped base
    stays fast but is approximate).

    The ceil uses a 1e-9 guard: ``ceil(t*|d|)`` computed on binary
    doubles can land one ABOVE the true integer ceiling (0.7*10 =
    7.000000000000001 → 8), silently shortening the prefix and
    dropping valid pairs."""
    from pyspark.sql import Window

    sh = shingle_table(df, id_col, text_col, n, None).localCheckpoint(
        eager=False
    )
    sizes = sh.groupBy("sid").agg(F.count(F.lit(1)).alias("n_sh"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    wp = Window.partitionBy("sid").orderBy("df_", "shingle")
    ordered = (
        sh.join(freq, "shingle")
        .withColumn("_pos", F.row_number().over(wp))
        .join(sizes, "sid")
    )
    alpha = F.ceil(F.lit(float(threshold)) * F.col("n_sh") - F.lit(1e-9))
    pref = ordered.filter(
        F.col("_pos") <= F.col("n_sh") - alpha + 1
    ).select("sid", "shingle", "n_sh")

    a, b = pref.alias("a"), pref.alias("b")
    t = float(threshold)
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.sid") < F.col("b.sid"))
            # symmetric size filter: |B| in [t*|A|, |A|/t]
            & (F.col("b.n_sh") >= t * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= t * F.col("b.n_sh")),
        )
        .select(
            F.col("a.sid").alias("id_a"),
            F.col("b.sid").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .distinct()  # pairs sharing several prefix tokens verify once
    )
    # exact verification over candidates only: |A ∩ B| by routing A's
    # full shingle set through the candidate pair to a semi match on B
    inter = (
        cand.join(sh.select(F.col("sid").alias("id_a"), "shingle"), "id_a")
        .join(
            sh.select(F.col("sid").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    )


def winnow_fingerprint_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id, fp) inverted-index table of winnowed fingerprints: each
    document contributes ~2/(w+1) of its k-gram hashes, so the index
    is a fraction of the full shingle table's size — the winnowing
    scale advantage.

    Implementation is the RELATIONAL formulation of
    ``text.winnow_fingerprints`` (same values, proven equivalent in
    test_winnow_table_matches_column_expression): posexplode tokens →
    ``lead``-composed k-grams → md5 → sliding ``min() OVER (ROWS w-1
    FOLLOWING)`` → valid-window filter → distinct. Every step is
    whole-stage-codegen; the array/lambda Column form evaluates
    higher-order functions INTERPRETED per element and re-evaluates
    the inlined hash array per window — measured 15x slower at sf0.1
    (38.8s vs 2.5s for the fingerprint table), which at 100 TB is the
    difference between a CPU-bound cluster and a working one. The
    ``repartition(n, id_col)`` both spreads the explode AND satisfies
    the window's required hash distribution, so the lead/min windows
    sort within partitions without any extra exchange."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartition(n_parts, id_col)
        .select(
            F.col(id_col).alias("sid"),
            F.split(F.col(text_col), " ").alias("_toks"),
        )
        .select(
            "sid",
            F.size("_toks").alias("_n"),
            F.posexplode("_toks").alias("pos", "_t"),
        )
    )
    from pyspark.sql import Window

    wl = Window.partitionBy("sid").orderBy("pos")
    ng = (
        base.withColumn(
            "_g",
            F.concat_ws(" ", "_t", *[F.lead("_t", j).over(wl) for j in range(1, k)]),
        )
        .filter(F.col("pos") <= F.col("_n") - k)  # complete k-grams only
        .withColumn("_h", F.md5(F.col("_g").cast("binary")))
    )
    nh = F.col("_n") - (k - 1)  # k-gram hash count for the document
    wmin = Window.partitionBy("sid").orderBy("pos").rowsBetween(0, w - 1)
    fps = (
        ng.withColumn("_wm", F.min("_h").over(wmin))
        # full windows start at 0..nh-w; shorter-than-window docs keep
        # the single global min (the frame clips at the partition end)
        .filter((F.col("pos") <= nh - w) | ((nh < w) & (F.col("pos") == 0)))
        .select("sid", F.col("_wm").alias("fp"))
        .distinct()
    )
    if max_doc_freq is not None:
        df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df_"))
        fps = fps.join(df_counts.filter(F.col("df_") <= max_doc_freq), "fp").select(
            "sid", "fp"
        )
    return fps


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Partial-overlap pairs by shared winnowed fingerprints: the
    rolling-hash dedup family (plagiarism / quote / near-copy
    detection). Two documents sharing any token run >= w + k - 1 long
    share a fingerprint, so candidate generation is an equi-join on the
    (small) fingerprint index — never all-pairs, and cheaper than the
    full-shingle Jaccard join by the winnowing density factor.

    ``containment`` = shared / min(|A|, |B|): a short document copied
    into a long one scores ~1.0 (Jaccard would dilute it toward 0 —
    the reason containment is the contamination metric of choice).
    """
    fps = winnow_fingerprint_table(
        df, id_col, text_col, k, w, max_doc_freq
    ).localCheckpoint(eager=False)  # reused by sizes + both join sides
    sizes = fps.groupBy("sid").agg(F.count(F.lit(1)).alias("n_fps"))
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    fps_spread = fps.repartition(n_parts, "fp")
    a = fps_spread.alias("a")
    b = fps_spread.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.sid") < F.col("b.sid")))
        .groupBy(F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("sid").alias("id_a"), F.col("n_fps").alias("n_a"))
    sb = sizes.select(F.col("sid").alias("id_b"), F.col("n_fps").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "containment",
            F.col("n_shared").cast("double")
            / F.least("n_a", "n_b").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "n_shared", "n_a", "n_b", "containment")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 12,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id, hash_idx, minhash): MinHash signature rows.

    Hash function family: h_i(shingle) = md5('<i>:' || shingle),
    minimized lexicographically — identical strings on every engine,
    which is why the oracle can verify it.

    Plan note: the k mins are computed as ONE wide aggregation over the
    un-exploded shingle table — partial (map-side) aggregation reduces
    each task's contribution to k values per document BEFORE the
    shuffle. The naive explode-seeds plan shuffles k x |shingles| rows
    of 32-char digests; this shuffles ~k x |docs|."""
    sh = shingle_table(df, id_col, text_col, n, max_doc_freq)
    return minhash_from_shingles(sh, k)


def minhash_from_shingles(sh: DataFrame, k: int = 12) -> DataFrame:
    """(sid, hash_idx, minhash) from a prepared (sid, shingle) table —
    the signature step of ``minhash_signatures`` split out so callers
    (e.g. the persisted dedup index) can filter the shingle table
    against an external hot-shingle list first."""
    aggs = [
        F.min(
            F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")).cast("binary"))
        ).alias(f"mh{i}")
        for i in range(k)
    ]
    wide = sh.groupBy("sid").agg(*aggs)
    stack = (
        f"stack({k}, "
        + ", ".join(f"{i}, mh{i}" for i in range(k))
        + ") AS (hash_idx, minhash)"
    )
    return wide.select("sid", F.expr(stack))


def band_signatures(
    sig: DataFrame, k: int = 12, bands: int = 3
) -> DataFrame:
    """(sid, band, band_sig) from ``minhash_signatures`` rows: band
    signature = md5 of the band's concatenated minhashes. Two docs
    agreeing on all rows_per_band = k/bands minhashes of any band
    collide — the similarity knee of MinHash LSH.

    The minhashes within a band are SORTED before hashing (the
    ``collect_list`` order is nondeterministic across partitionings),
    so banding is multiset- rather than position-sensitive: two docs
    whose band holds the same k/bands values in a different hash_idx
    arrangement also collide. With 128-bit md5 minhashes such
    permutation collisions are negligible extra candidates (candidates
    are verified downstream anyway), and the DuckDB oracles compute
    the same sorted-multiset semantics."""
    if k % bands != 0:
        raise ValueError(
            f"k={k} not divisible by bands={bands}: truncated "
            f"rows-per-band would silently create extra (possibly "
            f"1-minhash) bands, blowing up the candidate-pair count "
            f"and shifting the similarity knee"
        )
    rows_per_band = k // bands
    return (
        sig.withColumn("band", (F.col("hash_idx") / rows_per_band).cast("int"))
        .groupBy("sid", "band")
        .agg(
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("minhash"))).cast("binary")
            ).alias("band_sig")
        )
    )


def lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 12,
    bands: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band
    (band signature = md5 of the band's concatenated minhashes).
    rows_per_band = k / bands controls the similarity knee."""
    sig = minhash_signatures(df, id_col, text_col, n, k, max_doc_freq)
    # banded feeds both sides of the self-join: one signature pass
    banded = band_signatures(sig, k, bands).localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.sid") < F.col("b.sid")),
        )
        .select(F.col("a.sid").alias("id_a"), F.col("b.sid").alias("id_b"))
        .distinct()
    )


def fuzzy_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str,
    text_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """Entity resolution by bounded edit distance WITHIN blocks:
    (id_a, id_b, dist) for pairs sharing the blocking key with
    levenshtein(text_a, text_b) <= max_dist.

    Scale shape: the join key is the block (one shuffle, pairs never
    cross blocks — same discipline as blocked_pairs_cosine), and the
    thresholded ``levenshtein(l, r, threshold)`` short-circuits the DP
    once the bound is exceeded, so per-pair cost is O(max_dist·len)
    instead of O(len²). Never all-pairs: block on something with
    bounded cardinality per value (brand, domain, zip...)."""
    a = df.select(
        *[F.col(c).alias(f"blk_{i}") for i, c in enumerate(block_cols)],
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("txt_a"),
    )
    b = df.select(
        *[F.col(c).alias(f"blk_{i}") for i, c in enumerate(block_cols)],
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("txt_b"),
    )
    dist = F.levenshtein(F.col("txt_a"), F.col("txt_b"), max_dist)
    return (
        a.join(b, [f"blk_{i}" for i in range(len(block_cols))])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)  # -1 = threshold exceeded
        .select(
            *[F.col(f"blk_{i}").alias(c) for i, c in enumerate(block_cols)],
            "id_a", "id_b", "dist",
        )
    )


def contamination_pairs(
    train_df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag (train_id, bench_id) pairs where
    a training document contains >= ``threshold`` of a benchmark
    document's distinct word n-grams — the standard n-gram-overlap
    contamination check run before training so eval sets aren't leaked
    into the corpus. CONTAINMENT (n_inter / n_bench), not Jaccard: a
    train doc that embeds a whole benchmark item inside a larger page
    must still score 1.0.

    Plan: inverted-index join on the shingle (never all-pairs; the
    bench side is small, AQE broadcasts it) → per-pair intersection
    counts → divide by the bench doc's shingle count. ``max_doc_freq``
    drops shingles whose TRAIN-side document frequency exceeds the cap
    from BOTH sides including the denominator (hot boilerplate shingles
    are the quadratic-pair blow-up AND carry no containment signal) —
    same anti-skew contract as ``ngram_jaccard_pairs``. At 100 TB the
    cost is one pass over train shingles + |matches|."""
    # both shingle tables feed multiple consumers (hot-list agg,
    # anti-joins, size agg, intersection join): checkpoint lazily so
    # the explode/window passes run once each
    tr = shingle_table(train_df, id_col, text_col, n).select(
        F.col("sid").alias("train_id"), "shingle"
    ).localCheckpoint(eager=False)
    be = shingle_table(bench_df, id_col, text_col, n).select(
        F.col("sid").alias("bench_id"), "shingle"
    ).localCheckpoint(eager=False)
    if max_doc_freq is not None:
        hot = (
            tr.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_doc_freq)
            .select("shingle")
        )
        tr = tr.join(hot, "shingle", "left_anti")
        be = be.join(hot, "shingle", "left_anti")
    bsizes = be.groupBy("bench_id").agg(F.count(F.lit(1)).alias("n_bench"))
    inter = (
        tr.join(be, "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(bsizes, "bench_id")
        .withColumn(
            "overlap",
            F.col("n_inter").cast("double") / F.col("n_bench").cast("double"),
        )
        .filter(F.col("overlap") >= threshold)
        .select("train_id", "bench_id", "n_inter", "n_bench", "overlap")
    )


def stream_exact_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: emit the FIRST arrival of each key,
    suppress re-arrivals within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — keyed state store holds one
    entry per key, GC'd once the watermark passes, so state is bounded
    by keys-per-horizon, not keys-ever). The ingestion-side half of the
    dedup family: batch exact/minhash passes dedup the corpus at rest;
    this keeps the firehose clean before it lands."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    on_non_convergence: str = "raise",
) -> DataFrame:
    """(id, component) over the undirected candidate-pair graph;
    component id = smallest member id. This is the step that turns
    near-dup PAIRS into dedup DECISIONS: every document in a component
    except the min-id keeper is a duplicate.

    Plan: min-label propagation with POINTER DOUBLING — each iteration,
    every vertex adopts the minimum of its own, its neighbors', and its
    current label's label (label-of-label = path-halving step, the same
    acceleration small-star/large-star gets from star contraction).
    Labels therefore reach graph distance 2^k after k iterations: a
    chain of length L converges in O(log L) rounds, not O(L) — at
    max_iter=25 anything up to ~2^25-diameter resolves, so
    non-convergence is pathological, not merely "long chain". Each
    iteration is two joins + one aggregate, all distributed; lineage is
    cut per iteration with ``localCheckpoint`` so the plan stays
    constant size; the driver sees one scalar count per round.

    ``on_non_convergence``: ``"raise"`` (default) raises RuntimeError
    if labels are still changing after ``max_iter`` iterations —
    returning split components would be a silently wrong dedup answer;
    ``"warn"`` emits a warning and returns the partial labels (callers
    that prefer over-splitting to failing, e.g. best-effort batch
    jobs).
    """
    if on_non_convergence not in ("raise", "warn"):
        raise ValueError(
            f"on_non_convergence must be 'raise' or 'warn', got "
            f"{on_non_convergence!r}"
        )
    # symmetric closure as a self-union: the two branches' expensive
    # subtree (the candidate-pair pipeline, which ends in an exchange
    # — LSH distinct) is deduplicated by ReuseExchange, so this is a
    # single physical evaluation; an explode-of-both-orientations
    # rewrite was A/B-measured equal-to-slower (round-11 opt notes)
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    # Size the loop's parallelism to the GRAPH, not the session: a
    # dup-pair graph is typically a tiny fraction of the corpus, and
    # paying shuffle_partitions-wide task scheduling for two joins +
    # a checkpoint per iteration dominates wall time on small graphs
    # (measured ~2s of pure overhead for a 573-node graph at 32
    # partitions). One edge-count job up front (the edges frame is
    # persisted; every iteration reuses it) picks ~1 partition per
    # 200k edges, capped at the session default — a billion-edge graph
    # at 100 TB still gets full parallelism.
    n_edges = edges.count()
    sc = pairs.sparkSession.sparkContext
    n_parts = max(1, min(sc.defaultParallelism, n_edges // 200_000 + 1))
    # keep a handle to the PERSISTED frame: unpersist() on the
    # repartitioned child would not sameResult-match the cached plan,
    # leaking one cached edge table per call into executor storage
    edges_cached = edges
    edges = edges.repartition(n_parts, "a")
    converged = False
    # single-partition graphs run the loop under non-adaptive
    # single-partition scheduling (operators/scheduling.py): with AQE
    # on, each of the ~6 exchanges per iteration is its own stage-job
    # and each broadcast join adds a build-side job — measured 7-8
    # jobs/iteration on a 402-edge graph vs 1 with the scope active,
    # identical labels. Larger graphs (n_parts > 1) keep AQE.
    from activedatawarehouseprototype_spark.operators.scheduling import (
        single_partition_loop,
    )

    try:
        with single_partition_loop(pairs.sparkSession, n_parts):
            labels = edges.select(F.col("a").alias("id")).distinct().select(
                "id", F.col("id").alias("comp")
            )
            for it in range(max_iter):
                neighbor_min = (
                    edges.join(
                        labels.select(
                            F.col("id").alias("b"), F.col("comp").alias("bcomp")
                        ),
                        "b",
                    )
                    .groupBy(F.col("a").alias("id"))
                    .agg(F.min("bcomp").alias("ncomp"))
                )
                stepped = labels.join(neighbor_min, "id", "left")
                if it > 0:
                    # pointer doubling: also look up the label OF the
                    # current label, so label chains halve every round
                    # (O(log diameter)). Skipped in iteration 0, where
                    # labels are still the identity map and the lookup is
                    # a no-op join.
                    label_of_label = labels.select(
                        F.col("id").alias("comp"), F.col("comp").alias("ccomp")
                    )
                    stepped = stepped.join(label_of_label, "comp", "left")
                    new_comp = F.least(
                        F.col("comp"),
                        F.coalesce("ncomp", F.col("comp")),
                        F.coalesce("ccomp", F.col("comp")),
                    )
                else:
                    new_comp = F.least(
                        F.col("comp"), F.coalesce("ncomp", F.col("comp"))
                    )
                # carry the previous label through the checkpoint so the
                # convergence check is a filter over the materialized frame,
                # not another join per iteration
                stepped = stepped.select(
                    "id",
                    new_comp.alias("comp"),
                    F.col("comp").alias("prev"),
                ).localCheckpoint(eager=False)
                # lazy checkpoint: this count is the materializing action,
                # so an iteration costs ONE job instead of an
                # eager-checkpoint + count pair (pure job-submission
                # overhead on small graphs — same finding as the twostar
                # loop)
                changed = stepped.filter(F.col("comp") != F.col("prev")).count()
                labels = stepped.drop("prev")
                if changed == 0:
                    converged = True
                    break
    finally:
        edges_cached.unpersist()
    if not converged:
        msg = (
            f"connected_components did not converge within {max_iter} "
            f"iterations — labels were still changing; the returned "
            f"components would be over-split. Raise max_iter or inspect "
            f"the candidate graph for pathological topology."
        )
        if on_non_convergence == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def connected_components_twostar(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    on_non_convergence: str = "raise",
) -> DataFrame:
    """(id, component) over the undirected candidate-pair graph via
    the large-star / small-star alternation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) —
    component id = smallest member id, same contract as
    ``connected_components``.

    Why a second algorithm: min-label propagation (even with pointer
    doubling) keys every per-round join by the CURRENT LABEL, so as
    components coalesce, all of a giant component's vertices hash to
    ONE reducer key — at web scale (billions of near-dup docs, one
    boilerplate mega-component) that final-round key is a straggler no
    salt fixes, because the skew is in the algorithm, not the data
    layout. Large-star/small-star instead keys every round by VERTEX
    (each vertex re-links its own neighbors), so round cost stays
    proportional to degree distribution, and the edge set provably
    SHRINKS toward a union of stars in O(log^2 n) alternating rounds
    (each round strictly reduces the potential; fixed points are
    exactly unions of min-rooted stars — Kiveris Thm. 1/2). This is
    the 100 TB-defensible choice for dedup graphs; the label-prop
    variant stays for small/mid graphs where its per-round constant
    (2 joins vs 2 joins + 2 distincts) wins.

    Per round, each a distributed job over canonical (big, small)
    edges:
      large-star: every vertex u links each strictly-larger neighbor
        v to m(u) = min(N(u) ∪ {u})  →  edges (v, m(u)), v > u ≥ m;
      small-star: orienting edges big→small, every vertex u links its
        smaller neighbors (and itself) to its min neighbor.
    Both emit canonical pairs by construction (emitted (x, m) always
    has x > m after self-loop drop), so the fixed-point check is a
    set compare of two canonical frames: one subtract + two counts.
    Lineage is cut per round with ``localCheckpoint``.
    """
    if on_non_convergence not in ("raise", "warn"):
        raise ValueError(
            f"on_non_convergence must be 'raise' or 'warn', got "
            f"{on_non_convergence!r}"
        )
    spark = pairs.sparkSession
    # ONE setup job: the symmetric closure (both orientations,
    # self-loops kept, distinct) is the only frame materialized from
    # ``pairs`` — canonical edges are a FILTER of it (a > b picks each
    # undirected edge exactly once, no second distinct) and the node
    # set is a lazy projection of the same cache, evaluated inside the
    # final assembly job. Deriving nodes straight from ``pairs`` would
    # re-run the whole candidate-pair pipeline (e.g. the MinHash/LSH
    # pass) a second time; a separate eager nodes/edges
    # materialization pair paid two more planning-bound jobs
    # (measured: setup fell 3.5 s -> ~1 s on a 307-edge graph).
    sym = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    try:
        edges = sym.filter(F.col("a") > F.col("b"))
        # Same graph-sized parallelism as connected_components: the dup
        # graph is a sliver of the corpus; session-wide task counts for
        # per-round jobs on a tiny frame are pure scheduling overhead.
        n_edges = edges.count()
        n_parts = max(
            1,
            min(spark.sparkContext.defaultParallelism, n_edges // 200_000 + 1),
        )
        # lazy: round 1's count (or the final assembly) materializes
        # this off the still-cached sym
        edges = edges.repartition(n_parts, "a").localCheckpoint(eager=False)
        nodes = sym.select(F.col("a").alias("id")).distinct()
        out = _twostar_loop(
            edges, nodes, n_edges, n_parts, max_iter, on_non_convergence
        )
    finally:
        sym.unpersist()
    return out


def _twostar_round(edges: DataFrame, n_parts: int) -> DataFrame:
    """ONE large-star + small-star alternation over canonical (big,
    small) edges — exactly 3 exchanges (plan-pinned by
    ``test_twostar_round_plan_is_three_exchanges``):

    Each star pass computes a per-key MIN and joins it back to the
    same rows — exactly a window aggregate, which is ONE exchange
    instead of the agg-shuffle + join-shuffle pair. Intermediate
    duplicates are left in place ((v, m) can repeat across stars;
    small-star's per-edge self rows repeat too): every downstream
    consumer is a MIN or a set-compare, so dups are semantics-neutral,
    and dropping the mid-round distinct saves another exchange. The
    final distinct rides the repartition's hash(a) clustering (a
    subset of the (a, b) distinct keys), so it adds NO exchange. Net:
    3 shuffles/round vs 7 in the agg+join formulation — on small
    graphs (where rounds are scheduling-bound) that halved the loop's
    wall time."""
    # -- large-star: key by EVERY vertex (both orientations) ----------
    nbrs = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).union(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    after_large = (
        nbrs.withColumn(
            "m",
            F.least(F.min("v").over(Window.partitionBy("u")), F.col("u")),
        )
        .filter(F.col("v") > F.col("u"))  # v > u >= m: v != m free
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
    )
    # -- small-star: key by the LARGER endpoint only ------------------
    al = after_large.withColumn("m", F.min("b").over(Window.partitionBy("a")))
    # each row re-links BOTH its smaller endpoint and itself to the
    # min: explode, not a self-union — a union of two projections of
    # the same unmaterialized frame duplicates the whole window chain
    # in the plan (the exchange-count test caught exactly that)
    return (
        al.select(F.explode(F.array("b", "a")).alias("x"), "m")
        .filter(F.col("x") != F.col("m"))
        .select(F.col("x").alias("a"), F.col("m").alias("b"))
        .repartition(n_parts, "a")
        .dropDuplicates(["a", "b"])
    )


def _twostar_loop(
    edges: DataFrame,
    nodes: DataFrame,
    n_edges: int,
    n_parts: int,
    max_iter: int,
    on_non_convergence: str,
) -> DataFrame:
    from activedatawarehouseprototype_spark.operators.scheduling import (
        single_partition_loop,
    )

    converged = n_edges == 0
    # same single-partition scheduling scope as connected_components:
    # on an n_parts == 1 graph the 3 exchanges per round are 3
    # stage-jobs under AQE and 1 pipelined job without it. The final
    # star assembly materializes inside the scope too (its eager
    # checkpoint), so every loop action is covered.
    with single_partition_loop(edges.sparkSession, n_parts):
        for _ in range(max_iter if n_edges else 0):
            after_small = _twostar_round(edges, n_parts).localCheckpoint(
                # lazy: the count below is the materializing action, so
                # a round costs ONE job (plus the rare subtract), not
                # two — the eager-checkpoint+count pair was pure
                # job-submission overhead on small graphs
                eager=False
            )
            # canonical-set fixed-point check: E' == E iff same size
            # and E' \ E is empty (one subtract job + cached counts)
            n_after = after_small.count()
            if n_after == n_edges and after_small.subtract(edges).count() == 0:
                edges = after_small
                converged = True
                break
            edges, n_edges = after_small, n_after
        return _twostar_finish(
            edges, nodes, converged, max_iter, on_non_convergence
        )


def _twostar_finish(
    edges: DataFrame,
    nodes: DataFrame,
    converged: bool,
    max_iter: int,
    on_non_convergence: str,
) -> DataFrame:
    if not converged:
        msg = (
            f"connected_components_twostar did not converge within "
            f"{max_iter} alternating rounds — the edge set was still "
            f"changing; returned components would be over-split."
        )
        if on_non_convergence == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # fixed point is a union of min-rooted stars: comp(a) = b for every
    # star edge, roots (and isolated canonical nodes) map to themselves.
    # Eager: the result must be materialized while the caller's sym
    # cache (which `nodes` reads) is still live.
    star = edges.groupBy(F.col("a").alias("id")).agg(F.min("b").alias("c"))
    return (
        nodes.join(star, "id", "left")
        .select("id", F.coalesce("c", F.col("id")).alias("comp"))
        .localCheckpoint()
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document from per-token md5 bits.

    bit_j(token) = +1 if md5(token)[j] >= '8' else -1 (hex chars sort
    after digits, so the comparison IS the high-bit test); signature
    bit j = 1 iff the sum over tokens > 0. Identical semantics in SQL."""
    toks = df.select(
        F.col(id_col).alias("sid"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok").cast("binary")))
    bit_cols = [
        F.sum(
            F.when(F.substring("h", j + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(16)
    ]
    summed = toks.groupBy("sid").agg(*bit_cols)
    sig = F.concat(
        *[F.when(F.col(f"s{j}") > 0, "1").otherwise("0") for j in range(16)]
    )
    return summed.select("sid", sig.alias("simhash"))


def semantic_cluster_survivors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    threshold: float = 0.95,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding
    space coarsely (IVF assignment — centroids broadcast as literals
    into one codegen projection, no shuffle on the assign side), then
    within each cluster mark a vector as a duplicate when its cosine
    to ANY lower-id cluster member reaches ``threshold``; survivors
    are the non-duplicates. Returns (id_col, cell) survivor rows.

    Decision rule: "near any lower-id member" is deterministic and
    engine-portable (the SQL twin states it verbatim); it removes at
    least as much as keep-one-per-connected-component within a cell
    (a chain a~b, b~c with a!~c still drops both b and c — acceptable
    for training-data pruning where over-removal of near-dups is the
    cheap direction). Cross-cluster near-dups are NOT caught — the
    standard SemDeDup trade; raise ``k`` quality via
    ``ivf_kmeans_centroids`` (same seam as ANN) rather than lowering
    ``k``, because pair cost is Sigma_c |cell_c|^2.

    At 100 TB: ONE shuffle — groupBy(cell) via applyInPandas — ships
    each cell's vectors across the wire ONCE; the pair matrix is then
    numpy inside the executor (a pair JOIN would Arrow-serialize both
    64-dim vectors per candidate pair: |cell|^2 transfer instead of
    |cell|). Pair work is bounded by the largest cluster, never
    |corpus|^2; a skewed hot cell is sub-blocked the same way
    ``embedding_near_dup_pairs`` does it (sign-LSH inside the cell)
    before grouping, and the per-cell pair matrix must fit an
    executor (raise ``k`` until it does — centroid count is the
    memory knob). Cosine sums accumulate dim-by-dim in fold order
    (bit-identical to the Column fold and DuckDB's list_sum) and
    round to 6 before thresholding so the keep/drop decision is
    engine-stable (float discipline rule).

    Reference parity: the reference engine has no embedding ops at
    all; this is part of the LLM-pipeline extension surface
    (SemDeDup: Abbas et al. 2023, arXiv:2303.09540 — public)."""
    import numpy as np

    from activedatawarehouseprototype_spark.operators.similarity import (
        as_double_array,
        ivf_assign,
    )

    assigned = ivf_assign(
        df, k=k, id_col=id_col, vec_col=vec_col, centroids=centroids
    ).select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col("cell").cast("bigint").alias("cell"),
        as_double_array(F.col(vec_col)).alias("_v"),
    )

    def _survivors(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        A = np.stack(pdf["_v"].to_numpy()).astype("float64")
        n = A.shape[0]
        num = np.zeros((n, n))
        sq = np.zeros(n)
        for j in range(A.shape[1]):  # fold order: bit-exact sums
            num += np.outer(A[:, j], A[:, j])
            sq += A[:, j] * A[:, j]
        nrm = np.sqrt(sq)
        cos = np.round(num / np.outer(nrm, nrm), 6)
        # dup ⇔ within threshold of ANY lower-id member (strict lower
        # triangle after the id sort)
        dup = (np.tril(cos >= threshold, -1)).any(axis=1)
        return pdf.loc[~dup, [id_col, "cell"]]

    return assigned.groupBy("cell").applyInPandas(
        _survivors, schema=f"{id_col} bigint, cell bigint"
    )


def repeated_span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int = 8,
    min_docs: int = 2,
    hash_chunks: bool = False,
) -> DataFrame:
    """Remove exact word spans that repeat across documents (bounded
    ExactSubstr dedup, the fixed-stride approximation of Lee et al.
    "Deduplicating Training Data Makes Language Models Better").

    Documents are cut into consecutive ``chunk_words``-word chunks
    (stride = chunk size, so each word belongs to exactly one chunk);
    a chunk whose exact text appears in >= ``min_docs`` distinct
    documents is dropped from EVERY document containing it, and the
    surviving chunks (plus the <chunk_words tail, always kept) are
    re-joined in order. Unlike doc-level ``exact_dedup`` this rewrites
    partially-duplicated documents instead of keeping/dropping whole
    ones — the boilerplate/template-removal step of a training-data
    pipeline.

    Returns one row per input document:
    ``(id, n_chunks, chunks_removed, clean_text)``.

    Scale: one explode (|words|/chunk_words rows), one partial-agg
    shuffle on the chunk key for document frequency, one anti join,
    one per-doc regroup — all linear; never |docs|^2.
    ``hash_chunks=True`` shuffles/joins on ``xxhash64(chunk)`` (8
    bytes) instead of the chunk text (~6x wider) — the 100 TB setting;
    equivalence is pinned in test_repeated_span_dedup_hash_equivalence.
    The corpus oracle recomputes the string-key path in DuckDB.

    Reference scope note: the reference engine has no dedup surface;
    this extends the north-star LLM-pipeline tier (SURVEY.md §7 M5).
    """
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("sid"),
        words.alias("_w"),
        F.size(words).alias("_nw"),
        F.floor(F.size(words) / chunk_words).cast("int").alias("_nc"),
    )
    # one row per complete chunk; docs shorter than one chunk emit none
    chunks = (
        base.filter(F.col("_nc") > 0)
        .select(
            "sid",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, _nc - 1), i -> "
                    f"array_join(slice(_w, i * {chunk_words} + 1, {chunk_words}), ' '))"
                )
            ).alias("chunk_idx", "chunk"),
        )
    )
    key = F.xxhash64("chunk") if hash_chunks else F.col("chunk")
    # the chunk table feeds BOTH the document-frequency agg and the
    # anti join, so the scan+explode runs twice — deliberately NOT
    # localCheckpoint'ed (unlike the minhash shingle pass): the stride
    # explode is cheap per row, and materializing a corpus-sized chunk
    # table costs more than a second columnar scan (measured slower at
    # sf0.1 too)
    keyed = chunks.withColumn("_k", key)
    dup_keys = (
        keyed.groupBy("_k")
        .agg(F.count_distinct("sid").alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_k")
    )
    kept = keyed.join(dup_keys, "_k", "left_anti")
    reassembled = kept.groupBy("sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("_kept_text"),
        F.count(F.lit(1)).alias("_kept_chunks"),
    )
    tail = F.when(
        F.col("_nw") > F.col("_nc") * chunk_words,
        F.array_join(
            F.slice(
                F.col("_w"),
                F.col("_nc") * chunk_words + 1,
                F.col("_nw") - F.col("_nc") * chunk_words,
            ),
            " ",
        ),
    ).otherwise(F.lit(""))
    return (
        base.join(reassembled, "sid", "left")
        .select(
            F.col("sid").alias(id_col),
            F.col("_nc").alias("n_chunks"),
            (F.col("_nc") - F.coalesce("_kept_chunks", F.lit(0)))
            .cast("int")
            .alias("chunks_removed"),
            F.array_join(
                F.filter(
                    F.array(F.coalesce("_kept_text", F.lit("")), tail),
                    lambda x: x != "",
                ),
                " ",
            ).alias("clean_text"),
        )
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram_words: int = 8,
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Alignment-free exact-substring duplicate SPANS — the sorted-
    ngram realization of Lee et al.'s ExactSubstr (suffix-array
    substring dedup): find, per document, every maximal word span all
    of whose length-``ngram_words`` windows occur >= ``min_count``
    times in the whole corpus (any position, any document, including
    within-document repeats).

    Where ``repeated_span_dedup`` cuts documents at FIXED stride (a
    duplicate shifted by one word lands in differently-cut chunks and
    is missed), this emits an n-gram at EVERY word offset, so a
    duplicated substring of >= ``ngram_words`` words is found at any
    alignment — ``ngram_words`` is the detection threshold (Lee et
    al. use 50 tokens), and overlapping duplicated n-grams merge into
    maximal spans. Returns one row per maximal span:
    ``(id, span_start, span_end, span_words)`` — word offsets,
    0-based, end exclusive; callers cut ``[span_start, span_end)``
    out of the token stream (or drop docs whose duplicated fraction
    is too high).

    Scale: the n-gram table is |corpus tokens| skinny rows (the price
    of alignment-freedom; the suffix array pays the same linear
    factor) — one partial-agg shuffle on the gram key for occurrence
    counts, one semi join back, one per-doc window for the interval
    merge. Never |docs|^2. ``hash_grams=True`` keys the shuffle and
    join on ``xxhash64(gram)`` (8 bytes vs the gram text) — the
    100 TB setting; the string-key default is what the DuckDB corpus
    oracle replays (equivalence pinned in tests, same convention as
    ``repeated_span_dedup``). Hash-key caveat at extreme scale: a
    64-bit collision marks a unique gram as duplicated (a rare FALSE
    span — expected collisions ≈ G²/2⁶⁵, a few 10k at a trillion
    grams), which errs toward over-cutting; that is the accepted
    direction for dedup (the same trade every 64-bit-fingerprint
    dedup pipeline makes), and the string-key path is exact.

    Reference scope note: the reference engine has no dedup surface;
    this extends the north-star LLM-pipeline tier (SURVEY.md §7 M5).
    """
    if ngram_words < 1:
        raise ValueError("ngram_words must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 would mark everything)")
    n = int(ngram_words)
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("sid"),
        words.alias("_w"),
        F.size(words).alias("_nw"),
    )
    grams = base.filter(F.col("_nw") >= n).select(
        "sid",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, _nw - {n}), i -> "
                f"array_join(slice(_w, i + 1, {n}), ' '))"
            )
        ).alias("pos", "gram"),
    )
    key = F.xxhash64("gram") if hash_grams else F.col("gram")
    keyed = grams.withColumn("_k", key)
    # occurrence filter in ONE pass: count() over a gram-key window
    # replaces the groupBy + semi-join-back formulation, which
    # evaluated the gram-generation subtree TWICE (once under the agg,
    # once as the join's probe side — transform/slice/array_join over
    # every token is the operator's dominant per-row cost) and paid a
    # second exchange. The window's sort-by-_k is work the semi join's
    # sort-merge already did; a hyper-hot gram co-locates on one task
    # in both formulations (guide §2.4, §5 redundant evaluation).
    hits = (
        keyed.withColumn(
            "_cnt", F.count(F.lit(1)).over(Window.partitionBy("_k"))
        )
        .filter(F.col("_cnt") >= min_count)
        .select("sid", "pos")
    )
    # interval merge: duplicated n-grams cover [pos, pos + n); with the
    # hit list sorted per doc a new maximal span starts exactly when
    # the gap to the previous hit exceeds n (fixed-length intervals
    # make running-max-end == prev_pos + n, so one lag suffices)
    w_doc = Window.partitionBy("sid").orderBy("pos")
    w_run = w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = (
        hits.withColumn(
            "_brk",
            F.when(
                F.lag("pos").over(w_doc).isNull()
                | (F.col("pos") - F.lag("pos").over(w_doc) > n),
                1,
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_brk").over(w_run))
        .groupBy("sid", "_island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + n).cast("bigint").alias("span_end"),
        )
    )
    return spans.select(
        F.col("sid").alias(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_words"),
    )


def cut_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram_words: int = 8,
    min_count: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """The removal half of ExactSubstr dedup: rewrite each document
    with every maximal duplicated span (``exact_substring_spans``) cut
    out of the token stream. Like ``repeated_span_dedup`` — and like
    Lee et al.'s tooling — the span is removed from EVERY occurrence
    (training on even one boilerplate copy per cluster is a curation
    choice callers make upstream by exempting a keeper document).

    Returns one row per input document:
    ``(id, n_words, words_removed, clean_text)`` — documents with no
    duplicated span pass through verbatim (words_removed = 0).

    Plan: the span mining is ``exact_substring_spans`` (one gram
    shuffle + semi join + per-doc window); the cut itself adds ONE
    aggregation of spans per doc (rows bounded by spans, not words) +
    one left join back to the corpus + a pure codegen rebuild
    (transform/exists/filter over the word array — no UDF, no second
    corpus shuffle). Span count per doc is bounded by |words| /
    ngram_words, so the collected span array is always smaller than
    the document itself.
    """
    spans = exact_substring_spans(
        df,
        id_col,
        text_col,
        ngram_words=ngram_words,
        min_count=min_count,
        hash_grams=hash_grams,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    words = F.split(F.col(text_col), " ")
    # covered(i) = inside any [start, end) span; transform gets the
    # 0-based element index as its second lambda argument
    kept = F.filter(
        F.transform(
            words,
            lambda w, i: F.when(
                F.exists(
                    F.col("_spans"),
                    lambda s: (F.lit(i) >= s["span_start"])
                    & (F.lit(i) < s["span_end"]),
                ),
                F.lit(None).cast("string"),
            ).otherwise(w),
        ),
        lambda x: x.isNotNull(),
    )
    n_words = F.size(words)
    return (
        df.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            n_words.cast("int").alias("n_words"),
            F.when(F.col("_spans").isNull(), F.lit(0))
            .otherwise(n_words - F.size(kept))
            .cast("int")
            .alias("words_removed"),
            F.when(
                F.col("_spans").isNull(), F.col(text_col)
            )
            .otherwise(F.array_join(kept, " "))
            .alias("clean_text"),
        )
    )
