"""Deterministic, engine-portable sampling & split assignment — the
curation primitives of a training-data pipeline.

``df.sample()`` / ``sampleBy()`` draw from partition-local RNG streams:
the sample changes with partitioning, Spark version, and engine — which
is exactly wrong for corpus curation, where a document must land in the
same split on every run of every tool that touches the corpus
(otherwise train/test contamination creeps in across pipeline
versions). Hash sampling fixes that: the decision is a pure function of
the row's key.

fraction(key) = int(first 8 hex chars of md5(salt:key)) / 2^32 — a
uniform [0,1) value reproducible in any engine with md5 (the DuckDB
oracle recomputes it verbatim). Changing ``salt`` draws an independent
sample; overlapping rates nest (rate 0.1 ⊂ rate 0.2 for the same salt),
which gives consistent corpus scaling ("train on 10%, then grow to
20%" keeps the first 10%).

Scale: a pure per-row filter/projection — no shuffle, no RNG state, no
driver involvement; md5 cost is ~the cost of reading the key bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO_32 = float(1 << 32)


def hash_fraction(key_cols: list[str], salt: str = "s1") -> Column:
    """Uniform [0,1) fraction, a pure function of (salt, key columns).

    Multi-column keys are serialized injectively — each component
    length-prefixed, NULL encoded as a sentinel no real string
    produces — so ('a|b','c') vs ('a','b|c') and ('a',NULL) vs
    (NULL,'a') hash differently (concat_ws would silently collide
    them into one sampling/split decision). The single-column form is
    the plain cast (NULL → '', the historical behavior every SQL
    oracle twin mirrors)."""
    if len(key_cols) == 1:
        key = F.concat_ws("|", F.col(key_cols[0]).cast("string"))
    else:
        parts = []
        for c in key_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.coalesce(
                    F.concat(F.length(s).cast("string"), F.lit(":"), s),
                    F.lit("\\N"),
                )
            )
        key = F.concat_ws("|", *parts)
    hex8 = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), key).cast("binary")), 1, 8
    )
    return F.conv(hex8, 16, 10).cast("double") / F.lit(_TWO_32)


def deterministic_sample(
    df: DataFrame, rate: float, key_cols: list[str], salt: str = "s1"
) -> DataFrame:
    """Keep ~rate of rows, decided per-key: stable across runs,
    partitionings, and engines; samples at different rates nest."""
    return df.filter(hash_fraction(key_cols, salt) < rate)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_cols: list[str],
    default_rate: float = 0.0,
    salt: str = "s1",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing /
    source-re-weighting primitive ("keep 100% of books, 10% of
    common-crawl"). Same hash-fraction decision as
    ``deterministic_sample``, so per-stratum samples are stable across
    runs and nest across rate changes; strata not named in ``rates``
    fall back to ``default_rate``."""
    frac = hash_fraction(key_cols, salt)
    rate = F.lit(float(default_rate))
    for name, r in rates.items():
        rate = F.when(F.col(strata_col) == name, float(r)).otherwise(rate)
    return df.filter(frac < rate)


def group_quota_cap(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    max_per_group: int,
    salt: str = "q1",
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per group, chosen by the
    deterministic hash order (ties by key) — the per-source /
    per-domain quota primitive ("no single crawl domain may exceed N
    documents in the mix"). Unlike a rate-based sample, the cap is
    EXACT per group, yet which rows survive is still a pure function
    of (salt, key): stable across runs and engines.

    One window over the group (a single shuffle on group_cols); the
    ROW_NUMBER frame is streaming (no buffering beyond the current
    row), so a pathologically hot group costs one partition's scan,
    not memory."""
    if max_per_group < 1:
        raise ValueError("max_per_group must be >= 1")
    w = Window.partitionBy(*group_cols).orderBy(
        hash_fraction(key_cols, salt), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_group)
        .drop("_rn")
    )


def weighted_bernoulli_sample(
    df: DataFrame, weight: Column, key_cols: list[str], salt: str = "w1"
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep a row iff its
    hash fraction < ``weight`` (a per-row Column in [0, 1] — e.g. a
    quality score). The training-data curation shape "keep documents
    with probability proportional to quality": a pure per-row filter
    (no shuffle, no RNG state), reproducible across engines, and
    samples at scaled weights nest just like ``deterministic_sample``
    rates do."""
    return df.filter(hash_fraction(key_cols, salt) < weight)


def assign_split(
    key_cols: list[str],
    weights: dict[str, float] | None = None,
    salt: str = "s1",
) -> Column:
    """Split label column (e.g. train/val/test) from cumulative weight
    thresholds over the hash fraction. Weights must sum to 1."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    frac = hash_fraction(key_cols, salt)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        expr = (
            F.when(frac < cum, name)
            if expr is None
            else expr.when(frac < cum, name)
        )
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str,
    token_col: str,
    key_cols: list[str],
    default_budget: int = 0,
    salt: str = "s1",
) -> DataFrame:
    """Sample each source down to a TOKEN budget, not a row rate — the
    corpus-mixing primitive when the recipe says "200B tokens of web,
    30B of code" rather than "10% of web".

    Documents are ranked inside each source by the same deterministic
    hash fraction ``deterministic_sample`` uses (so the selection is
    stable across runs/engines and budgets NEST: growing a source's
    budget keeps everything the smaller budget chose), then kept while
    the running token total is within budget. The first document that
    crosses the line is dropped, as is everything after it — selected
    totals are always <= budget.

    Scale: one hash shuffle on ``source_col`` plus an in-partition sort
    (the window is ``PARTITION BY source ORDER BY frac``). That puts an
    entire source on one reducer — fine for tens-to-hundreds of
    sources, wrong when one source is half the corpus; for that shape
    use ``token_budget_threshold``, which never materializes a
    per-source ordering."""
    frac = hash_fraction(key_cols, salt)
    budget = F.lit(float(default_budget))
    for name, b in budgets.items():
        budget = F.when(F.col(source_col) == name, float(b)).otherwise(budget)
    w = (
        Window.partitionBy(source_col)
        .orderBy("_frac", *key_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_frac", frac)
        .withColumn("_cum", F.sum(F.col(token_col).cast("double")).over(w))
        .filter(F.col("_cum") <= budget)
        .drop("_frac", "_cum")
    )


def token_budget_threshold(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str,
    token_col: str,
    key_cols: list[str],
    n_buckets: int = 1024,
    salt: str = "s1",
) -> DataFrame:
    """Scale-path variant of ``token_budget_mix``: pick, per source, a
    hash-fraction THRESHOLD t such that documents with frac < t carry
    ~the budget's tokens, then apply the pure per-row filter
    ``frac < t``. Accuracy is one frac-bucket's worth of tokens
    (budget/|source| · n_buckets of relative error ~ 1/n_buckets of the
    source's tokens); the selection still nests across budget changes
    for the same salt.

    Scale: the heavy data is touched by (a) one map-side-combined agg
    on ``(source, bucket)`` — at most |sources|·n_buckets skinny rows
    into the shuffle, regardless of corpus size — and (b) one per-row
    filter against a broadcast threshold table. No per-source ordering,
    no single-reducer source partitions: this survives a source that is
    half the corpus. The cumulative-sum window runs on the tiny
    aggregate, never the corpus."""
    frac = hash_fraction(key_cols, salt)
    bucket = F.floor(frac * n_buckets).cast("int")
    with_cols = df.withColumn("_frac", frac).withColumn("_bucket", bucket)

    per_bucket = with_cols.groupBy(source_col, "_bucket").agg(
        F.sum(F.col(token_col).cast("double")).alias("_btok")
    )
    wcum = (
        Window.partitionBy(source_col)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.lit(0.0)
    for name, b in budgets.items():
        budget = F.when(F.col(source_col) == name, float(b)).otherwise(budget)
    # Highest bucket whose cumulative tokens stay within budget; the
    # threshold admits buckets 0..t inclusive.
    thresholds = (
        per_bucket.withColumn("_cum", F.sum("_btok").over(wcum))
        .filter(F.col("_cum") <= budget)
        .groupBy(source_col)
        .agg(F.max("_bucket").alias("_tbucket"))
    )
    out = with_cols.join(
        F.broadcast(thresholds), on=source_col, how="inner"
    ).filter(F.col("_bucket") <= F.col("_tbucket"))
    return out.drop("_frac", "_bucket", "_tbucket")


def shard_assignment(
    key_cols: list[str], n_shards: int, salt: str = "shard"
) -> Column:
    """Deterministic shard id in [0, n_shards): the write-side routing
    of a training-data pipeline. Same md5 decision as
    ``hash_fraction`` — a document lands in the same shard on every
    run of every engine (the DuckDB oracle recomputes it verbatim),
    unlike ``pmod(hash(...))`` whose Murmur3 seed is Spark-specific."""
    return F.floor(hash_fraction(key_cols, salt) * n_shards).cast("int")


def shuffle_position(
    key_cols: list[str], partition_cols: list[str] | None = None, salt: str = "pos"
) -> Column:
    """Deterministic within-shard training order: rank by an
    independent hash fraction (``salt`` differs from the shard salt, so
    order is uncorrelated with routing). Reproducible global shuffle —
    the property data-loading stacks need so a resumed run sees the
    same sequence."""
    w = Window.partitionBy(*(partition_cols or [])).orderBy(
        hash_fraction(key_cols, salt), *key_cols
    )
    return F.row_number().over(w)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_cols: list[str],
    shard_salt: str = "shard",
    pos_salt: str = "pos",
) -> None:
    """Materialize a deterministically shuffled, sharded training set:
    ``shard=`` directory partitions, rows inside each file in
    ``_pos`` order. ``repartition(shard)`` is the only shuffle;
    ``sortWithinPartitions`` orders each shard without a global sort.
    At 100 TB this is the standard writer shape — shards are
    independent units a loader can assign to data-parallel workers."""
    out = df.withColumn("shard", shard_assignment(key_cols, n_shards, shard_salt))
    out = out.withColumn(
        "_pos", shuffle_position(key_cols, partition_cols=["shard"], salt=pos_salt)
    )
    (
        out.repartition("shard")
        # leading 'shard' satisfies the dynamic-partition writer's
        # required ordering, so it does NOT insert its own SortExec —
        # which would both redo the work and, on spill, lose the _pos
        # order inside shard files (sort-merge of equal shard keys is
        # not stable)
        .sortWithinPartitions("shard", "_pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def temperature_mix_sample(
    df: DataFrame,
    source_col: str,
    key_cols: list[str],
    tau: float = 0.7,
    target_rows: int | None = None,
    salt: str = "tm1",
) -> DataFrame:
    """Temperature-based source re-balancing — the multilingual /
    multi-source mixing rule from the public T5 / mT5 recipes: source
    i gets sampling weight w_i = n_i^tau / Σ n_j^tau, so tau = 1 keeps
    natural proportions, tau -> 0 approaches uniform-over-sources, and
    the usual 0.3-0.7 range up-samples the tail without drowning the
    head.

    Each source is then thinned with the deterministic md5 hash coin
    at rate r_i = min(1, target_rows · w_i / n_i) (``target_rows``
    defaults to the corpus size — pure re-balancing). The coin is a
    pure function of (salt, key), so the draw is engine-portable
    (DuckDB oracle recomputes it verbatim) and nests across runs the
    way every sampler in this module does.

    Scale: one map-side-combined count per source (|sources| skinny
    rows), rates broadcast back, then a pure per-row filter — the
    corpus is never shuffled. Rates are computed driver-side from the
    per-source counts (control-plane, bounded by |sources|)."""
    if not 0.0 < tau <= 1.0:
        raise ValueError(f"temperature_mix_sample: tau must be in (0, 1], got {tau}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        return df.limit(0)
    total = sum(counts.values())
    target = float(target_rows if target_rows is not None else total)
    z = sum(n**tau for n in counts.values())
    rates = [
        (s, min(1.0, target * ((n**tau) / z) / n)) for s, n in counts.items()
    ]
    if len(rates) <= 64:
        # few sources: a literal CASE chain keeps the plan join-free
        rate = F.lit(None).cast("double")
        for s, r in rates:
            rate = F.when(
                F.col(source_col).eqNullSafe(F.lit(s)), F.lit(r)
            ).otherwise(rate)
        return df.filter(hash_fraction(key_cols, salt) < rate)
    # many sources: a thousands-deep WHEN chain bloats every batch's
    # plan — broadcast-join the skinny rate table instead (still no
    # shuffle of the corpus)
    from activedatawarehouseprototype_spark.session import local_rows_df

    # derive names the input provably doesn't have (a user column
    # literally named _src/_rate must survive)
    src_c, rate_c = "_src", "_rate"
    while src_c in df.columns:
        src_c += "_"
    while rate_c in df.columns:
        rate_c += "_"
    src_type = df.schema[source_col].dataType.simpleString()
    rate_df = local_rows_df(
        df.sparkSession,
        [(s, float(r)) for s, r in rates],
        f"`{src_c}` {src_type}, `{rate_c}` double",
    )
    joined = df.join(
        F.broadcast(rate_df),
        F.col(source_col).eqNullSafe(F.col(src_c)),
        "left",
    )
    return joined.filter(hash_fraction(key_cols, salt) < F.col(rate_c)).drop(
        src_c, rate_c
    )


def balanced_downsample(
    df: DataFrame,
    class_cols: list[str],
    key_cols: list[str],
    salt: str = "b1",
) -> DataFrame:
    """Downsample every class to the size of the SMALLEST class — the
    class-balancing primitive for classifier training sets (quality
    classifiers, lang-id, safety filters all want it). Which rows
    survive is the deterministic hash order (same md5 coin as every
    sampler here): a pure function of (salt, key), stable across runs,
    partitionings, and engines.

    Plan: one skinny count agg to the driver (|classes| rows —
    control-plane, same discipline as temperature_mix_sample's rate
    table) to find the min class size, then ONE window shuffle on the
    class columns with a streaming ROW_NUMBER frame. NULL class labels
    form their own class, as groupBy treats them.
    """
    counts = df.groupBy(*class_cols).count().collect()
    if not counts:
        return df
    n_min = min(r["count"] for r in counts)
    w = Window.partitionBy(*class_cols).orderBy(
        hash_fraction(key_cols, salt), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_min)
        .drop("_rn")
    )


def cluster_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: dict[str, float] | None = None,
    salt: str = "s1",
) -> DataFrame:
    """Leakage-safe train/val/test split: the split coin is tossed per
    NEAR-DUP CLUSTER, not per document, so two near-duplicates can
    never straddle a split boundary (per-doc splitting leaks — a test
    document with a train-side near-copy is effectively memorized;
    see the decontamination operators for the cross-corpus variant of
    the same failure).

    ``pairs`` is any near-dup candidate-pair frame over ``id_col``
    values (MinHash/LSH, SimHash, embedding near-dup — the caller
    picks the notion of "same"). Pairs are closed transitively with
    :func:`dedup.connected_components`; documents in no pair form
    singleton clusters keyed by their own id. The split is then
    :func:`assign_split` on the CLUSTER id — a pure function of
    (salt, cluster), reproducible in any engine with md5.

    Plan: the component loop runs on the (tiny) pair graph only; the
    corpus itself sees ONE broadcast-or-shuffle left join to pick up
    cluster labels plus the per-row split projection — no extra
    shuffle over the corpus beyond that join. Returns ``df`` plus
    ``cluster`` (same type as the id column — a component label
    or, for singletons, the document's own id) and ``split`` (string)
    columns.
    """
    from activedatawarehouseprototype_spark.operators.dedup import (
        connected_components,
    )

    comps = connected_components(pairs).select(
        F.col("id").alias(id_col), F.col("comp").alias("_comp")
    )
    labeled = df.join(comps, id_col, "left").withColumn(
        "cluster", F.coalesce(F.col("_comp"), F.col(id_col))
    )
    return labeled.withColumn(
        "split", assign_split(["cluster"], weights, salt)
    ).drop("_comp")
