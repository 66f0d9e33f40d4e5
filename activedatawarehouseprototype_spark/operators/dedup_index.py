"""Persisted MinHash-LSH dedup index: dedupe NEW data against an
already-indexed corpus without rescanning it.

Batch dedup (``operators/dedup.py``) recomputes signatures for the
whole corpus every run — fine for a one-shot pass, wrong for the
production shape where a 100 TB corpus is indexed ONCE and each
incoming batch (a crawl snapshot, a day of ingestion) is deduped
against it. This module persists the banded LSH signatures as a
parquet table partitioned by a band-signature BUCKET so a lookup:

1. computes signatures only for the new batch (cost O(|batch|)),
2. reads only the index partitions whose buckets the batch actually
   touches (parquet PartitionFilters — at 100 TB the scan lists only
   matched directories, plan-asserted in tests), and
3. equi-joins on (bucket, band, band_sig) — collision-bounded,
   never |batch| x |corpus|.

Hot-shingle discipline: a ``max_doc_freq`` cap at build time drops
non-discriminative boilerplate shingles BEFORE signatures (the
quadratic-pair control of ``operators/dedup.py``). Capping must be
consistent across batches or signatures stop being comparable, so the
build PERSISTS the hot-shingle list in the index and every
append/lookup anti-joins against it — new batches see the corpus's
cap decisions, not their own batch-local document frequencies. The
hot list is df-capped-small by construction (only shingles above the
cap), and grows only via explicit ``reindex``-style rebuilds.

Index layout (all parquet):
  {path}/bands/bucket=*/   (sid, band, band_sig)  — the searchable index
  {path}/hot_shingles/     (shingle)              — persisted cap decisions
  {path}/meta/             one row (n, k, bands, n_buckets, max_doc_freq)

Reference parity: the reference engine has no dedup surface at all
(its only state is per-rule window state — DynamicQueryFunction.java);
this is part of the LLM-pipeline extension surface the blueprint adds
on top (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from activedatawarehouseprototype_spark.session import local_rows_df
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.dedup import (
    band_signatures,
    minhash_from_shingles,
    shingle_table,
)


def _bucket(col, n_buckets: int):
    """Stable band_sig → bucket id: first 4 hex chars mod n_buckets.
    Pure function of the signature, so both sides of a lookup agree
    without coordination."""
    return (F.conv(F.substring(col, 1, 4), 16, 10).cast("int") % n_buckets).alias(
        "bucket"
    )


def _banded_for(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    k: int,
    bands: int,
    n_buckets: int,
    hot: DataFrame | None,
) -> DataFrame:
    """(sid, band, band_sig, bucket) for ``df``, honoring a persisted
    hot-shingle list (anti-join BEFORE signatures)."""
    sh = shingle_table(df, id_col, text_col, n, max_doc_freq=None)
    if hot is not None:
        sh = sh.join(hot, "shingle", "left_anti")
    banded = band_signatures(minhash_from_shingles(sh, k), k, bands)
    return banded.select("sid", "band", "band_sig", _bucket(F.col("band_sig"), n_buckets))


def _write_bands(
    sh: DataFrame,
    index_path: str,
    k: int,
    bands: int,
    n_buckets: int,
    mode: str = "overwrite",
) -> DataFrame:
    """Signatures → banded rows → bucket-partitioned parquet. The
    pre-write repartition ON THE BUCKET bounds output files at one per
    bucket (without it every shuffle task writes a sliver into every
    bucket directory — task_count × n_buckets small files, the classic
    partitioned-write explosion). Returns the banded frame (schema
    source for the meta entry)."""
    banded = band_signatures(minhash_from_shingles(sh, k), k, bands).select(
        "sid", "band", "band_sig", _bucket(F.col("band_sig"), n_buckets)
    )
    n_parts = min(n_buckets, sh.sparkSession.sparkContext.defaultParallelism)
    banded.repartition(n_parts, "bucket").write.mode(mode).partitionBy(
        "bucket"
    ).parquet(f"{index_path}/bands")
    return banded


def dedup_index_build(
    df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 12,
    bands: int = 3,
    max_doc_freq: int | None = None,
    n_buckets: int = 32,
) -> None:
    """Index a corpus for incremental near-dup lookup: persist its
    banded MinHash signatures partitioned by band-sig bucket, the
    hot-shingle list implied by ``max_doc_freq`` (computed over THIS
    corpus — the cap decisions future batches must inherit), and the
    parameters. One pass over the corpus; index size is
    ``bands``x|docs| rows of 32-char digests — a fixed small fraction
    of corpus bytes."""
    spark = df.sparkSession
    sh = shingle_table(df, id_col, text_col, n, max_doc_freq=None)
    if max_doc_freq is not None:
        # the shingle table feeds BOTH the hot-list aggregation and the
        # signature pass — persist so the explode+window pass runs once
        sh = sh.persist()
        try:
            hot = (
                sh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df_"))
                .filter(F.col("df_") > max_doc_freq)
                .select("shingle")
            )
            # materialize BEFORE the signature pass so the cap list is
            # computed once, then reused by the anti-join and persisted
            hot.write.mode("overwrite").parquet(f"{index_path}/hot_shingles")
            hot = spark.read.parquet(f"{index_path}/hot_shingles")
            banded = _write_bands(
                sh.join(hot, "shingle", "left_anti"),
                index_path, k, bands, n_buckets,
            )
        finally:
            sh.unpersist()
    else:
        local_rows_df(spark, [], "shingle string").write.mode("overwrite").parquet(
            f"{index_path}/hot_shingles"
        )
        banded = _write_bands(sh, index_path, k, bands, n_buckets)
    # sid type is recorded so readers can supply an explicit schema: a
    # partitioned parquet write of 0 rows (e.g. every shingle hot, or
    # an all-short-docs corpus) leaves no data files to infer from
    sid_type = banded.schema["sid"].dataType.simpleString()
    local_rows_df(
        spark,
        [(n, k, bands, n_buckets, max_doc_freq, sid_type)],
        "n int, k int, bands int, n_buckets int, max_doc_freq int, sid_type string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/meta")
    # per-bucket row counts (skew bookkeeping): counted from the
    # WRITTEN table — one cheap scan of digests, never a recompute of
    # the signature pass
    written = spark.read.schema(
        _bands_schema({"sid_type": sid_type})
    ).parquet(f"{index_path}/bands")
    _refresh_bucket_stats(
        spark,
        index_path,
        written.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        ),
    )
    _warn_if_skewed(spark, index_path, "build")


def _read_meta(spark: SparkSession, index_path: str) -> dict:
    row = spark.read.parquet(f"{index_path}/meta").collect()[0]
    return row.asDict()


# skew guard: a bucket this many times the mean row count is "hot" —
# one lookup partition reads it whole, so build/append warn and
# compaction splits it into multiple files (parallel scan tasks)
SKEW_FACTOR = 8.0


def _refresh_bucket_stats(
    spark: SparkSession, index_path: str, counts: DataFrame
) -> None:
    """Overwrite ``{path}/bucket_stats`` (bucket, n_rows) — control
    plane, <= n_buckets rows — with the warehouse swap protocol so a
    crash can't wedge it."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        commit_swap,
        recover_swap,
    )

    stats_path = f"{index_path}/bucket_stats"
    recover_swap(stats_path)
    staging = stats_path + ".staging"
    counts.coalesce(1).write.mode("overwrite").parquet(staging)
    commit_swap(stats_path, staging)


def bucket_stats(spark: SparkSession, index_path: str) -> DataFrame:
    """Per-bucket row counts (bucket, n_rows), maintained at
    build/append and refreshed from actuals at compaction. Falls back
    to counting the bands table for indexes built before stats
    existed."""
    import os

    stats_path = f"{index_path}/bucket_stats"
    from activedatawarehouseprototype_spark.operators.warehouse import (
        recover_swap,
    )

    recover_swap(stats_path)
    if os.path.exists(stats_path):
        return spark.read.parquet(stats_path)
    m = _read_meta(spark, index_path)
    return (
        spark.read.schema(_bands_schema(m))
        .parquet(f"{index_path}/bands")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


def hot_buckets(
    spark: SparkSession, index_path: str, skew_factor: float = SKEW_FACTOR
) -> list[int]:
    """Buckets whose row count exceeds ``skew_factor`` x the mean — the
    ones a pathological batch (boilerplate-identical signatures) can
    create. A hot bucket is read as ONE giant partition at lookup;
    ``dedup_index_compact`` splits it into multiple files."""
    rows = bucket_stats(spark, index_path).collect()
    if not rows:
        return []
    mean = sum(r["n_rows"] for r in rows) / len(rows)
    return sorted(
        r["bucket"] for r in rows if r["n_rows"] > skew_factor * max(mean, 1.0)
    )


def _warn_if_skewed(spark: SparkSession, index_path: str, op: str) -> None:
    import warnings

    hot = hot_buckets(spark, index_path)
    if hot:
        warnings.warn(
            f"dedup_index {op}: bucket(s) {hot} exceed {SKEW_FACTOR}x the "
            f"mean row count — lookups touching them read one giant "
            f"partition; run dedup_index_compact(max_rows_per_file=...) "
            f"to split them into parallel files",
            stacklevel=3,
        )


def _bands_schema(meta: dict) -> str:
    """Explicit read schema for the bands table (an empty index has no
    data files to infer from; partition column last)."""
    return f"sid {meta['sid_type']}, band int, band_sig string, bucket int"


def dedup_index_lookup(
    spark: SparkSession,
    index_path: str,
    batch_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta: dict | None = None,
    hot: DataFrame | None = None,
) -> DataFrame:
    """Near-dup matches of a NEW batch against the indexed corpus:
    (id_new, id_indexed) pairs sharing at least one LSH band. The
    corpus is not rescanned — the index read carries a bucket
    partition filter derived from the batch's own signatures, so only
    directories the batch can possibly match are listed (the two
    driver round-trips are the 1-row meta read and the ≤n_buckets
    bucket-id set — control-plane-sized).

    Entry recovers the bands swap: a crash inside
    ``dedup_index_compact``'s rename window otherwise leaves the
    bands dir missing (``.old`` holds the committed table) and every
    lookup/append until the next compaction dies on PATH_NOT_FOUND —
    the same wedge class as the round-11 IVF centroids ADVICE, found
    here by the compact crash matrix. ``bucket_stats`` already
    self-recovers its own table; the index is single-writer by
    contract, so reader-side repair cannot race another writer."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        recover_swap,
    )

    recover_swap(f"{index_path}/bands")
    # ``meta``/``hot`` are injectable so a caller driving several index
    # calls per micro-batch (DedupIngest: lookup + intra-batch pass +
    # append) pays the 1-row meta collect and hot-shingles read ONCE
    # per batch instead of once per call — both are immutable between
    # rebuilds, and each re-read was a fixed driver round-trip job.
    m = _read_meta(spark, index_path) if meta is None else meta
    if hot is None:
        hot = spark.read.parquet(f"{index_path}/hot_shingles")
    banded_new = _banded_for(
        batch_df, id_col, text_col, m["n"], m["k"], m["bands"], m["n_buckets"], hot
    ).persist()
    try:
        buckets = sorted(
            r["bucket"] for r in banded_new.select("bucket").distinct().collect()
        )
        idx = (
            spark.read.schema(_bands_schema(m))
            .parquet(f"{index_path}/bands")
            .filter(F.col("bucket").isin(buckets))
        )
        out = (
            banded_new.alias("q")
            .join(
                idx.alias("i"),
                (F.col("q.bucket") == F.col("i.bucket"))
                & (F.col("q.band") == F.col("i.band"))
                & (F.col("q.band_sig") == F.col("i.band_sig"))
                & (F.col("q.sid") != F.col("i.sid")),
            )
            .select(
                F.col("q.sid").alias("id_new"), F.col("i.sid").alias("id_indexed")
            )
            .distinct()
        )
        # the persist holds signature compute; the result is small
        # (matches only) so materializing it here releases the cache
        # eagerly without re-running the batch signature pass
        out = out.localCheckpoint()
    finally:
        banded_new.unpersist()
    return out


def dedup_index_append(
    spark: SparkSession,
    index_path: str,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta: dict | None = None,
    hot: DataFrame | None = None,
) -> None:
    """Add a batch to the index: signatures computed with the
    PERSISTED parameters + hot list, appended to the matching
    ``bucket=`` partitions — O(|batch|) regardless of index size, no
    rewrite of existing partitions. The standard flow is
    lookup → drop matched dups → append survivors.

    Entry recovers the bands swap (see ``dedup_index_lookup``) —
    appending into the missing-table crash window of a died
    compaction would otherwise write into a fresh ``bands`` dir and
    orphan the whole pre-crash index in ``.old``."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        recover_swap,
    )

    recover_swap(f"{index_path}/bands")
    # meta/hot injectable — see dedup_index_lookup
    m = _read_meta(spark, index_path) if meta is None else meta
    if hot is None:
        hot = spark.read.parquet(f"{index_path}/hot_shingles")
    banded = _banded_for(
        df, id_col, text_col, m["n"], m["k"], m["bands"], m["n_buckets"], hot
    ).persist()
    try:
        # snapshot the PRE-append stats first: the no-stats fallback
        # counts the bands table lazily, so reading it after the append
        # below would double-count the new batch
        cur = bucket_stats(spark, index_path).localCheckpoint()
        n_parts = min(m["n_buckets"], spark.sparkContext.defaultParallelism)
        banded.repartition(n_parts, "bucket").write.mode("append").partitionBy(
            "bucket"
        ).parquet(f"{index_path}/bands")
        # merge this batch's per-bucket counts into the stats table
        # (control plane: <= n_buckets rows each side)
        delta = banded.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows")
        )
        merged = (
            cur.unionByName(delta)
            .groupBy("bucket")
            .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
            .localCheckpoint()  # must survive the stats swap below
        )
        _refresh_bucket_stats(spark, index_path, merged)
    finally:
        banded.unpersist()
    _warn_if_skewed(spark, index_path, "append")


def dedup_index_compact(
    spark: SparkSession,
    index_path: str,
    files_per_bucket: int = 1,
    max_rows_per_file: int | None = None,
) -> None:
    """Rewrite the bands table to ``files_per_bucket`` files per
    bucket (appends add a file per touched bucket per batch — after
    many batches lookups pay per-file open cost). Shares the
    warehouse swap protocol (recover_swap/commit_swap), so a crash at
    any point either keeps the pre-compaction bands or the compacted
    ones — never a missing/wedged table.

    ``max_rows_per_file`` is the HOT-BUCKET splitter: a pathological
    batch whose signatures all land in one bucket (boilerplate-
    identical documents) leaves a giant partition that one lookup task
    must read whole. When set, the per-file ROW BOUND is hard — the
    write carries ``maxRecordsPerFile``, so no output file exceeds
    ``max_rows_per_file`` rows even when two salt groups of the same
    bucket hash-collide into one shuffle partition. The file COUNT is
    best-effort ~``ceil(n_rows / max_rows_per_file)`` per bucket
    (salting spreads the write across tasks; a salt collision yields
    the same total rows in the same number of files, just written by
    fewer tasks). Per-bucket counts are refreshed from actuals as
    part of the same pass (self-healing if stats drifted)."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        commit_swap,
        recover_swap,
    )

    m = _read_meta(spark, index_path)
    bands_path = f"{index_path}/bands"
    recover_swap(bands_path)
    df = spark.read.schema(_bands_schema(m)).parquet(bands_path)
    staging = bands_path + ".staging"
    counts = (
        df.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .localCheckpoint()  # one materialization feeds splits + stats
    )
    if max_rows_per_file is not None:
        splits = counts.select(
            "bucket",
            F.greatest(
                F.lit(files_per_bucket),
                F.ceil(F.col("n_rows") / max_rows_per_file),
            )
            .cast("int")
            .alias("_nsplit"),
        )
        total_files = sum(r["_nsplit"] for r in splits.collect())
        salted = (
            df.join(F.broadcast(splits), "bucket", "left")
            .withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64("sid", "band", "band_sig"),
                    F.coalesce(F.col("_nsplit"), F.lit(1)),
                ),
            )
        )
        # NOT capped by defaultParallelism: parallelizing the write
        # wants ~one shuffle partition per (bucket, salt) group; on a
        # low-core host a cap would funnel a hot bucket through one
        # task. The hard per-file row bound does NOT depend on the
        # salt layout though — hash repartition can collide two salt
        # groups of one bucket into a single partition, so the write
        # itself carries maxRecordsPerFile (Spark rolls a new file
        # every max_rows_per_file rows within a task).
        (
            salted.repartition(max(1, total_files), "bucket", "_salt")
            .drop("_nsplit", "_salt")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", max_rows_per_file)
            .partitionBy("bucket")
            .parquet(staging)
        )
    else:
        n_parts = min(
            m["n_buckets"] * files_per_bucket,
            spark.sparkContext.defaultParallelism,
        )
        df.repartition(n_parts, "bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(staging)
    commit_swap(bands_path, staging)
    _refresh_bucket_stats(spark, index_path, counts)
