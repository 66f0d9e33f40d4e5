"""Warehouse table maintenance: partitioned writes, MERGE-style
upsert, and small-file compaction over parquet directories.

This is the storage half of the "active data warehouse": the rules
table, alert history and event archive all live as partitioned
columnar tables. With Delta/Iceberg available these map to MERGE INTO
/ OPTIMIZE with ACID guarantees; this parquet implementation keeps the
exact same call shape (documented swap point) and uses
staging-dir + atomic rename for crash consistency on one node.

Scale notes:
- ``write_partitioned`` partitions by the query-pruning columns
  (e.g. event date) so scans prune directories, and AQE-coalesced
  writes avoid the many-small-files problem.
- ``merge_upsert`` is one broadcast-or-shuffle anti-join + union —
  the standard CDC upsert plan; cost is a scan of target + updates.
- ``compact`` rewrites to ~target file counts via repartition.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def recover_swap(target_path: str) -> None:
    """Crash recovery for the staging/.old swap protocol. MUST run
    before any read or swap of ``target_path`` (every public function
    in this module does; the dedup/IVF index compactors share it).

    The swap has two non-atomic windows a crash can land in:

    - between ``os.replace(target, old)`` and ``os.replace(staging,
      target)`` → no target dir exists. The last durably COMMITTED
      state is ``.old`` — roll it back (the interrupted batch was
      never committed; at-least-once replay re-delivers it, and the
      rolled-back meta marker inside ``.old`` makes the replay apply
      rather than skip). A half-staged ``.staging`` from that run is
      removed so the redo can re-stage cleanly.
    - after the commit rename but before ``rmtree(old)`` → target is
      live, ``.old`` is garbage. Drop it; otherwise the NEXT swap's
      ``os.replace(target, old)`` fails ENOTEMPTY and wedges the
      table permanently.
    """
    old = target_path + ".old"
    if not os.path.exists(old):
        return
    if os.path.exists(target_path):
        shutil.rmtree(old)
    else:
        staging = target_path + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        os.replace(old, target_path)


def commit_swap(target_path: str, staging: str) -> None:
    """Commit an already-written staging dir over ``target_path``
    (rename-swap; ``recover_swap`` handles every crash point)."""
    old = target_path + ".old"
    if os.path.exists(old):  # stale garbage from a crash-after-commit
        shutil.rmtree(old)
    if os.path.exists(target_path):
        os.replace(target_path, old)
    os.replace(staging, target_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def _atomic_swap(spark: SparkSession, new_df: DataFrame, target_path: str) -> None:
    recover_swap(target_path)
    staging = target_path + ".staging"
    new_df.write.mode("overwrite").parquet(staging)
    commit_swap(target_path, staging)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """MERGE semantics: rows in ``updates`` replace target rows with the
    same key; new keys are inserted. (Delta: MERGE INTO ... WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT.)"""
    recover_swap(target_path)
    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        kept = target.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(updates)
    else:
        merged = updates
    _atomic_swap(spark, merged, target_path)


def scd2_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective_ts_col: str,
    validate: bool = True,
) -> None:
    """Type-2 slowly-changing-dimension MERGE: history is preserved.

    For each incoming key at ``effective_ts``:
    - no current version exists → insert an open version
      (valid_from = effective_ts, valid_to = NULL, is_current = true);
    - the current version differs on any tracked column → close it
      (valid_to = effective_ts, is_current = false) and insert the new
      open version;
    - identical tracked values → no-op (idempotent re-delivery).

    Plan shape: one join of the CURRENT slice against the updates (the
    history slice is untouched pass-through), then a union — the same
    cost class as ``merge_upsert``; with Delta this is the two-branch
    MERGE INTO idiom.

    Input contract (validated, not assumed): ``tracked_cols`` must be
    non-empty (SCD2 with nothing tracked is undefined — the change
    predicate would vanish), and ``updates`` must carry ONE row per key
    — duplicate keys in a single batch would fan out the full-outer
    join and silently write overlapping open versions. Pre-aggregate
    upstream (e.g. keep the latest row per key) before calling.
    """
    recover_swap(target_path)
    if not tracked_cols:
        raise ValueError(
            "scd2_upsert: tracked_cols must be non-empty — with no "
            "tracked columns there is no change to detect; use "
            "merge_upsert for untracked overwrites"
        )
    # BOTH input validations in ONE job (a multi-batch replay pays this
    # per batch — two separate limit(1).collect() scans doubled the
    # fixed overhead): max per-key multiplicity + NULL-ts count, plus
    # one offending key for the error message. ``validate=False`` skips
    # the job entirely for callers whose batches are deduplicated and
    # NULL-filtered BY CONSTRUCTION (e.g. a row_number()=1 pick just
    # upstream) — with a violated contract the full-outer join writes
    # overlapping open versions, so only skip when construction
    # guarantees it.
    chk = None if not validate else updates.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(effective_ts_col).isNull().cast("long")).alias("_nulls"),
    ).agg(
        F.max("_n").alias("max_n"),
        F.sum("_nulls").alias("n_null_ts"),
        F.max_by(F.struct(*key_cols), F.col("_n")).alias("worst_key"),
    ).collect()[0]
    if chk is not None and chk["max_n"] is not None and chk["max_n"] > 1:
        key_repr = chk["worst_key"].asDict()
        raise ValueError(
            f"scd2_upsert: updates carry more than one row for key "
            f"{key_repr} — one row per key required (deduplicate to the "
            f"latest effective_ts upstream, e.g. row_number() over key "
            f"ordered by {effective_ts_col} desc = 1)"
        )
    # an SCD2 version with no start instant is meaningless, and a NULL
    # valid_from would also break the full-outer presence logic below
    # — reject it loudly rather than silently dropping/duplicating rows
    if chk is not None and chk["n_null_ts"]:
        raise ValueError(
            f"scd2_upsert: NULL {effective_ts_col} in updates — every "
            f"version needs a start instant"
        )
    upd = updates.select(
        *key_cols,
        *tracked_cols,
        F.col(effective_ts_col).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    if not os.path.exists(target_path):
        _atomic_swap(spark, upd, target_path)
        return
    target = spark.read.parquet(target_path)
    history = target.filter(~F.col("is_current"))
    current = target.filter(F.col("is_current"))

    changed_pred = None
    for c in tracked_cols:
        p = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
        changed_pred = p if changed_pred is None else (changed_pred | p)

    # explicit presence sentinels (same discipline as cdc_changelog):
    # testing valid_from for row presence would misclassify any
    # legacy row whose valid_from is NULL
    joined = current.select("*", F.lit(1).alias("_cp")).alias("cur").join(
        upd.select("*", F.lit(1).alias("_up")).alias("upd"),
        key_cols,
        "full_outer",
    )
    cur_cols = [c for c in current.columns]
    # current rows: keep as-is when no differing update; close when changed
    kept_current = joined.filter(
        F.col("upd._up").isNull() | ~changed_pred
    ).filter(F.col("cur._cp").isNotNull()).select(
        *[F.col(f"cur.{c}") for c in cur_cols]
    )
    # _up must be non-NULL here: for a current row with NO update in
    # this batch, every ~eqNullSafe(cur.c, NULL-from-absent-upd) is
    # TRUE, so changed_pred alone would ALSO route it into `closed`
    # (with a NULL valid_to) while kept_current keeps it open — a
    # duplicated, self-contradicting version pair. Only rows that
    # actually matched a differing update close.
    closed = (
        joined.filter(
            F.col("cur._cp").isNotNull()
            & F.col("upd._up").isNotNull()
            & changed_pred
        )
        .select(
            *[F.col(f"cur.{c}") for c in key_cols + tracked_cols],
            F.col("cur.valid_from"),
            F.col("upd.valid_from").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    inserted = (
        joined.filter(
            F.col("upd._up").isNotNull()
            & (F.col("cur._cp").isNull() | changed_pred)
        )
        .select(
            *[F.col(f"upd.{c}") for c in key_cols + tracked_cols],
            F.col("upd.valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    merged = history.unionByName(kept_current).unionByName(closed).unionByName(
        inserted
    )
    _atomic_swap(spark, merged, target_path)


def delete_where(spark: SparkSession, target_path: str, condition: str) -> int:
    """DELETE FROM target WHERE condition; returns rows deleted.

    SQL DELETE semantics: only rows where the predicate is TRUE are
    removed — rows where it evaluates to NULL (e.g. a NULL in a
    predicate column) are RETAINED, exactly as ANSI DELETE retains
    them. ``NOT (cond)`` would silently delete those rows."""
    recover_swap(target_path)
    if not os.path.exists(target_path):
        return 0
    target = spark.read.parquet(target_path)
    keep = target.filter(~F.coalesce(F.expr(condition), F.lit(False)))
    deleted = target.count() - keep.count()
    if deleted:
        _atomic_swap(spark, keep, target_path)
    return deleted


def compact(spark: SparkSession, path: str, target_files: int = 1) -> None:
    """Rewrite a table directory into ``target_files`` files (OPTIMIZE
    analogue for the many-small-files problem of streaming appends)."""
    recover_swap(path)
    df = spark.read.parquet(path)
    _atomic_swap(spark, df.repartition(target_files), path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    min_small_files: int = 2,
) -> dict:
    """Selective compaction: rewrite ONLY the files below
    ``target_bytes``, hard-linking the properly-sized ones into the new
    snapshot untouched. ``compact()`` above rewrites the whole table —
    at 100 TB that is a full-table IO bill to fix a tail of streaming
    micro-batch leftovers; this is the Delta OPTIMIZE / Iceberg
    rewrite_data_files shape: cost proportional to the SMALL-file
    bytes, not the table.

    Scope: flat (non-partitioned) directories — a partitioned layout
    raises loudly (per-partition compaction composes from this by
    calling it per leaf directory). Zero-row files are absorbed.
    Output file count = ceil(small_bytes / target_bytes); sizes are
    balanced by row count via repartition, so they track bytes only as
    far as rows are uniform — the standard OPTIMIZE approximation.

    Commit is the staging + atomic-rename swap shared with every
    writer in this module: a crash leaves the old or the new snapshot,
    never a mix. A ``<path>_skip_index`` manifest, if present, is
    STALE after a successful compaction (files added and removed) —
    run ``update_skipping_index`` after; its staleness check fails
    CLOSED (read raises, never returns partial data).

    Returns ``{"compacted", "untouched", "output_files"}``.
    """
    recover_swap(path)
    names = sorted(os.listdir(path))
    subdirs = [
        n
        for n in names
        if os.path.isdir(os.path.join(path, n)) and not n.startswith(("_", "."))
    ]
    if subdirs:
        raise ValueError(
            f"compact_small_files: {path} has a partitioned/nested layout "
            f"(e.g. {subdirs[:3]}); compact each leaf directory instead"
        )
    data = [
        (n, os.path.getsize(os.path.join(path, n)))
        for n in names
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    ]
    small = [n for n, sz in data if sz < target_bytes]
    big = [n for n, sz in data if sz >= target_bytes]
    if len(small) < min_small_files:
        return {"compacted": 0, "untouched": len(data), "output_files": 0}
    small_bytes = sum(sz for n, sz in data if sz < target_bytes)
    n_out = max(1, -(-small_bytes // target_bytes))
    staging = path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    (
        spark.read.parquet(*[os.path.join(path, n) for n in small])
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(staging)
    )
    written = {
        n for n in os.listdir(staging) if n.endswith(".parquet")
    }
    for n in big:
        dst = os.path.join(staging, n)
        if n in written:  # fresh-UUID part names make this ~impossible
            raise RuntimeError(
                f"compact_small_files: staging name collision on {n}"
            )
        try:
            os.link(os.path.join(path, n), dst)
        except OSError:
            shutil.copy2(os.path.join(path, n), dst)
    commit_swap(path, staging)
    return {
        "compacted": len(small),
        "untouched": len(big),
        "output_files": len(written),
    }


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    agg_col: str,
    salt_buckets: int = 16,
):
    """Two-phase salted aggregation for skewed keys: phase 1 aggregates
    (key, salt) partials, phase 2 merges partials per key — the hot key's
    work spreads over ``salt_buckets`` tasks. Returns (sum, count) per
    key; AVG = sum/count at the caller. AQE's skew handling covers joins;
    this covers the groupBy side for power-law keys."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.sum(agg_col).alias("_psum"), F.count(F.lit(1)).alias("_pcnt")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("n_rows")
    )


def incremental_agg_mv(
    spark: SparkSession,
    target_path: str,
    batch_df: DataFrame,
    key_cols: list[str],
    value_col: str,
    batch_id: int | None = None,
    distinct_col: str | None = None,
    hist_bins: tuple[float, float, int] | None = None,
) -> DataFrame:
    """Incrementally-maintained aggregate MATERIALIZED VIEW: per key,
    running (n, total, mn, mx) — the mergeable partial-aggregate set
    from which COUNT/SUM/MIN/MAX/AVG all derive — updated per
    micro-batch without ever rescanning history.

    Per batch: aggregate only the BATCH (map-side partial + one skinny
    shuffle of |batch keys| rows), read the current MV, merge by key
    (sum the sums/counts, min/max the extrema), atomically swap. Work
    per batch is O(|batch| + |MV|): the raw event history is never
    re-read — the active-warehouse answer to "keep a dashboard
    aggregate current against a 100 TB event stream". At very large
    key cardinality, swap the rewrite for a partitioned MERGE on
    bucketed keys (same ``merge_upsert`` pattern); the partial-agg
    algebra is unchanged.

    ``batch_id`` (optional) makes replays IDEMPOTENT: the MV records
    the last applied id in ``_mv_meta.json`` and silently skips any
    batch with id <= last (exactly-once under foreachBatch's
    at-least-once replay contract — same discipline as the pipeline's
    restart no-reemission test).

    ``distinct_col`` (optional) adds a MERGEABLE approximate
    distinct-count per key: each batch contributes a HyperLogLog
    sketch (``hll_sketch_agg``), merges union the binary registers
    (``hll_union_agg``) — the classic mergeable-sketch answer to
    COUNT(DISTINCT) in an incremental view, where exact distinct would
    require keeping every seen value. The stored ``hll`` column is the
    sketch; read the estimate with ``F.hll_sketch_estimate("hll")``.

    Returns the merged MV DataFrame (read back from the swap)."""
    import json as _json

    # the batch-id marker lives INSIDE the MV directory (underscore
    # files are invisible to the parquet reader) and is placed into
    # the STAGING dir before the swap rename — data and marker become
    # visible in the same atomic step, so a crash can never leave a
    # merged MV without its marker (which would double-apply the batch
    # on the at-least-once replay). The legacy external sidecar
    # location is still honored for pre-existing MVs.
    recover_swap(target_path)
    meta_name = "_mv_meta.json"
    meta_path = os.path.join(target_path, meta_name)
    legacy_meta = target_path + "_mv_meta.json"
    if batch_id is not None:
        last = -1
        for mp in (meta_path, legacy_meta):
            if os.path.exists(mp):
                with open(mp) as f:
                    last = max(last, _json.load(f).get("last_batch_id", -1))
        if batch_id <= last:
            return spark.read.parquet(target_path)

    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col)).alias("total"),
        F.min(F.col(value_col)).alias("mn"),
        F.max(F.col(value_col)).alias("mx"),
    ]
    merge_aggs = [
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    ]
    if distinct_col is not None:
        aggs.append(F.hll_sketch_agg(F.col(distinct_col)).alias("hll"))
        merge_aggs.append(F.hll_union_agg("hll").alias("hll"))
    if hist_bins is not None:
        # mergeable fixed-bin histogram: the quantile analogue of the
        # HLL column — per batch each value lands in one of nb bins
        # (domain-clamped), merges sum element-wise, and any percentile
        # reads off the cumulative counts (estimate_percentile) with
        # error <= one bin width. nb sum-when aggregates stay in
        # codegen; the stored column is array<bigint>[nb].
        lo, hi, nb = hist_bins
        if not (hi > lo and nb >= 1):
            raise ValueError(f"hist_bins must be (lo < hi, nb >= 1), got {hist_bins}")
        width = (hi - lo) / nb
        idx = F.least(
            F.lit(nb - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
        aggs.append(
            F.array(
                *[
                    F.sum(F.when(idx == i, 1).otherwise(0)).cast("bigint")
                    for i in range(nb)
                ]
            ).alias("hist")
        )
        merge_aggs.append(
            F.array(
                *[
                    F.sum(F.element_at("hist", i + 1)).cast("bigint")
                    for i in range(nb)
                ]
            ).alias("hist")
        )
    partial = batch_df.groupBy(*key_cols).agg(*aggs)
    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
        merged = (
            current.unionByName(partial)
            .groupBy(*key_cols)
            .agg(*merge_aggs)
        )
    else:
        merged = partial
    staging = target_path + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    if batch_id is not None:
        with open(os.path.join(staging, meta_name), "w") as f:
            _json.dump({"last_batch_id": batch_id}, f)
    commit_swap(target_path, staging)
    if os.path.exists(legacy_meta):
        os.remove(legacy_meta)  # migrated into the directory
    return spark.read.parquet(target_path)


def zorder_key(cols: list[str], bits: int = 16) -> "F.Column":
    """Z-order (Morton) key from non-negative integer columns: bit j of
    each column lands at interleaved position ``j * len(cols) + i``.
    Pure column arithmetic (shifts + ORs — whole-stage codegen), no UDF.

    Columns are clamped to ``bits`` low bits; normalize wider domains
    first (e.g. ``F.floor(rank / scale)``). With one column this
    degenerates to the identity ordering.

    Bound: ``bits * len(cols)`` must be <= 63 — the highest interleaved
    position is ``(bits-1)*n + (n-1) = bits*n - 1``, and position 63 is
    the bigint SIGN bit: keys touching it go negative and sort BEFORE
    small keys, silently destroying the clustering ``cluster_write``
    relies on. Raise rather than clamp so callers size bits explicitly
    (e.g. 4 cols → bits <= 15).
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: bits * len(cols) = {bits * n} > 63 would reach "
            f"the bigint sign bit (negative keys break the sort order); "
            f"use bits <= {63 // n} for {n} columns"
        )
    key = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        v = F.col(c).cast("bigint")
        for j in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(v, j) % 2, j * n + i).cast("bigint")
            )
    return key


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    zorder: bool = False,
    bits: int = 10,
) -> None:
    """Write ``df`` CLUSTERED on ``cluster_cols`` so parquet min/max
    stats make file- and row-group-level skipping effective (the
    OPTIMIZE/ZORDER pattern, no Delta required):

    - ``zorder=False``: range-partition + sort by the columns in order
      — ideal when queries filter on a prefix of ``cluster_cols``.
    - ``zorder=True``: order by the interleaved ``zorder_key`` so EACH
      clustered column individually has narrow per-file ranges — the
      multi-dimensional trade (somewhat wider ranges per column than a
      dedicated sort, but every column is skippable, not just the
      first).

    At 100 TB this is the difference between "selective filter reads
    the whole table" and "reads the few files whose stats overlap":
    `spark.sql.parquet.filterPushdown` turns each file/row-group's
    min/max against the predicate BEFORE any IO."""
    if zorder:
        keyed = df.withColumn("_zk", zorder_key(cluster_cols, bits))
        (
            keyed.repartitionByRange(n_files, "_zk")
            .sortWithinPartitions("_zk")
            .drop("_zk")
            .write.mode("overwrite")
            .parquet(path)
        )
    else:
        (
            df.repartitionByRange(n_files, *cluster_cols)
            .sortWithinPartitions(*cluster_cols)
            .write.mode("overwrite")
            .parquet(path)
        )


def estimate_percentile(
    hist: list[int], p: float, lo: float, hi: float
) -> float:
    """Percentile estimate from a mergeable fixed-bin histogram (the
    ``hist_bins`` column of ``incremental_agg_mv``): linear
    interpolation within the bin containing the p-th mass; error is
    bounded by one bin width. Driver-side helper over one MV row's
    (small) array — the data-plane work already happened in the
    aggregates."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    total = sum(hist)
    if total == 0:
        raise ValueError("empty histogram")
    nb = len(hist)
    width = (hi - lo) / nb
    target = p * total
    cum = 0
    for i, c in enumerate(hist):
        if cum + c >= target and c > 0:
            frac = (target - cum) / c
            return lo + (i + min(max(frac, 0.0), 1.0)) * width
        cum += c
    return hi


def merge_upsert_cdc(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """``merge_upsert`` that also EMITS the change-data-capture feed
    the merge implies — (op, row) rows with op in
    ``insert`` / ``update_preimage`` / ``update_postimage`` — the
    contract downstream incremental consumers (MV maintenance, cache
    invalidation, replication) need. No-op updates (identical row
    re-delivered) produce NO changelog rows and do not count as
    changes.

    Plan: one key-join of updates against the current target
    classifies each update row; the changelog is localCheckpointed
    (it must survive the atomic swap that then rewrites the target),
    and the merge itself reuses the standard anti-join + union. Cost
    is the same class as ``merge_upsert`` plus one classification
    join. Returns the changelog DataFrame."""
    # recover BEFORE the classification read: after a crash inside a
    # previous swap the committed state lives in `.old` and the target
    # dir is absent — classifying against "no table" would emit an
    # all-inserts changelog and permanently diverge downstream feeds
    recover_swap(target_path)
    current = (
        spark.read.parquet(target_path) if os.path.exists(target_path) else None
    )
    changelog = cdc_changelog(current, updates, key_cols)
    merge_upsert(spark, target_path, updates, key_cols)
    return changelog


def cdc_changelog(
    current: DataFrame | None,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Classify ``updates`` against ``current`` into the CDC feed
    (op in insert / update_preimage / update_postimage; no-op updates
    emit nothing). Standalone so callers can anchor the classification
    on WHICHEVER state is committed last in their protocol (see
    ``ActivePipeline.update_enrich_dim`` — anchoring on an
    already-merged table makes a crash-retry's changelog empty and
    permanently diverges downstream consumers). localCheckpointed:
    the log must survive whatever rewrite the caller commits next."""
    data_cols = [c for c in updates.columns]
    if current is None:
        return updates.select(
            F.lit("insert").alias("op"), *data_cols
        ).localCheckpoint()
    non_key = [c for c in data_cols if c not in key_cols]
    changed = None
    for c in non_key:
        p = ~F.col(c).eqNullSafe(F.col(f"_old_{c}"))
        changed = p if changed is None else (changed | p)
    # a key is NEW when the left join found no target row; detect
    # via a sentinel presence column to survive all-null rows
    joined = updates.alias("u").join(
        current.select(*key_cols, F.lit(1).alias("_present"),
                       *[F.col(c).alias(f"_old_{c}") for c in non_key]),
        key_cols,
        "left",
    )
    inserts = joined.filter(F.col("_present").isNull()).select(
        F.lit("insert").alias("op"), *data_cols
    )
    changed_rows = joined.filter(
        F.col("_present").isNotNull()
        & (changed if changed is not None else F.lit(False))
    )
    pre = changed_rows.select(
        F.lit("update_preimage").alias("op"),
        *key_cols,
        *[F.col(f"_old_{c}").alias(c) for c in non_key],
    ).select("op", *data_cols)
    post = changed_rows.select(
        F.lit("update_postimage").alias("op"), *data_cols
    )
    return inserts.unionByName(pre).unionByName(post).localCheckpoint()


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Corpus/table snapshot diff: one row per key present in either
    snapshot, classified ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` — the audit primitive for "what did this pipeline
    run do to the corpus" and the input to incremental re-processing
    (only ``added`` + ``changed`` keys need re-embedding/re-scoring).

    ``compare_cols`` defaults to every shared non-key column;
    comparison is null-safe (NULL == NULL). ONE full-outer hash join
    on the key — no collect, no window; at 100 TB both sides bucket
    by the same key and the join co-locates."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(
        *key_cols,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
    )
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
    return (
        o.join(n, key_cols, "full_outer")
        .select(
            *key_cols,
            F.when(F.col("_in_old").isNull(), "added")
            .when(F.col("_in_new").isNull(), "removed")
            .when(changed, "changed")
            .otherwise("unchanged")
            .alias("op"),
        )
    )


def _jmv_last_applied(vt, table_path: str) -> int:
    """Watermark of the highest ``jmv-batch:<id>`` applied to this
    table, from a sibling ``_jmv_meta.json`` — O(1) per batch instead
    of replaying the whole commit log (which made every batch's check
    O(history), O(n²) over a stream's life), and it SURVIVES
    ``vacuum`` (markers in vacuumed log entries are gone, so without
    the meta a replay of an old batch would re-append its delta).
    Initialized once from a full log scan for tables that predate the
    meta file."""
    mp = table_path + "_jmv_meta.json"
    if os.path.exists(mp):
        with open(mp) as f:
            return json.load(f).get("last_batch_id", -1)
    if vt.latest_version() is None:
        return -1  # table not created yet — nothing to initialize
    last = -1
    for h in vt.history():
        op = h["op"]
        if op.startswith("jmv-batch:"):
            last = max(last, int(op.split(":", 1)[1]))
    _atomic_json_write(mp, {"last_batch_id": last})
    return last


def _atomic_json_write(path: str, payload: dict) -> None:
    """tmp + os.replace: a crash mid-write must never leave truncated
    JSON (which would fail every later json.load until manually
    removed) — the same pattern as ActivePipeline._persist_watermarks
    and hll_mv_append's meta."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def _jmv_record_applied(table_path: str, batch_id: int) -> None:
    mp = table_path + "_jmv_meta.json"
    last = -1
    if os.path.exists(mp):
        with open(mp) as f:
            last = json.load(f).get("last_batch_id", -1)
    os.makedirs(os.path.dirname(mp), exist_ok=True)
    _atomic_json_write(mp, {"last_batch_id": max(last, batch_id)})


def _jmv_sync_meta(vt, table_path: str) -> None:
    """Fold every ``jmv-batch:<id>`` marker still visible in the log
    into the meta watermark. Must run BEFORE a vacuum: vacuum destroys
    markers in dropped log entries, and a crash between a commit and
    its meta write leaves exactly one marker that only the log knows
    about — absorbing it here closes the duplicate-append window."""
    if vt.latest_version() is None:
        return
    last = -1
    for h in vt.history():
        op = h["op"]
        if op.startswith("jmv-batch:"):
            last = max(last, int(op.split(":", 1)[1]))
    if last >= 0:
        _jmv_record_applied(table_path, last)


def jmv_vacuum(spark, base_path: str, retain_last: int = 1) -> None:
    """Retention for the three join-MV state tables (``mv``, ``left``,
    ``right`` under ``base_path``). ALWAYS use this instead of calling
    ``VersionedTable.vacuum`` on them directly: each table's meta
    watermark absorbs the markers in its log FIRST (``_jmv_sync_meta``),
    so a marker whose meta write was lost to a crash survives the
    vacuum as a watermark instead of re-opening that batch for a
    duplicate append on replay.

    NAMED markers (``seed_marker`` commits) are history-scan-only —
    they have no watermark to absorb into — so do not vacuum between a
    failed seed and its retry (in practice: retry the seed to
    completion first; once both its commits landed, idempotence is
    carried by the right table's existence and the marker may be
    vacuumed freely)."""
    from activedatawarehouseprototype_spark.operators.versioned import (
        VersionedTable,
    )

    for sub in ("mv", "left", "right"):
        p = f"{base_path}/{sub}"
        vt = VersionedTable(spark, p)
        if vt.latest_version() is None:
            continue
        _jmv_sync_meta(vt, p)
        vt.vacuum(retain_last=retain_last)


def _jmv_has_batch(vt, table_path: str, batch_id: int) -> bool:
    """Batch-id idempotence check: the meta watermark answers the
    common case in O(1) (foreachBatch ids are monotone); ids above the
    watermark — the crash window between a commit and its meta write —
    fall back to scanning ONLY the log suffix newer than the
    watermark (markers are monotone, so the scan stops at the first
    one at or below it)."""
    last = _jmv_last_applied(vt, table_path)
    if batch_id <= last:
        return True
    if vt.latest_version() is None:
        return False
    for h in vt.history():  # newest first
        op = h["op"]
        if op.startswith("jmv-batch:"):
            bid = int(op.split(":", 1)[1])
            if bid == batch_id:
                return True
            if bid <= last:
                break
    return False


def incremental_join_mv(
    spark: SparkSession,
    base_path: str,
    on: list[str],
    left_batch: DataFrame | None = None,
    right_batch: DataFrame | None = None,
    batch_id: int | None = None,
    seed_marker: str | None = None,
) -> DataFrame | None:
    """Incrementally-maintained INNER-JOIN materialized view for
    APPEND-ONLY sides — the delta-propagation identity
    ``Δ(L ⋈ R) = ΔL ⋈ R_old  ∪  L_old ⋈ ΔR  ∪  ΔL ⋈ ΔR``:
    each batch joins only against the OTHER side's accumulated
    snapshot (plus the batch-batch term), appends the result, and the
    full join is never recomputed. Work per batch is
    O(|ΔL|·match + |ΔR|·match), independent of the MV's size — the
    join analogue of ``incremental_agg_mv``.

    Exactly-once under at-least-once replay: all three state tables
    (``{base}/mv``, ``{base}/left``, ``{base}/right``) are
    ``VersionedTable``s, each commit is atomic (log-rename commit
    point, crashed retries clear their orphans), and when
    ``batch_id`` is given every commit carries a ``jmv-batch:<id>``
    marker in its log entry. A replay re-runs only the commits whose
    marker is missing, in the fixed order (mv, left, right) — the
    delta terms are computed only when the MV commit is still
    pending, at which point the input snapshots provably do not yet
    contain this batch (the side commits always follow the MV
    commit). Returns the current MV (``None`` while only one side has
    ever contributed — the join schema is unknowable until both sides
    appear).

    **Batch ids must be monotone non-decreasing across calls** — the
    ``foreachBatch`` contract this API is built for. The idempotence
    check keeps a high-watermark (``_jmv_meta.json``), so a FIRST-TIME
    id below an already-applied id is treated as already applied and
    silently skipped; callers minting their own ids out of order must
    renumber, not rely on per-id tracking. For retention use
    ``jmv_vacuum`` (never ``VersionedTable.vacuum`` directly) — it
    folds log markers into the watermark before dropping log entries,
    closing the commit-vs-meta crash window."""
    from activedatawarehouseprototype_spark.operators.versioned import (
        VersionedTable,
    )

    paths = {
        "l": f"{base_path}/left",
        "r": f"{base_path}/right",
        "mv": f"{base_path}/mv",
    }
    vt_l = VersionedTable(spark, paths["l"])
    vt_r = VersionedTable(spark, paths["r"])
    vt_mv = VersionedTable(spark, paths["mv"])
    if batch_id is not None and seed_marker is not None:
        raise ValueError("pass batch_id OR seed_marker, not both")
    marker = f"jmv-batch:{batch_id}" if batch_id is not None else None

    def done(vt, path):
        if marker is not None:
            return _jmv_has_batch(vt, path, batch_id)
        if seed_marker is not None:
            # named-marker idempotence for out-of-band calls (e.g. a
            # dimension SEED that may run after numbered batches have
            # already advanced the MV watermark — a numeric id would
            # either collide or be swallowed by the watermark). Scan
            # cost is O(history) but such calls are rare one-offs.
            return vt.latest_version() is not None and any(
                h["op"] == seed_marker for h in vt.history()
            )
        return False

    def record(path):
        if batch_id is not None:
            _jmv_record_applied(path, batch_id)

    l_exists = vt_l.latest_version() is not None
    r_exists = vt_r.latest_version() is not None

    if not done(vt_mv, paths["mv"]):
        terms = []
        if left_batch is not None and r_exists:
            terms.append(left_batch.join(vt_r.read(), on))
        if right_batch is not None and l_exists:
            terms.append(vt_l.read().join(right_batch, on))
        if left_batch is not None and right_batch is not None:
            terms.append(left_batch.join(right_batch, on))
        if terms:
            delta = terms[0]
            for t in terms[1:]:
                delta = delta.unionByName(t)
            vt_mv.commit(delta, mode="append", op=marker or seed_marker or "append")
            record(paths["mv"])
        # (no joinable term: the MV table appears with the first batch
        # that has a partner to join — replay-safe because one-sided
        # batches never change the snapshot the OTHER side's future
        # delta terms read)
    if left_batch is not None and not done(vt_l, paths["l"]):
        vt_l.commit(left_batch, mode="append", op=marker or seed_marker or "append")
        record(paths["l"])
    if right_batch is not None and not done(vt_r, paths["r"]):
        vt_r.commit(right_batch, mode="append", op=marker or seed_marker or "append")
        record(paths["r"])

    if vt_mv.latest_version() is not None:
        return vt_mv.read()
    if left_batch is not None and right_batch is not None:
        return left_batch.join(right_batch, on).limit(0)
    return None


def apply_cdc_to_join_mv(
    spark: SparkSession,
    base_path: str,
    on: list[str],
    changelog: DataFrame,
    pk: list[str],
    side: str = "left",
) -> DataFrame:
    """Maintain the ``incremental_join_mv`` under UPDATES to one side,
    driven by a ``merge_upsert_cdc`` changelog — incremental view
    maintenance beyond append-only:

    - ``update_preimage`` rows RETRACT: MV rows carrying that side's
      primary key are removed (anti-join on ``pk`` — the MV contains
      all the side's columns, so the pk identifies its rows);
    - ``update_postimage`` and ``insert`` rows ADD: post-image rows
      join the OTHER side's accumulated snapshot and append, and the
      stored snapshot of the changed side is patched the same way
      (retract + add) so future deltas from the other side join
      against current rows.

    Cost: one anti-join over the MV + one delta join — O(|MV| +
    |changed| · match), never a full join recompute. Both rewrites
    are overwrite commits on the VersionedTables (atomic; old
    versions readable until vacuum), and the whole application is a
    state OVERWRITE, hence naturally idempotent: re-applying the same
    changelog removes the same keys and re-adds the same rows.

    Commit ORDER is part of the crash contract: the MV commits FIRST
    and the changed side's snapshot LAST, because that snapshot is
    the state callers anchor changelog regeneration on
    (``cdc_changelog`` against ``vt_this``). A crash after the MV
    commit leaves the snapshot stale, so a retry regenerates the SAME
    changelog and re-applies it — converging — whereas the reverse
    order would make the retry's changelog empty and strand the MV.
    Returns the updated MV."""
    from activedatawarehouseprototype_spark.operators.versioned import (
        VersionedTable,
    )

    if side not in ("left", "right"):
        raise ValueError(f"side must be left|right, got {side!r}")
    vt_l = VersionedTable(spark, f"{base_path}/left")
    vt_r = VersionedTable(spark, f"{base_path}/right")
    vt_mv = VersionedTable(spark, f"{base_path}/mv")
    vt_this, vt_other = (vt_l, vt_r) if side == "left" else (vt_r, vt_l)
    pre = changelog.filter(F.col("op") == "update_preimage").drop("op")
    post = changelog.filter(
        F.col("op").isin("update_postimage", "insert")
    ).drop("op")
    changed_keys = pre.select(*pk).union(post.select(*pk)).distinct()

    # compute BOTH new states before committing either (reads must
    # materialize before the overwrite commits replace what they read
    # from — localCheckpoint cuts the dependency, same discipline as
    # the CDC changelog):
    # patched snapshot of the changed side: drop changed pks, add
    # post-images
    cur = vt_this.read()
    patched = cur.join(changed_keys, pk, "left_anti").unionByName(
        post
    ).localCheckpoint()
    # retract + add on the MV
    mv = vt_mv.read()
    kept = mv.join(changed_keys, pk, "left_anti")
    added = post.join(vt_other.read(), on)
    mv_cols = mv.columns
    new_mv = kept.unionByName(added.select(*mv_cols)).localCheckpoint()

    # MV first, changelog-anchor snapshot LAST (see docstring)
    vt_mv.commit(new_mv, mode="overwrite", op=f"cdc-{side}")
    vt_this.commit(patched, mode="overwrite", op=f"cdc-patch-{side}")
    return vt_mv.read()


def jmv_verify(
    spark: SparkSession,
    base_path: str,
    on: list[str],
    sample_fraction: float | None = None,
    salt: str = "v1",
) -> dict:
    """Anti-entropy audit of an ``incremental_join_mv``: recompute
    L ⋈ R from the accumulated side snapshots and MULTISET-diff it
    against the stored MV. Incremental maintenance earns trust by
    being *checkable* — this is the checker a production warehouse
    schedules after compactions, restores, or suspected replay bugs.

    Returns ``{"mv_rows", "expected_rows", "missing", "extra",
    "consistent"}`` where ``missing`` counts (row, multiplicity)
    shortfalls vs the recompute and ``extra`` surpluses — both zero
    iff the MV is exactly the join of its inputs.

    ``sample_fraction`` audits only the join keys whose
    ``hash_fraction`` (operators/sampling.py — pure function of
    (salt, key)) falls below the fraction. Because ALL THREE tables
    are filtered by the same key predicate, the sampled diff is exact
    for the sampled keyspace — at 100 TB a 1% audit gives a
    proportional read with zero false positives. Full-audit cost is
    one join + one grouped count per side; the driver transfer is a
    single aggregate row."""
    from activedatawarehouseprototype_spark.operators.sampling import (
        hash_fraction,
    )
    from activedatawarehouseprototype_spark.operators.versioned import (
        VersionedTable,
    )

    vt_l = VersionedTable(spark, f"{base_path}/left")
    vt_r = VersionedTable(spark, f"{base_path}/right")
    vt_mv = VersionedTable(spark, f"{base_path}/mv")
    left, right, mv = vt_l.read(), vt_r.read(), vt_mv.read()
    if sample_fraction is not None:
        if not 0.0 < sample_fraction <= 1.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}"
            )
        keep = hash_fraction(on, salt=salt) < sample_fraction
        left, right, mv = (
            left.filter(keep), right.filter(keep), mv.filter(keep),
        )
    expected = left.join(right, on)
    cols = mv.columns
    exp_counts = expected.select(*cols).groupBy(*cols).agg(
        F.count(F.lit(1)).alias("_e")
    )
    mv_counts = mv.groupBy(*cols).agg(F.count(F.lit(1)).alias("_m"))
    diff = exp_counts.join(mv_counts, cols, "full_outer").select(
        F.coalesce(F.col("_e"), F.lit(0)).alias("_e"),
        F.coalesce(F.col("_m"), F.lit(0)).alias("_m"),
    )
    row = diff.agg(
        F.sum(F.greatest(F.col("_e") - F.col("_m"), F.lit(0))).alias("missing"),
        F.sum(F.greatest(F.col("_m") - F.col("_e"), F.lit(0))).alias("extra"),
        F.sum("_m").alias("mv_rows"),
        F.sum("_e").alias("expected_rows"),
    ).head()
    out = {
        "mv_rows": int(row["mv_rows"] or 0),
        "expected_rows": int(row["expected_rows"] or 0),
        "missing": int(row["missing"] or 0),
        "extra": int(row["extra"] or 0),
    }
    out["consistent"] = out["missing"] == 0 and out["extra"] == 0
    return out


def purge_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: "list | tuple",
) -> dict:
    """Targeted deletion (the GDPR right-to-be-forgotten shape):
    remove every row whose ``key_col`` is in ``keys``, rewriting ONLY
    the files that can contain those keys and hard-linking every
    other file into the new snapshot untouched.

    ``delete_where`` above rewrites the whole table — the correct
    general tool, but a deletion request for a handful of users
    should not cost a 100 TB rewrite. This composes two existing
    pieces instead:

    1. TARGETING. With a ``<path>_skip_index`` manifest present
       (skipping.py) the touched-file list comes from manifest
       min/max pruning — zero data IO. The staleness check fails
       CLOSED like ``read_with_skipping``: unknown on-disk files
       raise (a missed file here would silently RETAIN rows a
       deletion promised to remove). Without a manifest, targeting
       costs one column-pruned scan: ``input_file_name()`` of the
       matching rows.
    2. REWRITE. Touched files are re-read (basePath + explicit
       schema, the partition-column-safe pattern), filtered with SQL
       NOT-IN semantics (NULL keys are never in ``keys``, so NULL-key
       rows are RETAINED, matching ``delete_where``'s ANSI contract),
       and written to staging; untouched files hard-link (same inode,
       zero bytes moved). Commit is the shared staging + atomic-swap
       protocol — a crash leaves the old or the new snapshot.

    The manifest, if present, is STALE after a successful purge — run
    ``update_skipping_index`` (its read-side check fails closed).
    Flat directories only, like ``compact_small_files`` (per-leaf
    composition for partitioned layouts). Returns
    ``{"deleted", "rewritten_files", "linked_files"}``."""
    from activedatawarehouseprototype_spark.operators import skipping

    if not keys:
        raise ValueError("purge_keys: empty key list")
    if any(k is None for k in keys):
        raise ValueError(
            "purge_keys: NULL is not a purgeable key (SQL IN never "
            "matches NULL); filter explicitly if you mean IS NULL"
        )
    recover_swap(path)
    names = sorted(os.listdir(path))
    subdirs = [
        n
        for n in names
        if os.path.isdir(os.path.join(path, n)) and not n.startswith(("_", "."))
    ]
    if subdirs:
        raise ValueError(
            f"purge_keys: {path} has a partitioned/nested layout "
            f"(e.g. {subdirs[:3]}); purge each leaf directory instead"
        )
    all_files = sorted(skipping._list_data_files(path))
    abs_root = os.path.abspath(path)

    if os.path.exists(skipping._index_path(path)):
        manifest_known = {
            skipping._rel_file(r["file"], path)
            for r in skipping._load_manifest(spark, path)
            .select("file")
            .collect()
        }
        unknown = set(all_files) - manifest_known
        if unknown:
            raise RuntimeError(
                f"purge_keys: skipping index at "
                f"{skipping._index_path(path)} is stale: {len(unknown)} "
                f"data file(s) not in the manifest (e.g. "
                f"{sorted(unknown)[:3]}); rebuild the index — a missed "
                "file would silently retain rows this purge must remove"
            )
        touched_abs = skipping.prune_files(
            spark, path, [skipping.Pred(key_col, "in", list(keys))]
        )
        touched = sorted(
            os.path.relpath(f, abs_root) for f in touched_abs
        )
    else:
        from urllib.parse import unquote

        hit_files = (
            spark.read.parquet(path)
            .filter(F.col(key_col).isin(list(keys)))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        )  # bounded by |files|, the list the scheduler already holds
        touched = sorted(
            os.path.relpath(unquote(r["f"]).removeprefix("file:"), abs_root)
            for r in hit_files
        )

    if not touched:
        return {"deleted": 0, "rewritten_files": 0, "linked_files": len(all_files)}

    schema = spark.read.parquet(path).schema
    src = (
        spark.read.option("basePath", abs_root)
        .schema(schema)
        .parquet(*[os.path.join(path, f) for f in touched])
    )
    keep = src.filter(
        ~F.coalesce(F.col(key_col).isin(list(keys)), F.lit(False))
    )
    deleted = src.count() - keep.count()
    if not deleted:
        return {"deleted": 0, "rewritten_files": 0, "linked_files": len(all_files)}

    staging = path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    keep.write.mode("overwrite").parquet(staging)
    written = {n for n in os.listdir(staging) if n.endswith(".parquet")}
    untouched = [f for f in all_files if f not in set(touched)]
    for n in untouched:
        dst = os.path.join(staging, n)
        if n in written:  # fresh-UUID part names make this ~impossible
            raise RuntimeError(f"purge_keys: staging name collision on {n}")
        try:
            os.link(os.path.join(path, n), dst)
        except OSError:
            shutil.copy2(os.path.join(path, n), dst)
    commit_swap(path, staging)
    return {
        "deleted": deleted,
        "rewritten_files": len(touched),
        "linked_files": len(untouched),
    }
