"""Streaming corpus ingestion with dedup-at-the-door: every
micro-batch is matched against the persisted MinHash-LSH index, known
near-dups are dropped, and only survivors land in the clean store AND
join the index — so later batches dedupe against everything admitted
before them, across batches and across restarts (the index and the
store are both on disk; no in-memory state to lose).

This is the ingestion-side complement to the batch dedup family: the
corpus at rest is deduped once (``operators/dedup.py``), the firehose
is deduped incrementally here (``operators/dedup_index.py``), and
exact re-deliveries within the watermark horizon are handled by
``dedup.stream_exact_dedup`` upstream if the transport can repeat
rows.

Idempotence contract: foreachBatch is at-least-once — a batch can be
re-delivered after a crash BETWEEN the store write and the index
append. ``_done/{batch_id}`` markers (written LAST) make replays
no-ops; a half-applied batch re-runs, and the lookup/append pair is
itself idempotent for exact replays (same ids match the same bands;
appending the same (sid, band, band_sig) rows twice only duplicates
index rows, which ``dedup_index_lookup``'s DISTINCT collapses).

At 100 TB: per-batch cost is O(|batch| + matched buckets); nothing
reads the accumulated store. The driver sees only the bucket-id set
and the batch's match pairs (bounded by the batch size).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators import dedup_index as DI


class _MarkerIngest:
    """Shared replay-marker machinery for foreachBatch ingest handlers:
    ``_done/{batch_id}`` files under ``_marker_root`` (written LAST by
    subclasses) short-circuit exact replays, and ``run_stream``
    attaches the handler with an availableNow trigger. Subclasses
    implement ``process_batch`` and call ``_mark_done`` as their final
    step. Note neither handler sets a checkpointLocation — batch ids
    restart at 0 after an uncheckpointed restart, which the markers
    treat as replays by design (the store/index carry the durable
    state); pass a checkpointed writer upstream when batch ids must
    advance across restarts."""

    _marker_root: str

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self._marker_root, "_done", str(batch_id))

    def _mark_done(self, batch_id: int) -> None:
        os.makedirs(os.path.dirname(self._marker(batch_id)), exist_ok=True)
        with open(self._marker(batch_id), "w") as f:
            f.write("done")

    def run_stream(
        self,
        stream_df: DataFrame,
        available_now: bool = True,
        checkpoint_location: str | None = None,
    ):
        """Attach to a streaming DataFrame via foreachBatch. Pass
        ``checkpoint_location`` when batch ids must keep advancing
        across restarts (see class docstring); without it a restarted
        stream re-numbers from 0 and the markers treat those batches
        as replays."""
        writer = stream_df.writeStream.foreachBatch(self.process_batch)
        if checkpoint_location is not None:
            writer = writer.option("checkpointLocation", checkpoint_location)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class DedupIngest(_MarkerIngest):
    """foreachBatch handler: lookup → drop matches → append survivors
    to the clean store (parquet) and the dedup index."""

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        store_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.index_path = index_path
        self.store_path = store_path
        self.id_col = id_col
        self.text_col = text_col
        self._marker_root = store_path
        self.metrics = {"batches": 0, "admitted": 0, "dropped": 0}

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # exact replay of a completed batch — no-op
        batch_df = batch_df.select(self.id_col, self.text_col)
        # the batch count doubles as the emptiness check — a separate
        # isEmpty() was one more job per micro-batch for a number the
        # metrics block below needed anyway
        n_total = batch_df.count()
        if n_total == 0:
            self._mark_done(batch_id)
            return
        # ONE meta collect + hot-shingles read serves all three index
        # interactions this batch (lookup, intra-batch signatures,
        # append) — both are immutable between rebuilds; re-reading
        # them per call was two extra driver round-trip jobs per batch
        m = DI._read_meta(self.spark, self.index_path)
        hot = self.spark.read.parquet(f"{self.index_path}/hot_shingles")
        matches = DI.dedup_index_lookup(
            self.spark,
            self.index_path,
            batch_df,
            id_col=self.id_col,
            text_col=self.text_col,
            meta=m,
            hot=hot,
        )
        dup_ids = matches.select(
            F.col("id_new").alias(self.id_col)
        ).distinct()
        survivors = batch_df.join(dup_ids, self.id_col, "left_anti")
        # within-batch dups: keep the min-id representative of any
        # group of survivors matching EACH OTHER's bands (cheap local
        # LSH pass on the batch only). Signatures come from the SAME
        # recipe the index uses (_banded_for honors the persisted
        # hot-shingle list): a plain lsh_candidates call here ignored
        # the hot list, so two distinct docs sharing only capped
        # boilerplate collided intra-batch and one was silently
        # dropped at the door — while the same pair arriving in
        # separate batches was (correctly) admitted by the capped
        # lookup. One consistent signature definition for both paths.
        banded = DI._banded_for(
            survivors, self.id_col, self.text_col,
            m["n"], m["k"], m["bands"], m["n_buckets"], hot,
        ).localCheckpoint(eager=False)
        a, b = banded.alias("a"), banded.alias("b")
        intra = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_sig") == F.col("b.band_sig"))
                & (F.col("a.sid") < F.col("b.sid")),
            )
            .select(F.col("b.sid").alias(self.id_col))
            .distinct()
        )
        survivors = survivors.join(intra, self.id_col, "left_anti")

        # per-batch partition dir + overwrite => the store write is
        # idempotent under replay: a crash AFTER this write but before
        # the _done marker re-runs the batch, and the rewrite replaces
        # the same directory instead of appending duplicates (the
        # index append below can duplicate rows on such a replay,
        # which lookup's DISTINCT collapses — the store must not).
        # The write IS the single materialization of the anti-join
        # chain; the index append and the admitted count then read the
        # committed parquet back (an eager localCheckpoint here was a
        # second full pass over the chain just to populate the cache).
        batch_dir = os.path.join(self.store_path, "docs", f"batch={batch_id}")
        survivors.write.mode("overwrite").parquet(batch_dir)
        committed = self.spark.read.parquet(batch_dir)
        DI.dedup_index_append(
            self.spark,
            self.index_path,
            committed,
            id_col=self.id_col,
            text_col=self.text_col,
            meta=m,
            hot=hot,
        )
        n_kept = committed.count()
        self.metrics["batches"] += 1
        self.metrics["admitted"] += n_kept
        self.metrics["dropped"] += n_total - n_kept
        self._mark_done(batch_id)

    def admitted(self) -> DataFrame:
        docs = os.path.join(self.store_path, "docs")
        # the store is laid out as batch=<id> partition dirs (replay
        # idempotence); the discovery column is bookkeeping, not data
        return self.spark.read.parquet(docs).drop("batch")


class AnnIngest(_MarkerIngest):
    """foreachBatch handler for similarity-at-the-door: every
    micro-batch of (id, embedding) rows is appended to a persisted
    fused IVF+PQ index (existing centroids + codebooks — no
    retraining), so the index serves searches over everything admitted
    before, across batches and restarts.

    Idempotence contract: ``_done/{batch_id}`` markers (written LAST)
    make exact replays no-ops. A crash BETWEEN the append and the
    marker re-runs the batch and duplicates its rows in the landing
    cells — ``ivf_pq_search`` collapses identical duplicates before
    top-k (dropDuplicates on (qid, id)), so results stay correct; run
    ``ivf_index_compact`` on the usual schedule to reclaim the space.

    Drift loop (round-10 VERDICT #6): appends assign into cells
    trained on the ORIGINAL distribution, so a long-lived ingest
    degrades probe recall as the stream drifts. ``rebuild`` wires the
    ``ivf_pq_index_rebuild`` growth trigger into the loop:

    - ``"off"`` (default) — current behavior; run rebuilds on an
      external schedule.
    - ``"recommend"`` — after each appended batch, run the cheap
      trigger check (one parquet FOOTER count + one JSON scalar — no
      data IO) and surface it: ``metrics["rebuild_recommended"]``
      counts batches past the threshold; an operator dashboard alarms
      on it without the stream ever paying a retrain.
    - ``"auto"`` — past the threshold, retrain+swap in-loop (the
      crash-safe ``ivf_pq_index_rebuild``). The rebuild runs AFTER
      the batch's ``_done`` marker: a replay of the batch stays a
      no-op for the APPEND, and a crash mid-rebuild leaves the meta
      un-advanced so the next batch's check simply re-fires —
      re-running converges.

    At 100 TB: per-batch cost is O(|batch|) — assignment against k
    broadcast centroids, one Arrow encode pass, partitioned append
    touching only the landing cells. Nothing reads the accumulated
    index on the write path; the trigger check reads footers only,
    and an ``"auto"`` retrain costs one full index rewrite exactly as
    often as the corpus grows by ``min_appended_fraction``
    (amortized O(1) rewrites per doubling)."""

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        rebuild: str = "off",
        min_appended_fraction: float = 0.25,
        rebuild_opts: dict | None = None,
    ):
        if rebuild not in ("off", "recommend", "auto"):
            raise ValueError(
                f"rebuild must be 'off', 'recommend' or 'auto', got {rebuild!r}"
            )
        self.spark = spark
        self.index_path = index_path
        self.id_col = id_col
        self.vec_col = vec_col
        self.rebuild = rebuild
        self.min_appended_fraction = min_appended_fraction
        self.rebuild_opts = dict(rebuild_opts or {})
        self._marker_root = index_path
        self.metrics = {
            "batches": 0,
            "appended": 0,
            "rebuilds": 0,
            "rebuild_recommended": 0,
        }

    def _growth_past_threshold(self) -> bool:
        """The trigger predicate at its cheapest: parquet footer count
        over the vectors table + one JSON scalar. Missing sidecar
        (pre-meta index) counts as no growth — the next rebuild call
        backfills it."""
        import json as _json

        n_now = self.spark.read.parquet(f"{self.index_path}/vectors").count()
        try:
            with open(os.path.join(self.index_path, "_build_meta.json")) as f:
                n_base = int(_json.load(f)["n_rows_at_build"])
        except (FileNotFoundError, ValueError, KeyError):
            # lost OR torn/garbage sidecar (pre-atomic writers could
            # tear it): treat as no-growth rather than failing the
            # micro-batch — the next rebuild call backfills the meta
            return False
        if n_base <= 0:
            return False
        return (n_now - n_base) / n_base >= self.min_appended_fraction

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            return  # exact replay of a completed batch — no-op
        # count ONCE (empty check + metric): each action re-evaluates
        # a real streaming batch's lineage, and a crash-replay that
        # lost its marker should record the batch a single time
        batch_df = batch_df.select(self.id_col, self.vec_col).localCheckpoint()
        n = batch_df.count()
        if n == 0:
            self._mark_done(batch_id)
            return
        from activedatawarehouseprototype_spark.operators import similarity

        similarity.ivf_pq_index_append(
            self.spark,
            self.index_path,
            batch_df,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )
        self.metrics["batches"] += 1
        self.metrics["appended"] += n
        self._mark_done(batch_id)
        if self.rebuild == "recommend":
            if self._growth_past_threshold():
                self.metrics["rebuild_recommended"] += 1
        elif self.rebuild == "auto":
            info = similarity.ivf_pq_index_rebuild(
                self.spark,
                self.index_path,
                min_appended_fraction=self.min_appended_fraction,
                id_col=self.id_col,
                **self.rebuild_opts,
            )
            if info["rebuilt"]:
                self.metrics["rebuilds"] += 1
