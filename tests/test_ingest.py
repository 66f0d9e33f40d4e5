"""Streaming dedup-at-the-door ingestion (streaming/ingest.py):
cross-batch suppression through the persisted index, within-batch
LSH dedup, and at-least-once replay idempotence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators import dedup_index as DI
from activedatawarehouseprototype_spark.streaming.ingest import DedupIngest

WORDS = "kilo lima mike november oscar papa quebec romeo sierra tango".split()


def _sentence(i: int, n: int = 12) -> str:
    # tokens carry i itself -> different seeds share NO tokens, so the
    # only LSH matches are the ones a test plants deliberately
    return " ".join(f"{WORDS[j % len(WORDS)]}{i}x{j}" for j in range(n))


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _setup(spark, tmp_path, name):
    idx = str(tmp_path / f"{name}-idx")
    store = str(tmp_path / f"{name}-store")
    seed = _mkdocs(spark, [(i, _sentence(i)) for i in range(20)])
    DI.dedup_index_build(seed, idx, n=3, k=12, bands=3)
    return DedupIngest(spark, idx, store), idx, store


def test_cross_batch_suppression(spark, tmp_path):
    ing, idx, store = _setup(spark, tmp_path, "a")
    # batch 0: one genuinely new doc + one near-dup of seed doc 4
    ing.process_batch(
        _mkdocs(spark, [(100, _sentence(50)), (101, _sentence(4) + " zz9")]), 0
    )
    admitted = {r.doc_id for r in ing.admitted().collect()}
    assert admitted == {100}
    # batch 1: exact copy of the doc ADMITTED in batch 0 -> dropped
    # (the index grew), plus another new doc -> admitted
    ing.process_batch(
        _mkdocs(spark, [(200, _sentence(50)), (201, _sentence(60))]), 1
    )
    admitted = {r.doc_id for r in ing.admitted().collect()}
    assert admitted == {100, 201}
    assert ing.metrics == {"batches": 2, "admitted": 2, "dropped": 2}


def test_within_batch_dedup_keeps_min_id(spark, tmp_path):
    ing, idx, store = _setup(spark, tmp_path, "b")
    ing.process_batch(
        _mkdocs(
            spark,
            [(300, _sentence(70)), (301, _sentence(70)), (302, _sentence(71))],
        ),
        0,
    )
    admitted = {r.doc_id for r in ing.admitted().collect()}
    assert admitted == {300, 302}  # 301 is an intra-batch copy of 300


def test_replay_is_idempotent(spark, tmp_path):
    ing, idx, store = _setup(spark, tmp_path, "c")
    batch = _mkdocs(spark, [(400, _sentence(80))])
    ing.process_batch(batch, 0)
    n_store = ing.admitted().count()
    n_index = spark.read.parquet(f"{idx}/bands").count()
    ing.process_batch(batch, 0)  # foreachBatch re-delivery
    assert ing.admitted().count() == n_store
    assert spark.read.parquet(f"{idx}/bands").count() == n_index
    assert ing.metrics["batches"] == 1


def test_streamed_ingest_end_to_end(spark, tmp_path):
    """Real foreachBatch stream over a file source: two files arrive
    as separate micro-batches (maxFilesPerTrigger=1); the second
    file's copy of the first file's doc is suppressed."""
    ing, idx, store = _setup(spark, tmp_path, "d")
    src = str(tmp_path / "d-src")
    _mkdocs(spark, [(500, _sentence(90))]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _mkdocs(spark, [(600, _sentence(90)), (601, _sentence(91))]).coalesce(
        1
    ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = ing.run_stream(stream, available_now=True)
    q.awaitTermination(120)
    admitted = {r.doc_id for r in ing.admitted().collect()}
    # file order is mtime-based: whichever arrives first wins its text;
    # 601 is always new. Either {500, 601} (500 first) or {600, 601}.
    assert admitted in ({500, 601}, {600, 601})
    assert ing.metrics["dropped"] >= 1


def test_cli_resample(spark, tmp_path):
    from activedatawarehouseprototype_spark.cli import main

    out = str(tmp_path / "grid")
    assert main([
        "resample", "--input", "/root/testdata/sf0.001/events.parquet",
        "--output", out, "--tie-col", "event_id",
    ]) == 0
    grid = spark.read.parquet(out)
    assert set(grid.columns) == {"user_id", "bucket_ms", "value", "observed"}
    assert grid.count() > 0
    assert grid.filter(F.col("value").isNull()).count() == 0


@pytest.mark.slow
def test_ingest_restart_recovery(spark, tmp_path):
    """A NEW DedupIngest instance over the same on-disk index/store
    continues correctly after a 'restart': completed batches replay as
    no-ops (marker), and new batches dedupe against docs admitted
    before the restart (index is the durable state)."""
    ing, idx, store = _setup(spark, tmp_path, "e")
    b0 = _mkdocs(spark, [(700, _sentence(95))])
    ing.process_batch(b0, 0)
    assert {r.doc_id for r in ing.admitted().collect()} == {700}

    ing2 = DedupIngest(spark, idx, store)  # restart
    ing2.process_batch(b0, 0)  # re-delivery of the completed batch
    assert {r.doc_id for r in ing2.admitted().collect()} == {700}
    ing2.process_batch(
        _mkdocs(spark, [(800, _sentence(95)), (801, _sentence(96))]), 1
    )
    assert {r.doc_id for r in ing2.admitted().collect()} == {700, 801}


def test_round4_curation_flow_end_to_end(spark, tmp_path):
    """Capstone over this round's additions: declarative quality gate →
    dedup-at-the-door ingestion (two batches, cross-batch suppression)
    → chunking → packing — with conservation and determinism checks at
    every joint."""
    from pyspark.sql import Window

    from activedatawarehouseprototype_spark.operators import (
        dedup_index as DI,
        packing,
    )
    from activedatawarehouseprototype_spark.operators.quality import (
        Constraint,
        enforce,
    )

    # seed index with an existing corpus
    corpus = _mkdocs(spark, [(i, _sentence(i, n=20)) for i in range(12)])
    idx = str(tmp_path / "flow-idx")
    store = str(tmp_path / "flow-store")
    DI.dedup_index_build(corpus, idx, n=3, k=12, bands=3)
    ing = DedupIngest(spark, idx, store)

    cons = [
        Constraint("text_not_null", "not_null", column="text"),
        Constraint("long_enough", "expression",
                   expr="size(split(text, ' ')) >= 5"),
    ]
    batches = [
        [(200, _sentence(40, n=20)), (201, _sentence(3, n=20)),  # 201 dups seed 3
         (202, None), (203, "too short")],
        [(300, _sentence(40, n=20)),                             # dups admitted 200
         (301, _sentence(41, n=20))],
    ]
    for bid, rows in enumerate(batches):
        raw = spark.createDataFrame(rows, "doc_id bigint, text string")
        clean, bad = enforce(raw, cons)
        ing.process_batch(clean, bid)
    admitted = ing.admitted()
    assert {r.doc_id for r in admitted.collect()} == {200, 301}

    chunks = packing.chunk_documents(admitted, chunk_tokens=8, overlap=2)
    # conservation: every admitted doc chunked, first chunks full-width
    assert {r.doc_id for r in chunks.collect()} == {200, 301}
    assert chunks.filter("chunk_idx = 0 AND n_tokens != 8").count() == 0

    packed = packing.pack_sequences(
        chunks.withColumn(
            "cid",
            F.col("doc_id") * 1000 + F.col("chunk_idx"),
        ),
        capacity=24, token_col="n_tokens", id_col="cid", n_shards=2,
    )
    # no bin exceeds capacity
    over = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("n_tokens").alias("t"))
        .filter(F.col("t") > 24)
    )
    assert over.count() == 0
    # determinism: the whole flow reruns bit-identically
    packed2 = packing.pack_sequences(
        packing.chunk_documents(admitted, chunk_tokens=8, overlap=2)
        .withColumn("cid", F.col("doc_id") * 1000 + F.col("chunk_idx")),
        capacity=24, token_col="n_tokens", id_col="cid", n_shards=2,
    )
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, packed2.collect())
    )


def test_partial_failure_replay_does_not_duplicate_store(spark, tmp_path):
    """Crash AFTER the store write but BEFORE the _done marker: the
    replayed batch must not duplicate store rows (per-batch overwrite
    partition dirs make the store write idempotent)."""
    import os

    ing, idx, store = _setup(spark, tmp_path, "f")
    batch = _mkdocs(spark, [(900, _sentence(97)), (901, _sentence(98))])
    ing.process_batch(batch, 0)
    assert ing.admitted().count() == 2
    os.remove(ing._marker(0))  # simulate the crash-before-marker
    ing.process_batch(batch, 0)  # at-least-once re-delivery
    assert ing.admitted().count() == 2  # no duplicates
    assert {r.doc_id for r in ing.admitted().collect()} == {900, 901}


@pytest.mark.slow
def test_ann_ingest_append_replay_and_search(spark, tmp_path):
    """AnnIngest: streamed batches append to the fused IVF+PQ index
    (searchable immediately); an exact replay is a marker no-op; a
    crash-style replay (marker removed, rows double-appended) still
    yields duplicate-free, correct search results."""
    import numpy as np

    from activedatawarehouseprototype_spark.operators import similarity
    from activedatawarehouseprototype_spark.streaming.ingest import AnnIngest

    rng = np.random.default_rng(5)
    DIM = 64
    centers = rng.normal(size=(4, DIM)) * 8.0
    base = np.vstack([centers[c] + rng.normal(size=(15, DIM)) for c in range(4)])

    def vdf(mat, ids):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)],
            "vec_id bigint, embedding array<double>",
        )

    idx = str(tmp_path / "ann-idx")
    similarity.ivf_pq_index_build(
        vdf(base, range(60)), idx, k=8, iters=4, m=8, ksub=16, pq_sample_n=4096
    )
    ing = AnnIngest(spark, idx)

    b1 = np.vstack([centers[1] + rng.normal(size=(5, DIM))])
    ing.process_batch(vdf(b1, range(100, 105)), 0)
    n_after_b1 = spark.read.parquet(f"{idx}/vectors").count()
    assert n_after_b1 == 65
    assert ing.metrics == {
        "batches": 1, "appended": 5, "rebuilds": 0, "rebuild_recommended": 0,
    }

    # exact replay: marker short-circuits, nothing appended
    ing.process_batch(vdf(b1, range(100, 105)), 0)
    assert spark.read.parquet(f"{idx}/vectors").count() == 65
    assert ing.metrics == {
        "batches": 1, "appended": 5, "rebuilds": 0, "rebuild_recommended": 0,
    }

    # appended vectors are searchable
    q = vdf((b1[2] + 0.005 * rng.normal(size=DIM))[None, :], [9000]).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    res = similarity.ivf_pq_search(spark, idx, q, k=3, probes=2, shortlist=40)
    assert {r.vec_id for r in res.collect()} & set(range(100, 105))

    # crash-style replay: marker lost AFTER append -> rows duplicate,
    # search results must stay duplicate-free and k-sized
    os.remove(os.path.join(idx, "_done", "0"))
    ing.process_batch(vdf(b1, range(100, 105)), 0)
    assert spark.read.parquet(f"{idx}/vectors").count() == 70  # dup rows
    rows = similarity.ivf_pq_search(
        spark, idx, q, k=3, probes=2, shortlist=40
    ).collect()
    assert len(rows) == 3
    assert len({(r.qid, r.vec_id) for r in rows}) == 3


def test_intra_batch_dedup_honors_hot_shingle_cap(spark, tmp_path):
    """Round-6 review finding 4: the within-batch LSH pass must use the
    SAME capped signature recipe the index uses — two distinct docs
    sharing only capped boilerplate must BOTH be admitted when they
    arrive in one batch (they already are when arriving separately)."""
    from activedatawarehouseprototype_spark.operators import dedup_index as DI
    from activedatawarehouseprototype_spark.streaming.ingest import DedupIngest

    boiler = "common boiler plate header text shared by every doc "
    corpus = spark.createDataFrame(
        [(i, boiler + f"unique body {i} " + " ".join(
            f"w{i}_{j}" for j in range(8))) for i in range(40)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "hotidx")
    # cap far below corpus size: every boilerplate shingle is hot
    DI.dedup_index_build(corpus, idx, n=3, k=12, bands=3, max_doc_freq=8)
    hot_n = spark.read.parquet(f"{idx}/hot_shingles").count()
    assert hot_n > 0, "test needs a non-empty hot list to be meaningful"

    ing = DedupIngest(spark, idx, str(tmp_path / "store"))
    batch = spark.createDataFrame(
        [
            (1000, boiler + "alpha beta gamma delta epsilon zeta eta"),
            (1001, boiler + "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    ing.process_batch(batch, 0)
    admitted = {r.doc_id for r in ing.admitted().collect()}
    assert admitted == {1000, 1001}, (
        "boilerplate-only intra-batch collision dropped a distinct doc"
    )


@pytest.mark.slow
def test_ann_ingest_drift_rebuild_soak(spark, tmp_path):
    """Round-10 VERDICT #6 soak: a drifting ANN ingest with
    rebuild='auto' must (a) stay a no-op below the growth threshold,
    (b) fire the retrain EXACTLY once when the threshold is crossed,
    (c) leave exact replays no-ops afterwards, and (d) measurably
    IMPROVE probe recall on the post-drift data vs an identical
    ingest that never rebuilds. 'recommend' mode must surface the
    same trigger in metrics without paying the retrain."""
    import json

    import numpy as np

    from activedatawarehouseprototype_spark.operators import similarity
    from activedatawarehouseprototype_spark.streaming.ingest import AnnIngest

    rng = np.random.default_rng(11)
    DIM = 16
    c0 = np.zeros(DIM); c0[0] = 10.0
    c1 = np.zeros(DIM); c1[1] = 10.0
    c_drift = (c0 + c1) / 2.0  # ON the old Voronoi boundary: tiny
    # noise flips which stale cell a drifted vector lands in, so the
    # drift cluster SPLITS across old cells and probes=1 misses the
    # half in the other cell (measured 11/9 split, recall 0.6)

    def vdf(mat, ids):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)],
            "vec_id bigint, embedding array<double>",
        )

    # vec 0 = exactly c0, vec 1 = exactly c1: with use_kmeans=False the
    # seed centroids (lowest-k ids) ARE the true cluster centers, so the
    # STALE geometry is pinned and the drift-straddle is deterministic
    base = np.vstack([
        c0[None, :], c1[None, :],
        c0 + rng.normal(scale=0.3, size=(19, DIM)),
        c1 + rng.normal(scale=0.3, size=(19, DIM)),
    ])
    small = c0 + rng.normal(scale=0.3, size=(4, DIM))
    drift = c_drift + rng.normal(scale=0.3, size=(20, DIM))
    queries = c_drift + rng.normal(scale=0.3, size=(3, DIM))

    def build_and_ingest(name, **ing_kw):
        idx = str(tmp_path / name)
        similarity.ivf_pq_index_build(
            vdf(base, range(40)), idx, k=2, m=4, ksub=8,
            pq_sample_n=4096, use_kmeans=False,
        )
        ing = AnnIngest(spark, idx, **ing_kw)
        ing.process_batch(vdf(small, range(100, 104)), 0)   # +10% < 25%
        ing.process_batch(vdf(drift, range(200, 220)), 1)   # +60% >= 25%
        return idx, ing

    idx_off, ing_off = build_and_ingest("off-idx")
    idx_auto, ing_auto = build_and_ingest(
        "auto-idx", rebuild="auto", rebuild_opts={"iters": 4}
    )

    # (a)+(b): no rebuild after batch 0, exactly one after batch 1
    assert ing_off.metrics["rebuilds"] == 0
    assert ing_auto.metrics["rebuilds"] == 1
    with open(f"{idx_auto}/_build_meta.json") as f:
        assert json.load(f)["n_rows_at_build"] == 64  # meta advanced
    with open(f"{idx_off}/_build_meta.json") as f:
        assert json.load(f)["n_rows_at_build"] == 40  # trigger still armed

    # (c): exact replay of the threshold-crossing batch is a no-op —
    # no append, no second rebuild
    ing_auto.process_batch(vdf(drift, range(200, 220)), 1)
    assert spark.read.parquet(f"{idx_auto}/vectors").count() == 64
    assert ing_auto.metrics["rebuilds"] == 1

    # (d): probe recall on the drifted queries improves after retrain.
    # Ground truth = brute-force cosine over everything ingested.
    allmat = np.vstack([base, small, drift])
    allids = list(range(40)) + list(range(100, 104)) + list(range(200, 220))

    def true_topk(q, k=5):
        sims = allmat @ q / (
            np.linalg.norm(allmat, axis=1) * np.linalg.norm(q)
        )
        return {allids[j] for j in np.argsort(-sims)[:k]}

    def recall(idx_path):
        got_total, want_total = 0, 0
        for qi, q in enumerate(queries):
            qdf = vdf(q[None, :], [9000 + qi]).select(
                F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
            )
            hits = {
                r.vec_id
                for r in similarity.ivf_pq_search(
                    spark, idx_path, qdf, k=5, probes=1, shortlist=64
                ).collect()
            }
            truth = true_topk(q)
            got_total += len(hits & truth)
            want_total += len(truth)
        return got_total / want_total

    r_off, r_auto = recall(idx_off), recall(idx_auto)
    assert r_auto > r_off, (r_off, r_auto)
    assert r_auto >= 0.9, r_auto  # retrained cells cover the drift

    # restart leg: a NEW AnnIngest over the same index (markers and
    # meta are the durable state). The replayed batch is a no-op; a
    # genuinely new batch appends WITHOUT re-firing the rebuild (the
    # advanced meta re-armed the trigger at 64 rows, and +1 row is
    # far below 25%).
    ing_auto2 = AnnIngest(spark, idx_auto, rebuild="auto",
                          rebuild_opts={"iters": 4})
    ing_auto2.process_batch(vdf(drift, range(200, 220)), 1)  # replay
    assert spark.read.parquet(f"{idx_auto}/vectors").count() == 64
    ing_auto2.process_batch(vdf(c_drift[None, :], [400]), 2)  # new
    assert spark.read.parquet(f"{idx_auto}/vectors").count() == 65
    assert ing_auto2.metrics["rebuilds"] == 0
    with open(f"{idx_auto}/_build_meta.json") as f:
        assert json.load(f)["n_rows_at_build"] == 64  # not re-advanced

    # 'recommend': same trigger surfaced in metrics, no retrain paid
    ing_rec = AnnIngest(spark, idx_off, rebuild="recommend")
    ing_rec.process_batch(vdf(c_drift[None, :], [300]), 2)
    assert ing_rec.metrics["rebuild_recommended"] == 1
    assert ing_rec.metrics["rebuilds"] == 0
    with open(f"{idx_off}/_build_meta.json") as f:
        assert json.load(f)["n_rows_at_build"] == 40  # untouched


@pytest.mark.slow
def test_streaming_curation_chain_soak(spark, tmp_path):
    """Golden-sequence soak of the STREAMING curation seam (the
    foreachBatch twin of the batch corpus_pipeline_e2e_stats entry):
    docs flow dedup-at-the-door -> admitted docs are embedded
    (deterministic fake projection) -> ANN-ingested, across three
    batches WITH a mid-stream restart of both handlers and a verbatim
    replay of an already-completed batch. The final admitted store and
    the final index must equal the golden single-pass result exactly —
    markers, not luck, are what make the chain idempotent."""
    import numpy as np

    from activedatawarehouseprototype_spark.operators import (
        dedup_index as DI,
        similarity,
    )
    from activedatawarehouseprototype_spark.streaming.ingest import (
        AnnIngest,
        DedupIngest,
    )

    def embed(doc_ids):
        # deterministic fake embedder: doc_id -> 8-dim unit-ish vector
        return [
            (i, [float((i * (d + 3)) % 7) / 7.0 + 0.01 for d in range(8)])
            for i in doc_ids
        ]

    # seed corpus + indexes
    seed = _mkdocs(spark, [(i, _sentence(i)) for i in range(10)])
    didx = str(tmp_path / "didx")
    store = str(tmp_path / "store")
    DI.dedup_index_build(seed, didx, n=3, k=12, bands=3)
    aidx = str(tmp_path / "aidx")
    similarity.ivf_pq_index_build(
        spark.createDataFrame(
            embed(range(10)), "vec_id bigint, embedding array<double>"
        ),
        aidx, k=2, m=4, ksub=4, pq_sample_n=16,
    )

    ding = DedupIngest(spark, didx, store)
    aing = AnnIngest(spark, aidx)

    batches = [
        # batch 0: two new docs + a near-dup of seed 4 (dropped at door)
        [(100, _sentence(50)), (101, _sentence(51)),
         (102, _sentence(4) + " zz9")],
        # batch 1: exact copy of an admitted doc (dropped) + one new
        [(200, _sentence(50)), (201, _sentence(60))],
        # batch 2 (post-restart): one new doc
        [(300, _sentence(70))],
    ]

    def run_chain(ding, aing, bid, rows):
        ding.process_batch(_mkdocs(spark, rows), bid)
        admitted_now = {r.doc_id for r in ding.admitted().collect()}
        # embed exactly the docs admitted in THIS batch (novel ids)
        new_ids = sorted(
            i for i in admitted_now if i in {r[0] for r in rows}
        )
        aing.process_batch(
            spark.createDataFrame(
                embed(new_ids) or [(None, None)],
                "vec_id bigint, embedding array<double>",
            ).filter("vec_id IS NOT NULL"),
            bid,
        )

    run_chain(ding, aing, 0, batches[0])
    run_chain(ding, aing, 1, batches[1])

    # ---- restart: fresh handler objects over the same on-disk state
    ding2 = DedupIngest(spark, didx, store)
    aing2 = AnnIngest(spark, aidx)
    # verbatim replay of completed batch 1 through BOTH handlers
    run_chain(ding2, aing2, 1, batches[1])
    # then the genuinely new batch 2
    run_chain(ding2, aing2, 2, batches[2])

    # golden: admitted set is exactly the non-dup novel docs, once each
    admitted = [r.doc_id for r in ding2.admitted().collect()]
    assert sorted(admitted) == [100, 101, 201, 300]  # no dup rows

    # the ANN index holds seed + exactly the admitted vectors, once
    vecs = spark.read.parquet(f"{aidx}/vectors")
    got_ids = sorted(r.vec_id for r in vecs.select("vec_id").collect())
    assert got_ids == sorted(list(range(10)) + [100, 101, 201, 300])

    # and every admitted doc is immediately searchable by its own vector
    q = spark.createDataFrame(
        [(9000, embed([300])[0][1])], "qid bigint, qvec array<double>"
    )
    hits = similarity.ivf_pq_search(spark, aidx, q, k=3, probes=2,
                                    shortlist=20).collect()
    assert 300 in {r.vec_id for r in hits}


@pytest.mark.slow
def test_ann_ingest_crash_mid_auto_rebuild_refires_and_converges(spark, tmp_path):
    """The drift-loop's crash contract, stream-side: the auto rebuild
    runs AFTER the batch's _done marker, so a crash anywhere inside
    the rebuild's rename protocol must (a) leave the replay of that
    batch a FULL no-op (marker present), (b) keep the growth trigger
    armed (meta un-advanced), and (c) re-fire the rebuild on the next
    genuine batch, converging through recover_swap. Injected at three
    representative rename boundaries: inside the scratch build's
    sidecar commits, mid vectors-swap, and just before the final meta
    advance (everything else already committed)."""
    import json
    import os

    import numpy as np

    from activedatawarehouseprototype_spark.operators import similarity
    from activedatawarehouseprototype_spark.streaming.ingest import AnnIngest

    class _Crash(RuntimeError):
        pass

    rng = np.random.default_rng(23)
    DIM = 16
    c0 = np.zeros(DIM); c0[0] = 10.0
    c1 = np.zeros(DIM); c1[1] = 10.0
    c_drift = (c0 + c1) / 2.0

    def vdf(mat, ids):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)],
            "vec_id bigint, embedding array<double>",
        )

    base = np.vstack([
        c0[None, :], c1[None, :],
        c0 + rng.normal(scale=0.3, size=(19, DIM)),
        c1 + rng.normal(scale=0.3, size=(19, DIM)),
    ])
    small = c0 + rng.normal(scale=0.3, size=(4, DIM))
    drift = c_drift + rng.normal(scale=0.3, size=(20, DIM))

    for crash_at in (0, 3, 7):
        idx = str(tmp_path / f"crash{crash_at}")
        similarity.ivf_pq_index_build(
            vdf(base, range(40)), idx, k=2, m=4, ksub=8,
            pq_sample_n=4096, use_kmeans=False,
        )
        ing = AnnIngest(spark, idx, rebuild="auto", rebuild_opts={"iters": 2})
        ing.process_batch(vdf(small, range(100, 104)), 0)  # below threshold

        real = os.replace
        state = {"calls": 0}

        def patched(src, dst, **kw):
            if state["calls"] == crash_at:
                raise _Crash(f"injected before os.replace #{crash_at}")
            state["calls"] += 1
            return real(src, dst, **kw)

        import pytest as _pytest

        with _pytest.MonkeyPatch.context() as mp:
            mp.setattr("os.replace", patched)
            with _pytest.raises(_Crash):
                ing.process_batch(vdf(drift, range(200, 220)), 1)  # crosses

        # (a) append IS durable and the marker exists: replay no-ops
        assert os.path.exists(ing._marker(1))
        ing2 = AnnIngest(spark, idx, rebuild="auto", rebuild_opts={"iters": 2})
        ing2.process_batch(vdf(drift, range(200, 220)), 1)
        assert ing2.metrics["rebuilds"] == 0
        # (b) the trigger is still armed — meta never advanced past 40
        with open(os.path.join(idx, "_build_meta.json")) as f:
            assert json.load(f)["n_rows_at_build"] == 40, crash_at
        # (c) the next genuine batch re-fires the rebuild and converges
        ing2.process_batch(vdf(c_drift[None, :], [400]), 2)
        assert ing2.metrics["rebuilds"] == 1, crash_at
        assert spark.read.parquet(f"{idx}/vectors").count() == 65
        assert spark.read.parquet(f"{idx}/centroids").count() == 2
        with open(os.path.join(idx, "_build_meta.json")) as f:
            assert json.load(f)["n_rows_at_build"] == 65, crash_at
        for leftover in ("vectors.old", "vectors.staging",
                         "centroids.old", "centroids.staging", ".rebuild"):
            assert not os.path.exists(os.path.join(idx, leftover)), (
                crash_at, leftover,
            )
        # and the recovered index answers searches
        q = vdf(c_drift[None, :], [9000]).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        assert similarity.ivf_pq_search(
            spark, idx, q, k=3, probes=2, shortlist=65
        ).count() == 3


def test_ann_ingest_growth_check_tolerates_torn_meta(spark, tmp_path):
    """A torn _build_meta.json must not fail the micro-batch in
    'recommend' mode: the growth check treats it as no-growth and the
    next rebuild call backfills it."""
    import numpy as np

    from activedatawarehouseprototype_spark.operators import similarity
    from activedatawarehouseprototype_spark.streaming.ingest import AnnIngest

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(30, 8))

    def vdf(m, ids):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, m)],
            "vec_id bigint, embedding array<double>",
        )

    idx = str(tmp_path / "idx")
    similarity.ivf_pq_index_build(
        vdf(mat, range(30)), idx, k=2, m=4, ksub=4, pq_sample_n=30
    )
    with open(f"{idx}/_build_meta.json", "w") as f:
        f.write('{"n_rows_at_b')  # torn
    ing = AnnIngest(spark, idx, rebuild="recommend")
    ing.process_batch(vdf(rng.normal(size=(25, 8)), range(100, 125)), 0)
    assert ing.metrics["batches"] == 1
    assert ing.metrics["rebuild_recommended"] == 0  # torn meta = no growth
