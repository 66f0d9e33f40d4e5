"""Product quantization: codebook training, encoding, ADC search.

Quality gates mirror test_ann_recall's style: planted clustered data,
recall@k vs exact brute force, plus compression/shape contracts and
partition-layout independence of the encoding."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators import pq as PQ

DIM = 32
M = 8
KSUB = 16


@pytest.fixture(scope="module")
def clustered(spark):
    """400 vectors in 10 tight clusters (deterministic)."""
    rng = np.random.RandomState(11)
    centers = rng.uniform(-1, 1, (10, DIM))
    rows = []
    for i in range(400):
        c = i % 10
        v = centers[c] + 0.05 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    return rows, spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_codes_shape_and_compression(spark, clustered):
    rows, df = clustered
    cbs = PQ.pq_train(df, m=M, ksub=KSUB, iters=5)
    assert len(cbs) == M and all(len(cb) == KSUB for cb in cbs)
    enc = PQ.pq_encode(df, cbs).collect()
    assert len(enc) == 400
    for r in enc:
        assert len(r["codes"]) == M
        assert all(0 <= c < KSUB for c in r["codes"])
    # 32 float64 dims -> 8 small ints: the 64x storage claim at byte
    # width (codes fit uint8 at any ksub <= 256)


def test_reconstruction_beats_random(clustered, spark):
    """PQ centroids must approximate the originals far better than a
    random quantizer: mean reconstruction error a small fraction of
    mean vector norm."""
    rows, df = clustered
    cbs = PQ.pq_train(df, m=M, ksub=KSUB, iters=5)
    enc = {r["vec_id"]: list(r["codes"]) for r in PQ.pq_encode(df, cbs).collect()}
    errs, norms = [], []
    for vid, vec in rows:
        rec = np.array(PQ.pq_reconstruct(enc[vid], cbs))
        v = np.array(vec)
        errs.append(np.linalg.norm(rec - v))
        norms.append(np.linalg.norm(v))
    assert np.mean(errs) <= 0.25 * np.mean(norms)


def test_adc_shortlist_recall_and_refined_exactness(spark, clustered):
    """Raw ADC can't rank within a quantization cell (codes collapse in
    tight clusters) — its guarantee is SHORTLIST recall: the exact
    top-10 live inside the ADC top-40. The refined search (shortlist +
    exact re-rank, the production recipe) then recovers the exact
    top-10 almost perfectly."""
    rows, df = clustered
    cbs = PQ.pq_train(df, m=M, ksub=KSUB, iters=5)
    encoded = PQ.pq_encode(df, cbs).persist()
    X = np.array([v for _, v in rows])
    short_hits = refined_hits = total = 0
    for qid in (7, 123, 305):
        q = [float(x) for x in X[qid]]
        exact = set(np.argsort(((X - X[qid]) ** 2).sum(axis=1))[:10].tolist())
        shortlist = {
            r["vec_id"] for r in PQ.pq_adc_topk(encoded, cbs, q, k=40).collect()
        }
        refined = {
            r["vec_id"]
            for r in PQ.pq_adc_topk_refined(encoded, df, cbs, q, k=10).collect()
        }
        short_hits += len(exact & shortlist)
        refined_hits += len(exact & refined)
        total += 10
    encoded.unpersist()
    assert short_hits / total >= 0.9, f"shortlist recall {short_hits/total:.2f}"
    assert refined_hits / total >= 0.9, f"refined recall@10 {refined_hits/total:.2f}"


def test_encode_is_partition_layout_independent(spark, clustered):
    rows, df = clustered
    cbs = PQ.pq_train(df, m=M, ksub=KSUB, iters=3)
    a = {r["vec_id"]: list(r["codes"]) for r in PQ.pq_encode(df, cbs).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in PQ.pq_encode(df.repartition(13), cbs).collect()
    }
    assert a == b
