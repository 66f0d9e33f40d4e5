"""Integer-lattice Lloyd k-means: separability, determinism, empty
cells, tie-breaks, and the IVF centroid-seam integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.clustering import (
    kmeans_lattice,
)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )


def test_separable_clusters_found(spark):
    # two tight blobs far apart; seeds (lowest ids) land one per blob
    blob_a = [[0.0, 0.0], [0.01, 0.0], [0.0, 0.01], [0.02, 0.01]]
    blob_b = [[1.0, 1.0], [1.01, 1.0], [1.0, 1.01], [0.99, 1.0]]
    df = _df(spark, [blob_a[0], blob_b[0]] + blob_a[1:] + blob_b[1:])
    assigned, cents = kmeans_lattice(df, k=2, iters=3)
    rows = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    a_ids = {0, 2, 3, 4}
    b_ids = {1, 5, 6, 7}
    assert len({rows[i] for i in a_ids}) == 1
    assert len({rows[i] for i in b_ids}) == 1
    assert rows[0] != rows[1]
    # centroid of blob_a on the 1e4 lattice: float32(0.01) is just
    # under 0.01, so it floors to 99 (and 0.02f to 199) — dim0 sums
    # 0+99+0+199=298 -> 298//4 = 74, dim1 0+0+99+99=198 -> 49
    cent_a = dict(cents)[rows[0]]
    assert cent_a == [74, 49]


def test_deterministic_replay(spark):
    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-0.5, 0.5) for _ in range(8)] for _ in range(60)]
    df = _df(spark, vecs)
    _, c1 = kmeans_lattice(df, k=3, iters=4)
    _, c2 = kmeans_lattice(df, k=3, iters=4)
    assert c1 == c2


def test_empty_cluster_keeps_previous_centroid(spark):
    # k=3 over two distinct points: one seed never wins a point and
    # must carry its seed coordinates through every iteration
    df = _df(spark, [[0.0, 0.0], [0.5, 0.5], [0.0, 0.0], [0.5, 0.5]])
    _, cents = kmeans_lattice(df, k=3, iters=2)
    by_cid = dict(cents)
    assert by_cid[2] == [0, 0]  # seed 2 = vec 2 = origin, tied away
    assert len(cents) == 3


def test_tie_breaks_to_lower_cluster_id(spark):
    # a point equidistant from both centroids joins the lower cid
    df = _df(spark, [[0.0, 0.0], [0.2, 0.0], [0.1, 0.0]])
    assigned, _ = kmeans_lattice(df, k=2, iters=0)
    rows = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    assert rows[2] == 0


def test_centroids_feed_ivf_assign(spark):
    from activedatawarehouseprototype_spark.operators.similarity import (
        ivf_assign,
    )

    import random

    rng = random.Random(11)
    vecs = [[rng.uniform(-0.5, 0.5) for _ in range(8)] for _ in range(40)]
    df = _df(spark, vecs)
    assigned, cents = kmeans_lattice(df, k=4, iters=2)
    dequant = [(cid, [c / 10_000 for c in cv]) for cid, cv in cents]
    cells = ivf_assign(df, k=4, centroids=dequant)
    assert cells.filter(F.col("cell").isNull()).count() == 0
    assert cells.select("cell").distinct().count() <= 4


def test_fewer_points_than_k_raises(spark):
    df = _df(spark, [[0.1, 0.2], [0.3, 0.4]])
    import pytest

    with pytest.raises(ValueError, match="only 2 input vectors"):
        kmeans_lattice(df, k=3, iters=1)


def _ref_kmeans_lattice(vecs, k, iters, scale=10_000):
    """Pure-Python replay of the exact integer-lattice trajectory —
    independent of both Spark and the DuckDB oracle."""
    import math

    q = [[math.floor(x * scale) for x in v] for v in vecs]
    cents = [list(q[i]) for i in range(k)]  # ids are 0..n-1 by construction

    def assign(p):
        best = None
        for cid, cv in enumerate(cents):
            d = sum((a - b) * (a - b) for a, b in zip(p, cv))
            if best is None or (d, cid) < best:
                best = (d, cid)
        return best[1]

    for _ in range(iters):
        sums = {}
        for p in q:
            cid = assign(p)
            s, n = sums.get(cid, ([0] * len(p), 0))
            sums[cid] = ([a + b for a, b in zip(s, p)], n + 1)
        new_cents = []
        for cid, cv in enumerate(cents):
            if cid in sums:
                s, n = sums[cid]
                new_cents.append([si // n for si in s])
            else:
                new_cents.append(cv)  # empty cell keeps its centroid
        cents = new_cents
    return cents, [assign(p) for p in q]


def test_trajectory_matches_pure_python_reference(spark):
    import random

    rng = random.Random(23)
    vecs = [[rng.uniform(-0.5, 0.5) for _ in range(6)] for _ in range(80)]
    # float32 storage quantizes the values BEFORE the operator sees
    # them — replay the reference on the post-float32 values
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    vecs32 = [[f32(x) for x in v] for v in vecs]
    df = _df(spark, vecs)
    assigned, cents = kmeans_lattice(df, k=3, iters=3)
    ref_cents, ref_labels = _ref_kmeans_lattice(vecs32, k=3, iters=3)
    assert [cv for _, cv in cents] == ref_cents
    got = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    assert [got[i] for i in range(len(vecs))] == ref_labels
