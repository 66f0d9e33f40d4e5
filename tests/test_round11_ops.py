"""Round-11 operators: large-star/small-star connected components.

The twostar variant must be a drop-in for ``connected_components`` —
same API, same (id, comp=min member) contract — so every test here
checks EQUIVALENCE against both the existing implementation and an
independent union-find, on the topologies where the two algorithms'
internals differ most (long chains stress star-contraction depth;
stars and cliques stress the per-vertex re-link; random graphs stress
everything at once).
"""

from __future__ import annotations

import random

import pytest

from activedatawarehouseprototype_spark.operators.dedup import (
    connected_components,
    connected_components_twostar,
)


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: comp = min member id
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {(n, comp_min[find(n)]) for n in parent}


def _run(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    return {(r.id, r.comp) for r in connected_components_twostar(df, **kw).collect()}


TOPOLOGIES = {
    "chain": [(i, i + 1) for i in range(60)],
    "clique": [(i, j) for i in range(8) for j in range(i + 1, 8)],
    "star": [(100, 100 + i) for i in range(1, 20)],
    "two_components": [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)],
    "reversed_ids": [(5, 4), (4, 3), (3, 2), (2, 1)],
    "dup_and_self_noise": [(1, 2), (2, 1), (1, 2), (3, 3), (3, 4)],
}


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
def test_twostar_matches_union_find(spark, name):
    pairs = TOPOLOGIES[name]
    assert _run(spark, pairs) == _union_find(pairs)


def test_twostar_matches_label_propagation_random_graph(spark):
    """Same answer as the existing min-label implementation on a seeded
    random graph (the drop-in-replacement contract of VERDICT r10 #5)."""
    rng = random.Random(11)
    pairs = [(rng.randrange(300), rng.randrange(300)) for _ in range(220)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _run(spark, pairs)
    base = {
        (r.id, r.comp)
        for r in connected_components(_mkdf(spark, pairs)).collect()
    }
    assert got == base == _union_find(pairs)


def _mkdf(spark, pairs):
    return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")


def test_twostar_long_chain_converges_logarithmically(spark):
    """A 200-node chain (diameter 199) must converge well inside 25
    alternating rounds — star contraction halves path structure per
    round the same way pointer doubling does."""
    pairs = [(i, i + 1) for i in range(200)]
    assert _run(spark, pairs) == {(i, 0) for i in range(201)}


def test_twostar_empty_and_selfloop_only(spark):
    assert _run(spark, [(7, 7)]) == {(7, 7)}
    empty = _mkdf(spark, []).filter("id_a > 0")
    assert connected_components_twostar(empty).count() == 0


def test_cli_dedup_cc_algo_twostar_matches_labelprop(spark, tmp_path):
    """`dedup --cc-algo twostar` writes the same clusters as the
    default label-propagation path."""
    from activedatawarehouseprototype_spark.cli import main

    docs = "/root/testdata/sf0.001/documents.parquet"
    out_lp = str(tmp_path / "lp")
    out_ts = str(tmp_path / "ts")
    assert main(["dedup", "--input", docs, "--output", out_lp]) == 0
    assert main(["dedup", "--input", docs, "--output", out_ts,
                 "--cc-algo", "twostar"]) == 0
    lp = {(r.doc_id, r.component) for r in spark.read.parquet(out_lp).collect()}
    ts = {(r.doc_id, r.component) for r in spark.read.parquet(out_ts).collect()}
    assert lp == ts and len(lp) > 0


# --- IVF rebuild crash-safety (round-11 ADVICE) --------------------------


def _mk_vecs(spark, ids, dim=8):
    from pyspark import Row

    rows = [
        Row(
            vec_id=i,
            embedding=[float((i * (d + 3)) % 7) / 7.0 for d in range(dim)],
        )
        for i in ids
    ]
    return spark.createDataFrame(rows)


def _crash_mid_centroid_swap(idx):
    """Simulate a crash between commit_swap's two os.replace calls on
    the centroids table: target gone, .old holds the committed state."""
    import os

    cent = os.path.join(idx, "centroids")
    os.replace(cent, cent + ".old")
    assert not os.path.exists(cent)


def test_ivf_rebuild_recovers_centroid_crash_window(spark, tmp_path):
    """A crash mid-swap on the CENTROIDS table must not wedge the
    index: re-running rebuild recovers the committed centroids and
    converges (the docstring's 're-running converges' claim, now true
    for both tables, not just vectors)."""
    from activedatawarehouseprototype_spark.operators import similarity as S

    idx = str(tmp_path / "idx")
    S.ivf_index_build(_mk_vecs(spark, range(40)), idx, k=4, use_kmeans=False)
    _crash_mid_centroid_swap(idx)
    info = S.ivf_index_rebuild(spark, idx, force=True, iters=1)
    assert info["rebuilt"] and info["k"] == 4
    assert spark.read.parquet(f"{idx}/centroids").count() == 4
    # and a plain search works again too
    import pyspark.sql.functions as F

    q = _mk_vecs(spark, [3]).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    assert S.ivf_index_search(spark, idx, q, k=3, probes=2).count() >= 1


def test_ivf_pq_rebuild_recovers_centroid_crash_window(spark, tmp_path):
    from activedatawarehouseprototype_spark.operators import similarity as S

    idx = str(tmp_path / "pqidx")
    S.ivf_pq_index_build(
        _mk_vecs(spark, range(40)), idx, k=4, iters=1, m=4, ksub=4,
        pq_sample_n=40,
    )
    _crash_mid_centroid_swap(idx)
    info = S.ivf_pq_index_rebuild(spark, idx, force=True, iters=1,
                                  pq_sample_n=40)
    assert info["rebuilt"] and info["k"] == 4
    assert spark.read.parquet(f"{idx}/centroids").count() == 4


def test_ivf_rebuild_backfills_missing_meta(spark, tmp_path):
    """An index predating _build_meta.json (or with a lost sidecar)
    must not die on FileNotFoundError: the meta is backfilled at the
    current count (treated as freshly built), growth-triggering
    resumes from there, and force=True still rebuilds."""
    import json
    import os

    from activedatawarehouseprototype_spark.operators import similarity as S

    idx = str(tmp_path / "idx")
    S.ivf_index_build(_mk_vecs(spark, range(40)), idx, k=4, use_kmeans=False)
    os.remove(os.path.join(idx, "_build_meta.json"))
    info = S.ivf_index_rebuild(spark, idx)
    assert info == {"rebuilt": False, "n_rows": 40, "n_at_build": 40, "k": 4}
    with open(os.path.join(idx, "_build_meta.json")) as f:
        assert json.load(f)["n_rows_at_build"] == 40
    # force still rebuilds on a backfilled index
    assert S.ivf_index_rebuild(spark, idx, force=True, iters=1)["rebuilt"]


def test_ivf_pq_rebuild_backfills_missing_meta(spark, tmp_path):
    import os

    from activedatawarehouseprototype_spark.operators import similarity as S

    idx = str(tmp_path / "pqidx")
    S.ivf_pq_index_build(
        _mk_vecs(spark, range(40)), idx, k=4, iters=1, m=4, ksub=4,
        pq_sample_n=40,
    )
    os.remove(os.path.join(idx, "_build_meta.json"))
    info = S.ivf_pq_index_rebuild(spark, idx)
    assert info == {"rebuilt": False, "n_rows": 40, "n_at_build": 40, "k": 4}


def test_twostar_non_convergence_signal(spark):
    pairs = [(i, i + 1) for i in range(64)]
    df = _mkdf(spark, pairs)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_twostar(df, max_iter=1)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        partial = connected_components_twostar(
            df, max_iter=1, on_non_convergence="warn"
        )
    assert partial.count() == 65  # partial labels still cover every vertex


# --- mine_hard_negatives (retrieval hard-negative mining) ----------------


def _hn_fixture(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    corpus = rng.normal(size=(40, 8))
    queries = rng.normal(size=(5, 8))
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(corpus)],
        "vec_id bigint, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(1000 + i, [float(x) for x in v]) for i, v in enumerate(queries)],
        "qid bigint, qvec array<double>",
    )
    sims = (corpus @ queries.T) / (
        np.linalg.norm(corpus, axis=1)[:, None]
        * np.linalg.norm(queries, axis=1)[None, :]
    )
    return cdf, qdf, sims


def test_mine_hard_negatives_excludes_positives(spark):
    """Negatives = brute-force cosine order with each query's labeled
    positives removed (probes=n_centroids makes the IVF plan exact, so
    the numpy reference is the ground truth)."""
    import numpy as np

    from activedatawarehouseprototype_spark.operators.similarity import (
        mine_hard_negatives,
    )

    cdf, qdf, sims = _hn_fixture(spark)
    # positives: the TRUE top-1 (and for query 0 the top-2) per query
    pos_rows = []
    for qi in range(5):
        order = list(np.argsort(-sims[:, qi]))
        pos_rows.append((1000 + qi, int(order[0])))
        if qi == 0:
            pos_rows.append((1000 + qi, int(order[1])))
    pdf = spark.createDataFrame(pos_rows, "qid bigint, vec_id bigint")

    out = mine_hard_negatives(
        cdf, qdf, pdf, k=4, n_centroids=4, probes=4
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append((r.rank, r.vec_id))
    pos_by_q = {}
    for q, v in pos_rows:
        pos_by_q.setdefault(q, set()).add(v)
    for qi in range(5):
        got = [v for _, v in sorted(by_q[1000 + qi])]
        want = [
            int(j)
            for j in np.argsort(-sims[:, qi])
            if int(j) not in pos_by_q[1000 + qi]
        ][:4]
        assert got == want, (qi, got, want)
        assert not set(got) & pos_by_q[1000 + qi]


def test_mine_hard_negatives_positive_floor_guard(spark):
    """With guard_positive_floor, candidates scoring above the weakest
    labeled positive are dropped (likely unlabeled positives); a query
    with no labeled positive keeps its full top-k."""
    import numpy as np

    from activedatawarehouseprototype_spark.operators.similarity import (
        mine_hard_negatives,
    )

    cdf, qdf, sims = _hn_fixture(spark)
    # label the SECOND-best as the (only) positive for every query:
    # the true best now scores above the floor and must be dropped
    pos_rows = [
        (1000 + qi, int(np.argsort(-sims[:, qi])[1])) for qi in range(4)
    ]  # query 4 gets NO positive
    pdf = spark.createDataFrame(pos_rows, "qid bigint, vec_id bigint")

    out = mine_hard_negatives(
        cdf, qdf, pdf, k=3, n_centroids=4, probes=4,
        guard_positive_floor=True,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append((r.rank, r.vec_id, r.score))
    for qi in range(4):
        order = list(np.argsort(-sims[:, qi]))
        got = [v for _, v, _ in sorted(by_q[1000 + qi])]
        # best (above the floor) AND the positive itself are both gone
        assert order[0] not in got and order[1] not in got
        assert got == [int(j) for j in order[2:5]]
    # the floorless query keeps the plain brute-force top-3
    order4 = list(np.argsort(-sims[:, 4]))
    assert [v for _, v, _ in sorted(by_q[1004])] == [int(j) for j in order4[:3]]


def test_mine_hard_negatives_validates_k(spark):
    from activedatawarehouseprototype_spark.operators.similarity import (
        mine_hard_negatives,
    )

    cdf, qdf, _ = _hn_fixture(spark)
    pdf = spark.createDataFrame([], "qid bigint, vec_id bigint")
    with pytest.raises(ValueError, match="k must be"):
        mine_hard_negatives(cdf, qdf, pdf, k=0)
    # empty positives: plain ANN top-k (still ranked, nothing dropped)
    out = mine_hard_negatives(cdf, qdf, pdf, k=2, n_centroids=4, probes=4)
    assert out.groupBy("qid").count().filter("count != 2").count() == 0


def test_cli_mine_hard_negatives(spark, tmp_path):
    """The CLI verb mines negatives from the fixture embeddings against
    a tiny labeled-positives file and writes ranked parquet."""
    from pyspark.sql import functions as F

    from activedatawarehouseprototype_spark.cli import main

    emb = "/root/testdata/sf0.001/embeddings.parquet"
    # queries: 3 corpus vectors re-labeled into a disjoint qid range
    qdir = str(tmp_path / "queries")
    spark.read.parquet(emb).filter("vec_id < 3").select(
        (F.col("vec_id") + 1_000_000).alias("qid"),
        F.col("embedding").alias("qvec"),
    ).write.parquet(qdir)
    # positives: each query's own source vector (a guaranteed top hit)
    pdir = str(tmp_path / "pos")
    spark.range(3).select(
        (F.col("id") + 1_000_000).alias("qid"), F.col("id").alias("vec_id")
    ).write.parquet(pdir)
    out = str(tmp_path / "negs")
    assert main([
        "mine-hard-negatives", "--corpus", emb, "--queries", qdir,
        "--positives", pdir, "--output", out, "--k", "4",
        "--n-centroids", "4", "--probes", "4",
    ]) == 0
    negs = spark.read.parquet(out)
    assert set(negs.columns) == {"qid", "vec_id", "score", "rank"}
    rows = negs.collect()
    # every query got k negatives, none of them its labeled positive
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append(r)
    assert set(per_q) == {1_000_000, 1_000_001, 1_000_002}
    for qid, rs in per_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3, 4]
        assert (qid - 1_000_000) not in {r.vec_id for r in rs}


def test_twostar_large_random_graph_with_giant_component(spark):
    """Scale-shape check: a 3k-node graph whose edges concentrate into
    one giant component (the exact regime where label-prop's
    label-keyed rounds skew) still converges inside max_iter and
    matches union-find. Kept at a size that runs in seconds locally —
    the structural guarantee (per-vertex keys, O(log^2 n) rounds) is
    what scales, not this fixture."""
    rng = random.Random(23)
    n = 3000
    # giant component: a sparse random graph over [0, 2000) plus a
    # spanning chain so it's connected; [2000, 3000) stays in small
    # 10-node rings
    pairs = [(i, i + 1) for i in range(0, 1999)]
    pairs += [
        (rng.randrange(2000), rng.randrange(2000)) for _ in range(1500)
    ]
    for base in range(2000, 3000, 10):
        pairs += [(base + j, base + (j + 1) % 10) for j in range(10)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _run(spark, pairs)
    assert got == _union_find(pairs)
    # one giant component rooted at 0 plus 100 ten-node rings
    comps = {}
    for node, comp in got:
        comps.setdefault(comp, 0)
        comps[comp] += 1
    assert comps[0] == 2000
    assert sorted(v for c, v in comps.items() if c != 0) == [10] * 100


# --- Exhaustive crash-point enumeration over the rebuild swap protocol ---
#
# The hand-placed tests above pin the two crash windows the round-11
# ADVICE named.  This matrix goes further: inject a crash before EVERY
# ``os.replace`` call a forced rebuild performs (the rename boundaries
# are the only non-atomic state transitions in the protocol — parquet
# staging writes are re-staged wholesale on retry), then re-run the
# rebuild and assert the index converges to a state that is
# search-indistinguishable from a never-crashed run.  Swap points
# added later are covered automatically: the matrix walks crash
# points until a run completes with no injection left to fire.
#
# Search comparisons are made geometry-independent on purpose
# (probes = k probes every cell; PQ shortlist covers the whole
# corpus, and the exact re-rank stage returns true cosines), so the
# assertions hold even where a retry retrains k-means over a
# differently-partitioned vectors table and lands on different cells.


class _InjectedCrash(RuntimeError):
    pass


def _inject_replace_crash(mp, crash_at: int) -> dict:
    """Patch ``os.replace`` to raise before its ``crash_at``-th call.
    Returns the counter state so the caller can tell whether the
    injection actually fired (if not, the matrix is exhausted)."""
    import os as _os

    real = _os.replace
    state = {"calls": 0, "fired": False}

    def patched(src, dst, **kw):
        if state["calls"] == crash_at:
            state["fired"] = True
            raise _InjectedCrash(
                f"injected before os.replace #{crash_at}: {src} -> {dst}"
            )
        state["calls"] += 1
        return real(src, dst, **kw)

    mp.setattr("os.replace", patched)
    return state


def _clean_index_dir(idx: str) -> None:
    import os

    for leftover in (
        "vectors.old",
        "vectors.staging",
        "centroids.old",
        "centroids.staging",
        "_build_meta.json.tmp",
        "_pq_codebooks.json.tmp",
        ".rebuild",
    ):
        assert not os.path.exists(os.path.join(idx, leftover)), leftover


@pytest.mark.slow
def test_ivf_rebuild_crash_matrix(spark, tmp_path, monkeypatch):
    """Every rename boundary of ivf_index_rebuild, crashed and
    re-run: vec swap (2 renames), centroid swap (2), meta commit (1)."""
    import os

    import pyspark.sql.functions as F

    from activedatawarehouseprototype_spark.operators import similarity as S

    dim = 8
    new_cents = [
        (c, [float((c + 1) * (d + 1) % 5) / 5.0 for d in range(dim)])
        for c in range(4)
    ]

    def build(idx):
        S.ivf_index_build(_mk_vecs(spark, range(48)), idx, k=4, use_kmeans=False)
        S.ivf_index_append(spark, idx, _mk_vecs(spark, range(100, 124)))

    def rebuild(idx):
        # deterministic retrain geometry: constant across retries
        return S.ivf_index_rebuild(spark, idx, force=True, centroids=new_cents)

    def search(idx):
        q = _mk_vecs(spark, [5, 110]).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        # probes = k probes every cell: exact top-k whatever the cells
        return {
            (r.qid, r.vec_id, r.score)
            for r in S.ivf_index_search(spark, idx, q, k=4, probes=4).collect()
        }

    golden_idx = str(tmp_path / "golden")
    build(golden_idx)
    assert rebuild(golden_idx)["rebuilt"]
    golden = search(golden_idx)
    assert len(golden) == 8

    crash_at = 0
    while True:
        idx = str(tmp_path / f"crash{crash_at}")
        build(idx)
        with monkeypatch.context() as mp:
            state = _inject_replace_crash(mp, crash_at)
            try:
                rebuild(idx)
            except _InjectedCrash:
                pass
        if not state["fired"]:
            break  # run completed untouched -> every crash point covered
        # the recovery action IS the operation: re-run and compare
        info = rebuild(idx)
        assert info["rebuilt"] and info["k"] == 4
        assert search(idx) == golden, f"crash point {crash_at}"
        _clean_index_dir(idx)
        import json

        with open(os.path.join(idx, "_build_meta.json")) as f:
            assert json.load(f)["n_rows_at_build"] == 72
        crash_at += 1
    assert crash_at >= 5, f"expected >=5 rename boundaries, saw {crash_at}"


@pytest.mark.slow
def test_ivf_pq_rebuild_crash_matrix(spark, tmp_path, monkeypatch):
    """Same matrix over the fused IVF+PQ rebuild: scratch-build sidecar
    commits (2), vec swap (2), centroid swap (2), codebooks commit (1),
    meta commit (1)."""
    import pyspark.sql.functions as F

    from activedatawarehouseprototype_spark.operators import similarity as S

    def build(idx):
        S.ivf_pq_index_build(
            _mk_vecs(spark, range(48)), idx, k=4, iters=1, m=4, ksub=4,
            pq_sample_n=48,
        )

    def rebuild(idx):
        return S.ivf_pq_index_rebuild(
            spark, idx, force=True, iters=1, pq_iters=2, pq_sample_n=64
        )

    def search(idx):
        q = _mk_vecs(spark, [5, 17]).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        # probes=k + corpus-sized shortlist + exact re-rank: the result
        # set is independent of which cells a retry's retrain landed on
        return {
            (r.qid, r.vec_id, r.score)
            for r in S.ivf_pq_search(
                spark, idx, q, k=3, probes=4, shortlist=10_000
            ).collect()
        }

    golden_idx = str(tmp_path / "golden")
    build(golden_idx)
    assert rebuild(golden_idx)["rebuilt"]
    golden = search(golden_idx)
    assert len(golden) == 6

    crash_at = 0
    while True:
        idx = str(tmp_path / f"crash{crash_at}")
        build(idx)
        with monkeypatch.context() as mp:
            state = _inject_replace_crash(mp, crash_at)
            try:
                rebuild(idx)
            except _InjectedCrash:
                pass
        if not state["fired"]:
            break
        info = rebuild(idx)
        assert info["rebuilt"] and info["k"] == 4
        assert search(idx) == golden, f"crash point {crash_at}"
        _clean_index_dir(idx)
        crash_at += 1
    assert crash_at >= 6, f"expected >=6 rename boundaries, saw {crash_at}"


def test_ivf_rebuild_tolerates_torn_meta(spark, tmp_path):
    """A TORN _build_meta.json (half-written JSON from a pre-atomic
    writer, or a truncated copy) is recovered like a lost sidecar:
    backfill at the current count, never a JSONDecodeError wedge.
    A PARSEABLE non-positive count still raises — that is structured
    corruption, not a torn write."""
    import json
    import os

    import pytest as _pytest

    from activedatawarehouseprototype_spark.operators import similarity as S

    idx = str(tmp_path / "idx")
    S.ivf_index_build(_mk_vecs(spark, range(40)), idx, k=4, use_kmeans=False)
    meta = os.path.join(idx, "_build_meta.json")

    with open(meta, "w") as f:
        f.write('{"n_rows_at_b')  # torn mid-write
    info = S.ivf_index_rebuild(spark, idx)
    assert info == {"rebuilt": False, "n_rows": 40, "n_at_build": 40, "k": 4}
    with open(meta) as f:
        assert json.load(f) == {"n_rows_at_build": 40}

    with open(meta, "w") as f:
        json.dump({"wrong_key": 1}, f)  # lost the field, valid JSON
    assert S.ivf_index_rebuild(spark, idx)["n_at_build"] == 40

    with open(meta, "w") as f:
        json.dump({"n_rows_at_build": 0}, f)  # parseable + impossible
    with _pytest.raises(ValueError, match="corrupt build meta"):
        S.ivf_index_rebuild(spark, idx)


def test_ivf_pq_rebuild_tolerates_torn_meta(spark, tmp_path):
    import os

    from activedatawarehouseprototype_spark.operators import similarity as S

    idx = str(tmp_path / "pqidx")
    S.ivf_pq_index_build(
        _mk_vecs(spark, range(40)), idx, k=4, iters=1, m=4, ksub=4,
        pq_sample_n=40,
    )
    with open(os.path.join(idx, "_build_meta.json"), "w") as f:
        f.write("")  # zero-byte file: the classic crash artifact
    info = S.ivf_pq_index_rebuild(spark, idx)
    assert info == {"rebuilt": False, "n_rows": 40, "n_at_build": 40, "k": 4}


def test_twostar_round_plan_is_three_exchanges(spark):
    """Pin the round's physical shape: window-min per star pass (one
    exchange each, replacing an agg-shuffle + join-shuffle pair) plus
    the final repartition(a) — whose hash(a) clustering the (a, b)
    dropDuplicates REUSES, adding no fourth exchange. A regression
    back to agg+join or a distinct that re-shuffles shows up here as
    an exchange count, not as a wall-clock mystery three rounds
    later."""
    from activedatawarehouseprototype_spark.operators.dedup import (
        _twostar_round,
    )

    edges = spark.createDataFrame(
        [(2, 1), (3, 1), (5, 4)], "a bigint, b bigint"
    )
    plan = (
        _twostar_round(edges, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 3, plan
