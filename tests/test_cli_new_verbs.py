"""End-to-end CLI coverage for the round-6 late verbs: bm25, ewma,
hll-mv-build/hll-mv-distinct, pca-project — each exercised against its
operator-level ground truth."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_bm25(spark, tmp_path):
    out = str(tmp_path / "hits")
    assert (
        main(
            [
                "bm25",
                "--docs", f"{SF}/documents.parquet",
                "--query", "hash join",
                "--query", "stream batch",
                "--k", "5",
                "--output", out,
            ]
        )
        == 0
    )
    rows = spark.read.parquet(out).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {1, 2}
    assert all(len(v) == 5 for v in per_q.values())
    from activedatawarehouseprototype_spark.operators.retrieval import bm25_topk

    want = {
        (r["query_id"], r["doc_id"], r["score"])
        for r in bm25_topk(
            catalog.load(spark, SF, "documents"),
            [(1, "hash join"), (2, "stream batch")],
            k=5,
        ).collect()
    }
    assert {(r["query_id"], r["doc_id"], r["score"]) for r in rows} == want


def test_cli_ewma(spark, tmp_path):
    out = str(tmp_path / "sm")
    assert (
        main(
            [
                "ewma",
                "--input", f"{SF}/events.parquet",
                "--key-col", "user_id",
                "--value-col", "value",
                "--alpha", "0.5",
                "--tie-col", "event_id",
                "--output", out,
            ]
        )
        == 0
    )
    got = spark.read.parquet(out)
    assert got.columns == ["key", "seq", "ts_ms", "value", "ewma"]
    n_in = (
        catalog.load(spark, SF, "events")
        .filter("value is not null and ts is not null")
        .count()
    )
    assert got.count() == n_in
    # first observation per key: ewma == value
    firsts = got.filter("seq = 0").collect()
    assert firsts and all(r["ewma"] == r["value"] for r in firsts)


def test_cli_hll_mv_roundtrip(spark, tmp_path, capsys):
    mv = str(tmp_path / "mv")
    assert (
        main(
            [
                "hll-mv-build",
                "--events", f"{SF}/events.parquet",
                "--mv", mv,
                "--key-col", "user_id",
                "--bucket-ms", "3600000",
                "--group-cols", "event_type",
            ]
        )
        == 0
    )
    assert main(["hll-mv-distinct", "--mv", mv, "--group-cols", "event_type"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    exact = {
        r["event_type"]: r["d"]
        for r in catalog.load(spark, SF, "events")
        .filter("user_id is not null and ts is not null")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        e = exact[r["event_type"]]
        assert abs(r["distinct_estimate"] - e) <= max(3, 0.05 * e)


def test_cli_pca_project(spark, tmp_path, capsys):
    out = str(tmp_path / "proj")
    assert (
        main(
            [
                "pca-project",
                "--input", f"{SF}/embeddings.parquet",
                "--d", "4",
                "--whiten",
                "--output", out,
            ]
        )
        == 0
    )
    meta = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
    assert meta["rows"] == 500 and len(meta["explained_variance"]) == 4
    got = spark.read.parquet(out)
    assert "pca" in got.columns
    import numpy as np

    P = np.array([r["pca"] for r in got.collect()])
    # whitened: unit variance per axis
    assert (P * P).mean(axis=0) == pytest.approx(np.ones(4), rel=1e-6)


def test_cli_jmv_verify_exit_codes(spark, tmp_path, capsys):
    """jmv-verify: exit 0 + consistent report on a healthy MV; exit 1
    when the MV drifts from its inputs (cron-able ops contract)."""
    from activedatawarehouseprototype_spark.operators.versioned import (
        VersionedTable,
    )
    from activedatawarehouseprototype_spark.operators.warehouse import (
        incremental_join_mv,
    )

    base = str(tmp_path / "jmv")
    L = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    R = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, w double")
    incremental_join_mv(spark, base, ["k"], right_batch=R)
    incremental_join_mv(spark, base, ["k"], left_batch=L, batch_id=0)

    assert main(["jmv-verify", "--base", base, "--on", "k"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["consistent"] and rep["mv_rows"] == 2

    vt = VersionedTable(spark, f"{base}/mv")
    vt.commit(vt.read().filter("k != 1"), mode="overwrite", op="corrupt")
    assert main(["jmv-verify", "--base", base, "--on", "k"]) == 1
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["missing"] == 1 and rep["extra"] == 0


def test_cli_drift(spark, tmp_path):
    out = str(tmp_path / "drift")
    assert (
        main(
            [
                "drift",
                "--input", f"{SF}/events.parquet",
                "--value-col", "value",
                "--ref-where", "unix_millis(ts) % 2 = 0",
                "--cur-where", "unix_millis(ts) % 2 = 1",
                "--group-cols", "event_type",
                "--output", out,
            ]
        )
        == 0
    )
    rows = spark.read.parquet(out).collect()
    assert len(rows) > 0
    assert {"psi", "kl", "n_ref", "n_cur"} <= set(rows[0].asDict())


def test_cli_triangles(spark, tmp_path):
    edges = str(tmp_path / "edges")
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src bigint, dst bigint"
    ).write.parquet(edges)
    out = str(tmp_path / "tri")
    assert main(["triangles", "--edges", edges, "--output", out]) == 0
    got = {r["node"]: r["triangles"] for r in spark.read.parquet(out).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}


def test_cli_temperature_mix(spark, tmp_path):
    out = str(tmp_path / "mix")
    assert (
        main(
            [
                "temperature-mix",
                "--input", f"{SF}/documents.parquet",
                "--source-col", "lang",
                "--key-cols", "doc_id",
                "--tau", "0.5",
                "--output", out,
            ]
        )
        == 0
    )
    from activedatawarehouseprototype_spark.operators.sampling import (
        temperature_mix_sample,
    )

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    want = {
        r["doc_id"]
        for r in temperature_mix_sample(
            catalog.load(spark, SF, "documents"), "lang", ["doc_id"], tau=0.5
        ).collect()
    }
    assert got == want and len(got) > 0


def test_cli_text_index_build_and_search(spark, tmp_path):
    idx = str(tmp_path / "tix")
    out = str(tmp_path / "tix_hits")
    assert main([
        "text-index-build",
        "--docs", f"{SF}/documents.parquet",
        "--index", idx,
        "--n-buckets", "8",
    ]) == 0
    assert main([
        "text-index-search",
        "--index", idx,
        "--query", "hash join",
        "--k", "5",
        "--output", out,
    ]) == 0
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5 and all(r["query_id"] == 1 for r in rows)
    from activedatawarehouseprototype_spark.operators.retrieval import bm25_topk

    want = bm25_topk(
        spark.read.parquet(f"{SF}/documents.parquet"), [(1, "hash join")], k=5
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))


def test_cli_cusum(spark, tmp_path):
    src = str(tmp_path / "ev")
    out = str(tmp_path / "walk")
    spark.createDataFrame(
        [("k", "2024-01-01 00:00:00", 1, 15), ("k", "2024-01-01 00:00:01", 2, 15)],
        "key string, ts_s string, eid long, v long",
    ).selectExpr("key", "CAST(ts_s AS TIMESTAMP) AS ts", "eid", "v").write.parquet(src)
    assert main([
        "cusum",
        "--input", src,
        "--key-col", "key",
        "--value-col", "v",
        "--target", "10",
        "--tie-col", "eid",
        "--output", out,
    ]) == 0
    rows = sorted((r["seq"], r["s_pos"]) for r in spark.read.parquet(out).collect())
    assert rows == [(0, 5.0), (1, 10.0)]


def test_cli_balanced_sample(spark, tmp_path):
    src = str(tmp_path / "docs")
    out = str(tmp_path / "bal")
    spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", 100 + i) for i in range(3)],
        "cls string, id long",
    ).write.parquet(src)
    assert main([
        "balanced-sample",
        "--input", src,
        "--class-cols", "cls",
        "--key-cols", "id",
        "--output", out,
    ]) == 0
    from collections import Counter

    counts = Counter(r["cls"] for r in spark.read.parquet(out).collect())
    assert counts == {"a": 3, "b": 3}


def test_cli_frequent_pairs(spark, tmp_path):
    src = str(tmp_path / "bk")
    out = str(tmp_path / "pairs")
    spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (2, "z")],
        "b int, i string",
    ).write.parquet(src)
    assert main([
        "frequent-pairs",
        "--input", src,
        "--basket-col", "b",
        "--item-col", "i",
        "--min-support", "2",
        "--output", out,
    ]) == 0
    rows = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert rows == [("x", "y", 2)]


def test_cli_compact_small(spark, tmp_path, capsys):
    path = str(tmp_path / "t")
    spark.range(0, 1000).repartition(8).write.parquet(path)
    assert main(["compact-small", "--path", path]) == 0
    import os as _os

    n = len([f for f in _os.listdir(path) if f.endswith(".parquet")])
    assert n < 8
    assert spark.read.parquet(path).count() == 1000


# --- round-9 verbs --------------------------------------------------------


def test_cli_kmeans(spark, tmp_path):
    out = str(tmp_path / "km")
    assert (
        main(
            [
                "kmeans",
                "--input", f"{SF}/embeddings.parquet",
                "--k", "4",
                "--iters", "2",
                "--output", out,
            ]
        )
        == 0
    )
    rows = spark.read.parquet(out)
    assert rows.filter(F.col("cluster_id").isNull()).count() == 0
    from activedatawarehouseprototype_spark.operators.clustering import (
        kmeans_lattice,
    )

    want, _ = kmeans_lattice(
        catalog.load(spark, SF, "embeddings"), k=4, iters=2
    )
    got = {(r["vec_id"], r["cluster_id"]) for r in rows.collect()}
    assert got == {
        (r["vec_id"], r["cluster_id"]) for r in want.collect()
    }


def test_cli_fuzzy_match_pairs_and_survivors(spark, tmp_path):
    pairs_out = str(tmp_path / "pairs")
    assert (
        main(
            [
                "fuzzy-match",
                "--input", f"{SF}/part.parquet",
                "--block-col", "p_brand",
                "--id-col", "p_partkey",
                "--text-col", "p_name",
                "--max-dist", "3",
                "--output", pairs_out,
            ]
        )
        == 0
    )
    pairs = spark.read.parquet(pairs_out)
    assert pairs.filter("dist > 3").count() == 0

    surv_out = str(tmp_path / "surv")
    assert (
        main(
            [
                "fuzzy-match",
                "--input", f"{SF}/part.parquet",
                "--block-col", "p_brand",
                "--id-col", "p_partkey",
                "--text-col", "p_name",
                "--max-dist", "3",
                "--keep-survivors",
                "--output", surv_out,
            ]
        )
        == 0
    )
    surv = spark.read.parquet(surv_out)
    dropped = {r["b_p_partkey"] for r in pairs.collect()}
    kept = {r["p_partkey"] for r in surv.collect()}
    assert kept.isdisjoint(dropped)
    total = catalog.load(spark, SF, "part").count()
    assert len(kept) == total - len(dropped)


def test_cli_outliers_and_ols_trend(spark, tmp_path):
    out1 = str(tmp_path / "mad")
    assert (
        main(
            [
                "outliers",
                "--input", f"{SF}/events.parquet",
                "--group-cols", "event_type",
                "--value-col", "value",
                "--output", out1,
            ]
        )
        == 0
    )
    mad = spark.read.parquet(out1)
    assert {c for c in mad.columns} >= {
        "event_type", "n", "median_value", "mad_value", "n_outliers"
    }
    assert mad.count() > 0

    out2 = str(tmp_path / "ols")
    assert (
        main(
            [
                "ols-trend",
                "--input", f"{SF}/events.parquet",
                "--group-cols", "user_id",
                "--x-col", "user_id",
                "--y-col", "user_id",
                "--output", out2,
            ]
        )
        == 0
    )
    ols = spark.read.parquet(out2)
    # x rebased within each single-valued group -> zero variance,
    # NULL slope, exact components present
    assert ols.filter("slope_den != 0").count() == 0
    assert ols.count() > 0


def test_cli_collocations(spark, tmp_path):
    out = str(tmp_path / "pmi")
    assert (
        main(
            [
                "collocations",
                "--input", f"{SF}/documents.parquet",
                "--min-count", "2",
                "--k", "10",
                "--output", out,
            ]
        )
        == 0
    )
    rows = spark.read.parquet(out)
    assert rows.count() <= 10
    assert rows.filter("c_xy < 2").count() == 0


def test_cli_purge(spark, tmp_path):
    path = str(tmp_path / "purge_t")
    spark.range(100).selectExpr("id as k", "id % 3 as v").write.parquet(path)
    assert (
        main(
            [
                "purge",
                "--path", path,
                "--key-col", "k",
                "--keys", "7,8,9",
            ]
        )
        == 0
    )
    left = spark.read.parquet(path)
    assert left.count() == 97
    assert left.filter("k in (7,8,9)").count() == 0


def test_cli_index_build_lattice_roundtrip(spark, tmp_path):
    idx = str(tmp_path / "latidx")
    out = str(tmp_path / "lathits")
    assert (
        main(
            [
                "index-build",
                "--input", f"{SF}/embeddings.parquet",
                "--index", idx,
                "--k", "4",
                "--iters", "2",
                "--lattice",
            ]
        )
        == 0
    )
    cents = spark.read.parquet(f"{idx}/centroids")
    assert cents.count() == 4
    assert (
        main(
            [
                "index-search",
                "--index", idx,
                "--queries", f"{SF}/embeddings.parquet",
                "--output", out,
                "--k", "3",
                "--probes", "2",
            ]
        )
        == 0
    )
    hits = spark.read.parquet(out)
    assert hits.count() > 0
    # reproducibility: a second lattice build yields identical centroids
    idx2 = str(tmp_path / "latidx2")
    assert (
        main(
            [
                "index-build",
                "--input", f"{SF}/embeddings.parquet",
                "--index", idx2,
                "--k", "4",
                "--iters", "2",
                "--lattice",
            ]
        )
        == 0
    )
    a = sorted(map(tuple, spark.read.parquet(f"{idx}/centroids").collect()))
    b = sorted(map(tuple, spark.read.parquet(f"{idx2}/centroids").collect()))
    assert a == b


def test_cli_quantile_mv_roundtrip(spark, tmp_path, capsys):
    mv = str(tmp_path / "qmv")
    assert (
        main(
            [
                "quantile-mv-build",
                "--events", f"{SF}/events.parquet",
                "--mv", mv,
                "--value-col", "value",
                "--bins", "32",
            ]
        )
        == 0
    )
    assert spark.read.parquet(mv).count() > 0
    assert (
        main(["quantile-mv-query", "--mv", mv, "--q", "0.5"]) == 0
    )
    out = [
        line
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ][-1]
    res = json.loads(out)
    assert res["n"] > 0 and res["value"] is not None
    assert res["rank_error_bound"] == res["n"] / 32


def test_cli_split_safe(spark, tmp_path):
    out = str(tmp_path / "splits")
    assert (
        main(
            [
                "split-safe",
                "--input", f"{SF}/documents.parquet",
                "--output", out,
            ]
        )
        == 0
    )
    rows = spark.read.parquet(out)
    assert {"cluster", "split"} <= set(rows.columns)
    # the leakage invariant: one split per cluster
    multi = (
        rows.groupBy("cluster")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert multi == 0


def test_cli_transitions(spark, tmp_path):
    out = str(tmp_path / "tm")
    assert (
        main(
            [
                "transitions",
                "--events", f"{SF}/events.parquet",
                "--output", out,
            ]
        )
        == 0
    )
    rows = spark.read.parquet(out)
    from activedatawarehouseprototype_spark.operators.timeseries import (
        transition_counts,
    )

    want = {
        (r["src"], r["dst"], r["n"])
        for r in transition_counts(
            catalog.load(spark, SF, "events"),
            "user_id", "ts", "event_type", "event_id",
        ).collect()
    }
    assert {(r["src"], r["dst"], r["n"]) for r in rows.collect()} == want


def test_cli_ab_test(spark, tmp_path):
    units = str(tmp_path / "units")
    spark.createDataFrame(
        [("m", "A", 1)] * 6 + [("m", "A", 0)] * 4
        + [("m", "B", 1)] * 3 + [("m", "B", 0)] * 7,
        "g string, arm string, converted int",
    ).write.parquet(units)
    out = str(tmp_path / "zt")
    assert (
        main(
            ["ab-test", "--units", units, "--group-cols", "g",
             "--output", out]
        )
        == 0
    )
    r = spark.read.parquet(out).collect()[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (10, 10, 6, 3)
    assert r["z"] is not None


def test_cli_classify(spark, tmp_path):
    out = str(tmp_path / "scored")
    assert (
        main(
            [
                "classify",
                "--input", f"{SF}/documents.parquet",
                "--output", out,
            ]
        )
        == 0
    )
    rows = spark.read.parquet(out)
    from activedatawarehouseprototype_spark.operators.text import (
        hashed_linear_score,
    )

    want = {
        (r["doc_id"], r["score_milli"], r["keep"])
        for r in hashed_linear_score(
            catalog.load(spark, SF, "documents").filter(
                F.col("text").isNotNull()
            )
        ).collect()
    }
    got = {
        (r["doc_id"], r["score_milli"], r["keep"])
        for r in rows.filter(F.col("text").isNotNull()).collect()
    }
    assert got == want


def test_cli_cuped(spark, tmp_path):
    units = str(tmp_path / "cu_units")
    spark.createDataFrame(
        [("A", 3, 1), ("A", 5, 2), ("B", 2, 2), ("B", 6, 1)],
        "arm string, x_pre int, y int",
    ).write.parquet(units)
    out = str(tmp_path / "cu_out")
    assert main(["cuped", "--units", units, "--output", out]) == 0
    rows = {r["arm"]: r for r in spark.read.parquet(out).collect()}
    assert rows["A"]["n"] == 2 and rows["B"]["n"] == 2
    # pooled theta components: n*Sxy - Sx*Sy / n*Sxx - Sx^2 over all 4 rows
    xs, ys = [3, 5, 2, 6], [1, 2, 2, 1]
    num = 4 * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = 4 * sum(x * x for x in xs) - sum(xs) ** 2
    assert rows["A"]["theta_num"] == num and rows["A"]["theta_den"] == den


def test_cli_kcore(spark, tmp_path):
    edges = str(tmp_path / "kc_edges")
    spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    ).write.parquet(edges)
    out = str(tmp_path / "kc_out")
    assert main(["kcore", "--edges", edges, "--k", "2", "--output", out]) == 0
    got = {r["node"]: r["degree"] for r in spark.read.parquet(out).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


# --- round-10 verbs: train-probe, substr-spans, ivf-rebuild -----------------


def test_cli_train_probe(spark, tmp_path):
    feats = str(tmp_path / "tp_in")
    spark.createDataFrame(
        [(i, (i * 3) % 5, 1 if i >= 6 else -1) for i in range(12)],
        "x1 long, x2 long, y long",
    ).write.parquet(feats)
    out = str(tmp_path / "tp_w")
    scored = str(tmp_path / "tp_scored")
    assert (
        main(
            [
                "train-probe",
                "--input", feats,
                "--x1-col", "x1",
                "--x2-col", "x2",
                "--y-col", "y",
                "--lam", "1",
                "--output", out,
                "--scored-output", scored,
            ]
        )
        == 0
    )
    from activedatawarehouseprototype_spark.operators.regression import (
        ridge_probe_train,
    )

    w = ridge_probe_train(
        spark.read.parquet(feats), "x1", "x2", "y", lam=1
    )
    row = spark.read.parquet(out).head()
    assert (row["w0_milli"], row["w1_milli"], row["w2_milli"]) == w
    assert row["n"] == 12
    got = spark.read.parquet(scored).collect()
    assert all(r["keep"] == (r["score_milli"] >= 0) for r in got)
    acc = sum((r["score_milli"] >= 0) == (r["y"] == 1) for r in got) / 12
    assert acc >= 0.9


def test_cli_substr_spans(spark, tmp_path):
    docs = str(tmp_path / "ss_in")
    spark.createDataFrame(
        [
            (1, "a b c q w e r t y u i zz"),
            (2, "q w e r t y u i k l m n"),
        ],
        "doc_id long, text string",
    ).write.parquet(docs)
    out = str(tmp_path / "ss_out")
    assert (
        main(
            [
                "substr-spans",
                "--input", docs,
                "--ngram-words", "4",
                "--hash-grams",
                "--output", out,
            ]
        )
        == 0
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_words"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 3, 11, 8), (2, 0, 8, 8)}


def test_cli_substr_spans_cut_output(spark, tmp_path):
    docs = str(tmp_path / "sc_in")
    spark.createDataFrame(
        [
            (1, "a b c q w e r t y u i zz"),
            (2, "q w e r t y u i k l m n"),
        ],
        "doc_id long, text string",
    ).write.parquet(docs)
    out, cut = str(tmp_path / "sc_spans"), str(tmp_path / "sc_clean")
    assert (
        main(
            [
                "substr-spans",
                "--input", docs,
                "--ngram-words", "4",
                "--output", out,
                "--cut-output", cut,
            ]
        )
        == 0
    )
    clean = {r["doc_id"]: r["clean_text"]
             for r in spark.read.parquet(cut).collect()}
    assert clean == {1: "a b c zz", 2: "k l m n"}


@pytest.mark.slow
def test_cli_ivf_rebuild(spark, tmp_path, capsys):
    from activedatawarehouseprototype_spark.operators import similarity as S

    vecs = spark.createDataFrame(
        [
            (i, [float((i * (d + 3)) % 7) / 7.0 for d in range(8)])
            for i in range(40)
        ],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "idx")
    S.ivf_index_build(vecs.filter(F.col("vec_id") < 25), idx, k=3,
                      use_kmeans=False)
    S.ivf_index_append(spark, idx, vecs.filter(F.col("vec_id") >= 25))
    assert main(["ivf-rebuild", "--index", idx, "--iters", "1"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rebuilt"] is True and info["n_rows"] == 40
    # meta advanced: an immediate second run reports the no-op
    assert main(["ivf-rebuild", "--index", idx]) == 0
    info2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info2 == {"rebuilt": False, "n_rows": 40, "n_at_build": 40, "k": 3}
