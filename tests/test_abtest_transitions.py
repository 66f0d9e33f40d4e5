"""Unit tests for the round-9 second-wave operators: leakage-safe
cluster splits (sampling.cluster_safe_split), the Markov transition
matrix (timeseries.transition_counts), and the two-proportion z-test
(abtest.two_proportion_ztest). Each is pinned against a hand-computed
pure-Python reference — independent of both Spark and the DuckDB
oracle twins in corpus/extensions5.py."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.abtest import (
    Z_CRIT_95,
    two_proportion_ztest,
)
from activedatawarehouseprototype_spark.operators.sampling import (
    cluster_safe_split,
)
from activedatawarehouseprototype_spark.operators.timeseries import (
    transition_counts,
)


# --- cluster_safe_split ---------------------------------------------------


def _coin(cluster: int, salt: str = "s1") -> float:
    h = hashlib.md5(f"{salt}:{cluster}".encode()).hexdigest()[:8]
    return int(h, 16) / 2**32


def _expected_split(cluster: int) -> str:
    f = _coin(cluster)
    return "train" if f < 0.8 else ("val" if f < 0.9 else "test")


def test_cluster_safe_split_no_leakage_and_singletons(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(1, 11)]
    )
    # components: {1,2,3} (chain), {4,5}; 6-10 singletons
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=4, id_b=5)]
    )
    out = cluster_safe_split(docs, "doc_id", pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 10
    # transitive closure: the whole chain shares cluster = min id
    assert [by_id[i]["cluster"] for i in (1, 2, 3)] == [1, 1, 1]
    assert [by_id[i]["cluster"] for i in (4, 5)] == [4, 4]
    for i in range(6, 11):
        assert by_id[i]["cluster"] == i  # singleton = own id
    # the leakage property: split is a pure function of cluster
    for r in out:
        assert r["split"] == _expected_split(r["cluster"])
    splits_per_cluster = {}
    for r in out:
        splits_per_cluster.setdefault(r["cluster"], set()).add(r["split"])
    assert all(len(s) == 1 for s in splits_per_cluster.values())


def test_cluster_safe_split_string_ids(spark):
    """Round-10 advice regression: non-numeric ids must keep their own
    id as the singleton cluster (the old bigint cast collapsed every
    unpaired string id into one NULL cluster sharing one split coin)."""
    docs = spark.createDataFrame(
        [Row(doc_id=f"d{i}", text=f"doc {i}") for i in range(1, 7)]
    )
    pairs = spark.createDataFrame([Row(id_a="d1", id_b="d2")])
    out = cluster_safe_split(docs, "doc_id", pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["d1"]["cluster"] == by_id["d2"]["cluster"] == "d1"
    singles = {by_id[f"d{i}"]["cluster"] for i in range(3, 7)}
    assert singles == {f"d{i}" for i in range(3, 7)}  # own id, not NULL
    assert all(r["cluster"] is not None for r in out)


def test_cluster_safe_split_weights_respected(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="t") for i in range(200)]
    )
    pairs = spark.createDataFrame([Row(id_a=0, id_b=1)])
    out = cluster_safe_split(
        docs, "doc_id", pairs, weights={"train": 0.5, "test": 0.5}, salt="w9"
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    # 199 clusters, fair coin: both sides populated, no exact split asserted
    assert counts["train"] + counts["test"] == 200
    assert min(counts.values()) > 50


# --- transition_counts ----------------------------------------------------


def test_transition_counts_hand_sequence(spark):
    rows = [
        # user 1: a -> b -> a   (order by ts, tie by eid)
        Row(uid=1, ts=1, eid=1, state="a"),
        Row(uid=1, ts=2, eid=2, state="b"),
        Row(uid=1, ts=3, eid=3, state="a"),
        # user 2: a -> a        (same ts: eid breaks the tie)
        Row(uid=2, ts=5, eid=5, state="a"),
        Row(uid=2, ts=5, eid=4, state="a"),
        # user 3: single event -> no transition
        Row(uid=3, ts=9, eid=9, state="b"),
    ]
    out = {
        (r["src"], r["dst"]): (r["n"], r["p"])
        for r in transition_counts(
            spark.createDataFrame(rows), "uid", "ts", "state", "eid"
        ).collect()
    }
    # src=a transitions: a->b (1), a->a (1)  => p = 0.5 each
    assert out[("a", "b")] == (1, 0.5)
    assert out[("a", "a")] == (1, 0.5)
    # src=b: b->a only
    assert out[("b", "a")] == (1, 1.0)
    assert len(out) == 3


def test_transition_counts_probabilities_sum_to_one(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    t = transition_counts(ev, "user_id", "ts", "event_type", "event_id")
    sums = t.groupBy("src").agg(F.sum("p").alias("s")).collect()
    assert sums and all(abs(r["s"] - 1.0) < 1e-9 for r in sums)


# --- two_proportion_ztest -------------------------------------------------


def _ref_z(conv_a, n_a, conv_b, n_b):
    p_a, p_b = conv_a / n_a, conv_b / n_b
    pooled = (conv_a + conv_b) / (n_a + n_b)
    var = pooled * (1.0 - pooled) * (1.0 / n_a + 1.0 / n_b)
    return round((p_a - p_b) / math.sqrt(var), 6)


def test_ztest_matches_pure_python(spark):
    # arm A: 30/100 convert; arm B: 45/120
    rows = (
        [Row(g="m", arm="A", converted=1)] * 30
        + [Row(g="m", arm="A", converted=0)] * 70
        + [Row(g="m", arm="B", converted=1)] * 45
        + [Row(g="m", arm="B", converted=0)] * 75
    )
    r = two_proportion_ztest(spark.createDataFrame(rows), ["g"]).collect()[0]
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (100, 120, 30, 45)
    assert r["z"] == _ref_z(30, 100, 45, 120)
    assert r["significant"] == (abs(r["z"]) > Z_CRIT_95)


def test_ztest_degenerate_groups_yield_null(spark):
    rows = (
        # everyone converts -> pooled variance 0
        [Row(g="all1", arm="A", converted=1)] * 5
        + [Row(g="all1", arm="B", converted=1)] * 5
        # one arm empty
        + [Row(g="noB", arm="A", converted=1), Row(g="noB", arm="A", converted=0)]
    )
    out = {r["g"]: r for r in
           two_proportion_ztest(spark.createDataFrame(rows), ["g"]).collect()}
    assert out["all1"]["z"] is None and out["all1"]["significant"] is None
    assert out["noB"]["z"] is None and out["noB"]["significant"] is None


# --- hashed_linear_score ----------------------------------------------------


def _ref_weight(g: str, n_buckets: int = 4096, salt: str = "clf1") -> int:
    bucket = int(hashlib.md5(f"{salt}:{g}".encode()).hexdigest()[:8], 16) % n_buckets
    return int(hashlib.md5(f"w:{bucket}".encode()).hexdigest()[:8], 16) % 2001 - 1000


def _ref_score(text: str) -> tuple[int, int]:
    toks = text.split(" ")
    grams = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    return len(grams), sum(_ref_weight(g) for g in grams)


def test_hashed_linear_score_matches_pure_python(spark):
    from activedatawarehouseprototype_spark.operators.text import (
        hashed_linear_score,
    )

    rows = [
        Row(doc_id=1, text="the quick brown fox"),
        Row(doc_id=2, text="single"),          # no bigrams
        Row(doc_id=3, text="a a a"),            # repeated gram -> weight x2
    ]
    out = {r["doc_id"]: r for r in
           hashed_linear_score(spark.createDataFrame(rows)).collect()}
    for r in rows:
        n, s = _ref_score(r.text)
        assert out[r.doc_id]["n_grams"] == n
        assert out[r.doc_id]["score_milli"] == s
        assert out[r.doc_id]["keep"] == (s >= 0)
    # single-token doc: exactly 1 gram (its unigram), no phantom bigram
    assert out[2]["n_grams"] == 1


def test_hashed_linear_score_collision_semantics(spark):
    """Two DIFFERENT grams in the same bucket share one weight — the
    hashing-trick contract (n_buckets=1 forces the collision)."""
    from activedatawarehouseprototype_spark.operators.text import (
        hashed_linear_score,
    )

    rows = [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="omega")]
    out = hashed_linear_score(
        spark.createDataFrame(rows), n_buckets=1, bigrams=False
    ).collect()
    scores = {r["doc_id"]: r["score_milli"] for r in out}
    assert scores[1] == scores[2]  # same (only) bucket, same weight


# --- cuped_components -------------------------------------------------------


def test_cuped_components_matches_pure_python(spark):
    from activedatawarehouseprototype_spark.operators.abtest import (
        cuped_components,
    )

    data = [
        ("A", 3, 1), ("A", 5, 2), ("A", 0, 0), ("A", 7, 3),
        ("B", 2, 2), ("B", 6, 1), ("B", 4, 4),
    ]
    rows = spark.createDataFrame(data, "arm string, x_pre int, y int")
    out = {r["arm"]: r for r in cuped_components(rows).collect()}

    xs = [x for _, x, _ in data]
    ys = [y for _, _, y in data]
    n = len(data)
    theta_num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    theta_den = n * sum(x * x for x in xs) - sum(xs) ** 2
    for arm in ("A", "B"):
        sub = [(x, y) for a, x, y in data if a == arm]
        assert out[arm]["n"] == len(sub)
        assert out[arm]["sum_x"] == sum(x for x, _ in sub)
        assert out[arm]["sum_y"] == sum(y for _, y in sub)
        # pooled theta components repeated on every arm row
        assert out[arm]["theta_num"] == theta_num
        assert out[arm]["theta_den"] == theta_den
    # sanity: consumer-side theta reproduces cov/var (floats allowed here)
    import statistics

    theta = theta_num / theta_den
    cov = sum(
        (x - statistics.mean(xs)) * (y - statistics.mean(ys))
        for x, y in zip(xs, ys)
    )
    var = sum((x - statistics.mean(xs)) ** 2 for x in xs)
    assert abs(theta - cov / var) < 1e-12
