"""Distributed PCA: the one-pass covariance must match both numpy and
a DuckDB SQL twin (ORACLE_SQL below — queued for round-7 driver
registration as ``embedding_covariance_entries``); the
eigendecomposition is gated algebraically (orthonormal components,
descending variance, numpy-subspace agreement, reconstruction-error
monotonicity); the projection pass must stay shuffle-free."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from activedatawarehouseprototype_spark import catalog
from activedatawarehouseprototype_spark.operators.pca import (
    fit_pca,
    gram_partials,
    pca_project,
)
from activedatawarehouseprototype_spark.plans.explain import exchange_count

SF = "/root/testdata/sf0.001"

# Covariance entries for a fixed diagonal-ish probe set, population
# convention (/n), rounded at 6 (order-dependent sums — registry float
# discipline). Dimensions are 1-based in DuckDB lists.
ORACLE_SQL = """
WITH e AS (
  SELECT CAST(embedding AS DOUBLE[]) AS v
  FROM read_parquet('{sf}/embeddings.parquet')
),
pairs(i, j) AS (VALUES (1, 1), (2, 2), (17, 17), (64, 64),
                       (1, 2), (3, 7), (10, 40), (32, 64)),
m AS (
  SELECT p.i, p.j,
         AVG(v[p.i] * v[p.j]) AS exy,
         AVG(v[p.i]) AS ex, AVG(v[p.j]) AS ey
  FROM e, pairs p GROUP BY p.i, p.j
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       ROUND(exy - ex * ey, 6) AS cov
FROM m ORDER BY i, j
"""


def _emb(spark):
    return catalog.load(spark, SF, "embeddings")


def _np_matrix(spark):
    rows = _emb(spark).select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([[float(x) for x in r["embedding"]] for r in rows])


def test_covariance_matches_numpy(spark):
    X = _np_matrix(spark)
    model = fit_pca(_emb(spark), d=4)
    mu = np.asarray(model.mean)
    assert model.n == len(X)
    assert mu == pytest.approx(X.mean(axis=0), abs=1e-9)
    # full covariance via the same partial path numpy-checks through
    # the top eigenvalue: eigh of numpy covariance vs explained_variance
    C = (X.T @ X) / len(X) - np.outer(X.mean(0), X.mean(0))
    w = np.linalg.eigvalsh((C + C.T) / 2)[::-1]
    assert model.explained_variance == pytest.approx(w[:4].tolist(), rel=1e-8)


def test_covariance_entries_match_duckdb_oracle(spark):
    """The exact cells the round-7 corpus entry will gate: Spark's
    merged moments vs DuckDB recomputing cov(i,j) from scratch."""
    from activedatawarehouseprototype_spark.operators.pca import _merged_moments

    n, mu, M2 = _merged_moments(_emb(spark), "embedding")
    want = duckdb.sql(ORACLE_SQL.format(sf=SF)).fetchall()
    assert len(want) == 8
    for i, j, cov in want:
        got = M2[i - 1, j - 1] - mu[i - 1] * mu[j - 1]
        assert round(got, 6) == pytest.approx(cov, abs=2e-6), (i, j)


def test_components_orthonormal_and_variance_descending(spark):
    model = fit_pca(_emb(spark), d=6)
    W = np.asarray(model.components)
    assert W.shape == (6, 64)
    assert W @ W.T == pytest.approx(np.eye(6), abs=1e-8)
    ev = model.explained_variance
    assert all(a >= b - 1e-12 for a, b in zip(ev, ev[1:]))
    assert ev[-1] >= -1e-9  # covariance PSD: no negative variance
    # sign canon: the max-|coeff| entry of each row is positive
    for row in W:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_subspace_agrees_with_numpy(spark):
    """Each Spark component must match the numpy eigenvector up to
    sign; with the sign canon applied the dot product is ~1."""
    X = _np_matrix(spark)
    model = fit_pca(_emb(spark), d=4)
    C = (X.T @ X) / len(X) - np.outer(X.mean(0), X.mean(0))
    w, V = np.linalg.eigh((C + C.T) / 2)
    order = np.argsort(w)[::-1][:4]
    for k, col in enumerate(order):
        v = V[:, col]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        assert abs(float(np.dot(v, model.components[k]))) == pytest.approx(
            1.0, abs=1e-6
        )


def test_projection_centers_and_whitening(spark):
    emb = _emb(spark)
    model = fit_pca(emb, d=5)
    out = pca_project(emb, model, out_col="p").select("vec_id", "p").collect()
    P = np.array([r["p"] for r in sorted(out, key=lambda r: r["vec_id"])])
    assert P.shape == (len(out), 5)
    # projected data is centered, per-axis variance == eigenvalue
    assert P.mean(axis=0) == pytest.approx(np.zeros(5), abs=1e-8)
    assert (P * P).mean(axis=0) == pytest.approx(
        model.explained_variance, rel=1e-6
    )
    white = pca_project(emb, model, out_col="p", whiten=True).select("p").collect()
    Pw = np.array([r["p"] for r in white])
    assert (Pw * Pw).mean(axis=0) == pytest.approx(np.ones(5), rel=1e-6)


def test_reconstruction_error_monotone_in_d(spark):
    X = _np_matrix(spark)
    errs = []
    for d in (2, 8, 32):
        m = fit_pca(_emb(spark), d=d)
        W = np.asarray(m.components)
        mu = np.asarray(m.mean)
        R = (X - mu) - (X - mu) @ W.T @ W
        errs.append(float((R * R).sum()))
    assert errs[0] > errs[1] > errs[2] >= 0


def test_schema_preserved_and_column_appended(spark):
    emb = _emb(spark)
    model = fit_pca(emb, d=3)
    out = pca_project(emb, model)
    assert out.columns == emb.columns + ["pca"]
    row = out.limit(1).collect()[0]
    assert len(row["pca"]) == 3


def test_partials_pass_is_shuffle_free(spark):
    p = gram_partials(_emb(spark))
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # merged totals move ≤ #partitions rows of dim+dim² doubles
    assert p.count() <= _emb(spark).rdd.getNumPartitions()


def test_projection_is_shuffle_free(spark):
    emb = _emb(spark)
    model = fit_pca(emb, d=2)
    assert exchange_count(pca_project(emb, model)) == 0


def test_out_col_collision_raises(spark):
    emb = _emb(spark)
    model = fit_pca(emb, d=2)
    with pytest.raises(ValueError, match="already exists"):
        pca_project(emb, model, out_col="embedding")


def test_empty_input_raises(spark):
    emb = _emb(spark).filter("vec_id < 0")
    with pytest.raises(ValueError):
        fit_pca(emb, d=2)


def test_internal_temp_col_does_not_collide(spark):
    """A user column literally named '_v' must survive projection —
    the staging column derives a non-colliding name."""
    df = spark.createDataFrame(
        [([1.0, 0.0], "keepme")], "embedding array<double>, _v string"
    )
    m = fit_pca(df, d=1)
    out = pca_project(df, m).collect()[0]
    assert out["_v"] == "keepme"
    assert len(out["pca"]) == 1
