"""Distributed PCA over an embedding column — the classic one-pass
covariance recipe that scales to a 100 TB corpus because the data-plane
never shuffles vectors:

1. **Partial pass** (`gram_partials`): one ``mapInPandas`` sweep emits,
   per Arrow batch, a 1-row partial ``(n, Σx, Σ x xᵀ flattened)`` —
   O(#partitions) rows of dim + dim² doubles each, regardless of corpus
   size.
2. **Merge** (`fit_pca`): the partials element-wise-sum through one
   tiny shuffle (posexplode → groupBy(pos), ≤ #partitions · dim² scalar
   rows) and the (dim + dim²)-value total is collected — a
   control-plane-bounded transfer (dim=64 → 33 KB). The driver forms
   C = G/n − μμᵀ and runs ``numpy.linalg.eigh`` on the dim×dim matrix
   (milliseconds; dim is model-, not data-, sized).
3. **Project** (`pca_project`): the (d × dim) component matrix
   broadcasts by closure into a second Arrow pass — a shuffle-free
   matmul ``(X − μ) @ Wᵀ`` per batch.

Eigenvector sign is canonicalized (largest-|coefficient| entry made
positive) so fits are reproducible run-to-run and engine-to-engine.

The covariance entries themselves are SQL-checkable — the DuckDB twin
recomputes Σ x_i x_j / n − μ_i μ_j directly (tests/test_pca.py
ORACLE_SQL, queued for round-7 driver registration as
``embedding_covariance_entries``); the eigendecomposition is gated by
algebraic property tests (orthonormality, variance ordering, numpy
subspace agreement) since eigenvectors are not SQL-expressible.

The reference engine has no linear-algebra tier; this is
training-data-pipeline surface (embedding whitening / dimensionality
reduction ahead of ANN and SemDeDup) the task brief mandates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.similarity import as_double_array


@dataclass(frozen=True)
class PCAModel:
    """Control-plane PCA fit: KB-scale, broadcast by closure."""

    mean: "list[float]"  # (dim,)
    components: "list[list[float]]"  # (d, dim) rows = eigenvectors
    explained_variance: "list[float]"  # (d,) eigenvalues, descending
    n: int


def gram_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-Arrow-batch ``(n, s, g)`` partials of the Gram accumulation:
    ``n`` rows, ``s = Σx`` (dim), ``g = Σ x xᵀ`` row-major (dim²). One
    scan, no shuffle; output has O(#partitions) rows."""
    import numpy as np
    import pandas

    src = df.select(as_double_array(F.col(vec_col)).alias("_v"))

    def it(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["_v"].to_numpy()).astype("float64")
            if X.ndim != 2:
                raise ValueError("gram_partials: ragged vector lengths")
            yield pandas.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0)],
                    "g": [(X.T @ X).ravel()],
                }
            )

    return src.mapInPandas(it, "n bigint, s array<double>, g array<double>")


def _merged_moments(df: DataFrame, vec_col: str):
    """(n, mean, second-moment matrix) from one partial pass + one tiny
    positional-sum shuffle; the collect is dim + dim² doubles."""
    import numpy as np

    p = gram_partials(df, vec_col=vec_col).localCheckpoint()
    n = p.agg(F.sum("n")).head()[0]
    if not n:
        raise ValueError("fit_pca: empty input")
    sums = (
        p.select(F.posexplode(F.concat(F.col("s"), F.col("g"))))
        .groupBy("pos")
        .agg(F.sum("col").alias("v"))
        .collect()
    )
    vals = {r["pos"]: r["v"] for r in sums}
    total = len(vals)
    # total = dim + dim²  =>  dim = (-1 + sqrt(1+4*total)) / 2
    dim = int(round((-1 + (1 + 4 * total) ** 0.5) / 2))
    if dim + dim * dim != total:
        raise ValueError(f"fit_pca: inconsistent moment length {total}")
    flat = np.array([vals[i] for i in range(total)], dtype="float64")
    mu = flat[:dim] / n
    M2 = flat[dim:].reshape(dim, dim) / n
    return int(n), mu, M2


def fit_pca(df: DataFrame, d: int = 8, vec_col: str = "embedding") -> PCAModel:
    """Fit a ``d``-component PCA of ``vec_col``. Covariance uses the
    population convention C = E[xxᵀ] − μμᵀ (divide by n), matching the
    SQL twin. ``d`` is clamped to dim."""
    import numpy as np

    n, mu, M2 = _merged_moments(df, vec_col)
    C = M2 - np.outer(mu, mu)
    C = (C + C.T) / 2.0  # symmetrize away last-ulp asymmetry
    w, V = np.linalg.eigh(C)  # ascending
    order = np.argsort(w)[::-1][: max(1, min(d, len(w)))]
    comps = V[:, order].T  # (d, dim)
    # sign canon: the largest-|coefficient| entry of each component > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=[float(x) for x in mu],
        components=[[float(x) for x in row] for row in comps],
        explained_variance=[float(w[i]) for i in order],
        n=n,
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Append ``out_col = (x − μ) @ Wᵀ`` — a shuffle-free Arrow matmul
    pass (the model broadcasts by closure, KB-scale). ``whiten`` also
    divides each coordinate by sqrt(eigenvalue) (guarded at 1e-12 so a
    zero-variance direction maps to 0, not inf)."""
    import numpy as np
    import pandas

    mu = np.asarray(model.mean, dtype="float64")
    W = np.asarray(model.components, dtype="float64")
    scale = None
    if whiten:
        ev = np.asarray(model.explained_variance, dtype="float64")
        scale = 1.0 / np.sqrt(np.maximum(ev, 1e-12))
        scale[ev <= 1e-12] = 0.0

    cols = df.columns
    if out_col in cols:
        raise ValueError(f"pca_project: column {out_col!r} already exists")
    # the internal staging column must not collide either: withColumn
    # would silently REPLACE a user column of the same name and the
    # worker would then drop it, so the declared output schema (which
    # still lists the original field) no longer matches the yielded
    # frames. Derive a name the input provably doesn't have.
    tmp = "_v"
    while tmp in cols:
        tmp += "_"
    fields = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols)
    schema = f"{fields}, {out_col} array<double>"

    def it(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[tmp].to_numpy()).astype("float64")
            P = (X - mu) @ W.T
            if scale is not None:
                P = P * scale
            out = pdf.drop(columns=[tmp])
            out[out_col] = list(P)
            yield out

    src = df.withColumn(tmp, as_double_array(F.col(vec_col)))
    return src.mapInPandas(it, schema)
