"""Product quantization (PQ) for embedding compression + ANN search.

The missing tier between ``quantize_int8`` (4x smaller, exact-ish
scores) and IVF cell restriction (fewer candidates, full vectors):
PQ stores each vector as ``m`` one-byte codes — a 64-dim float64
embedding becomes 8 bytes (64x) — and scores candidates WITHOUT
decompression via asymmetric distance computation (ADC): the query
precomputes a (m x ksub) table of partial squared distances to every
sub-centroid, and a candidate's distance is just ``m`` table lookups
summed. (Jegou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 — public.)

Scale split (who does what):
- **Codebook training is control-plane.** Codebooks are trained with
  numpy Lloyd iterations on a DETERMINISTIC bounded sample (lowest-id
  rows — the id-hash-sample trick keeps it engine-portable); training
  on a sample is the standard PQ recipe, the codebook is m*ksub*dsub
  floats (~few KB) and broadcasts everywhere. The full corpus is
  never collected.
- **Encoding is data-plane.** One Arrow-vectorized pandas_udf maps
  each vector's m subvectors to their nearest sub-centroids (numpy
  argmin over a (batch, ksub) distance matrix per subvector) —
  O(n·m·ksub·dsub) executor work, no shuffle.
- **Search is data-plane.** The per-query distance table is computed
  inside the same kind of vectorized udf from broadcast codebooks;
  scoring a candidate is table-take + sum. Top-k via
  TakeOrderedAndProject on the scored frame.

Determinism: sample = ``ksub`` lowest-id rows per init + fixed
iteration count; numpy arithmetic is IEEE and the argmin tie-break is
first-index — stable across runs/partitionings (encode happens
rowwise, independent of partition layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.similarity import as_double_array


def pq_train(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks: ``m`` sub-quantizers of ``ksub`` centroids
    each, over the ``sample_n`` lowest-id vectors (bounded,
    deterministic collect — the one control-plane transfer).
    Returns ``codebooks[sub][code] -> centroid subvector``."""
    import numpy as np

    rows = (
        df.select(F.col(id_col).alias("_id"), as_double_array(F.col(vec_col)).alias("_v"))
        .orderBy("_id")
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError(
            "pq_train: empty training sample — the input DataFrame has "
            "no rows (or every row was filtered upstream)"
        )
    X = np.array([r["_v"] for r in rows], dtype="float64")
    if X.ndim != 2:
        raise ValueError(
            "pq_train: ragged vector lengths in the training sample — "
            "all vectors must share one dimension"
        )
    return train_codebooks_array(X, m=m, ksub=ksub, iters=iters)


def train_codebooks_array(
    X, m: int = 8, ksub: int = 16, iters: int = 8
) -> list[list[list[float]]]:
    """The numpy core of ``pq_train``: Lloyd iterations per
    sub-quantizer over an (n, dim) sample matrix. Exposed so callers
    that already hold the training sample driver-side (e.g. the fused
    IVF+PQ build, which derives residuals from an already-collected
    assignment sample) can train without materializing a Spark
    residual DataFrame first."""
    import numpy as np

    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    codebooks = []
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        # init: first ksub DISTINCT subvectors (deterministic)
        seen, init = set(), []
        for row in sub:
            t = tuple(row)
            if t not in seen:
                seen.add(t)
                init.append(row)
            if len(init) == ksub:
                break
        C = np.array(init, dtype="float64")
        if C.shape[0] < ksub:  # degenerate sample: pad by repeating
            C = np.vstack([C] * (ksub // C.shape[0] + 1))[:ksub]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    C[c] = sub[mask].mean(axis=0)
        codebooks.append([[float(x) for x in row] for row in C])
    return codebooks


def encode_batch(X, C) -> "object":
    """Encode an (n, dim) float64 matrix to (n, m) int64 codes against
    codebook arrays ``C`` (list of (ksub, dsub) ndarrays). The shared
    numpy kernel of ``pq_encode`` and the fused IVF+PQ writer — ONE
    definition of the argmin/tie-break so the two paths cannot
    drift."""
    import numpy as np

    m = len(C)
    dsub = C[0].shape[1]
    out = np.empty((X.shape[0], m), dtype="int64")
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        d2 = ((sub[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
        out[:, s] = d2.argmin(axis=1)
    return out


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector compressed to ``m`` codes.
    One vectorized pandas_udf pass; codebooks ride the closure (a few
    KB broadcast per task)."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    C = [np.array(cb, dtype="float64") for cb in codebooks]

    def _enc(vs):
        if len(vs) == 0:
            return pandas.Series([], dtype="object")
        X = np.stack(vs.to_numpy()).astype("float64")
        out = encode_batch(X, C)
        return pandas.Series(list(out))

    _enc.__annotations__ = {"vs": pandas.Series, "return": pandas.Series}
    enc = pandas_udf("array<int>")(_enc)
    return df.select(
        F.col(id_col), enc(as_double_array(F.col(vec_col))).alias("codes")
    )


def pq_reconstruct(codes: list[int], codebooks: list[list[list[float]]]) -> list[float]:
    """Decode one code vector back to its centroid approximation
    (test/diagnostic helper)."""
    out: list[float] = []
    for s, c in enumerate(codes):
        out.extend(codebooks[s][c])
    return out


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by asymmetric distance: precompute the query's (m x ksub)
    partial-distance table, score every code vector with m lookups
    (vectorized numpy take+sum), TakeOrderedAndProject the k best.
    Returns (id, adc_dist) ascending."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    C = [np.array(cb, dtype="float64") for cb in codebooks]
    m = len(C)
    dsub = C[0].shape[1]
    q = np.asarray(query_vec, dtype="float64")
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != {m * dsub}")
    # distance table: dt[s][c] = ||q_s - C[s][c]||^2
    dt = np.stack(
        [((C[s] - q[s * dsub : (s + 1) * dsub]) ** 2).sum(axis=1) for s in range(m)]
    )

    def _score(codes):
        if len(codes) == 0:
            return pandas.Series([], dtype="float64")
        A = np.stack(codes.to_numpy()).astype("int64")
        tot = np.zeros(A.shape[0])
        for s in range(m):  # fold order: deterministic sums
            tot += dt[s][A[:, s]]
        return pandas.Series(tot)

    _score.__annotations__ = {"codes": pandas.Series, "return": pandas.Series}
    score = pandas_udf("double")(_score)
    return (
        encoded.select(F.col(id_col), score(F.col("codes")).alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_adc_topk_refined(
    encoded: DataFrame,
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist → exact re-rank (the production PQ recipe): codes
    cut the corpus to ``shortlist`` (default 4k) candidates cheaply;
    only those rows' full vectors are read and re-scored exactly.
    Vectors within one quantization cell are indistinguishable to raw
    ADC — the re-rank restores exact ordering among the shortlist, so
    recall@k approaches the shortlist's cluster recall. The shortlist
    is a k-row-scale frame: the semi-join against the full vector
    table broadcasts it, reading only matching rows."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    n_short = shortlist if shortlist is not None else 4 * k
    short = pq_adc_topk(encoded, codebooks, query_vec, k=n_short, id_col=id_col)
    q = [float(x) for x in query_vec]

    def _exact(vs):
        if len(vs) == 0:
            return pandas.Series([], dtype="float64")
        X = np.stack(vs.to_numpy()).astype("float64")
        qa = np.asarray(q)
        tot = np.zeros(X.shape[0])
        for j in range(X.shape[1]):  # fold order: deterministic sums
            d = X[:, j] - qa[j]
            tot += d * d
        return pandas.Series(tot)

    _exact.__annotations__ = {"vs": pandas.Series, "return": pandas.Series}
    exact = pandas_udf("double")(_exact)
    cand = vectors.join(F.broadcast(short.select(id_col)), id_col)
    return (
        cand.select(
            F.col(id_col),
            exact(as_double_array(F.col(vec_col))).alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
