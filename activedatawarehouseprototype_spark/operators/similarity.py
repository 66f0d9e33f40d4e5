"""Similarity search over embedding columns (array<float>).

- ``cosine``: pure Column expression (zip_with + aggregate fold —
  JVM-side, no UDF, sequential summation so the SQL twin matches).
- ``topk_brute_force``: query vector vs all rows; global top-k via
  TakeOrderedAndProject (no full sort materialization).
- ``random_hyperplane_bucket``: deterministic sign-LSH bucketing (the
  scale path: restrict candidate set to one bucket / multi-probe
  neighbors instead of scanning all vectors).
- ``blocked_pairs_cosine``: all-pairs cosine within a blocking key
  (label / IVF cell) — the pairwise join never crosses blocks.

At 100 TB: brute force is a full scan per query — fine for batch
scoring many queries at once (one broadcast of the query matrix),
wrong for point lookups; there the LSH/IVF bucket prunes the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window

from activedatawarehouseprototype_spark.session import local_rows_df
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def safe_norm(a: Column) -> Column:
    """L2 norm with a 1.0 divisor for the zero vector: x / safe_norm(x)
    leaves an all-zero embedding as zeros instead of throwing
    DIVIDE_BY_ZERO under the session's ANSI default."""
    n = norm(a)
    return F.when(n == 0.0, F.lit(1.0)).otherwise(n)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; a zero-norm side scores 0.0 (undefined
    direction — never a spurious top-k hit, and never an ANSI
    DIVIDE_BY_ZERO crash; the vectorized twin cosine_pairs_score
    applies the same convention)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def topk_brute_force(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k by cosine vs a literal query vector. Score rounded to 6
    so ordering/selection is engine-stable; ties broken by id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(as_double_array(F.col(vec_col)), q), 6).alias("score"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col(id_col) != exclude_id)
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def random_hyperplane_bucket(
    vec_col: Column, n_planes: int = 8, dim: int = 64
) -> Column:
    """Sign-LSH bucket string. Plane p's direction over dimension d is
    a deterministic ±1 derived from md5('p:d') (hex char >= '8' ⇔ +1),
    so buckets are reproducible across engines and runs — no stored
    model needed. bucket[p] = 1 iff Σ_d v[d]·sign(p,d) > 0.

    The ±1 signs are data-INDEPENDENT, so they are precomputed here
    (hashlib.md5 == Spark md5 == DuckDB md5 on the same "p:d" bytes)
    and the whole bucket string is computed by ONE vectorized Arrow
    pandas_udf. Two prior shapes both failed at scale: the
    higher-order fold evaluates interpreted per element AND re-hashes
    a constant per row·dim·plane; a literal left-chained arithmetic
    expression fixes the speed but costs ~500 plan nodes per bucket,
    which the multi-probe expansion (37 substring variants, each
    duplicating the child) blows up into a ~750k-node plan — codegen
    OOM at broadcast build. One UDF node keeps the plan tiny and the
    math vectorized. Accumulation runs dim-by-dim in fold order, so
    plane sums are bit-identical to the old fold and to DuckDB's
    sequential list_sum — bucket values are unchanged."""
    import hashlib

    import numpy as np
    import pandas  # noqa: F401 — resolves the deferred type hints
    from pyspark.sql.functions import pandas_udf

    signs = np.array(
        [
            [
                1.0
                if hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0] >= "8"
                else -1.0
                for d in range(1, dim + 1)
            ]
            for p in range(n_planes)
        ]
    )

    def _bucket(a):
        if len(a) == 0:
            return pandas.Series([], dtype="object")
        A = np.stack(a.to_numpy()).astype("float64")
        n = A.shape[0]
        sums = np.zeros((n, n_planes))
        for j in range(A.shape[1]):  # fold order: bit-exact plane sums
            sums += A[:, j : j + 1] * signs[:, j]
        bits = np.where(sums > 0, "1", "0")
        return pandas.Series(["".join(row) for row in bits])

    _bucket.__annotations__ = {"a": pandas.Series, "return": pandas.Series}
    return pandas_udf("string")(_bucket)(vec_col)


def lsh_probe_buckets(bucket: Column, n_planes: int = 8, probes: int = 1) -> Column:
    """Probe set for multi-probe LSH: all buckets within Hamming
    distance ``probes - 1`` of the query's own bucket. Near-neighbors
    that straddle r hyperplanes land r bits away — probing those
    buckets recovers the recall a single-bucket lookup loses at
    boundaries, at sum_{i<=r} C(n_planes, i) candidate-bucket cost
    instead of a full scan.

    probes=1 → own bucket; probes=2 → + all Hamming-1 neighbors;
    probes=3 → + all Hamming-2 neighbors; and so on (each probes value
    is a distinct, strictly larger expansion — round-3 ADVICE: values
    above 2 used to silently alias to 2)."""
    from itertools import combinations

    if not 1 <= probes <= n_planes + 1:
        raise ValueError(
            f"probes must be in [1, n_planes + 1] = [1, {n_planes + 1}], "
            f"got {probes}"
        )
    if probes <= 1:
        return F.array(bucket)

    def flipped(positions: tuple[int, ...]) -> Column:
        chars = [
            F.when(F.substring(bucket, i + 1, 1) == "1", "0").otherwise("1")
            if i in positions
            else F.substring(bucket, i + 1, 1)
            for i in range(n_planes)
        ]
        return F.concat(*chars)

    variants = [
        flipped(combo)
        for radius in range(1, probes)
        for combo in combinations(range(n_planes), radius)
    ]
    return F.array(bucket, *variants)


def lsh_topk_for_queries(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Batch ANN: top-k cosine neighbors for EVERY row of ``queries_df``
    in one plan — the realistic training-data-pipeline shape (dedup vs
    index, contamination checks run thousands of queries, not one).

    Shape: bucket the corpus once, bucket + probe-expand the queries
    (own bucket, plus Hamming-1 neighbors when ``probes > 1``),
    broadcast the small query side into a bucket-equi join, then one
    per-query window rank. No per-query driver roundtrip; the corpus
    is scanned once regardless of query count. Each corpus vector has
    exactly ONE bucket, so a candidate matches at most one probe bucket
    per query — no post-join dedup needed."""
    bucketed = corpus_df.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("_v"),
        random_hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("_bkt"),
    )
    q = queries_df.select(
        F.col(qid_col),
        as_double_array(F.col(qvec_col)).alias("_qv"),
        F.explode(
            lsh_probe_buckets(
                random_hyperplane_bucket(F.col(qvec_col), n_planes, dim),
                n_planes,
                probes,
            )
        ).alias("_pbkt"),
    )
    cand = bucketed.join(
        F.broadcast(q), F.col("_bkt") == F.col("_pbkt")
    ).filter(F.col(id_col) != F.col(qid_col))
    scored = cand.select(
        qid_col,
        id_col,
        F.round(cosine(F.col("_v"), F.col("_qv")), 6).alias("score"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance — sequential left-fold, deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    df: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest of k
    centroids (min squared-L2, ties by centroid id). Default centroids
    are the k lowest-id vectors — deterministic, so the DuckDB oracle
    can recompute the assignment; pass ``centroids=
    ivf_kmeans_centroids(df, k)`` for trained cells (same plumbing:
    centroids are control data, broadcast as literals into one codegen
    projection — no join, no shuffle).

    The ANN search path then probes only the query's cell (or its few
    nearest cells), cutting the scan from |corpus| to |corpus|/k per
    query — the standard IVF-flat trade."""
    seeds = centroids or ivf_seed_centroids(df, k, id_col=id_col, vec_col=vec_col)
    best = _ivf_sorted_cells(F.col(vec_col), seeds)[0]
    return df.withColumn("cell", best)


def ivf_seed_centroids(
    df: DataFrame, k: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Bounded control-plane fetch (k rows): the deterministic seed
    centroids. Swap in k-means output (``ivf_kmeans_centroids``) in a
    real deployment; the oracle corpus keeps this path because DuckDB
    can recompute it."""
    return [
        (int(r[id_col]), [float(x) for x in r[vec_col]])
        for r in df.orderBy(id_col).limit(k).collect()
    ]


def ivf_kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Lloyd k-means over the corpus, expressed as DataFrame ops — the
    real centroid trainer behind the ``ivf_assign``/``ivf_topk_*``
    centroid seam (seed centroids give no recall guarantee on clustered
    real embeddings).

    Per iteration: assign every vector to its nearest current centroid
    (centroids broadcast as literals into ONE codegen projection — no
    join, no shuffle on the assign side), then recompute each cell's
    element-wise mean via posexplode → groupBy(cell, pos) → avg (one
    shuffle of |corpus|·dim skinny rows with map-side partial
    aggregation). The ONLY collect is k rows of centroids per
    iteration — control plane, never the corpus. Empty cells keep
    their previous centroid. Deterministic: seeds are the k lowest-id
    vectors and every step is an exact aggregate (modulo float
    summation order in avg — immaterial for centroid quality).

    Returns the same ``[(label, vector)]`` shape as
    ``ivf_seed_centroids``, so it drops into ``ivf_assign(...,
    centroids=...)`` / ``ivf_topk_for_queries(..., centroids=...)``."""
    cents = ivf_seed_centroids(df, k, id_col=id_col, vec_col=vec_col)
    v = as_double_array(F.col(vec_col))
    for _ in range(iters):
        assigned = df.select(
            _ivf_sorted_cells(F.col(vec_col), cents)[0].alias("cell"),
            v.alias("_v"),
        )
        rows = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cell", F.transform("pm", lambda s: s["m"]).alias("centroid")
            )
            .collect()  # bounded: k rows (control plane)
        )
        new = {int(r["cell"]): [float(x) for x in r["centroid"]] for r in rows}
        cents = [(sid, new.get(sid, cv)) for sid, cv in cents]
    return cents


def _ivf_sorted_cells(vec_col: Column, seeds) -> Column:
    """Array of centroid sids ascending by (quantized dist, sid) — the
    full probe order for a vector, computed by ONE vectorized Arrow
    pandas_udf (the earlier per-centroid ``sq_dist`` fold structs were
    interpreted higher-order functions: k x dim lambda evals per row
    dominated every IVF query's wall time).

    The distance is QUANTIZED to 1e-12 (``floor(dist * 1e12)``) before
    ordering, matching ``FLOOR(... * 1e12)`` in the DuckDB oracles: a
    last-ulp disagreement on a near-tie between two centroids would
    otherwise flip the cell assignment (round-3 ADVICE). Multiply-floor
    rather than ROUND because the two engines round decimals
    differently (Spark: BigDecimal HALF_UP; DuckDB: binary) while
    multiply+floor is the same IEEE ops on both. The numpy
    accumulation runs dim-by-dim in fold order, so distances are
    bit-identical to the previous fold and DuckDB's sequential
    list_sum; ties resolve to the lowest sid via a stable argsort over
    ascending-sid columns (``ivf_seed_centroids`` and
    ``ivf_kmeans_centroids`` both emit seeds sid-ascending)."""
    import numpy as np
    import pandas  # noqa: F401 — resolves the deferred type hints
    from pyspark.sql.functions import pandas_udf

    sids = np.array([int(sid) for sid, _ in seeds], dtype="int64")
    assert list(sids) == sorted(sids), "seeds must be sid-ascending"
    C = np.array([sv for _, sv in seeds], dtype="float64")  # (k, dim)

    def _cells(a):
        if len(a) == 0:
            return pandas.Series([], dtype="object")
        A = np.stack(a.to_numpy()).astype("float64")
        n = A.shape[0]
        d2 = np.zeros((n, C.shape[0]))
        for j in range(A.shape[1]):  # fold order: bit-exact distances
            diff = A[:, j : j + 1] - C[:, j]
            d2 += diff * diff
        q = np.floor(d2 * 1e12).astype("int64")
        order = np.argsort(q, axis=1, kind="stable")  # ties -> low sid
        return pandas.Series(list(sids[order]))

    _cells.__annotations__ = {"a": pandas.Series, "return": pandas.Series}
    return pandas_udf("array<bigint>")(_cells)(vec_col)


def ivf_topk_for_queries(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Batch IVF-flat ANN: top-k cosine for every query row in one plan.

    The corpus is assigned to its nearest centroid once; each query
    probes its ``probes`` nearest centroids (top-2 fixes recall for
    queries sitting on a cell boundary). Queries join broadcast on the
    cell id — scan cost |corpus| once + candidates, independent of the
    number of queries; no per-query driver roundtrip (the only collect
    is the bounded ``n_centroids``-row seed fetch). Pass ``centroids``
    (e.g. from ``ivf_kmeans_centroids``) for trained cells; the default
    deterministic seed path is what the DuckDB oracle recomputes."""
    if not 1 <= probes <= n_centroids:
        raise ValueError(
            f"probes must be in [1, n_centroids] = [1, {n_centroids}], "
            f"got {probes}"
        )
    seeds = centroids or ivf_seed_centroids(corpus_df, n_centroids, id_col, vec_col)
    assigned = corpus_df.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("_v"),
        _ivf_sorted_cells(F.col(vec_col), seeds)[0].alias("cell"),
    )
    qcells = F.slice(_ivf_sorted_cells(F.col(qvec_col), seeds), 1, probes)
    q = queries_df.select(
        F.col(qid_col),
        as_double_array(F.col(qvec_col)).alias("_qv"),
        F.explode(qcells).alias("_pcell"),
    )
    cand = assigned.join(
        F.broadcast(q), F.col("cell") == F.col("_pcell")
    ).filter(F.col(id_col) != F.col(qid_col))
    scored = cand.select(
        qid_col,
        id_col,
        F.round(cosine(F.col("_v"), F.col("_qv")), 6).alias("score"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric linear int8 quantization of an embedding:
    ``struct(scale, q array<int>)`` with scale = max|x|/127 and
    q = floor(x/scale + 0.5) (the floor form, NOT round(): both engines
    floor identically on IEEE doubles, while round() half-way rules
    differ). At 100 TB of embeddings this is the 4x storage/IO cut that
    makes the ANN scan paths affordable; dequantized error is bounded
    by scale/2 per component."""
    v = as_double_array(vec)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = mx / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.floor(x / scale + F.lit(0.5)).cast("int"))
        .cast("int"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the semantic-dedup
    family (exact/minhash dedup misses paraphrases; embeddings catch
    them). Candidates are restricted to a shared sign-LSH bucket
    (deterministic hyperplanes, no stored model), then scored by
    cosine and thresholded.

    Scale shape: the self-join key is the bucket, so pair generation
    is Σ_b |bucket_b|² — never |corpus|²; raise ``n_planes`` as the
    corpus grows to keep buckets bounded (each plane halves expected
    bucket size). Cost of that restriction is recall at bucket
    boundaries; near-dups at cosine >= 0.95 flip few plane signs, and
    the multi-probe expansion (``lsh_probe_buckets``) is the recall
    knob if needed. Scores round to 6 (engine-stable ordering rule).
    """
    b = df.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("_v"),
        random_hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.bucket").alias("bucket"),
            F.round(
                cosine_pairs_score(F.col("a._v"), F.col("b._v")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def blocked_pairs_cosine(
    df: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos) for all pairs sharing a blocking key.
    The join key is the block — shuffle is by block, pairs never
    cross blocks (IVF-style candidate restriction)."""
    lhs = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        as_double_array(F.col(vec_col)).alias("va"),
    )
    rhs = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        as_double_array(F.col(vec_col)).alias("vb"),
    )
    return (
        lhs.join(rhs, ["blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "blk",
            "id_a",
            "id_b",
            cosine_pairs_score(F.col("va"), F.col("vb")).alias("cos"),
        )
    )


def cosine_pairs_score(va: Column, vb: Column) -> Column:
    """Vectorized cosine for PAIR tables — the hot-path twin of
    ``cosine``. The fold-based Column form evaluates higher-order
    lambdas INTERPRETED per element (~32us/pair at dim 64 measured at
    sf0.1), which dominates every blocked pairwise join; this Arrow
    pandas_udf moves the same arithmetic into one numpy batch
    (~100-1000x per-element).

    Parity: the accumulation loops over dimensions IN ORDER (one
    vectorized numpy add per dim, sequential across dims — NOT einsum
    or BLAS, whose unrolled/pairwise accumulation differs in the last
    ulp), so every sum is bit-identical to the sequential
    ``F.aggregate`` fold and to DuckDB's in-order list_sum — the
    round-then-threshold discipline downstream sees the exact same
    doubles. Measured parity: 5000/5000 bit-equal vs the fold. Use
    for pair tables (both sides row-aligned); single-vector-vs-literal
    scans stay on the Column form (no Python worker hop for one
    pass)."""
    import numpy as np
    import pandas  # noqa: F401 — resolves the deferred type hints
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        if len(a) == 0:
            return pandas.Series([], dtype="float64")
        A = np.stack(a.to_numpy())
        B = np.stack(b.to_numpy())
        n, dim = A.shape
        num = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for j in range(dim):  # fold order: bit-exact vs F.aggregate
            num += A[:, j] * B[:, j]
            na += A[:, j] * A[:, j]
            nb += B[:, j] * B[:, j]
        den = np.sqrt(na) * np.sqrt(nb)
        # zero-norm convention shared with cosine(): score 0.0, not
        # NaN (which Spark would sort ABOVE every real score)
        return pandas.Series(np.where(den == 0.0, 0.0, num / np.where(den == 0.0, 1.0, den)))

    _cos.__annotations__ = {
        "a": pandas.Series,
        "b": pandas.Series,
        "return": pandas.Series,
    }
    return pandas_udf("double")(_cos)(va, vb)


def ivf_index_build(
    df: DataFrame,
    index_path: str,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_kmeans: bool = True,
    centroids: "list[tuple[int, list[float]]] | None" = None,
) -> list[tuple[int, list[float]]]:
    """Build a PERSISTED IVF-flat ANN index: train centroids, assign
    every vector to its cell, and write the corpus partitioned by
    ``cell=`` (one directory per cell) plus a k-row centroids table.

    ``centroids`` overrides training entirely — the trained-centroid
    seam at the index level (e.g. de-quantized
    ``clustering.kmeans_lattice`` output for a bit-reproducible
    layout, or centroids reused from a sibling index so two corpora
    share cell geometry).

    This is the storage-layout half of the IVF trade: at query time
    the probed cells become parquet PARTITION FILTERS, so a search
    over a 100 TB corpus reads only |probed cells| / k of the files —
    the scan never touches non-candidate data (verified by plan
    assertion in tests). Centroids are control-plane-sized (k rows)
    and stored beside the vectors so search needs no retraining.

    Returns the trained centroids (same shape as
    ``ivf_kmeans_centroids``)."""
    if centroids is not None:
        if len(centroids) != k:
            raise ValueError(
                f"ivf_index_build: {len(centroids)} centroids given, k={k}"
            )
        cents = centroids
    elif use_kmeans:
        cents = ivf_kmeans_centroids(df, k, iters, id_col=id_col, vec_col=vec_col)
    else:
        cents = ivf_seed_centroids(df, k, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(df, k=k, id_col=id_col, vec_col=vec_col, centroids=cents)
    # the vectors write doubles as the row count for the drift meta:
    # an Observation rides the write job, so the sidecar costs ZERO
    # extra Spark jobs (was: a read-back footer count per build —
    # pure job-submission overhead in the index lifecycle, guide §1.5)
    from pyspark.sql import Observation

    obs = Observation()
    assigned.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("vec"),
        F.col("cell"),
    ).observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{index_path}/vectors")
    spark = df.sparkSession
    local_rows_df(
        spark,
        [(int(sid), [float(x) for x in sv]) for sid, sv in cents],
        "sid bigint, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/centroids")
    _write_build_meta(spark, index_path, n_rows=int(obs.get["n"]))
    return cents


def _atomic_json_write(path: str, obj) -> None:
    """Write a JSON sidecar durably: full content to ``path + ".tmp"``,
    then one ``os.replace`` — a crash mid-write leaves the OLD sidecar
    (or none) intact, never a torn file that wedges the next
    ``json.load``. Every sidecar write in this module goes through
    here; the rebuild readers additionally tolerate torn files from
    pre-atomic writers (backfill, same as a lost sidecar)."""
    import json as _json
    import os as _os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(obj, f)
    _os.replace(tmp, path)


def _write_build_meta(spark, index_path: str, n_rows: int | None = None) -> None:
    """Persist the row count at (re)build time beside the centroids —
    the drift denominator ``ivf_index_rebuild`` compares appends
    against. Builders pass ``n_rows`` from an ``Observation`` riding
    the vectors write (zero extra jobs); when absent, fall back to a
    parquet count over the just-written vectors (footer-metadata-only,
    no row reads, but still one job submission)."""
    import os as _os

    n = (
        n_rows
        if n_rows is not None
        else spark.read.parquet(f"{index_path}/vectors").count()
    )
    _atomic_json_write(
        _os.path.join(index_path, "_build_meta.json"),
        {"n_rows_at_build": int(n)},
    )


def ivf_index_search(
    spark,
    index_path: str,
    queries_df: DataFrame,
    k: int = 5,
    probes: int = 2,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batch ANN search against a persisted ``ivf_index_build`` index.

    Each query probes its ``probes`` nearest cells; the union of
    probed cells (bounded by the number of CENTROIDS, not queries) is
    collected and pushed into the vector scan as a STATIC partition
    filter — ``.explain`` shows ``PartitionFilters: [cell IN (...)]``
    and only those directories are listed/read. Candidates then join
    broadcast against the probe-expanded queries, are scored with the
    vectorized pair cosine, and one per-query window rank yields the
    top-k. No driver roundtrip carries data: the two collects are the
    k-row centroid table and the ≤k probed-cell id set."""
    cents = [
        (int(r["sid"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(f"{index_path}/centroids").collect()
    ]
    cents.sort(key=lambda t: t[0])
    q = queries_df.select(
        F.col(qid_col),
        as_double_array(F.col(qvec_col)).alias("_qv"),
        F.explode(
            F.slice(_ivf_sorted_cells(F.col(qvec_col), cents), 1, probes)
        ).alias("_pcell"),
    )
    probe_cells = sorted(
        {r["_pcell"] for r in q.select("_pcell").distinct().collect()}
    )
    vectors = spark.read.parquet(f"{index_path}/vectors").filter(
        F.col("cell").isin(probe_cells)
    )
    cand = vectors.join(
        F.broadcast(q), F.col("cell") == F.col("_pcell")
    ).filter(F.col(id_col) != F.col(qid_col))
    scored = cand.select(
        qid_col,
        id_col,
        F.round(cosine_pairs_score(F.col("vec"), F.col("_qv")), 6).alias("score"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def ivf_index_append(
    spark,
    index_path: str,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "list[tuple[int, list[float]]] | None" = None,
) -> None:
    """Incrementally add vectors to a persisted ``ivf_index_build``
    index: assign against the EXISTING centroids (k-row control-plane
    read, broadcast into one vectorized projection) and append to the
    matching ``cell=`` partitions — no rewrite of existing data, no
    retraining. Parquet partitioned append only touches the
    directories the new batch lands in, so index maintenance cost is
    O(|new batch|) regardless of index size; searches pick the rows up
    immediately (same partition filters). Re-train + rebuild
    (``ivf_index_build``) when drift degrades recall — centroid
    assignment quality, not storage, is the rebuild trigger.

    Entry recovers both swap paths: appending into a crashed
    rebuild's rename window (vectors dir missing, ``.old`` holding
    the committed table) would otherwise CREATE a fresh one-batch
    vectors dir, and the next recover would delete ``.old`` — silent
    loss of the whole index (found by the stream-side crash test;
    same wedge class as the dedup-index bands append)."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        recover_swap,
    )

    recover_swap(f"{index_path}/vectors")
    recover_swap(f"{index_path}/centroids")
    if centroids is not None:
        # injected-read seam (same as DedupIngest's one-meta-read-per-
        # batch): a caller that just built or searched the index
        # already holds the k-row centroid list — passing it skips the
        # centroids-table collect job. The caller owns the guarantee
        # that they ARE this index's centroids (they are KB-sized
        # control data; when in doubt, omit and pay the one read).
        cents = sorted(
            ((int(s), [float(x) for x in v]) for s, v in centroids),
            key=lambda t: t[0],
        )
    else:
        cents = sorted(
            (
                (int(r["sid"]), [float(x) for x in r["centroid"]])
                for r in spark.read.parquet(f"{index_path}/centroids").collect()
            ),
            key=lambda t: t[0],
        )
    assigned = ivf_assign(
        df, k=len(cents), id_col=id_col, vec_col=vec_col, centroids=cents
    )
    assigned.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("vec"),
        F.col("cell"),
    ).write.mode("append").partitionBy("cell").parquet(f"{index_path}/vectors")


def ivf_index_rebuild(
    spark,
    index_path: str,
    min_appended_fraction: float = 0.25,
    iters: int = 4,
    id_col: str = "vec_id",
    centroids: "list[tuple[int, list[float]]] | None" = None,
    force: bool = False,
) -> dict:
    """Drift-triggered RETRAIN of a persisted IVF index — the path the
    ``ivf_index_append`` docstring promises: appends assign into cells
    trained on the ORIGINAL distribution, so once enough new data has
    landed the cell geometry no longer fits it and probe recall
    degrades. This closes the loop: measure growth since the last
    (re)build, and past the threshold retrain centroids on the FULL
    current corpus, reassign every vector, and atomically swap the
    layout in.

    Trigger: rows appended since the last build / rows at last build
    >= ``min_appended_fraction`` (the ``_build_meta.json`` sidecar
    ``ivf_index_build`` writes). Growth is the cheap, deterministic
    drift proxy — it needs no query log; pass ``force=True`` when an
    external recall probe says the geometry is stale sooner.

    Retrain: ``centroids`` overrides training (the same seam as
    ``ivf_index_build`` — e.g. de-quantized ``kmeans_lattice`` output
    for a bit-reproducible rebuild, which is what the corpus oracle
    replays); default is ``ivf_kmeans_centroids`` over the current
    vectors at the existing k.

    Crash safety: the vectors table AND the centroids table each swap
    via the warehouse protocol (recover_swap/commit_swap) — readers
    see the old or the new layout of either, never a partial one, and
    rebuild entry recovers BOTH paths (round-11 ADVICE: the centroids
    rewrite used to be a plain delete-then-write overwrite, so a
    crash mid-job left a missing/partial centroids dir that wedged
    every subsequent search and rebuild). A crash between the vector
    commit and the centroid commit leaves new cells described by the
    old centroids (searches stay valid parquet reads but probe with
    stale geometry — degraded recall, never an error), and the
    un-advanced meta keeps the trigger armed, so simply re-running
    rebuild retrains and converges — the recovery action IS the
    operation itself. An index predating ``_build_meta.json`` (or one
    whose sidecar was lost) is treated as freshly built: the meta is
    backfilled at the CURRENT count (growth measured from now;
    ``force=True`` rebuilds immediately), rather than failing on a
    bare FileNotFoundError.

    Returns ``{"rebuilt": bool, "n_rows": int, "n_at_build": int,
    "k": int}`` — control-plane scalars only; the corpus never
    reaches the driver. Cost when triggered: one full scan + one
    shuffle-free reassign projection + one partitioned rewrite —
    O(index), the honest price of new geometry (compare
    ``ivf_index_compact``, which keeps geometry and only merges
    files)."""
    import json as _json
    import os as _os

    from activedatawarehouseprototype_spark.operators.warehouse import (
        commit_swap,
        recover_swap,
    )

    vec_path = f"{index_path}/vectors"
    cent_path = f"{index_path}/centroids"
    recover_swap(vec_path)
    recover_swap(cent_path)
    cur = spark.read.parquet(vec_path)
    n_now = cur.count()
    if n_now == 0:
        # force=True on an empty table would train k-means over zero
        # vectors and swap in an empty layout — a caller bug, not a
        # rebuild decision
        raise ValueError(f"ivf_index_rebuild: empty vectors table at {vec_path}")
    meta_path = _os.path.join(index_path, "_build_meta.json")
    try:
        with open(meta_path) as f:
            n_base = int(_json.load(f)["n_rows_at_build"])
    except (FileNotFoundError, ValueError, KeyError):
        # pre-sidecar index, lost sidecar, or a TORN file from a
        # pre-atomic writer (JSONDecodeError is a ValueError): backfill
        # at the current count so the drift denominator is anchored
        # from now on — growth-triggering resumes on the next append;
        # force=True still rebuilds this run. A PARSEABLE non-positive
        # count still raises below: that is corruption with structure,
        # not a torn write.
        n_base = int(n_now)
        _atomic_json_write(meta_path, {"n_rows_at_build": n_base})
    if n_base <= 0:
        raise ValueError(f"corrupt build meta at {meta_path}: {n_base}")
    grown = (n_now - n_base) / n_base
    if not force and grown < min_appended_fraction:
        return {
            "rebuilt": False,
            "n_rows": int(n_now),
            "n_at_build": n_base,
            "k": int(spark.read.parquet(cent_path).count()),
        }
    if centroids is not None:
        # caller-supplied geometry: k is len(centroids) by definition,
        # so the centroids-table count job is skipped entirely (the
        # table is about to be overwritten with these anyway)
        cents = sorted(
            ((int(s), [float(x) for x in v]) for s, v in centroids),
            key=lambda t: t[0],
        )
    else:
        k = spark.read.parquet(cent_path).count()
        cents = ivf_kmeans_centroids(
            cur, k=int(k), iters=iters, id_col=id_col, vec_col="vec"
        )
    reassigned = ivf_assign(
        cur.drop("cell"), k=len(cents), id_col=id_col, vec_col="vec",
        centroids=cents,
    )
    staging = vec_path + ".staging"
    reassigned.select(id_col, "vec", "cell").repartition(
        max(1, len(cents)), "cell"
    ).write.mode("overwrite").partitionBy("cell").parquet(staging)
    commit_swap(vec_path, staging)
    cent_staging = cent_path + ".staging"
    local_rows_df(
        spark,
        [(int(sid), [float(x) for x in sv]) for sid, sv in cents],
        "sid bigint, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(cent_staging)
    commit_swap(cent_path, cent_staging)
    _atomic_json_write(meta_path, {"n_rows_at_build": int(n_now)})
    return {
        "rebuilt": True,
        "n_rows": int(n_now),
        "n_at_build": n_base,
        "k": int(len(cents)),
    }


def cross_near_dup_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    threshold: float = 0.95,
) -> DataFrame:
    """Cross-table embedding near-duplicates — the SEMANTIC
    decontamination check (n-gram containment misses paraphrased
    benchmark items; embedding cosine catches them): (id_left,
    id_right, score) for pairs across the two frames within a shared
    sign-LSH bucket and cosine >= threshold.

    Same scale shape as ``embedding_near_dup_pairs``: the join key is
    the deterministic hyperplane bucket, so pair generation is
    Σ_b |left_b|·|right_b| — never |left|×|right|; the (typically
    small) benchmark side broadcasts via AQE. Scores round to 6
    (engine-stable ordering rule)."""
    def prep(df, nid):
        return df.select(
            F.col(id_col).alias(nid),
            as_double_array(F.col(vec_col)).alias(f"_v_{nid}"),
            random_hyperplane_bucket(F.col(vec_col), n_planes, dim).alias(
                "bucket"
            ),
        )

    a = prep(left, "id_left")
    b = prep(right, "id_right")
    return (
        a.join(b, "bucket")
        .select(
            "id_left",
            "id_right",
            "bucket",
            F.round(
                cosine_pairs_score(F.col("_v_id_left"), F.col("_v_id_right")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def ivf_index_compact(
    spark, index_path: str, files_per_cell: int = 1
) -> None:
    """Rewrite the IVF vectors table to ``files_per_cell`` files per
    cell partition (each ``ivf_index_append`` adds files to its landing
    cells; search cost grows with file count, not row count). Shares
    the warehouse swap protocol (recover_swap/commit_swap) so a crash
    at any point leaves either the old or the compacted vectors, never
    a missing/wedged table; centroids untouched."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        commit_swap,
        recover_swap,
    )

    vec_path = f"{index_path}/vectors"
    recover_swap(vec_path)
    df = spark.read.parquet(vec_path)
    n_cells = spark.read.parquet(f"{index_path}/centroids").count()
    staging = vec_path + ".staging"
    if files_per_cell > 1:
        # repartitioning on the cell alone lands each cell in ONE task
        # (one output file regardless of files_per_cell) — a salt in
        # the key is what actually splits a skewed giant cell
        df = df.withColumn(
            "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(files_per_cell))
        )
        (
            df.repartition(max(1, n_cells * files_per_cell), "cell", "_salt")
            .drop("_salt")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(staging)
        )
    else:
        df.repartition(max(1, n_cells), "cell").write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(staging)
    commit_swap(vec_path, staging)


# -- IVF + PQ fused index: the production ANN layout -----------------------


def ivf_pq_index_build(
    df: DataFrame,
    index_path: str,
    k: int = 16,
    iters: int = 4,
    m: int = 8,
    ksub: int = 16,
    pq_iters: int = 8,
    pq_sample_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_kmeans: bool = True,
) -> None:
    """Build the PRODUCTION ANN layout — IVF partitioning x PQ
    compression fused in one persisted index:

    - **IVF (which files)**: k-means cells become ``cell=`` parquet
      partitions, so a search's probed cells turn into partition
      filters — at 100 TB only |probes|/k of the files are listed.
    - **PQ (which bytes)**: each vector also stores ``m`` one-byte
      codes; the ADC shortlist stage reads ONLY the codes column
      (column pruning — ~64x less IO than full vectors), and the
      final exact re-rank reads full vectors for just the shortlist.

    PQ codebooks are trained on RESIDUALS of L2-normalized vectors
    from their cell's L2-normalized centroid (the IVF-ADC recipe):
    squared-L2 on normalized vectors IS cosine order (||a/|a| -
    b/|b|||^2 = 2 - 2*cos(a,b)), and subtracting the cell centroid
    first concentrates the quantized distribution around 0, so one
    shared codebook yields a sharper ADC shortlist at the same
    m x ksub budget. Codebooks + normalized centroids (KB) persist as
    ``_pq_codebooks.json`` beside the k-row centroids table — search
    needs no retraining.

    Reference parity: the reference engine has no ANN tier at all —
    this is the scale-path extension the task brief mandates
    (IVF per Jegou et al. TPAMI 2011, public)."""
    import json as _json
    import os as _os

    from activedatawarehouseprototype_spark.operators import pq as PQ

    import math as _math

    import numpy as _np

    cents = (
        ivf_kmeans_centroids(df, k, iters, id_col=id_col, vec_col=vec_col)
        if use_kmeans
        else ivf_seed_centroids(df, k, id_col=id_col, vec_col=vec_col)
    )
    # the assignment feeds BOTH the training sample and the final
    # vectors write — persist so the build evaluates it once
    assigned = ivf_assign(
        df, k=k, id_col=id_col, vec_col=vec_col, centroids=cents
    ).persist()
    try:
        # residual PQ (Jegou et al.'s actual IVF-ADC recipe): quantize
        # nv - cnorm(cell). Residuals concentrate around 0 regardless
        # of which cell a vector lives in, so one shared codebook fits
        # them far better than the raw (cell-offset) points — sharper
        # ADC shortlists at the same m x ksub budget.
        cnorm = {}
        for sid, sv in cents:
            n_ = _math.sqrt(sum(float(x) * float(x) for x in sv)) or 1.0
            cnorm[int(sid)] = [float(x) / n_ for x in sv]

        # training sample: the pq_sample_n lowest-id (vector, cell)
        # rows — the ONE bounded control-plane collect (standard PQ
        # recipe: codebooks train on a sample); residuals for the
        # sample are computed driver-side with the SAME numpy recipe
        # the fused writer applies executor-side
        sample = (
            assigned.select(
                F.col(id_col).alias("_id"),
                as_double_array(F.col(vec_col)).alias("_v"),
                "cell",
            )
            .orderBy("_id")
            .limit(pq_sample_n)
            .collect()
        )
        if not sample:
            raise ValueError(
                "ivf_pq_index_build: empty input — nothing to index"
            )
        Xs = _np.array([r["_v"] for r in sample], dtype="float64")
        if Xs.ndim != 2:
            raise ValueError(
                "ivf_pq_index_build: ragged vector lengths — all "
                "vectors must share one dimension"
            )
        Rs = _residual_batch(
            Xs, _np.array([int(r["cell"]) for r in sample]), cnorm
        )
        codebooks = PQ.train_codebooks_array(
            Rs, m=m, ksub=ksub, iters=pq_iters
        )

        # fused write: ONE Arrow pass computes normalize -> residual ->
        # codes in-place and writes (id, vec, cell, codes) — no
        # residual DataFrame, no encode join, and crucially no
        # full-corpus shuffle (the previous join-by-id was one). An
        # Observation rides the write so the drift-meta row count
        # costs zero extra jobs (same move as ivf_index_build).
        from pyspark.sql import Observation

        obs = Observation()
        (
            _fused_residual_codes(
                assigned, cnorm, codebooks, id_col=id_col, vec_col=vec_col
            )
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{index_path}/vectors")
        )
        n_written = int(obs.get["n"])
    finally:
        assigned.unpersist()
    spark = df.sparkSession
    local_rows_df(
        spark,
        [(int(sid), [float(x) for x in sv]) for sid, sv in cents],
        "sid bigint, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/centroids")
    _atomic_json_write(
        _os.path.join(index_path, "_pq_codebooks.json"),
        {
            "m": m,
            "ksub": ksub,
            "codebooks": codebooks,
            # normalized centroids persist with the codebooks: the
            # ADC stage must subtract the SAME values encoding did
            # (JSON float round-trip is exact for doubles)
            "cnorm": {str(c): vec for c, vec in sorted(cnorm.items())},
        },
    )
    _write_build_meta(spark, index_path, n_rows=n_written)


def _residual_batch(X, cells, cnorm: dict[int, list[float]]):
    """(n, dim) residual matrix: L2-normalize each row of ``X`` and
    subtract its assigned cell's L2-normalized centroid — the ONE
    definition of what PQ codes quantize, shared by the build-time
    training sample, the fused build/append writer, and (query-side,
    per probed cell) the ADC stage, so encodings cannot drift. Empty
    ``cnorm`` (legacy flat-PQ index) degrades to a zero offset."""
    import numpy as np

    norms = np.sqrt((X * X).sum(axis=1))
    norms[norms == 0.0] = 1.0
    NV = X / norms[:, None]
    if not cnorm:
        return NV
    keys = np.array(sorted(cnorm), dtype="int64")
    CN = np.array([cnorm[int(kk)] for kk in keys], dtype="float64")
    idx = np.searchsorted(keys, cells)
    # an unknown cell id would silently grab a neighbor's centroid
    if (idx >= len(keys)).any() or (keys[np.clip(idx, 0, len(keys) - 1)]
                                    != cells).any():
        raise ValueError("cell id not present in cnorm centroid map")
    return NV - CN[idx]


def _fused_residual_codes(
    assigned: DataFrame,
    cnorm: dict[int, list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, cell, codes) in ONE Arrow pass over the assigned
    corpus: normalize -> subtract cell centroid -> PQ-encode, with the
    full vector carried through for the exact re-rank column. No
    shuffle — this replaced a full-corpus join-by-id between the
    assignment and a separate encode pass."""
    import numpy as np
    import pandas

    from activedatawarehouseprototype_spark.operators import pq as PQ

    C = [np.array(cb, dtype="float64") for cb in codebooks]
    schema = f"{id_col} bigint, vec array<double>, cell bigint, codes array<int>"

    def it(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["_v"].to_numpy()).astype("float64")
            cells = pdf["cell"].to_numpy().astype("int64")
            R = _residual_batch(X, cells, cnorm)
            codes = PQ.encode_batch(R, C)
            yield pandas.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "vec": list(X),
                    "cell": cells,
                    "codes": list(codes.astype("int32")),
                }
            )

    return assigned.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("_v"),
        "cell",
    ).mapInPandas(it, schema)


def ivf_pq_search(
    spark,
    index_path: str,
    queries_df: DataFrame,
    k: int = 5,
    probes: int = 2,
    shortlist: int | None = None,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Batch ANN search over an ``ivf_pq_index_build`` index — the
    three-stage production recipe (prune -> ADC shortlist -> exact
    re-rank):

    1. **Partition prune**: each query's ``probes`` nearest centroids
       become a static ``cell IN (...)`` partition filter; only those
       directories are listed/read.
    2. **ADC shortlist**: the pruned scan reads (id, codes, cell)
       ONLY — never the full vectors. Per query, one numpy pass builds
       the (m x ksub) distance table from the broadcast codebooks and
       scores every candidate with m table lookups (grouped
       applyInPandas keyed by query: table built once per query, not
       per row). The best ``shortlist`` (default 4k) ids survive.
    3. **Exact re-rank**: full vectors for ONLY the shortlist rows
       (broadcast semi-join into the same pruned scan) are scored with
       exact cosine; top-k per query returned as (qid, id, score)
       descending — identical shape to ``ivf_index_search``.

    Driver transfers are control-plane bounded: the k-row centroid
    table, the KB codebooks, and the <= n_cells probed-cell id set."""
    import json as _json
    import os as _os

    import numpy as np
    import pandas

    with open(_os.path.join(index_path, "_pq_codebooks.json")) as f:
        meta = _json.load(f)
    C = [np.array(cb, dtype="float64") for cb in meta["codebooks"]]
    m = len(C)
    dsub = C[0].shape[1]
    # residual-PQ indexes persist their normalized centroids; a legacy
    # flat-PQ index (no cnorm) degrades to a zero offset
    CN = {
        int(c): np.asarray(vec, dtype="float64")
        for c, vec in meta.get("cnorm", {}).items()
    }
    n_short = shortlist if shortlist is not None else 4 * k

    cents = [
        (int(r["sid"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(f"{index_path}/centroids").collect()
    ]
    cents.sort(key=lambda t: t[0])

    qv = as_double_array(F.col(qvec_col))
    q = queries_df.select(
        F.col(qid_col),
        qv.alias("_qv"),
        F.transform(qv, lambda x: x / safe_norm(qv)).alias("_qvn"),
        F.explode(
            F.slice(_ivf_sorted_cells(F.col(qvec_col), cents), 1, probes)
        ).alias("_pcell"),
    ).localCheckpoint(eager=False)  # |queries| x probes rows, used THREE
    # times (probe-cell collect, ADC broadcast, re-rank broadcast) —
    # without this each use re-runs the probe-order pandas_udf over the
    # queries. LAZY: the probe-cell collect right below is the
    # materializing action (guide §1.5 — the eager variant paid one
    # extra job per search just to fill the checkpoint)
    probe_cells = sorted(
        {r["_pcell"] for r in q.select("_pcell").distinct().collect()}
    )

    # stage 2: codes-only pruned scan (column pruning keeps `vec` out
    # of this ReadSchema — asserted in tests/test_ann_recall.py)
    codes_scan = (
        spark.read.parquet(f"{index_path}/vectors")
        .filter(F.col("cell").isin(probe_cells))
        .select(id_col, "codes", "cell")
    )
    cand = codes_scan.join(
        F.broadcast(q.select(qid_col, "_qvn", "_pcell")),
        F.col("cell") == F.col("_pcell"),
    )
    if exclude_self:
        # assumes queries share the corpus id space (the
        # query-the-corpus-against-itself shape); pass
        # exclude_self=False when qids come from a DIFFERENT id
        # space, or a corpus vector numerically equal to a qid would
        # be silently dropped from that query's results
        cand = cand.filter(F.col(id_col) != F.col(qid_col))

    out_schema = f"{qid_col} bigint, {id_col} bigint, adc_dist double"

    def _adc_it(batches):
        """Score candidates WHERE THE CODES LIVE: the broadcast join
        preserves the pruned scan's partitioning, so this Arrow pass
        runs per cell directory with NO shuffle of the candidate set
        (the former groupBy(qid, cell).applyInPandas moved every
        candidate row once just to build per-group distance tables —
        at 100 TB that shuffle is |candidates|-sized). Each batch
        groups by (qid, cell) in-memory; the m x ksub table per group
        is microseconds, so locality wins outright."""
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for (qv_key, cell), g in pdf.groupby([qid_col, "cell"], sort=False):
                # residual query: the codes quantize (x_n - cnorm(cell)),
                # so the table is built from (q_n - cnorm(cell)) per
                # (query, cell) group
                qn = np.asarray(g["_qvn"].iloc[0], dtype="float64")
                qr = qn - CN.get(int(cell), 0.0)
                dt = np.stack(
                    [
                        ((C[s] - qr[s * dsub : (s + 1) * dsub]) ** 2).sum(axis=1)
                        for s in range(m)
                    ]
                )
                A = np.stack(g["codes"].to_numpy()).astype("int64")
                tot = np.zeros(A.shape[0])
                for s in range(m):  # fixed fold order: deterministic sums
                    tot += dt[s][A[:, s]]
                outs.append(
                    pandas.DataFrame(
                        {
                            qid_col: g[qid_col].to_numpy(),
                            id_col: g[id_col].to_numpy(),
                            "adc_dist": tot,
                        }
                    )
                )
            yield pandas.concat(outs, ignore_index=True)

    adc = cand.select(qid_col, id_col, "cell", "codes", "_qvn").mapInPandas(
        _adc_it, out_schema
    )
    w_short = Window.partitionBy(qid_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    short = (
        adc.withColumn("_rnk", F.row_number().over(w_short))
        .filter(F.col("_rnk") <= n_short)
        .select(qid_col, id_col)
    )

    # stage 3: exact cosine over the shortlist's full vectors only
    vec_scan = (
        spark.read.parquet(f"{index_path}/vectors")
        .filter(F.col("cell").isin(probe_cells))
        .select(id_col, "vec")
    )
    # a DEFAULT shortlist (4k/query) broadcasts in KB-MB; an
    # oracle-style all-covering shortlist is |candidates|-sized and
    # must NOT be forced through the broadcast path — let AQE pick
    # (it still broadcasts when the realized size is small)
    short_side = F.broadcast(short) if n_short <= 65_536 else short
    reranked = (
        vec_scan.join(short_side, id_col)
        .join(
            F.broadcast(q.select(qid_col, "_qv").distinct()), qid_col
        )
        .select(
            qid_col,
            id_col,
            F.round(cosine_pairs_score(F.col("vec"), F.col("_qv")), 6).alias(
                "score"
            ),
        )
        # a crash-replayed ivf_pq_index_append can leave duplicate
        # (id, vec) rows in a cell; identical duplicates must not
        # occupy two top-k slots
        .dropDuplicates([qid_col, id_col])
    )
    w_final = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        reranked.withColumn("_rnk", F.row_number().over(w_final))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )


def ivf_pq_index_append(
    spark,
    index_path: str,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to a persisted ``ivf_pq_index_build``
    index: assign against the EXISTING centroids, encode residuals with
    the EXISTING codebooks (both control-plane reads, KB-scale), and
    append to the matching ``cell=`` partitions — maintenance cost is
    O(|new batch|) regardless of index size, searches pick the rows up
    immediately. Same rebuild trigger as ``ivf_index_append``: re-train
    when drift degrades recall, not for storage reasons.
    ``ivf_index_compact`` applies unchanged to this layout (the codes
    column rides the rewrite).

    Entry recovers both swap paths — see ``ivf_index_append``: an
    append into a crashed rebuild's rename window would otherwise
    orphan the committed index in ``.old`` and the next recover would
    delete it."""
    import json as _json
    import os as _os

    from activedatawarehouseprototype_spark.operators.warehouse import (
        recover_swap,
    )

    recover_swap(f"{index_path}/vectors")
    recover_swap(f"{index_path}/centroids")
    with open(_os.path.join(index_path, "_pq_codebooks.json")) as f:
        meta = _json.load(f)
    cents = [
        (int(r["sid"]), [float(x) for x in r["centroid"]])
        for r in spark.read.parquet(f"{index_path}/centroids").collect()
    ]
    cents.sort(key=lambda t: t[0])
    assigned = ivf_assign(
        df, k=len(cents), id_col=id_col, vec_col=vec_col, centroids=cents
    )
    # same fused normalize -> residual -> encode pass as the build (no
    # shuffle, one Arrow pass), against the PERSISTED cnorm/codebooks
    # so append-time encodings cannot drift from build-time ones
    (
        _fused_residual_codes(
            assigned,
            {int(c): vec for c, vec in meta.get("cnorm", {}).items()},
            meta["codebooks"],
            id_col=id_col,
            vec_col=vec_col,
        )
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{index_path}/vectors")
    )


def ivf_pq_index_rebuild(
    spark,
    index_path: str,
    min_appended_fraction: float = 0.25,
    iters: int = 4,
    pq_iters: int = 8,
    pq_sample_n: int = 4096,
    id_col: str = "vec_id",
    force: bool = False,
) -> dict:
    """Drift-triggered retrain of the FUSED IVF+PQ index — the
    production-layout twin of ``ivf_index_rebuild``: same growth
    trigger (``_build_meta.json``), but a triggered rebuild retrains
    BOTH quantizers from the index's own stored raw vectors (kept for
    the exact re-rank stage, which is what makes self-rebuild
    possible): new k-means cells, new normalized-centroid residual
    basis, new PQ codebooks, and a full re-encode — k / m / ksub are
    carried over from the existing index.

    Mechanics: the retrain is a full ``ivf_pq_index_build`` into a
    scratch dir off the stored vectors, then vectors and centroids
    swap in via the crash-safe protocol and the codebooks JSON +
    build meta replace atomically (``os.replace``). Crash windows
    mirror ``ivf_index_rebuild``: after the vector commit, stale
    sidecars mean degraded-recall ADC shortlists — never an error
    (the exact re-rank stage keeps returned scores correct) — and the
    un-advanced meta keeps the trigger armed, so re-running rebuild
    converges. Cost when triggered is a full rebuild — the honest
    price of new geometry AND new codebooks; below the trigger it is
    one footer count.

    Returns the same ``{"rebuilt", "n_rows", "n_at_build", "k"}``
    control-plane dict."""
    import json as _json
    import os as _os
    import shutil as _shutil

    from activedatawarehouseprototype_spark.operators.warehouse import (
        commit_swap,
        recover_swap,
    )

    vec_path = f"{index_path}/vectors"
    cent_path = f"{index_path}/centroids"
    recover_swap(vec_path)
    # the centroids table is commit_swap'd below, so its crash windows
    # must be recovered here too — a crash between commit_swap's two
    # renames otherwise leaves centroids missing with an .old sibling
    # and wedges every search AND this very function's k readback
    # (round-11 ADVICE)
    recover_swap(cent_path)
    cur = spark.read.parquet(vec_path)
    n_now = cur.count()
    if n_now == 0:
        raise ValueError(
            f"ivf_pq_index_rebuild: empty vectors table at {vec_path}"
        )
    meta_path = _os.path.join(index_path, "_build_meta.json")
    try:
        with open(meta_path) as f:
            n_base = int(_json.load(f)["n_rows_at_build"])
    except (FileNotFoundError, ValueError, KeyError):
        # pre-sidecar index, lost sidecar, or a torn file from a
        # pre-atomic writer — same recovery as ivf_index_rebuild
        n_base = int(n_now)
        _atomic_json_write(meta_path, {"n_rows_at_build": n_base})
    if n_base <= 0:
        raise ValueError(f"corrupt build meta at {meta_path}: {n_base}")
    k = spark.read.parquet(cent_path).count()
    if not force and (n_now - n_base) / n_base < min_appended_fraction:
        return {
            "rebuilt": False,
            "n_rows": int(n_now),
            "n_at_build": n_base,
            "k": int(k),
        }
    with open(_os.path.join(index_path, "_pq_codebooks.json")) as f:
        pq_meta = _json.load(f)
    scratch = f"{index_path}/.rebuild"
    if _os.path.exists(scratch):  # leftover from a crashed rebuild
        _shutil.rmtree(scratch)
    ivf_pq_index_build(
        cur.select(id_col, "vec"),
        scratch,
        k=int(k),
        iters=iters,
        m=int(pq_meta["m"]),
        ksub=int(pq_meta["ksub"]),
        pq_iters=pq_iters,
        pq_sample_n=pq_sample_n,
        id_col=id_col,
        vec_col="vec",
    )
    # vectors first (crash-safe swap), then the small sidecars — see
    # the crash-window note in the docstring
    commit_swap(vec_path, f"{scratch}/vectors")
    commit_swap(cent_path, f"{scratch}/centroids")
    _os.replace(
        _os.path.join(scratch, "_pq_codebooks.json"),
        _os.path.join(index_path, "_pq_codebooks.json"),
    )
    _os.replace(_os.path.join(scratch, "_build_meta.json"), meta_path)
    _shutil.rmtree(scratch, ignore_errors=True)
    return {
        "rebuilt": True,
        "n_rows": int(n_now),
        "n_at_build": n_base,
        "k": int(k),
    }


def mine_hard_negatives(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    positives_df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    guard_positive_floor: bool = False,
    overfetch: int | None = None,
    centroids: "list[tuple[int, list[float]]] | None" = None,
) -> DataFrame:
    """Per-query hard-negative mining for retrieval training data
    (the DPR/ANCE recipe): for every query, the ``k`` most
    cosine-similar corpus items that are NOT that query's labeled
    positives — the informative negatives uniform sampling never
    finds. Input: the corpus (id, vec), queries (qid, qvec), and the
    labeled positives as (qid, id) pairs. Output: (qid, vec_id,
    score, rank) with rank 1..k per query.

    ``guard_positive_floor=True`` additionally drops candidates that
    score ABOVE the query's weakest labeled positive — the standard
    false-negative guard: a "negative" the encoder ranks above a
    known positive is far more likely an unlabeled positive than a
    useful training signal (Qu et al., RocketQA). Queries with no
    labeled positive keep all candidates (no floor to apply).

    ``overfetch`` sets the candidate depth fetched per query BEFORE
    positives/floor drops; default k+P plain, 2k+P with the guard
    (floor drops come out of the same shortlist). A query can return
    FEWER than k rows when more than ``overfetch - k`` of its
    shortlist is dropped — with the guard that many above-floor
    "negatives" is itself a label-noise signal worth surfacing, not
    papering over; raise ``overfetch`` to dig deeper.

    Plan shape (one job, no per-query work): candidates come from the
    batch IVF plan (``ivf_topk_for_queries`` — corpus scanned once,
    queries join broadcast on cell id) fetched at depth k + P where
    P = max positives per query (one bounded scalar agg); positives
    are removed with a broadcast anti-join on (qid, id); the floor
    guard is one broadcast semi-computation per qid (min positive
    score); final rank is one per-qid window. Everything downstream
    of the IVF scan is sized by |queries|·(k+P), never by |corpus|.

    Ids: the underlying batch plan drops candidates whose corpus id
    EQUALS the query id (the self-match rule every ANN entry here
    shares) — keep query ids and corpus ids in disjoint ranges, as a
    retrieval dataset naturally does.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # P: bounded control-plane scalar (one row) — how deep to overfetch
    # so that dropping positives still leaves k candidates
    pmax_row = (
        positives_df.groupBy(qid_col)
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    pmax = int(pmax_row or 0)
    if overfetch is None:
        overfetch = (2 * k if guard_positive_floor else k) + pmax
    if overfetch < k + pmax:
        raise ValueError(
            f"overfetch must be >= k + max-positives-per-query "
            f"({k} + {pmax}), got {overfetch}"
        )
    cand = ivf_topk_for_queries(
        corpus_df,
        queries_df,
        k=overfetch,
        n_centroids=n_centroids,
        probes=probes,
        id_col=id_col,
        vec_col=vec_col,
        qid_col=qid_col,
        qvec_col=qvec_col,
        centroids=centroids,
    )
    pos = positives_df.select(qid_col, id_col).distinct()
    negs = cand.join(F.broadcast(pos), [qid_col, id_col], "left_anti")
    if guard_positive_floor:
        pos_scored = (
            pos.join(
                corpus_df.select(
                    F.col(id_col), as_double_array(F.col(vec_col)).alias("_pv")
                ),
                id_col,
            )
            .join(
                queries_df.select(
                    F.col(qid_col), as_double_array(F.col(qvec_col)).alias("_qv")
                ),
                qid_col,
            )
            .groupBy(qid_col)
            .agg(
                F.min(
                    F.round(cosine_pairs_score(F.col("_pv"), F.col("_qv")), 6)
                ).alias("_floor")
            )
        )
        negs = negs.join(F.broadcast(pos_scored), qid_col, "left").filter(
            F.col("_floor").isNull() | (F.col("score") <= F.col("_floor"))
        ).drop("_floor")
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        negs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, id_col, "score", F.col("rank").cast("int"))
    )


def contrastive_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    pos_threshold: float = 0.9,
    neg_threshold: float = 0.5,
    neg_mod: int = 3,
) -> DataFrame:
    """Contrastive training-pair mining over an embedding corpus:
    POSITIVES are same-bucket pairs with cosine >= ``pos_threshold``
    (near-duplicates / paraphrases — label 1); HARD NEGATIVES are
    same-bucket pairs with cosine < ``neg_threshold`` (same coarse
    sign-LSH region yet dissimilar — the informative negatives random
    sampling misses — label 0), deterministically thinned to
    1/``neg_mod`` by ``(id_a + id_b) % neg_mod == 0`` so the negative
    side stays a bounded multiple of the positive side.

    Returns (id_a, id_b, score, label). Same scale bound as the
    near-dup pass it extends: candidates are Σ_b |bucket_b|², never
    |corpus|²; raise ``n_planes`` as the corpus grows. One bucket
    self-join serves both labels (single scan of the pair stream).
    """
    b = df.select(
        F.col(id_col),
        as_double_array(F.col(vec_col)).alias("_v"),
        random_hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cosine_pairs_score(F.col("a._v"), F.col("b._v")), 6).alias(
            "score"
        ),
    )
    return pairs.filter(
        (F.col("score") >= pos_threshold)
        | (
            (F.col("score") < neg_threshold)
            & ((F.col("id_a") + F.col("id_b")) % neg_mod == 0)
        )
    ).select(
        "id_a",
        "id_b",
        "score",
        F.when(F.col("score") >= pos_threshold, 1)
        .otherwise(0)
        .cast("int")
        .alias("label"),
    )
