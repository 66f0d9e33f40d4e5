"""Integer-lattice Lloyd k-means: bit-reproducible distributed
clustering.

``similarity.ivf_kmeans_centroids`` is the production float trainer —
its per-cell means depend on float summation order, which is fine for
centroid QUALITY but means two runs (or two engines) can disagree in
the last ulp and flip a boundary point's label. For reproducible
training-data pipelines (and for an exact cross-engine oracle) this
module runs Lloyd entirely on an integer lattice:

* vectors are quantized once: ``q_d = floor(x_d * scale)`` (floor, not
  round — round-half ties on dyadic inputs are resolved differently by
  different engines; floor of an exact IEEE product is unambiguous);
* distances are exact BIGINT sums of squared diffs;
* ties in the argmin break on the lower centroid id;
* centroid updates are exact floor divisions ``S_d // n`` of exact
  BIGINT sums — no float enters the recurrence, so ANY engine
  (Spark, DuckDB, a laptop) replays the identical trajectory;
* empty cells keep their previous centroid.

100 TB shape (same as the float trainer): the assignment is ONE
codegen projection per iteration — centroids are k*d literals, no
join, no shuffle; the update is posexplode → groupBy(cell, pos) →
SUM/COUNT, one shuffle of skinny rows with map-side partial
aggregation reducing to <= partitions * k * d shuffle rows; the only
collect is k*d running-sum cells per iteration (control plane, never
the corpus). Centroids drop into ``ivf_assign(..., centroids=...)``
after de-quantization (divide by scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(vec_col: Column, scale: int) -> Column:
    return F.transform(
        vec_col, lambda x: F.floor(x * F.lit(float(scale))).cast("long")
    )


def _sq_dist(q: Column, centroid: list[int]) -> Column:
    cv = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(q, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _best_cell(q: Column, cents: list[tuple[int, list[int]]]) -> Column:
    """argmin over centroids of (exact dist, cid) — one codegen
    expression, lexicographic struct least() gives the tie-break."""
    return F.least(
        *[
            F.struct(
                _sq_dist(q, cv).alias("d"),
                F.lit(int(cid)).cast("int").alias("cid"),
            )
            for cid, cv in cents
        ]
    )["cid"]


def kmeans_lattice(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10_000,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Run ``iters`` rounds of (assign, update) from the k lowest-id
    quantized vectors, then assign once against the final centroids.

    Returns ``(assignments, centroids)``: assignments is the input df
    plus a ``cluster_id`` int column (lazy — one codegen projection
    over the final centroid literals); centroids is the
    ``[(cid, [int lattice coords])]`` control-plane list. De-quantize
    with ``[c / scale for c in cv]`` to feed ``ivf_assign``."""
    if k < 1 or iters < 0:
        raise ValueError("kmeans_lattice: k >= 1 and iters >= 0 required")
    q = _quantize(F.col(vec_col), scale)
    cents: list[tuple[int, list[int]]] = [
        (j, [int(x) for x in r["_q"]])
        for j, r in enumerate(
            df.select(F.col(id_col), q.alias("_q"))
            .orderBy(id_col)
            .limit(k)
            .collect()  # bounded: k rows (control plane)
        )
    ]
    if len(cents) < k:
        # F.least over a short centroid list would silently train a
        # smaller k; fewer points than clusters is a caller bug
        raise ValueError(
            f"kmeans_lattice: k={k} but only {len(cents)} input vectors"
        )
    # Quantize ONCE into a skinny persisted projection: without this,
    # every Lloyd iteration re-scans the source (parquet + transform)
    # — iters redundant passes over the corpus at 100 TB. The cached
    # frame is one array column; spill-safe default storage level.
    qdf = df.select(q.alias("_q")).persist()
    try:
        for _ in range(iters):
            sums = (
                qdf.select(
                    _best_cell(F.col("_q"), cents).alias("_cid"), "_q"
                )
                .select("_cid", F.posexplode("_q").alias("_pos", "_x"))
                .groupBy("_cid", "_pos")
                .agg(
                    F.sum("_x").alias("_s"),
                    F.count(F.lit(1)).alias("_n"),
                )
                .collect()  # bounded: k * d cells (control plane)
            )
            by_cid: dict[int, dict[int, tuple[int, int]]] = {}
            for r in sums:
                by_cid.setdefault(int(r["_cid"]), {})[int(r["_pos"])] = (
                    int(r["_s"]),
                    int(r["_n"]),
                )
            cents = [
                (
                    cid,
                    [
                        # Python // is floor division — exactly the
                        # (s - ((s % n) + n) % n) / n the SQL twin runs
                        by_cid[cid][p][0] // by_cid[cid][p][1]
                        if cid in by_cid
                        else cv[p]
                        for p in range(len(cv))
                    ],
                )
                for cid, cv in cents
            ]
    finally:
        qdf.unpersist()
    assigned = df.withColumn("cluster_id", _best_cell(q, cents))
    return assigned, cents
