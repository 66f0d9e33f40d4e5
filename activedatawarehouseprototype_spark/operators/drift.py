"""Distribution-drift detection between two slices of a table — the
data-quality gate a training pipeline runs before trusting a new crawl
batch, and a warehouse runs before trusting a new day's load.

Reference parity: the reference engine has no statistical QA tier —
this extends the quality/constraint layer (operators/quality.py) from
"row violates predicate" to "the whole distribution moved". Metrics
are the standard public ones:

- **PSI** (population stability index): Σ (c−r)·ln(c/r) over bins,
  with the industry reading of <0.1 stable / 0.1-0.25 drifting /
  >0.25 shifted.
- **KL divergence** D(current ‖ reference): Σ c·ln(c/r).

Both need binned proportions; bins are FIXED from the reference
slice's [min, max] (equal width) so the same cut points apply to both
sides — data-driven quantile bins would make the metric depend on the
mixture under test. Empty bins are Laplace-smoothed (`eps`) on both
sides, the standard guard against ln(0)/division by zero; the oracle
applies the identical smoothing.

Scale: ONE pass over the union of both slices (a single filter +
group-by on (group, side, bin) with map-side combine), then all
per-bin arithmetic happens on |groups|·|bins| skinny rows — the heavy
data is never shuffled wider than the bin histogram, which is the
same shape at 100 GB and 100 TB. The reference min/max pre-pass is a
second scan of the reference slice only (two scans total, both
column-pruned to (group, value)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_kl_drift(
    df: DataFrame,
    ref_filter: Column,
    cur_filter: Column,
    value_col: str,
    group_cols: list[str] | None = None,
    bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """PSI + KL(current ‖ reference) of ``value_col`` between the rows
    matching ``ref_filter`` and those matching ``cur_filter``, per
    ``group_cols`` slice.

    Output: (*group_cols, n_ref BIGINT, n_cur BIGINT, psi DOUBLE,
    kl DOUBLE), one row per group present in BOTH slices (a group with
    either side empty has no defined proportions — absent, not NaN).
    ``psi``/``kl`` are ROUNDed (order-dependent sums over doubles —
    registry float discipline). NULL values are excluded (they have no
    bin; track NULL-rate drift separately with a constraint). NULL
    GROUP values are excluded too: the geometry/per-bin joins are
    null-strict on the group key, exactly like the SQL twin's USING
    join — pre-coalesce a sentinel if a null slice must be scored
    (pinned by test).

    Bin edges come from the REFERENCE slice's global [min, max] per
    group; current-side values outside that range clamp into the edge
    bins (the standard treatment — out-of-range mass lands in the
    extreme bins and inflates PSI, which is the signal wanted)."""
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    side = (
        F.when(ref_filter, F.lit("r")).when(cur_filter, F.lit("c"))
    )
    src = df.select(
        *groups, v.alias("_v"), side.alias("_side")
    ).filter(F.col("_side").isNotNull() & F.col("_v").isNotNull())

    # pass 1: reference-side bin geometry per group (min/max -> width)
    geo = (
        src.filter(F.col("_side") == "r")
        .groupBy(*groups)
        .agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    )
    j = src.join(F.broadcast(geo), groups) if groups else src.crossJoin(
        F.broadcast(geo)
    )
    # constant reference (hi == lo): everything lands in bin 0 — PSI
    # then measures only out-of-range mass, which is the right signal
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    raw = F.when(
        width > 0, F.floor((F.col("_v") - F.col("_lo")) / width)
    ).otherwise(F.lit(0))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")

    counts = (
        j.groupBy(*groups, F.col("_side"), bin_.alias("_bin"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # pivot the (side, bin) counts to per-bin (ref, cur) pairs; a bin
    # absent on a side contributes 0 before smoothing
    per_bin = (
        counts.groupBy(*groups, "_bin")
        .agg(
            F.sum(F.when(F.col("_side") == "r", F.col("_n")).otherwise(0)).alias("_nr"),
            F.sum(F.when(F.col("_side") == "c", F.col("_n")).otherwise(0)).alias("_nc"),
        )
    )
    totals = per_bin.groupBy(*groups).agg(
        F.sum("_nr").alias("_tr"), F.sum("_nc").alias("_tc")
    )
    jt = (
        per_bin.join(F.broadcast(totals), groups)
        if groups
        else per_bin.crossJoin(F.broadcast(totals))
    )
    e = F.lit(float(eps))
    r_p = F.col("_nr").cast("double") / F.col("_tr") + e
    c_p = F.col("_nc").cast("double") / F.col("_tc") + e
    term_psi = (c_p - r_p) * F.log(c_p / r_p)
    term_kl = c_p * F.log(c_p / r_p)
    out = (
        jt.filter((F.col("_tr") > 0) & (F.col("_tc") > 0))
        .groupBy(*groups)
        .agg(
            F.max("_tr").cast("bigint").alias("n_ref"),
            F.max("_tc").cast("bigint").alias("n_cur"),
            F.round(F.sum(term_psi), round_to).alias("psi"),
            F.round(F.sum(term_kl), round_to).alias("kl"),
        )
    )
    return out
