"""Deterministic, engine-portable sampling & split assignment — the
curation primitives of a training-data pipeline.

``df.sample()`` / ``sampleBy()`` draw from partition-local RNG streams:
the sample changes with partitioning, Spark version, and engine — which
is exactly wrong for corpus curation, where a document must land in the
same split on every run of every tool that touches the corpus
(otherwise train/test contamination creeps in across pipeline
versions). Hash sampling fixes that: the decision is a pure function of
the row's key.

fraction(key) = int(first 8 hex chars of md5(salt:key)) / 2^32 — a
uniform [0,1) value reproducible in any engine with md5 (the DuckDB
oracle recomputes it verbatim). Changing ``salt`` draws an independent
sample; overlapping rates nest (rate 0.1 ⊂ rate 0.2 for the same salt),
which gives consistent corpus scaling ("train on 10%, then grow to
20%" keeps the first 10%).

Scale: a pure per-row filter/projection — no shuffle, no RNG state, no
driver involvement; md5 cost is ~the cost of reading the key bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO_32 = float(1 << 32)


def hash_fraction(key_cols: list[str], salt: str = "s1") -> Column:
    """Uniform [0,1) fraction, a pure function of (salt, key columns)."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    hex8 = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), key).cast("binary")), 1, 8
    )
    return F.conv(hex8, 16, 10).cast("double") / F.lit(_TWO_32)


def deterministic_sample(
    df: DataFrame, rate: float, key_cols: list[str], salt: str = "s1"
) -> DataFrame:
    """Keep ~rate of rows, decided per-key: stable across runs,
    partitionings, and engines; samples at different rates nest."""
    return df.filter(hash_fraction(key_cols, salt) < rate)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_cols: list[str],
    default_rate: float = 0.0,
    salt: str = "s1",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing /
    source-re-weighting primitive ("keep 100% of books, 10% of
    common-crawl"). Same hash-fraction decision as
    ``deterministic_sample``, so per-stratum samples are stable across
    runs and nest across rate changes; strata not named in ``rates``
    fall back to ``default_rate``."""
    frac = hash_fraction(key_cols, salt)
    rate = F.lit(float(default_rate))
    for name, r in rates.items():
        rate = F.when(F.col(strata_col) == name, float(r)).otherwise(rate)
    return df.filter(frac < rate)


def assign_split(
    key_cols: list[str],
    weights: dict[str, float] | None = None,
    salt: str = "s1",
) -> Column:
    """Split label column (e.g. train/val/test) from cumulative weight
    thresholds over the hash fraction. Weights must sum to 1."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    frac = hash_fraction(key_cols, salt)
    expr = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w
        expr = (
            F.when(frac < cum, name)
            if expr is None
            else expr.when(frac < cum, name)
        )
    last = items[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)
