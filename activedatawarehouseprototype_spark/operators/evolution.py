"""Schema-evolution reader: one DataFrame over parquet snapshots whose
schemas DRIFTED — columns added over time, integer/float types
widened, columns renamed.

Why this is warehouse-core at 100 TB: a table written continuously for
years is never one schema. Spark's ``mergeSchema`` handles ADDED
columns but refuses type conflicts (int32 file vs int64 file fails the
read), and nothing handles renames. Table formats solve this with
column-mapping metadata (Delta column mapping, Iceberg schema
evolution by field id); this module is the plain-parquet equivalent:
explicit renames + automatic SAFE widening + NULL-fill for missing
columns.

Semantics per snapshot:
- ``renames`` (old -> new) apply first — the caller's column-mapping
  metadata, exactly like a table format's rename log.
- The unified schema is the BY-NAME union. Types unify by widening
  ONLY along value-preserving ladders: byte < short < int < long
  among integrals, float < double among fractionals, and integral
  + fractional -> double (the SQL numeric-promotion rule). Anything
  else (string vs int, timestamp vs long, ...) raises with the column
  and both types — silent coercion is how a warehouse corrupts
  history.
- Columns a snapshot lacks come back as typed NULLs.

Plan shape: each snapshot is its own pruned parquet scan + a
projection (casts / NULL literals), unioned by name — NO shuffle, NO
UDF; column pruning pushes through the per-snapshot selects into each
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_LADDER = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()]
_FRAC_LADDER = [T.FloatType(), T.DoubleType()]


def _widen(a: T.DataType, b: T.DataType, col: str) -> T.DataType:
    if a == b:
        return a
    if a in _INT_LADDER and b in _INT_LADDER:
        return _INT_LADDER[max(_INT_LADDER.index(a), _INT_LADDER.index(b))]
    if a in _FRAC_LADDER and b in _FRAC_LADDER:
        return _FRAC_LADDER[max(_FRAC_LADDER.index(a), _FRAC_LADDER.index(b))]
    if (a in _INT_LADDER and b in _FRAC_LADDER) or (
        a in _FRAC_LADDER and b in _INT_LADDER
    ):
        return T.DoubleType()
    raise ValueError(
        f"read_evolved: column {col!r} has irreconcilable types across "
        f"snapshots: {a.simpleString()} vs {b.simpleString()} — only "
        f"integral/fractional widening is value-preserving; fix the "
        f"rename map or migrate the snapshot"
    )


def read_evolved(
    spark: SparkSession,
    paths: "list[str]",
    renames: "dict[str, str] | None" = None,
) -> DataFrame:
    """Union the snapshots at ``paths`` into one DataFrame under the
    widened by-name schema. Column order follows first appearance
    across snapshots (oldest snapshot first keeps stable layouts)."""
    if not paths:
        raise ValueError("read_evolved: no snapshot paths")
    ren = renames or {}
    dfs = []
    unified: "dict[str, T.DataType]" = {}
    for p in paths:
        df = spark.read.parquet(p)
        for old, new in ren.items():
            if old in df.columns:
                if new in df.columns:
                    raise ValueError(
                        f"read_evolved: rename {old!r} -> {new!r} collides "
                        f"with an existing column in {p}"
                    )
                df = df.withColumnRenamed(old, new)
        for f in df.schema.fields:
            unified[f.name] = (
                _widen(unified[f.name], f.dataType, f.name)
                if f.name in unified
                else f.dataType
            )
        dfs.append(df)
    cols = list(unified)
    out = None
    for df in dfs:
        have = set(df.columns)
        proj = df.select(
            *[
                (
                    F.col(c).cast(unified[c])
                    if c in have
                    else F.lit(None).cast(unified[c])
                ).alias(c)
                for c in cols
            ]
        )
        out = proj if out is None else out.unionByName(proj)
    return out
