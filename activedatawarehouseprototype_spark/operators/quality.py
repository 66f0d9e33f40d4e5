"""Declarative data-quality constraints over DataFrames — the
expectations layer (Delta CHECK constraints / dbt tests analogue)
a warehouse needs before data is trusted downstream.

A constraint set is data, not code: a list of (name, kind, params)
rows, so rule sets can live in config/tables the same way the ECA
rules do. ``check_constraints`` compiles the whole set into ONE pass:

- row-level kinds (``not_null``, ``accepted_values``, ``in_range``,
  ``matches_regex``, ``expression``) become sum-of-violations
  aggregates in a single scan (one job, no shuffle beyond the final
  1-row agg);
- ``unique`` needs its own groupBy per key set (a shuffle each) —
  the unavoidable cost of a uniqueness proof at scale.

Returns one row per constraint: (constraint, kind, violations,
passed). ``enforce`` filters the offending rows out instead
(quarantine pattern), returning (clean, violations) frames.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from activedatawarehouseprototype_spark.session import local_rows_df
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    kind: str  # not_null | accepted_values | in_range | matches_regex | expression | unique
    column: str | None = None
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    expr: str | None = None
    keys: tuple = ()

    def validate(self) -> None:
        """Fail at DECLARATION time, not mid-scan: every kind names its
        required params; a constraint set is config, and config errors
        should not surface as AnalysisExceptions three jobs later."""
        needs_col = self.kind in (
            "not_null", "accepted_values", "in_range", "matches_regex"
        )
        if needs_col and not self.column:
            raise ValueError(f"constraint {self.name!r} ({self.kind}) needs a column")
        if self.kind == "accepted_values" and not self.values:
            raise ValueError(
                f"constraint {self.name!r}: accepted_values needs a non-empty "
                f"values tuple (empty would reject every row)"
            )
        if self.kind == "in_range" and self.lo is None and self.hi is None:
            raise ValueError(
                f"constraint {self.name!r}: in_range needs lo and/or hi"
            )
        if self.kind == "matches_regex" and not self.pattern:
            raise ValueError(f"constraint {self.name!r}: matches_regex needs a pattern")
        if self.kind == "expression" and not self.expr:
            raise ValueError(f"constraint {self.name!r}: expression needs expr")
        if self.kind == "unique" and not self.keys:
            raise ValueError(f"constraint {self.name!r}: unique needs keys")
        if self.kind not in (
            "not_null", "accepted_values", "in_range", "matches_regex",
            "expression", "unique",
        ):
            raise ValueError(f"unknown constraint kind {self.kind!r}")

    def violation_pred(self):
        """Row-level violation predicate (None for ``unique``)."""
        c = F.col(self.column) if self.column else None
        if self.kind == "not_null":
            return c.isNull()
        if self.kind == "accepted_values":
            return c.isNull() | ~c.isin(list(self.values))
        if self.kind == "in_range":
            pred = F.lit(False)
            if self.lo is not None:
                pred = pred | (c < self.lo)
            if self.hi is not None:
                pred = pred | (c > self.hi)
            return c.isNull() | pred
        if self.kind == "matches_regex":
            return c.isNull() | ~c.rlike(self.pattern)
        if self.kind == "expression":
            # NULL must count as a violation like every other kind: a
            # bare ~expr yields NULL for NULL inputs, which sum() and
            # when() silently skip — rows dodging the check via NULL
            # would flow downstream untagged
            return ~F.coalesce(F.expr(self.expr), F.lit(False))
        if self.kind == "unique":
            return None
        raise ValueError(f"unknown constraint kind {self.kind!r}")


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """One row per constraint: (constraint, kind, violations, passed).
    All row-level constraints share a single scan."""
    spark = df.sparkSession
    for c in constraints:
        c.validate()
    row_level = [c for c in constraints if c.kind != "unique"]
    uniques = [c for c in constraints if c.kind == "unique"]

    results = []
    if row_level:
        aggs = [
            F.sum(c.violation_pred().cast("bigint")).alias(c.name)
            for c in row_level
        ]
        row = df.agg(*aggs).collect()[0]
        for c in row_level:
            n = int(row[c.name] or 0)
            results.append((c.name, c.kind, n))
    for c in uniques:
        n = (
            df.groupBy(*c.keys)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.sum(F.col("count") - 1).alias("v"))
            .collect()[0]["v"]
        )
        results.append((c.name, "unique", int(n or 0)))
    out = local_rows_df(
        spark, results, "constraint string, kind string, violations bigint"
    ).withColumn("passed", F.col("violations") == 0)
    # preserve declaration order for stable output
    order = {c.name: i for i, c in enumerate(constraints)}
    mapping = F.create_map(
        *[x for name, i in order.items() for x in (F.lit(name), F.lit(i))]
    )
    return out.orderBy(mapping[F.col("constraint")])


def enforce(
    df: DataFrame, constraints: list[Constraint]
) -> tuple[DataFrame, DataFrame]:
    """Quarantine pattern: split rows into (clean, violating) by the
    ROW-LEVEL constraints (``unique`` has no per-row blame without a
    keeper policy — dedupe upstream). The violating frame carries a
    ``violated`` array naming the failed constraints."""
    for c in constraints:
        c.validate()
    row_level = [c for c in constraints if c.kind != "unique"]
    if not row_level:
        return df, df.limit(0).withColumn(
            "violated", F.array().cast("array<string>")
        )
    flags = F.array_compact(
        F.array(
            *[
                F.when(c.violation_pred(), F.lit(c.name))
                for c in row_level
            ]
        )
    )
    tagged = df.withColumn("violated", flags)
    clean = tagged.filter(F.size("violated") == 0).drop("violated")
    bad = tagged.filter(F.size("violated") > 0)
    return clean, bad
