"""Named query corpus: every implemented operator gets a (spark_fn, oracle_sql) pair.

``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES[name]`` is the ANSI-SQL twin DuckDB runs over the same
parquet (driver contract, ``/root/repo/__spark_entry__.py``). Names,
aliases and rounding are kept identical on both sides because the
driver compares sorted-by-name columns via order-insensitive
value-hash.

Float discipline: any aggregate whose value depends on summation order
(sum/avg over doubles) is ROUNDed identically on both sides — Spark and
DuckDB both parallelize, so last-ulp results are nondeterministic run
to run; rounding makes the hash stable without weakening the check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Import for side effects: each module registers its queries.
from activedatawarehouseprototype_spark.corpus import rule_engine  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import relational  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import scalar_fns  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import extensions  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import temporal  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import analytics  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import udfs  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import stats  # noqa: E402,F401
