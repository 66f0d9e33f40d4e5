"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (the reference README's congestion
rule, batch form) over sf0.001. ``queries()``/``oracle_sql()`` — the
full corpus from ``activedatawarehouseprototype_spark.corpus`` (one
entry per implemented operator from SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from activedatawarehouseprototype_spark.corpus import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the congestion-style rule (tumbling AVG + filter box +
    HAVING; reference README.md:102-132) compiled to a DataFrame plan,
    run over /root/testdata/sf0.001 events."""
    from activedatawarehouseprototype_spark.corpus.rule_engine import rule_tumbling_avg

    return rule_tumbling_avg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
