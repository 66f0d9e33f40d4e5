"""Benchmark runner (driver contract): times the headline corpus
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully executed via the no-op sink (all partitions
computed, nothing collected to the driver) — measuring engine
throughput, not toPandas serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from activedatawarehouseprototype_spark.corpus import QUERIES  # noqa: E402
from activedatawarehouseprototype_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "rule_tumbling_avg",
    "rule_sliding_max",
    "rule_per_event_avg",
    "rule_count_tumbling",
    "rule_union_alerts",
    "tpch_q1_pricing_summary",
    "join_revenue_by_nation",
    "topk_customers_by_spend",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="adw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM/codegen paths outside the timed region.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_corpus_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
