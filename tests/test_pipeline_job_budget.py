"""Per-micro-batch Spark JOB budget (round-7 VERDICT item 3): the
round-6 throughput regression was per-batch constant overhead, fixed
by riding the max-ts on the buffer write's Observation and folding the
fired count into the watermark agg. These tests pin the job counts so
the overhead can't silently creep back — `tools/profile_batch.py` is
the matching measurement tool.

Budgets (steady state, optional stages off):
- idle pipeline (no active rules): 2 jobs — buffer write + buffer
  schema read.
- one rule, nothing matches (evals empty): 4 jobs — buffer write,
  schema read, eval materialization (isEmpty on the persisted evals),
  watermark agg.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.streaming.pipeline import ActivePipeline
from activedatawarehouseprototype_spark.streaming.registry import RuleRegistry


def _jobs(spark) -> int:
    return int(spark.sparkContext._jsc.sc().dagScheduler().nextJobId())


def _batch(spark, n=50, speed=10.0):
    return spark.createDataFrame(
        [(1, 1_000 + i, speed) for i in range(n)],
        "carId int, ms long, speed double",
    ).select("carId", F.timestamp_millis("ms").alias("ts"), "speed")


def test_idle_pipeline_two_jobs_per_batch(spark, tmp_path):
    pipe = ActivePipeline(
        spark=spark, registry=RuleRegistry(), work_dir=str(tmp_path / "wk")
    )
    pipe.process_batch(_batch(spark), 0)  # warm-up (committer init etc.)
    j0 = _jobs(spark)
    pipe.process_batch(_batch(spark), 1)
    assert _jobs(spark) - j0 <= 2, (
        f"idle micro-batch ran {_jobs(spark) - j0} jobs (budget: 2 — "
        "buffer write + schema read); a job crept onto the idle path"
    )


def test_single_rule_no_match_four_jobs_per_batch(spark, tmp_path):
    reg = RuleRegistry()
    reg.apply_json(
        json.dumps(
            {
                "queryId": 1,
                "queryState": "ACTIVE",
                "lastTime": -1,
                "windowMilliseconds": 10_000,
                "frequencyMilliseconds": None,
                "groupingKeyNames": ["carId"],
                # filter matches nothing: evals stay empty, the
                # steady-state floor is visible
                "windowFilterRules": [
                    {"field": "speed", "operator": ">", "value": "1e9"}
                ],
                "aggregatorFunctionType": "AVG",
                "limitOperatorType": ">",
                "limit": 0,
                "aggregateFieldName": "speed",
            }
        )
    )
    pipe = ActivePipeline(
        spark=spark, registry=reg, work_dir=str(tmp_path / "wk")
    )
    pipe.process_batch(_batch(spark), 0)  # warm-up
    pipe.process_batch(_batch(spark), 1)  # steady state reached
    j0 = _jobs(spark)
    pipe.process_batch(_batch(spark), 2)
    assert _jobs(spark) - j0 <= 4, (
        f"single-rule no-emission micro-batch ran {_jobs(spark) - j0} "
        "jobs (budget: 4 — buffer write, schema read, eval "
        "materialization, watermark agg); see tools/profile_batch.py"
    )
