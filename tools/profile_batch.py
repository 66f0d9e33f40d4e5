"""Per-micro-batch profiler for ActivePipeline.process_batch: wall
time + Spark job count per phase, on the exact single-rule workload
bench.py's streaming_events_per_sec measures. Round-7 VERDICT item 3:
find where the ~30% single-rule throughput regression went."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.session import get_spark
from activedatawarehouseprototype_spark.streaming.pipeline import ActivePipeline
from activedatawarehouseprototype_spark.streaming.registry import RuleRegistry

N = int(os.environ.get("N_EVENTS", "1000000"))
BATCHES = int(os.environ.get("N_BATCHES", "2"))


def _events(spark, n):
    import datetime as dt

    base = int(dt.datetime(2024, 1, 1).timestamp())
    return spark.range(n).select(
        (F.col("id") % 5000).cast("int").alias("carId"),
        F.timestamp_seconds(F.lit(base) + F.col("id") / 1000.0).alias("ts"),
        (F.col("id") * 7 % 160).cast("double").alias("speed"),
    )


def main():
    spark = get_spark()
    sc = spark.sparkContext

    def job_count():
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    reg = RuleRegistry()
    reg.apply_json(
        json.dumps(
            {
                "queryId": 1,
                "queryState": "ACTIVE",
                "lastTime": -1,
                "windowMilliseconds": 10000,
                "frequencyMilliseconds": None,
                "groupingKeyNames": ["carId"],
                "windowFilterRules": [
                    {"field": "speed", "operator": ">", "value": "20"}
                ],
                "aggregatorFunctionType": "AVG",
                "limitOperatorType": ">",
                "limit": 120,
                "aggregateFieldName": "speed",
            }
        )
    )
    work = tempfile.mkdtemp(prefix="adw-prof-")
    try:
        pipe = ActivePipeline(spark=spark, registry=reg, work_dir=work)

        # phase instrumentation: wrap the interesting instance methods
        phases: dict[str, list] = {}

        def wrap(name):
            orig = getattr(pipe, name)

            def inner(*a, **kw):
                j0, t0 = job_count(), time.perf_counter()
                out = orig(*a, **kw)
                phases.setdefault(name, []).append(
                    (time.perf_counter() - t0, job_count() - j0)
                )
                return out

            setattr(pipe, name, inner)

        for m in (
            "_update_buffer",
            "_persist_watermarks",
            "_poll_rules_dir",
            "_apply_alert_cooldown",
        ):
            wrap(m)

        ev = _events(spark, N)
        parts = [
            ev.filter(F.col("carId") % BATCHES == i).persist()
            for i in range(BATCHES)
        ]
        for p in parts:
            p.count()
        t_all0, j_all0 = time.perf_counter(), job_count()
        for i, p in enumerate(parts):
            j0, t0 = job_count(), time.perf_counter()
            pipe.process_batch(p, i)
            print(
                f"batch {i}: {time.perf_counter() - t0:.3f}s "
                f"{job_count() - j0} jobs"
            )
        elapsed = time.perf_counter() - t_all0
        print(f"TOTAL: {elapsed:.3f}s, {job_count() - j_all0} jobs, "
              f"{N / elapsed:,.0f} events/s")
        for name, recs in phases.items():
            tot = sum(r[0] for r in recs)
            jobs = sum(r[1] for r in recs)
            print(f"  {name}: {tot:.3f}s {jobs} jobs over {len(recs)} calls")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
