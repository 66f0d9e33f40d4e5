"""Streaming observability: the reference exposes a gauge for active
rules and a meter for alerts/second via Flink's metric groups
(``DynamicKeyFunction.java:37-40,179-191``,
``DynamicQueryFunction.java:65-66,199``). The Spark-native mirror is
two-layered:

- per-batch values ride ``df.observe`` inside the pipeline
  (``ActivePipeline.metrics`` — ingest count, latency avg/max), and
- query-level progress (rows/sec, batch durations, state size) arrives
  through ``StreamingQueryListener``, captured here.

``PipelineMetricsListener`` keeps a bounded ring of progress snapshots
(driver-side control data), so dashboards/tests can read throughput
without touching the data plane.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class PipelineMetricsListener(StreamingQueryListener):
    """Collects per-batch progress for all streaming queries on the
    session: rows/sec, input rows, batch duration. Bounded ring buffer
    (``keep`` snapshots) — attach with
    ``spark.streams.addListener(listener)``."""

    def __init__(self, keep: int = 256) -> None:
        self.progress: deque = deque(maxlen=keep)
        self.started: list[str] = []
        self.terminated: list[str] = []

    # -- StreamingQueryListener interface ---------------------------------

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:
        pass

    # -- reads --------------------------------------------------------------

    def total_input_rows(self) -> int:
        return sum(p["num_input_rows"] for p in self.progress)
