"""Rule-ingestion seam (S1/S3): the pipeline consumes rule JSON lines
through one small interface so transports are swappable without
touching the evaluation loop.

The reference consumes rules from a Kafka ``rules`` topic
(``App.java:34-43``) and publishes spawned children back to it
(``common/KafkaSender.java:34-54``). This sandbox has no Kafka broker,
so the default transport is a watched directory of JSON files — the
same wire schema (one rule JSON object per line), the same at-start-of-
batch delivery semantics. ``KafkaRuleSource`` documents the drop-in
swap: it is the identical ``poll()`` contract over a Kafka consumer.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


class RuleSource:
    """One method: ``poll()`` returns the rule JSON lines that arrived
    since the previous poll (empty list when none). The pipeline calls
    it at the start of every micro-batch and applies each line to the
    registry — transport-agnostic."""

    def poll(self) -> list[str]:  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class DirectoryRuleSource(RuleSource):
    """Watched-directory transport: ``*.json`` files under ``path``,
    one rule JSON object per line; new or modified files are re-read
    (mtime-tracked), so dropping a file registers rules mid-stream."""

    path: str
    _seen: dict[str, float] = field(default_factory=dict)

    def poll(self) -> list[str]:
        if not self.path or not os.path.isdir(self.path):
            return []
        out: list[str] = []
        for fname in sorted(os.listdir(self.path)):
            if not fname.endswith(".json"):
                continue
            fpath = os.path.join(self.path, fname)
            mtime = os.path.getmtime(fpath)
            if self._seen.get(fpath) == mtime:
                continue
            self._seen[fpath] = mtime
            with open(fpath) as f:
                out.extend(line for line in f if line.strip())
        return out


@dataclass
class StaticRuleSource(RuleSource):
    """In-memory transport for tests and programmatic setup: yields the
    given lines exactly once."""

    lines: list[str]
    _drained: bool = False

    def poll(self) -> list[str]:
        if self._drained:
            return []
        self._drained = True
        return list(self.lines)


@dataclass
class KafkaRuleSource(RuleSource):
    """Kafka transport (reference parity, ``App.java:34-43``): poll the
    ``rules`` topic with a plain consumer and return the new message
    values. Requires a broker + the kafka client library, neither of
    which exists in this environment — the class documents the swap
    point and fails loudly if constructed here.

    In a real deployment::

        from kafka import KafkaConsumer  # or confluent_kafka
        consumer = KafkaConsumer(topic, bootstrap_servers=servers,
                                 value_deserializer=bytes.decode)
        # poll() drains consumer.poll(timeout_ms=0) into a list[str]

    (The data-plane events stream would use Spark's native
    ``spark.readStream.format("kafka")`` instead — this seam is only
    the low-volume control plane, which the reference also reads with a
    plain consumer.)
    """

    topic: str = "rules"
    bootstrap_servers: str = "localhost:9092"

    def __post_init__(self) -> None:
        raise NotImplementedError(
            "no Kafka broker/client in this environment; use "
            "DirectoryRuleSource (same wire schema, same semantics)"
        )
