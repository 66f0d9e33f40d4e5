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
    values.

    ``poll()`` is written against the kafka-python consumer contract —
    ``consumer.poll(timeout_ms=0)`` returns ``{TopicPartition:
    [ConsumerRecord]}`` where each record carries (topic, partition,
    offset, key, value, headers, ...) and ``value`` is ``bytes`` unless
    a deserializer was configured. Only ``value`` feeds the registry
    (the reference's consumer does the same: the rule JSON IS the
    message body; key/headers are routing metadata). Per-partition
    offset order is preserved; cross-partition order is undefined, as
    in Kafka itself.

    The consumer is injected via ``consumer_factory`` so the transport
    contract stays TESTED in this broker-less sandbox (a fake consumer
    drives ``poll()`` with exact-shaped records —
    tests/test_rule_source_kafka.py); the default factory builds a real
    ``kafka.KafkaConsumer`` and fails loudly when the client library is
    absent, which is this environment's documented state.

    (The data-plane events stream would use Spark's native
    ``spark.readStream.format("kafka")`` instead — this seam is only
    the low-volume control plane, which the reference also reads with a
    plain consumer.)
    """

    topic: str = "rules"
    bootstrap_servers: str = "localhost:9092"
    consumer_factory: "object | None" = None  # Callable[[], consumer]
    _consumer: object = field(default=None, repr=False)

    def __post_init__(self) -> None:
        factory = self.consumer_factory or self._default_factory
        self._consumer = factory()

    def _default_factory(self):
        try:
            from kafka import KafkaConsumer  # type: ignore[import-not-found]
        except ImportError as e:
            raise NotImplementedError(
                "no Kafka broker/client in this environment; use "
                "DirectoryRuleSource (same wire schema, same semantics) "
                "or inject a consumer_factory"
            ) from e
        return KafkaConsumer(
            self.topic,
            bootstrap_servers=self.bootstrap_servers,
            # rule lines are small and idempotent to re-apply (registry
            # upserts by queryId), so auto-commit's at-least-once is fine
            enable_auto_commit=True,
        )

    def poll(self) -> list[str]:
        out: list[str] = []
        for records in self._consumer.poll(timeout_ms=0).values():
            for rec in records:
                v = rec.value
                if isinstance(v, (bytes, bytearray)):
                    v = v.decode("utf-8")
                if v and v.strip():
                    out.append(v)
        return out
