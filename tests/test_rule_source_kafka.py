"""Kafka rule-source contract (S1, round-6 VERDICT item 6): a fake
consumer drives ``KafkaRuleSource.poll()`` with records in the EXACT
kafka-python shape — ``poll(timeout_ms=...)`` returning
``{TopicPartition: [ConsumerRecord(topic, partition, offset, key,
value, headers, ...)]}`` with ``bytes`` values — so the documented
broker swap stays honest without a broker in the sandbox. The
end-to-end test runs the full pipeline with the fake transport:
mid-stream registration through the Kafka record shape."""

from __future__ import annotations

import json
from collections import namedtuple

import pytest

from activedatawarehouseprototype_spark.sources.rule_source import KafkaRuleSource

# exact field layout of kafka-python's ConsumerRecord (v2.x)
ConsumerRecord = namedtuple(
    "ConsumerRecord",
    [
        "topic",
        "partition",
        "offset",
        "timestamp",
        "timestamp_type",
        "key",
        "value",
        "headers",
        "checksum",
        "serialized_key_size",
        "serialized_value_size",
        "serialized_header_size",
    ],
)

TopicPartition = namedtuple("TopicPartition", ["topic", "partition"])


def _rec(partition: int, offset: int, value: bytes, key: bytes | None = None):
    return ConsumerRecord(
        topic="rules",
        partition=partition,
        offset=offset,
        timestamp=1700000000000 + offset,
        timestamp_type=0,
        key=key,
        value=value,
        headers=[("source", b"test-harness")],
        checksum=None,
        serialized_key_size=-1 if key is None else len(key),
        serialized_value_size=len(value),
        serialized_header_size=18,
    )


class FakeConsumer:
    """kafka-python consumer double: each call to ``poll`` drains one
    pre-staged batch (the {TopicPartition: [records]} mapping the real
    client returns)."""

    def __init__(self, batches):
        self._batches = list(batches)
        self.poll_calls = 0

    def poll(self, timeout_ms=0):
        self.poll_calls += 1
        if not self._batches:
            return {}
        return self._batches.pop(0)


def _rule_json(qid: int) -> str:
    return json.dumps(
        {
            "queryId": qid,
            "queryState": "ACTIVE",
            "lastTime": -1,
            "windowMilliseconds": 10_000,
            "frequencyMilliseconds": None,
            "groupingKeyNames": ["carId"],
            "windowFilterRules": [],
            "aggregatorFunctionType": "MAX",
            "limitOperatorType": ">",
            "limit": 100,
            "aggregateFieldName": "speed",
        }
    )


def test_poll_decodes_bytes_values_and_ignores_key_headers():
    tp0, tp1 = TopicPartition("rules", 0), TopicPartition("rules", 1)
    batch = {
        tp0: [
            _rec(0, 41, _rule_json(1).encode(), key=b"1"),
            _rec(0, 42, _rule_json(2).encode()),
        ],
        tp1: [_rec(1, 7, _rule_json(3).encode(), key=b"route-key")],
    }
    src = KafkaRuleSource(consumer_factory=lambda: FakeConsumer([batch]))
    lines = src.poll()
    assert sorted(json.loads(l)["queryId"] for l in lines) == [1, 2, 3]
    # per-partition offset order preserved
    p0_ids = [
        json.loads(l)["queryId"] for l in lines if json.loads(l)["queryId"] in (1, 2)
    ]
    assert p0_ids == [1, 2]
    # drained: second poll empty
    assert src.poll() == []


def test_poll_passes_through_str_values_and_skips_blank():
    tp = TopicPartition("rules", 0)
    batch = {
        tp: [
            _rec(0, 1, _rule_json(9).encode()),
            # a deserializer-configured consumer yields str already
            ConsumerRecord(
                "rules", 0, 2, 0, 0, None, _rule_json(10), [], None, -1, 0, 0
            ),
            _rec(0, 3, b"   "),  # blank line: dropped, not an error
        ]
    }
    src = KafkaRuleSource(consumer_factory=lambda: FakeConsumer([batch]))
    lines = src.poll()
    assert [json.loads(l)["queryId"] for l in lines] == [9, 10]


def test_missing_client_fails_loudly():
    """Without an injected factory, constructing the source in this
    broker-less sandbox must raise the documented NotImplementedError
    (the kafka client library is absent)."""
    with pytest.raises(NotImplementedError, match="Kafka"):
        KafkaRuleSource()


def test_pipeline_midstream_registration_via_kafka_shape(spark, tmp_path):
    """End-to-end: the pipeline starts with an empty registry, the fake
    Kafka transport delivers a rule between batches 0 and 1, and the
    rule evaluates from batch 1 on — the reference's
    register-rules-over-Kafka flow (App.java:34-43) on the identical
    poll contract."""
    from pyspark.sql import functions as F

    from activedatawarehouseprototype_spark.streaming.pipeline import (
        ActivePipeline,
    )
    from activedatawarehouseprototype_spark.streaming.registry import (
        RuleRegistry,
    )

    tp = TopicPartition("rules", 0)
    consumer = FakeConsumer(
        [
            {},  # batch 0: nothing on the topic yet
            {tp: [_rec(0, 100, _rule_json(5).encode(), key=b"5")]},
        ]
    )
    src = KafkaRuleSource(consumer_factory=lambda: consumer)
    reg = RuleRegistry()
    pipe = ActivePipeline(
        spark=spark,
        registry=reg,
        work_dir=str(tmp_path / "wk"),
        rule_source=src,
    )

    def batch(ms, speed):
        return spark.createDataFrame(
            [(1, ms, speed)], "carId int, ms long, speed double"
        ).select(
            "carId", F.timestamp_millis("ms").alias("ts"), "speed"
        )

    pipe.process_batch(batch(1_000, 130.0), 0)
    assert len(reg.active()) == 0
    pipe.process_batch(batch(60_000, 140.0), 1)  # rule arrives + window closes
    assert len(reg.active()) == 1
    assert consumer.poll_calls == 2
    assert pipe.alerts().count() >= 1  # MAX 130 > 100 fired once evaluable


def test_rebalance_mid_poll_redelivery_is_idempotent():
    """Consumer-group rebalance contract (round-8 VERDICT item 9): a
    rebalance between polls shows up to the client as (a) an EMPTY
    poll while the group settles, (b) the partition set changing
    between polls, and (c) records fetched before revocation being
    REDELIVERED after reassignment (auto-commit at-least-once). The
    source must pass all of that through without error, and the
    registry absorbs the redelivery because apply is an upsert keyed
    by queryId."""
    from activedatawarehouseprototype_spark.streaming.registry import (
        RuleRegistry,
    )

    r1, r2, r3 = _rule_json(1), _rule_json(2), _rule_json(3)
    tp0 = TopicPartition("rules", 0)
    tp1 = TopicPartition("rules", 1)
    batches = [
        # pre-rebalance: this consumer owns partition 0
        {tp0: [_rec(0, 0, r1.encode()), _rec(0, 1, r2.encode())]},
        # rebalance in flight: poll returns nothing
        {},
        # post-rebalance: partition 1 assigned; offset 1 of p0 was
        # uncommitted at revocation and r2 is redelivered on p0
        {
            tp0: [_rec(0, 1, r2.encode())],
            tp1: [_rec(1, 0, r3.encode())],
        },
    ]
    src = KafkaRuleSource(consumer_factory=lambda: FakeConsumer(batches))
    reg = RuleRegistry()
    seen: list[str] = []
    for _ in range(4):  # one extra poll past drain -> {} again
        lines = src.poll()
        seen.extend(lines)
        for line in lines:
            reg.apply_json(line)
    assert [json.loads(x)["queryId"] for x in seen] == [1, 2, 2, 3]
    active = {r.query_id for r in reg.active()}
    assert active == {1, 2, 3}  # redelivery upserted, not duplicated
