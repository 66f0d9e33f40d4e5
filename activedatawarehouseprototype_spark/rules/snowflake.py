"""Time-ordered 64-bit unique id generator (snowflake layout).

Parity with ``common/SnowflakeIdWorker.java:107-138``: 41 bits of
millis since a custom epoch, 5 bits datacenter, 5 bits worker, 12 bits
per-millisecond sequence, with a clock-regression guard. Used for
spawned-rule queryIds in the ECA loop (``common/KafkaSender.java:109-114``).

Driver-side only (rule control plane, a few ids per micro-batch).
Data-plane id generation at scale should use
``F.monotonically_increasing_id()`` / ``F.uuid()`` instead.
"""

from __future__ import annotations

import threading
import time

_TWEPOCH = 1288834974657  # same custom epoch as the common snowflake layout
_WORKER_BITS = 5
_DATACENTER_BITS = 5
_SEQUENCE_BITS = 12
_MAX_WORKER = (1 << _WORKER_BITS) - 1
_MAX_DATACENTER = (1 << _DATACENTER_BITS) - 1
_SEQUENCE_MASK = (1 << _SEQUENCE_BITS) - 1
_WORKER_SHIFT = _SEQUENCE_BITS
_DATACENTER_SHIFT = _SEQUENCE_BITS + _WORKER_BITS
_TIMESTAMP_SHIFT = _SEQUENCE_BITS + _WORKER_BITS + _DATACENTER_BITS


class SnowflakeIdWorker:
    def __init__(self, worker_id: int = 0, datacenter_id: int = 0) -> None:
        if not 0 <= worker_id <= _MAX_WORKER:
            raise ValueError(f"worker_id out of range [0, {_MAX_WORKER}]")
        if not 0 <= datacenter_id <= _MAX_DATACENTER:
            raise ValueError(f"datacenter_id out of range [0, {_MAX_DATACENTER}]")
        self.worker_id = worker_id
        self.datacenter_id = datacenter_id
        self._sequence = 0
        self._last_ts = -1
        self._lock = threading.Lock()

    @staticmethod
    def _now_ms() -> int:
        return time.time_ns() // 1_000_000

    def next_id(self) -> int:
        with self._lock:
            ts = self._now_ms()
            if ts < self._last_ts:
                # Clock regression guard (SnowflakeIdWorker.java:112-116):
                # refuse to hand out ids that would sort backwards.
                raise RuntimeError(
                    f"clock moved backwards; refusing ids for {self._last_ts - ts} ms"
                )
            if ts == self._last_ts:
                self._sequence = (self._sequence + 1) & _SEQUENCE_MASK
                if self._sequence == 0:  # sequence exhausted: spin to next ms
                    while ts <= self._last_ts:
                        ts = self._now_ms()
            else:
                self._sequence = 0
            self._last_ts = ts
            return (
                ((ts - _TWEPOCH) << _TIMESTAMP_SHIFT)
                | (self.datacenter_id << _DATACENTER_SHIFT)
                | (self.worker_id << _WORKER_SHIFT)
                | self._sequence
            )


_default = SnowflakeIdWorker()


def next_id() -> int:
    return _default.next_id()
