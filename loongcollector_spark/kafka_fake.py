"""In-process Kafka broker model — the behavior harness for
flusher_kafka / service_kafka (no broker ships in this container).

The reference's kafka flushers delegate partition assignment to their
client library (sarama for the Go v2 plugin, flusher_kafka_v2.go:
499-517; librdkafka for the native one) — so "does the hash partitioner
land same-key messages on one partition, with sarama's exact hash?" is
client+broker behavior our option-mapping tests never exercised. This
module models precisely that slice:

* partitioners with sarama's algorithms (partitioner.go, public
  Apache-2.0 API contract):
  - ``hash``: FNV-1a 32-bit over the key bytes, cast to int32, modulo
    numPartitions, negated if negative (sarama NewHashPartitioner);
  - ``roundrobin``: per-topic counter modulo numPartitions;
  - ``random``: seeded PRNG choice (deterministic under test);
* per-partition append logs with contiguous offsets from 0;
* RequiredAcks semantics: 0 → fire-and-forget (no metadata returned),
  1 / -1 → (partition, offset) ack per message;
* a consumer view shaped like Spark's kafka source (key/value binary,
  topic, partition, offset, timestamp) so ``sources.service_kafka``'s
  projection drives against it unchanged.

This is a test harness, not a sink: production writes still go through
Spark's kafka writer (``flusher_kafka``), whose Java DefaultPartitioner
is murmur2-based — a DIFFERENT function than sarama's FNV-1a. That gap
is real and documented: a mixed fleet (reference agents + this engine)
keying the same topic will not co-locate identical keys unless the
Spark side sets ``kafka.partitioner.class``. The harness exists to pin
the reference semantics so such a partitioner can be validated against
it.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

FNV_OFFSET_32 = 2166136261
FNV_PRIME_32 = 16777619


def fnv1a_32(data: bytes) -> int:
    """FNV-1a 32-bit (public domain algorithm; what sarama's default
    Hasher32 uses for the hash partitioner)."""
    h = FNV_OFFSET_32
    for b in data:
        h ^= b
        h = (h * FNV_PRIME_32) & 0xFFFFFFFF
    return h


def sarama_hash_partition(key: bytes, num_partitions: int) -> int:
    """sarama NewHashPartitioner assignment: int32(fnv1a(key)) %
    numPartitions, negated if negative (Go truncated modulo), which
    collapses to abs(int32) % n."""
    h = fnv1a_32(key)
    signed = h - (1 << 32) if h >= (1 << 31) else h
    return abs(signed) % num_partitions


@dataclass
class _Record:
    offset: int
    key: bytes | None
    value: bytes
    headers: tuple
    timestamp: float


@dataclass
class FakeKafkaBroker:
    """topics: {topic: num_partitions}. Call ``produce``/``produce_rows``
    then inspect ``logs`` or read back via ``records_frame``."""

    topics: dict
    required_acks: int = 1
    seed: int = 0
    logs: dict = field(init=False)
    _rr: dict = field(init=False)
    _rng: random.Random = field(init=False)
    _clock: float = field(init=False, default=0.0)

    def __post_init__(self):
        self.logs = {t: [[] for _ in range(n)] for t, n in self.topics.items()}
        self._rr = {}
        self._rng = random.Random(self.seed)

    def produce(self, topic: str, value, key=None, headers=(),
                partitioner: str = "random"):
        """Assign a partition and append; returns (partition, offset)
        for RequiredAcks 1/-1, None for 0 (NoResponse)."""
        parts = self.logs[topic]
        n = len(parts)
        kb = None if key is None else (
            key if isinstance(key, (bytes, bytearray)) else
            str(key).encode())
        if partitioner == "hash" and kb is not None:
            p = sarama_hash_partition(kb, n)
        elif partitioner == "roundrobin":
            c = self._rr.get(topic, 0)
            self._rr[topic] = c + 1
            p = c % n
        else:
            p = self._rng.randrange(n)
        self._clock += 0.001
        rec = _Record(len(parts[p]), kb, bytes(value), tuple(headers),
                      self._clock)
        parts[p].append(rec)
        if self.required_acks == 0:
            return None
        return (p, rec.offset)

    def produce_rows(self, rows, default_topic: str,
                     partitioner: str = "random"):
        """Feed ``kafka_payload_frame`` output rows (Row or dict with
        value[, key, topic, headers]) in order; returns the ack list."""
        acks = []
        for r in rows:
            get = r.asDict().get if hasattr(r, "asDict") else r.get
            acks.append(self.produce(
                get("topic") or default_topic,
                get("value").encode() if isinstance(get("value"), str)
                else get("value"),
                key=get("key"),
                headers=tuple((h["key"], bytes(h["value"]))
                              for h in (get("headers") or [])),
                partitioner=partitioner,
            ))
        return acks

    def records_frame(self, spark, topic: str):
        """Consumer view shaped like Spark's kafka source output:
        (key binary, value binary, topic, partition, offset,
        timestamp) — what ``service_kafka``'s projection consumes."""
        import datetime

        rows = [
            (rec.key, rec.value, topic, p, rec.offset,
             datetime.datetime.fromtimestamp(1_700_000_000 + rec.timestamp))
            for p, precs in enumerate(self.logs[topic])
            for rec in precs
        ]
        return spark.createDataFrame(
            rows,
            "key binary, value binary, topic string, partition int, "
            "offset long, timestamp timestamp",
        )
