"""Env-driven pipeline configuration.

Mirrors the reference's zio.Config surface (core/src/main/scala/tamer/
config.scala:31-184 and db/local/runDatabaseSimple.sh:5-26), same key names
where they exist, so a reference deployment's env translates directly:

  KAFKA_BROKERS, KAFKA_SINK_TOPIC, KAFKA_STATE_TOPIC, KAFKA_GROUP_ID,
  KAFKA_CLIENT_ID, KAFKA_TRANSACTIONAL_ID, KAFKA_BUFFER_SIZE,
  KAFKA_SCHEMA_REGISTRY_URL, QUERY_FETCH_CHUNK_SIZE

plus engine-loop knobs the reference hard-codes (retry policy —
Tamer.scala:58 FIXME — and poll interval).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str | None = None) -> str | None:
    v = os.environ.get(name, default)
    return v if v != "" else default


@dataclass
class KafkaConfig:
    brokers: str = field(default_factory=lambda: _env("KAFKA_BROKERS", "localhost:9092"))
    sink_topic: str | None = field(default_factory=lambda: _env("KAFKA_SINK_TOPIC"))
    state_topic: str | None = field(default_factory=lambda: _env("KAFKA_STATE_TOPIC"))
    group_id: str = field(default_factory=lambda: _env("KAFKA_GROUP_ID", "tamer-spark"))
    client_id: str = field(default_factory=lambda: _env("KAFKA_CLIENT_ID", "tamer-spark"))
    transactional_id: str = field(
        default_factory=lambda: _env("KAFKA_TRANSACTIONAL_ID", "tamer-spark-tx")
    )
    buffer_size: int = field(default_factory=lambda: int(_env("KAFKA_BUFFER_SIZE", "50")))
    registry_url: str | None = field(default_factory=lambda: _env("KAFKA_SCHEMA_REGISTRY_URL"))


@dataclass
class EngineConfig:
    fetch_chunk_size: int = field(
        default_factory=lambda: int(_env("QUERY_FETCH_CHUNK_SIZE", "10000"))
    )
    sink_retries: int = field(default_factory=lambda: int(_env("TAMER_SINK_RETRIES", "10")))
    sink_retry_base_ms: int = field(
        default_factory=lambda: int(_env("TAMER_SINK_RETRY_BASE_MS", "100"))
    )
    poll_interval_s: float = field(
        default_factory=lambda: float(_env("TAMER_POLL_INTERVAL_S", "1.0"))
    )
    checkpoint_root: str = field(
        default_factory=lambda: _env("TAMER_CHECKPOINT_ROOT", "/tmp/tamer-spark-checkpoints")
    )
