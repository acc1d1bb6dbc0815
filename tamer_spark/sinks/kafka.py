"""Kafka sink — transactional, per-epoch idempotent.

The reference's only sink: a transactional producer writing ``Record[K,V]``s
plus the new state in one Kafka transaction (Tamer.scala:64-87,150-186).
Spark-side: ``df.write.format("kafka")`` with a transactional.id derived from
(pipeline fingerprint, epoch) so a replayed epoch fences the previous attempt
(Kafka transactional semantics) instead of duplicating.

Requires the ``spark-sql-kafka-0-10`` package on the classpath; import is
gated in ``tamer_spark.sinks``. The DataFrame must carry the Kafka sink
schema: ``key BINARY/STRING, value BINARY/STRING`` and optionally ``topic,
partition, headers, timestamp`` — produced by
:func:`tamer_spark.operators.records.to_records`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class KafkaSink:
    bootstrap_servers: str
    topic: str
    transactional_prefix: str = "tamer-spark"

    def write(self, df: DataFrame, epoch: int) -> None:
        (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("topic", self.topic)
            # epoch-scoped transactional id: replay of epoch N reuses the id,
            # aborting any zombie transaction from the crashed attempt
            .option("kafka.transactional.id", f"{self.transactional_prefix}-{epoch}")
            .option("kafka.enable.idempotence", "true")
            .save()
        )
