"""Sinks. The reference writes only to Kafka (Tamer.scala:64-87); we provide
Kafka plus Parquet/memory/console, all honoring the per-epoch idempotence
contract required by the engine loop (see engine.py docstring)."""

from tamer_spark.sinks.base import ConsoleSink, MemorySink, ParquetEpochSink

__all__ = ["ParquetEpochSink", "MemorySink", "ConsoleSink"]

try:  # Kafka sinks need the spark-sql-kafka package / a Kafka client at write time
    from tamer_spark.sinks.kafka import KafkaSink, TransactionalKafkaSink  # noqa: F401

    __all__ += ["KafkaSink", "TransactionalKafkaSink"]
except Exception:  # pragma: no cover
    pass
