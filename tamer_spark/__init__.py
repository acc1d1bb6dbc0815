"""tamer_spark — a PySpark-native incremental ingestion + analytics engine.

Re-expresses the capabilities of laserdisc-io/tamer (a stateful, exactly-once
Kafka ingestion framework; see /root/reference) on top of Apache Spark:

- the stateful driver loop (reference core/src/main/scala/tamer/Tamer.scala)
  becomes :mod:`tamer_spark.engine` — a checkpointed micro-batch loop with
  idempotent epoch commits,
- the JDBC / S3 / REST / OCI sources become :mod:`tamer_spark.sources`,
- serdes + schema registry become :mod:`tamer_spark.serde`,
- and the relational / LLM-data-pipeline surface (dedup, similarity search,
  text analysis) lives in :mod:`tamer_spark.operators` and
  :mod:`tamer_spark.functions`, all expressed as Catalyst-friendly DataFrame
  plans designed for 100 TB scale.
"""

from tamer_spark.errors import TamerError
from tamer_spark.session import get_spark

__all__ = ["TamerError", "get_spark"]
__version__ = "0.1.0"
