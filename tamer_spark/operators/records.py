"""Record construction: DataFrame → Kafka-sink-shaped records.

The reference's ``recordFrom: (SV, V) => Record[K, V]`` (Record.scala:37-45;
every source takes one — DbSetup.scala:37, S3Setup.scala:38,
RESTSetup.scala:36) chooses a key, value, optional timestamp and headers per
row. Spark-side it's a projection onto the Kafka writer schema
(``key BINARY, value BINARY, headers ARRAY<STRUCT<key,value>>, timestamp``),
with JSON or framed-Avro encoding from tamer_spark.serde.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tamer_spark.serde.confluent import frame_confluent


def to_records(
    df: DataFrame,
    key: Column,
    value_cols: list[str] | None = None,
    timestamp: Column | None = None,
    headers: dict[str, str] | None = None,
    value_schema_id: int | None = None,
) -> DataFrame:
    """Project rows into Kafka records.

    - ``key``: any Column; stringified then UTF-8 bytes.
    - value: JSON object of ``value_cols`` (default: all columns), as bytes;
      with ``value_schema_id`` the payload is Confluent-framed
      (magic+id+payload) for registry-aware consumers.
    - ``headers``: static header map (Record.scala:41 allows per-record
      headers; pass Column-valued maps via withColumn upstream if needed).
    """
    value_cols = value_cols or df.columns
    value = F.encode(F.to_json(F.struct(*[F.col(c) for c in value_cols])), "UTF-8")
    if value_schema_id is not None:
        value = frame_confluent(value.alias("payload"), value_schema_id)
    out = df.select(
        F.encode(key.cast("string"), "UTF-8").alias("key"),
        value.alias("value"),
    )
    if timestamp is not None:
        out = out.withColumn("timestamp", timestamp)
    if headers:
        out = out.withColumn(
            "headers",
            F.array(
                *[
                    F.struct(F.lit(k).alias("key"), F.encode(F.lit(v), "UTF-8").alias("value"))
                    for k, v in headers.items()
                ]
            ),
        )
    return out
