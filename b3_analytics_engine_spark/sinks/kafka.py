"""Kafka sink (K5): records → JSON values, acks=all.

Mirrors the reference's producer contract (JSON value, ``acks="all"``,
reference include/common/kafka_producer.py:11-17) with ``to_json
(struct(*))`` — serialization happens JVM-side in the connector, not
per-row in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_kafka_records(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Project to the (key, value) envelope the Kafka writer needs —
    F5 JSON serialization of every column."""
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    if key_col is not None:
        return df.select(F.col(key_col).cast("string").alias("key"), value)
    return df.select(value)


def write_batch(
    df: DataFrame, brokers: str, topic: str, key_col: str | None = None
) -> None:
    (
        to_kafka_records(df, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.acks", "all")
        .save()
    )


def write_stream(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
):
    """Streaming producer with checkpointed offsets (replaces the
    reference's at-least-once fire-and-forget)."""
    return (
        to_kafka_records(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("kafka.acks", "all")
        .option("checkpointLocation", checkpoint)
        .start()
    )
