"""Kafka sink configuration + per-row topic routing.

Covers SURVEY.md §2.1 S2 (projection sink: String key, JSON payload value,
OrderProjectionTopology.java:64) and §2.4 R3/R4 (conditional multi-topic
routing): Spark's Kafka sink honors a per-row ``topic`` column, so the
Redpanda-Connect ``switch`` output becomes a single writeStream with a
``when/otherwise`` topic expression — no stream split needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def to_kafka_records(
    df: DataFrame,
    key_col: str = "order_id",
    value_col: str = "payload",
    topic: str | Column | None = "order-projection",
) -> DataFrame:
    """Shape a DataFrame into Kafka sink columns (key, value[, topic])."""
    cols = [
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    ]
    if topic is not None:
        topic_col = F.lit(topic) if isinstance(topic, str) else topic
        cols.append(topic_col.alias("topic"))
    return df.select(*cols)


def route_topics(
    df: DataFrame, rules: list[tuple[Column, str]], default: str
) -> Column:
    """Per-row topic routing expression from (condition, topic) rules."""
    expr: Column | None = None
    for cond, topic in rules:
        expr = F.when(cond, topic) if expr is None else expr.when(cond, topic)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def kafka_stream_writer(
    records: DataFrame,
    bootstrap_servers: str,
    checkpoint_location: str,
    topic: str | None = None,
    trigger_interval: str = "1 second",
    sasl_jaas: str | None = None,
    **options: str,
):
    """Configured (unstarted) writeStream to Kafka.

    ``trigger_interval`` defaults to 1 s to match the reference's
    punctuation cadence (SURVEY.md §4.3); delivery is at-least-once like
    the reference (no processing.guarantee configured there either).
    """
    writer = (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_location)
        .trigger(processingTime=trigger_interval)
    )
    if topic is not None:
        writer = writer.option("topic", topic)
    if sasl_jaas:
        writer = (
            writer.option("kafka.security.protocol", "SASL_PLAINTEXT")
            .option("kafka.sasl.mechanism", "SCRAM-SHA-256")
            .option("kafka.sasl.jaas.config", sasl_jaas)
        )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer
