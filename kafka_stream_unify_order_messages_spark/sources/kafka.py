"""Kafka source configuration + order-event JSON deserialization.

Mirrors the reference's consumer surface (S1/S3 in SURVEY.md §2.1): three
topics subscribed with String keys and JSON OrderEvent values
(OrderProjectionTopology.java:69-82, serde/JsonDeserializer.java:23-32).

One multi-topic Kafka source replaces the reference's three separate
sources + union: the ``topic`` metadata column drives the per-topic
canonicalization fallback, so the union is free (SURVEY.md §2.3 T1).

The serde layer is pure-Column (`from_json`) and is equally usable on a
batch DataFrame — tests exercise it without a broker. Malformed-record
policy (SURVEY.md §7.3.4): the reference kills the stream thread; we route
rejects to a column instead (strict=False) or fail the query (strict=True).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.schemas import (
    ORDER_EVENT_JSON_SCHEMA,
)

DEFAULT_TOPICS = ("order-created", "order-placed", "order-cancelled")


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: tuple[str, ...] = DEFAULT_TOPICS,
    starting_offsets: str = "earliest",
    sasl_jaas: str | None = None,
    **options: str,
):
    """Configured (unstarted) readStream for the order-event topics.

    SASL/SCRAM parity with the reference's streams.properties is expressed
    through the standard ``kafka.`` option passthrough.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
    )
    if sasl_jaas:
        reader = (
            reader.option("kafka.security.protocol", "SASL_PLAINTEXT")
            .option("kafka.sasl.mechanism", "SCRAM-SHA-256")
            .option("kafka.sasl.jaas.config", sasl_jaas)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def parse_order_events(
    raw: DataFrame,
    value_col: str = "value",
    topic_col: str = "topic",
    strict: bool = False,
) -> DataFrame:
    """Kafka (key, value, topic) -> typed order-event columns.

    Output: (order_id, type, timestamp, order_details, topic, corrupt).

    ``order_details`` is extracted as the RAW byte substring, not through
    get_json_object (which re-serializes and would turn ``12.30`` into
    ``12.3`` — SURVEY.md §7.3.3 requires byte fidelity). The extraction
    relies on ``order_details`` being the last field, which the reference
    wire format pins (@JsonPropertyOrder, OrderEvent.java:12).

    ``corrupt`` marks deserialization failures exactly where the
    reference's Jackson would throw (JsonDeserializer.java:27-31): either
    unparseable JSON or a missing required field (all four fields are
    required=true, OrderEvent.java:21-24). Spark's PERMISSIVE from_json
    yields an all-null struct for malformed input, never a null struct —
    so malformation is detected with try_parse_json, not a struct null
    check. ``strict=True`` turns corrupt rows into query failure
    (reference parity: the stream thread dies); default keeps them
    flagged for a rejects sink.
    """
    value_str = F.col(value_col).cast("string")
    parsed = F.from_json(value_str, ORDER_EVENT_JSON_SCHEMA)
    malformed = value_str.isNotNull() & F.try_parse_json(value_str).isNull()
    details_raw = F.regexp_extract(
        value_str, r'"order_details"\s*:\s*(.*)\}\s*$', 1
    )
    fields = {
        "order_id": parsed.getField("order-id"),
        "type": parsed.getField("type"),
        "timestamp": parsed.getField("timestamp"),
        "order_details": F.when(details_raw != "", details_raw),
    }
    missing_required = reduce(
        lambda a, b: a | b, (c.isNull() for c in fields.values())
    )
    corrupt = value_str.isNotNull() & (malformed | missing_required)
    out = raw.select(
        *[c.alias(name) for name, c in fields.items()],
        F.col(topic_col).alias("topic"),
        corrupt.alias("corrupt"),
    )
    if strict:
        # reference parity: malformed record -> fail (JsonDeserializer throws)
        out = out.withColumn(
            "order_id",
            F.when(F.col("corrupt"), F.raise_error("malformed order event"))
            .otherwise(F.col("order_id")),
        )
    return out
