"""kafka_stream_unify_order_messages_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
`selcukusta/kafka_stream_unify_order_messages` (a Kafka Streams order-event
unification app), extended with a general DataFrame/SQL relational surface and
large-scale training-data pipeline operators (dedup, similarity search, text
analysis, multimodal columns).

Layout:
    session     — tuned SparkSession builder (AQE, UTC, Arrow, parquet nanos)
    schemas     — StructTypes for the order-event wire format and projections
    sources/    — parquet/Kafka/rate readers and the deterministic generator
    sinks/      — Kafka/parquet writers with per-row topic routing
    functions/  — pure Column-expression helpers (normalize, text, vectors)
    operators/  — batch operators (unify, dedup, similarity, routing, windows)
    streaming/  — Structured Streaming stateful unify (applyInPandasWithState)
"""

from kafka_stream_unify_order_messages_spark.session import (
    drop_cached_blocks,
    get_spark,
)

__version__ = "0.1.0"

__all__ = ["get_spark", "drop_cached_blocks", "__version__"]
