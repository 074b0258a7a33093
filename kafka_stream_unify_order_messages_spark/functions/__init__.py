from kafka_stream_unify_order_messages_spark.functions.normalize import (
    TYPE_ALIASES,
    TYPE_PRIORITIES,
    REQUIRED_TYPES,
    TOPIC_FALLBACK_TYPES,
    canonicalize_type,
    type_priority,
)

__all__ = [
    "TYPE_ALIASES",
    "TYPE_PRIORITIES",
    "REQUIRED_TYPES",
    "TOPIC_FALLBACK_TYPES",
    "canonicalize_type",
    "type_priority",
]
