from kafka_stream_unify_order_messages_spark.operators.unify import (
    unify_events,
    unify_events_flat,
)

__all__ = ["unify_events", "unify_events_flat"]
