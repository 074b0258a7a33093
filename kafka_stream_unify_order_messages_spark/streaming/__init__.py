from kafka_stream_unify_order_messages_spark.streaming.unify_stream import (
    UNIFY_OUTPUT_SCHEMA,
    make_unify_fn,
    unify_stream,
)

__all__ = ["unify_stream", "make_unify_fn", "UNIFY_OUTPUT_SCHEMA"]
