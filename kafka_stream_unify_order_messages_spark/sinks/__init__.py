from kafka_stream_unify_order_messages_spark.sinks.files import (
    parquet_stream_writer,
    write_partitioned_parquet,
)
from kafka_stream_unify_order_messages_spark.sinks.kafka import (
    kafka_stream_writer,
    to_kafka_records,
    route_topics,
)

__all__ = [
    "kafka_stream_writer",
    "to_kafka_records",
    "route_topics",
    "write_partitioned_parquet",
    "parquet_stream_writer",
]
from kafka_stream_unify_order_messages_spark.sinks.monitor import (
    ProgressMonitor,
    attach_monitor,
)
