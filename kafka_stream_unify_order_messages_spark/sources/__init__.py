from kafka_stream_unify_order_messages_spark.sources.files import (
    load_table,
    load_tables,
    TABLE_NAMES,
)

__all__ = ["load_table", "load_tables", "TABLE_NAMES"]
