"""Engine schemas.

Wire/state/output schemas for the order-event unification pipeline, mirroring
the reference's data model (see /root/reference/src/main/java/com/example/
stream/model/OrderEvent.java:12-30, PendingOrder.java:8-19,
OrderProjectionPayload.java:8-19) but expressed as Spark StructTypes.

``order_details`` stays a raw JSON string end-to-end (lossless passthrough —
the reference treats it as an opaque JsonNode; re-encoding through from_json/
to_json would perturb field order and float formatting).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# One Kafka message, after JSON deserialization (reference OrderEvent).
ORDER_EVENT_SCHEMA = StructType(
    [
        StructField("order_id", StringType(), True),
        StructField("type", StringType(), True),
        StructField("timestamp", TimestampType(), True),
        # opaque nested JSON, passed through untouched
        StructField("order_details", StringType(), True),
    ]
)

# JSON shape on the wire uses the hyphenated field name `order-id`; column
# names in Spark use underscores, the serde maps between the two.
ORDER_EVENT_JSON_SCHEMA = StructType(
    [
        StructField("order-id", StringType(), True),
        StructField("type", StringType(), True),
        StructField("timestamp", StringType(), True),  # ISO-8601 on the wire
        StructField("order_details", StringType(), True),
    ]
)

# One buffered event inside streaming state (timestamps kept as ISO strings so
# the state schema is Arrow-friendly and output bytes stay reproducible).
_STATE_EVENT = StructType(
    [
        StructField("order_id", StringType(), True),
        StructField("type", StringType(), True),
        StructField("timestamp", StringType(), True),
        StructField("order_details", StringType(), True),
    ]
)

# Per-key streaming state (reference PendingOrder): deadline + up-to-3 events
# keyed structurally by type (closed world: created/placed/cancelled), which
# makes first-wins dedup a null-check instead of a map probe.
PENDING_ORDER_STATE_SCHEMA = StructType(
    [
        StructField("deadline_ms", LongType(), True),
        StructField("created", _STATE_EVENT, True),
        StructField("placed", _STATE_EVENT, True),
        StructField("cancelled", _STATE_EVENT, True),
    ]
)

# Emitted projection (reference OrderProjectionPayload): ordered event array.
PROJECTION_SCHEMA = StructType(
    [
        StructField("order_id", StringType(), False),
        StructField("events", ArrayType(_STATE_EVENT, False), False),
    ]
)

# Harness-side `transactions` JSON-Schema (reference docker-compose/
# transactions-schema.json:5-36): all fields required, price matches
# ^XXX \d+\.\d{6}$, no additional properties.
TRANSACTIONS_SCHEMA = StructType(
    [
        StructField("email", StringType(), True),
        StructField("index", IntegerType(), True),
        StructField("price", StringType(), True),
        StructField("product_url", StringType(), True),
        StructField("timestamp", StringType(), True),
        StructField("user_id", IntegerType(), True),
    ]
)

TRANSACTIONS_PRICE_PATTERN = r"^XXX \d+\.\d{6}$"

# Driver testdata logical schemas (see TESTDATA.md / FIXTURES.md §B).
EVENTS_COLUMNS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
DOCUMENTS_COLUMNS = ["doc_id", "text", "lang", "source", "n_chars"]
EMBEDDINGS_COLUMNS = ["vec_id", "embedding", "label"]

EMBEDDING_DIM = 64

__all__ = [
    "ORDER_EVENT_SCHEMA",
    "ORDER_EVENT_JSON_SCHEMA",
    "PENDING_ORDER_STATE_SCHEMA",
    "PROJECTION_SCHEMA",
    "TRANSACTIONS_SCHEMA",
    "TRANSACTIONS_PRICE_PATTERN",
    "EVENTS_COLUMNS",
    "DOCUMENTS_COLUMNS",
    "EMBEDDINGS_COLUMNS",
    "EMBEDDING_DIM",
]
