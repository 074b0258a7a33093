"""S8 parity: the rate-source synthetic generator feeding the full
streaming unification — no files, no Kafka, pure in-engine stream."""

from __future__ import annotations

import json
import time
import uuid

from kafka_stream_unify_order_messages_spark.sources.generator import (
    rate_order_event_stream,
)
from kafka_stream_unify_order_messages_spark.streaming import unify_stream


def test_rate_generator_through_unify(spark):
    name = f"rate_{uuid.uuid4().hex[:8]}"
    events = rate_order_event_stream(spark, rows_per_second=30)
    q = (
        unify_stream(events.drop("topic"), buffer_ms=1000)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if q.exception():
                raise q.exception()
            if spark.table(name).count() >= 5:
                break
            time.sleep(0.5)
        rows = spark.table(name).collect()
        assert len(rows) >= 5
        for r in rows:
            payload = json.loads(r.payload)
            assert [e["type"] for e in payload["events"]] == [
                "created",
                "placed",
                "cancelled",
            ]
            assert payload["orderId"] == r.order_id
    finally:
        q.stop()
