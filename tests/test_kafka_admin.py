"""S7 topic auto-creation: the AdminClient passthrough must fail with the
typed, actionable error (not a py4j TypeError) when the Kafka client jars
are absent — which is exactly the sandbox condition, so the fallback path
the e2e script takes is the one under test here."""

from __future__ import annotations

import pytest

from kafka_stream_unify_order_messages_spark.sources.kafka_admin import (
    KafkaAdminUnavailable,
    ensure_topics,
)


def test_ensure_topics_raises_typed_error_without_client_jars(spark):
    with pytest.raises(KafkaAdminUnavailable, match="classpath"):
        ensure_topics(spark, "localhost:9092", ("order-created",))
