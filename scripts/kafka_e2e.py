"""Live-broker end-to-end smoke for the Kafka surface (SURVEY.md §2.1
S1/S2): three order-event topics -> kafka source -> JSON parse ->
canonicalize -> stateful unify -> kafka sink -> read back and assert.

Reference parity: source wiring OrderProjectionTopology.java:74 (three
subscribed topics), sink :64 (String key, JSON value). Topic creation is
left to the broker's auto-create (the reference delegates it to its Go
harness, test-consumer-app/main.go:133-192 — declared out of engine
scope in PARITY.md).

Usage:

    KAFKA_BOOTSTRAP=localhost:9092 python scripts/kafka_e2e.py

Requires the spark-sql-kafka connector on the driver classpath; the
Maven coordinates default to the running PySpark's version and can be
overridden with KAFKA_PACKAGES. Exit codes: 0 ok, 2 not configured,
1 failure. ``tests/test_kafka_e2e.py`` runs this script when
KAFKA_BOOTSTRAP is set and skips otherwise (no broker in CI sandboxes).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

N_COMPLETE = 20
N_INCOMPLETE = 5
BUFFER_MS = 2000
DEADLINE_S = 120


def wire_event(order_id: str, etype: str, seq: int) -> str:
    return (
        f'{{"order-id":"{order_id}","type":"{etype}",'
        f'"timestamp":"2026-01-01T00:00:{seq:02d}.000Z",'
        f'"order_details":{json.dumps({"seq": seq})}}}'
    )


def main() -> int:
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not bootstrap:
        print("kafka_e2e: KAFKA_BOOTSTRAP not set; nothing to do")
        return 2

    import pyspark
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    scala = "2.13"
    pkg = os.environ.get(
        "KAFKA_PACKAGES",
        f"org.apache.spark:spark-sql-kafka-0-10_{scala}:{pyspark.__version__}",
    )
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-e2e")
        .config("spark.jars.packages", pkg)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from kafka_stream_unify_order_messages_spark.functions.normalize import (
        canonicalize_type,
        topic_fallback,
    )
    from kafka_stream_unify_order_messages_spark.sinks.kafka import (
        kafka_stream_writer,
        to_kafka_records,
    )
    from kafka_stream_unify_order_messages_spark.sources.kafka import (
        kafka_stream_reader,
        parse_order_events,
    )
    from kafka_stream_unify_order_messages_spark.streaming import unify_stream

    run = uuid.uuid4().hex[:8]
    topics = {
        t: f"{t}-{run}"
        for t in ("order-created", "order-placed", "order-cancelled")
    }
    out_topic = f"order-projection-{run}"
    print(f"kafka_e2e: run={run} bootstrap={bootstrap}")

    # S7 topic auto-creation: the connector package puts the Java Kafka
    # client on the classpath, so create the topics explicitly like the
    # reference harness does; fall back to broker auto-create if absent.
    from kafka_stream_unify_order_messages_spark.sources.kafka_admin import (
        KafkaAdminUnavailable,
        ensure_topics,
    )

    try:
        created = ensure_topics(
            spark, bootstrap, (*topics.values(), out_topic)
        )
        print(f"kafka_e2e: created topics {created}")
    except KafkaAdminUnavailable as e:
        print(f"kafka_e2e: admin unavailable ({e}); relying on auto-create")

    # -- produce: complete lifecycles + incomplete ones that must NOT emit.
    # The e2e harness produces through Spark's own batch Kafka sink, so no
    # extra client library is needed. Order 0 sends UPPERCASE types
    # (case-insensitive aliasing) and order 1 sends an unknown type so the
    # topic-name fallback resolves it (OrderProjectionTopology.java:39-46).
    rows = []
    for i in range(N_COMPLETE):
        oid = f"ok-{run}-{i}"
        for seq, etype in enumerate(("created", "placed", "cancelled")):
            wire_type = (
                etype.upper() if i == 0 else "unknown" if i == 1 else etype
            )
            rows.append(
                (oid, wire_event(oid, wire_type, seq), topics[f"order-{etype}"])
            )
    for i in range(N_INCOMPLETE):
        oid = f"partial-{run}-{i}"
        for seq, etype in enumerate(("created", "placed")):
            rows.append((oid, wire_event(oid, etype, seq), topics[f"order-{etype}"]))
    produce = spark.createDataFrame(
        rows, "key string, value string, topic string"
    )
    (
        produce.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .save()
    )
    print(f"kafka_e2e: produced {len(rows)} events")

    # -- the topology under test
    raw = kafka_stream_reader(
        spark, bootstrap, topics=tuple(topics.values())
    ).load()
    # suffixed topics -> strip the run id so the canonical fallback applies
    base_topic = F.regexp_replace(F.col("topic"), f"-{run}$", "")
    parsed = parse_order_events(
        raw.withColumn("topic", base_topic)
    )
    normalized = (
        parsed.filter(~F.col("corrupt"))
        .withColumn(
            "type",
            canonicalize_type("type", fallback=topic_fallback("topic")),
        )
        .filter(F.col("order_id").isNotNull())
        .select("order_id", "type", "timestamp", "order_details")
    )
    projections = unify_stream(normalized, buffer_ms=BUFFER_MS)
    records = to_kafka_records(
        projections, key_col="order_id", value_col="payload", topic=out_topic
    )
    with tempfile.TemporaryDirectory() as ckpt:
        query = kafka_stream_writer(
            records, bootstrap, checkpoint_location=ckpt
        ).start()
        try:
            # -- poll the output topic (batch reads) until all complete
            # lifecycles projected; ProcessingTimeTimeout schedules batches
            # continuously, so poll with a deadline instead of
            # processAllAvailable (see tests/test_unify_stream.py).
            deadline = time.time() + DEADLINE_S
            keys: set[str] = set()
            while time.time() < deadline:
                try:
                    got = (
                        spark.read.format("kafka")
                        .option("kafka.bootstrap.servers", bootstrap)
                        .option("subscribe", out_topic)
                        .option("startingOffsets", "earliest")
                        .load()
                        .select(F.col("key").cast("string"))
                        .collect()
                    )
                    keys = {r["key"] for r in got}
                except Exception:  # noqa: BLE001 — out topic may not exist yet
                    keys = set()
                if len(keys) >= N_COMPLETE:
                    break
                time.sleep(2)
        finally:
            query.stop()

    expected = {f"ok-{run}-{i}" for i in range(N_COMPLETE)}
    partial = {k for k in keys if k.startswith("partial-")}
    if keys >= expected and not partial:
        print(f"kafka_e2e: OK — {len(keys)} projections, 0 incomplete leaks")
        return 0
    print(
        f"kafka_e2e: FAIL — got {len(keys)}/{N_COMPLETE} expected keys, "
        f"{len(partial)} incomplete leaked"
    )
    return 1


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
