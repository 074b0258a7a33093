"""Topic auto-creation (SURVEY.md §2.1 S7).

The reference delegates topic creation to its Go harness
(test-consumer-app/main.go:133-192: AdminClient, 3 partitions, RF=1,
idempotent on TopicExistsException). Spark has no topic-admin API of its
own, but the Kafka connector ships the Java Kafka client, so when those
jars are on the driver classpath the same AdminClient is reachable
through the session's JVM gateway — no extra Python dependency.

``ensure_topics`` is therefore best-effort by design: it creates missing
topics when the admin client is available, treats already-exists as
success (reference parity: main.go:185-189 ignores TOPIC_ALREADY_EXISTS),
and raises ``KafkaAdminUnavailable`` when the classpath lacks the client
so callers can fall back to broker auto-create.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

DEFAULT_PARTITIONS = 3  # test-consumer-app/main.go:174
DEFAULT_REPLICATION = 1  # test-consumer-app/main.go:175


class KafkaAdminUnavailable(RuntimeError):
    """The Kafka client classes are not on the driver classpath (the
    spark-sql-kafka connector package is not loaded)."""


def ensure_topics(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: tuple[str, ...],
    partitions: int = DEFAULT_PARTITIONS,
    replication: int = DEFAULT_REPLICATION,
    timeout_ms: int = 30000,
) -> list[str]:
    """Create any missing topics; return the names actually created.

    Raises ``KafkaAdminUnavailable`` without touching the broker when the
    Kafka client jars are absent, and propagates real broker errors
    (auth, timeout) — only TopicExistsException is swallowed, matching
    the reference harness.
    """
    jvm = spark.sparkContext._jvm
    try:
        props = jvm.java.util.Properties()
        props.setProperty("bootstrap.servers", bootstrap_servers)
        props.setProperty("request.timeout.ms", str(timeout_ms))
        admin = jvm.org.apache.kafka.clients.admin.AdminClient.create(props)
    except TypeError as e:
        # py4j surfaces a missing class as a non-callable JavaPackage
        raise KafkaAdminUnavailable(
            "org.apache.kafka.clients.admin.AdminClient not on the driver "
            "classpath; load the spark-sql-kafka connector package or rely "
            "on broker auto-create"
        ) from e

    try:
        existing = admin.listTopics().names().get()
        missing = [t for t in topics if not existing.contains(t)]
        if not missing:
            return []
        new_topics = jvm.java.util.ArrayList()
        for t in missing:
            new_topics.add(
                jvm.org.apache.kafka.clients.admin.NewTopic(
                    t, partitions, replication
                )
            )
        created: list[str] = []
        results = admin.createTopics(new_topics).values()
        for t in missing:
            try:
                results.get(t).get()
                created.append(t)
            except Exception as e:  # noqa: BLE001 — inspect the cause
                if "TopicExistsException" in str(e):
                    continue  # raced with another creator: fine
                raise
        return created
    finally:
        admin.close()
