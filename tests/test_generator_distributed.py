"""Scale-path generator (spark.range + md5-derived expressions): same
statistical shape at any parallelism, no driver materialization."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.operators.unify import unify_events
from kafka_stream_unify_order_messages_spark.sources.generator import (
    generate_order_events_distributed,
)


def test_distributed_generator_shape_and_determinism(spark):
    df = generate_order_events_distributed(spark, 200, seed=5)
    assert df.columns == ["order_id", "type", "topic", "timestamp", "order_details"]
    assert df.count() == 600  # 3 events per lifecycle, no injection
    # deterministic across evaluations and partitioning
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in df.repartition(13).collect())
    assert a == b
    types = {r.type for r in df.select("type").distinct().collect()}
    assert types == {"created", "placed", "cancelled"}


def test_distributed_generator_missing_injection_rate(spark):
    n = 2000
    df = generate_order_events_distributed(
        spark, n, missing_probability=0.3, seed=5
    )
    per_order = df.groupBy("order_id").count()
    n_incomplete = per_order.filter(F.col("count") < 3).count()
    # md5 draw: expect ~30% of lifecycles affected (each drops >= 1 event)
    assert 0.25 * n <= n_incomplete <= 0.35 * n
    # dropped events follow the three reference patterns: never 0 events
    assert per_order.filter(F.col("count") == 0).count() == 0


def test_distributed_generator_feeds_unify(spark):
    df = generate_order_events_distributed(spark, 100, missing_probability=0.4, seed=9)
    out = unify_events(
        df,
        id_col="order_id",
        type_col="type",
        arrival_cols=["timestamp"],
        payload_cols=["type", "timestamp"],
        topic_col="topic",
    )
    complete_ids = {
        r.order_id
        for r in df.groupBy("order_id")
        .agg(F.countDistinct("type").alias("nt"))
        .filter(F.col("nt") == 3)
        .collect()
    }
    got = {r.order_id for r in out.collect()}
    assert got == complete_ids
    assert 0 < len(got) < 100
