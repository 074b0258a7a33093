"""Idempotent foreachBatch sink: replaying a batch id overwrites its own
output instead of duplicating it."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.sinks.foreach_batch import (
    idempotent_parquet_sink,
)


def test_replayed_batch_overwrites_not_duplicates(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = idempotent_parquet_sink(out)

    b0 = spark.createDataFrame([("o1", "a"), ("o2", "b")], "order_id string, v string")
    b1 = spark.createDataFrame([("o3", "c")], "order_id string, v string")

    sink(b0, 0)
    sink(b1, 1)
    # crash-replay of batch 1 with (possibly) different partial content
    sink(b1, 1)

    rows = spark.read.parquet(out).collect()
    assert sorted((r.order_id, r.batch_id) for r in rows) == [
        ("o1", 0),
        ("o2", 0),
        ("o3", 1),
    ]


def test_replay_with_corrected_content_replaces(spark, tmp_path):
    out = str(tmp_path / "out")
    sink = idempotent_parquet_sink(out)
    first_try = spark.createDataFrame([("o1", "partial")], "order_id string, v string")
    replay = spark.createDataFrame(
        [("o1", "full"), ("o2", "full")], "order_id string, v string"
    )
    sink(first_try, 7)
    sink(replay, 7)  # same batch id: full rewrite of batch_id=7
    rows = spark.read.parquet(out).collect()
    assert sorted((r.order_id, r.v) for r in rows) == [
        ("o1", "full"),
        ("o2", "full"),
    ]
    # and only batch_id=7 exists
    assert {r.batch_id for r in rows} == {7}
