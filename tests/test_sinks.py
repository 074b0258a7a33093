"""File sink layout: partition directories, row-group clustering, and
Kafka record shaping / topic routing expressions."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.sinks import (
    route_topics,
    to_kafka_records,
    write_partitioned_parquet,
)


def test_partitioned_write_layout_and_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(300)],
        "id long, cat string, v double",
    )
    path = str(tmp_path / "out")
    write_partitioned_parquet(
        df, path, partition_cols=["cat"], sort_cols=["id"]
    )
    dirs = sorted(d for d in os.listdir(path) if d.startswith("cat="))
    assert dirs == ["cat=a", "cat=b", "cat=c"]
    # one data file per partition directory (repartition before write)
    for d in dirs:
        files = [f for f in os.listdir(f"{path}/{d}") if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    back = spark.read.parquet(path)
    assert back.count() == 300
    # partition pruning: reading one category scans one directory
    plan = (
        back.filter(F.col("cat") == "b")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(cat" in plan


def test_kafka_record_shaping_and_routing(spark):
    df = spark.createDataFrame(
        [("o1", '{"a":1}', "error"), ("o2", '{"b":2}', "click")],
        "order_id string, payload string, event_type string",
    )
    topic = route_topics(
        df,
        [(F.col("event_type") == "error", "errors")],
        default="projections",
    )
    recs = to_kafka_records(df, topic=topic).collect()
    by_key = {r.key: (r.value, r.topic) for r in recs}
    assert by_key["o1"] == ('{"a":1}', "errors")
    assert by_key["o2"] == ('{"b":2}', "projections")
    assert [f.name for f in to_kafka_records(df, topic=topic).schema] == [
        "key", "value", "topic",
    ]


def test_range_layout_write_globally_sorted_and_file_bounded(spark, tmp_path):
    import pyarrow.parquet as pq
    from pathlib import Path

    from kafka_stream_unify_order_messages_spark.sources.files import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_ranged")
    write_partitioned_parquet(
        events,
        out,
        range_cols=["user_id"],
        target_file_rows=200,
    )

    files = sorted(Path(out).glob("*.parquet"))
    assert len(files) > 1
    spans = []
    for f in files:
        t = pq.read_table(f, columns=["user_id"])
        ids = t.column("user_id").to_pylist()
        assert len(ids) <= 200  # maxRecordsPerFile honored
        assert ids == sorted(ids)  # in-file clustering
        spans.append((min(ids), max(ids)))
    # global sort layout: key ranges of distinct range-buckets overlap
    # only via maxRecordsPerFile splits of the SAME bucket, so when
    # sorted by min the ranges are non-decreasing
    spans.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_lo <= b_lo and a_hi <= b_hi

    # roundtrip: nothing lost, schema stable
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert set(back.columns) == set(events.columns)
