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


def test_schema_evolution_merge_and_partition_pruning(spark, tmp_path):
    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.sources.files import (
        load_table,
        read_evolving_dataset,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "evolving")
    # v1 writer: original columns, partitioned by event_type
    write_partitioned_parquet(
        events.select("event_id", "user_id", "value", "event_type"),
        out,
        partition_cols=["event_type"],
        mode="overwrite",
    )
    # v2 writer: schema evolved — a quality_score column was added
    write_partitioned_parquet(
        events.select(
            (F.col("event_id") + 1_000_000).alias("event_id"),
            "user_id",
            "value",
            F.round(F.col("value") / 10.0, 3).alias("quality_score"),
            "event_type",
        ),
        out,
        partition_cols=["event_type"],
        mode="append",
    )

    df = read_evolving_dataset(spark, out)
    assert "quality_score" in df.columns
    assert df.count() == 2 * events.count()
    # old rows surface the added column as null, new rows carry values
    old = df.filter(F.col("event_id") < 1_000_000)
    assert old.filter(F.col("quality_score").isNotNull()).count() == 0
    new = df.filter(F.col("event_id") >= 1_000_000)
    assert new.filter(F.col("quality_score").isNull()).count() == 0

    # directory-partition pruning: a filter on the partition column must
    # become a PartitionFilters entry, not a data-page predicate
    q = df.filter(F.col("event_type") == "view")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
