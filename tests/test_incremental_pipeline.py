"""End-to-end incremental batch pipeline: JSONL landing zone -> file
ledger -> strict schema read -> flagship unification -> parquet sink,
run twice to prove per-file exactly-once and cross-run completion
(an order whose events arrive split across two landed files unifies
once both halves are in)."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_unify_order_messages_spark.operators.unify import unify_events
from kafka_stream_unify_order_messages_spark.sources.files import read_jsonl
from kafka_stream_unify_order_messages_spark.sources.generator import (
    generate_order_events,
)
from kafka_stream_unify_order_messages_spark.sources.ledger import (
    commit_processed,
    unprocessed_files,
)

SCHEMA = StructType(
    [
        StructField("order_id", StringType()),
        StructField("type", StringType()),
        StructField("topic", StringType()),
        StructField("timestamp", StringType()),
        StructField("order_details", StringType()),
        StructField("arrival_seq", LongType()),
    ]
)


def _land(zone, name, events):
    zone.mkdir(exist_ok=True)
    lines = []
    for e in events:
        lines.append(
            json.dumps(
                {
                    "order_id": e["order_id"],
                    "type": e["type"],
                    "topic": e["topic"],
                    "timestamp": "2024-01-01T00:00:00.000Z",
                    "order_details": e["order_details"],
                    "arrival_seq": e["arrival_seq"],
                }
            )
        )
    (zone / name).write_text("\n".join(lines) + "\n")


def _run_once(spark, zone, ledger, sink):
    work = unprocessed_files(spark, str(zone), ledger)
    names = [r.file_name for r in work.collect()]
    if names:
        paths = [str(zone / n) for n in names]
        raw = read_jsonl(spark, paths[0], SCHEMA, mode="FAILFAST")
        for p in paths[1:]:
            raw = raw.unionByName(read_jsonl(spark, p, SCHEMA, mode="FAILFAST"))
        raw.write.mode("append").parquet(sink + "/staged")
    commit_processed(spark, work, ledger)
    # unify over EVERYTHING staged so far: orders split across files
    # complete only when all their events have landed
    staged = spark.read.parquet(sink + "/staged")
    return unify_events(
        staged,
        payload_cols=["type", "topic", "timestamp", "order_details"],
        arrival_cols=["arrival_seq"],
    )


def test_split_lifecycle_completes_on_second_run(spark, tmp_path):
    zone = tmp_path / "zone"
    ledger = str(tmp_path / "ledger")
    sink = str(tmp_path / "out")

    events = generate_order_events(6, seed=9)
    # split one order's lifecycle across the two files
    split_id = events[0]["order_id"]
    first = [
        e
        for e in events
        if e["order_id"] != split_id or e["type"] == "created"
    ]
    second = [
        e for e in events if e["order_id"] == split_id and e["type"] != "created"
    ]
    _land(zone, "batch1.jsonl", first)

    out1 = _run_once(spark, zone, ledger, sink)
    ids1 = {r.order_id for r in out1.collect()}
    assert split_id not in ids1  # incomplete: only 'created' landed
    assert len(ids1) == 5

    _land(zone, "batch2.jsonl", second)
    out2 = _run_once(spark, zone, ledger, sink)
    ids2 = {r.order_id for r in out2.collect()}
    assert ids2 == ids1 | {split_id}  # completed by the second landing

    # third run with nothing new: no file re-read, same results
    work3 = unprocessed_files(spark, str(zone), ledger)
    assert work3.count() == 0
    staged = spark.read.parquet(sink + "/staged")
    assert staged.count() == len(first) + len(second)  # each file staged once
