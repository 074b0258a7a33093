"""Stream-stream join (event-time-bounded) and streaming dedup with
watermark-bounded state."""

from __future__ import annotations

import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from kafka_stream_unify_order_messages_spark.streaming.joins import (
    dedup_within_watermark,
    stream_stream_join,
)

SCHEMA = "order_id string, type string, timestamp string"
COLS = ["order_id", "type", "timestamp"]


def write_batch(src_dir, rows, batch_no):
    table = pa.table({k: [r[i] for r in rows] for i, k in enumerate(COLS)})
    pq.write_table(table, f"{src_dir}/batch-{batch_no:04d}.parquet")


def ev(order_id, etype, second):
    minute, sec = divmod(second, 60)
    return (order_id, etype, f"2026-01-01T00:{minute:02d}:{sec:02d}.000Z")


def drain(spark, query, name, min_rows, timeout_s=60):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if query.exception():
            raise query.exception()
        if spark.table(name).count() >= min_rows:
            return True
        time.sleep(0.3)
    return False


def test_stream_stream_join_within_lag(spark, tmp_path):
    (tmp_path / "l").mkdir()
    (tmp_path / "r").mkdir()
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    created = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "l"))
    placed = spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "r"))
    joined = stream_stream_join(
        created,
        placed,
        on="order_id",
        watermark_delay="5 seconds",
        max_lag="30 seconds",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        write_batch(tmp_path / "l", [ev("o1", "created", 0),
                                     ev("o2", "created", 10)], 0)
        write_batch(
            tmp_path / "r",
            [
                ev("o1", "placed", 20),   # within 30 s of o1 created: match
                ev("o2", "placed", 55),   # 45 s after o2 created: NO match
            ],
            0,
        )
        q.processAllAvailable()
        assert drain(spark, q, name, 1)
        rows = spark.table(name).collect()
        matched = {r.l_order_id for r in rows}
        assert matched == {"o1"}
        [r] = rows
        assert r.r_type == "placed" and r.l_type == "created"
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    name = f"dd_{uuid.uuid4().hex[:8]}"
    events = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        dedup_within_watermark(
            events, keys=["order_id", "type"], watermark_delay="10 seconds"
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        write_batch(
            src,
            [
                ev("o1", "created", 0),
                ev("o1", "created", 2),   # duplicate inside the delay
                ev("o1", "placed", 3),
            ],
            0,
        )
        q.processAllAvailable()
        write_batch(src, [ev("o1", "created", 4)], 1)  # still duplicate
        q.processAllAvailable()
        assert drain(spark, q, name, 2)
        rows = [(r.order_id, r.type) for r in spark.table(name).collect()]
        assert sorted(rows) == [("o1", "created"), ("o1", "placed")]
    finally:
        q.stop()
