"""P1 parity e2e: observation metrics surface per micro-batch through
StreamingQueryProgress (the scalable replacement for the reference's
printf-per-record peek)."""

from __future__ import annotations

import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from kafka_stream_unify_order_messages_spark.functions.normalize import (
    observe_counts,
)


def test_observed_metrics_in_streaming_progress(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "order_id": ["o1", "o2", None, "o3"],
                "type": ["created", "placed", "created", "cancelled"],
            }
        ),
        f"{src}/batch-0000.parquet",
    )
    name = f"obs_{uuid.uuid4().hex[:8]}"
    events = spark.readStream.schema("order_id string, type string").parquet(
        str(src)
    )
    observed = observe_counts(events, name="source")
    q = (
        observed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        deadline = time.time() + 30
        metrics = None
        while time.time() < deadline:
            for p in q.recentProgress:
                om = p.get("observedMetrics", {})
                if "source" in om and om["source"]["n_records"]:
                    metrics = om["source"]
                    break
            if metrics:
                break
            time.sleep(0.3)
        assert metrics is not None, "no observed metrics surfaced"
        assert metrics["n_records"] == 4
        assert metrics["n_null_ids"] == 1
    finally:
        q.stop()


def test_observed_metrics_batch(spark):
    df = spark.createDataFrame(
        [("o1", "created"), (None, "placed")], "order_id string, type string"
    )
    observed = observe_counts(df, name="batch_src")
    observed.collect()
    # batch observation is read through the DataFrame's observation API;
    # semantics identical, side-channel only — data unchanged
    assert observed.columns == df.columns
    assert observed.count() == 2


def test_progress_monitor_collects_batches_and_state(spark, tmp_path):
    from kafka_stream_unify_order_messages_spark.sinks.monitor import (
        attach_monitor,
    )
    from kafka_stream_unify_order_messages_spark.streaming import (
        dedup_within_watermark,
    )

    src = tmp_path / "in"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "k": ["a", "a", "b", "c"],
                "timestamp": ["2026-01-01T00:00:0%d.000Z" % i for i in range(4)],
            }
        ),
        f"{src}/batch-0000.parquet",
    )
    monitor = attach_monitor(spark)
    name = f"mon_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema("k string, timestamp string").parquet(
        str(src)
    )
    deduped = dedup_within_watermark(stream, ["k"])
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # listener delivery is async: poll until the batch shows up
        deadline = time.time() + 30
        while time.time() < deadline:
            t = monitor.totals()
            if t["input_rows"] >= 4 and t["max_state_rows"]:
                break
            time.sleep(0.3)
        t = monitor.totals()
        assert t["batches"] >= 1
        assert t["input_rows"] >= 4
        # dedup state holds the 3 distinct keys
        assert t["max_state_rows"] == 3
    finally:
        q.stop()
        spark.streams.removeListener(monitor)
