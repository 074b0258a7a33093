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
