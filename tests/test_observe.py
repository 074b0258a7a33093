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
        assert t["rows_dropped_by_watermark"] == 0
        # now a LATE batch: first jack the watermark far ahead, then
        # feed rows behind it — the engine drops them and the monitor
        # must surface the count (the deployment alarm for out-of-order
        # arrival vs the watermark delay; DEPLOYMENT.md §5)
        pq.write_table(
            pa.table(
                {
                    "k": ["z"],
                    "timestamp": ["2026-01-01T03:00:00.000Z"],
                }
            ),
            f"{src}/batch-0001.parquet",
        )
        q.processAllAvailable()
        pq.write_table(
            pa.table(
                {
                    "k": ["old1", "old2"],
                    "timestamp": ["2026-01-01T00:01:00.000Z"] * 2,
                }
            ),
            f"{src}/batch-0002.parquet",
        )
        q.processAllAvailable()
        deadline = time.time() + 30
        while time.time() < deadline:
            t = monitor.totals()
            if t["rows_dropped_by_watermark"] >= 2:
                break
            time.sleep(0.3)
        assert monitor.totals()["rows_dropped_by_watermark"] >= 2
    finally:
        q.stop()
        spark.streams.removeListener(monitor)


def test_pin_file_arrival_order(tmp_path):
    """Strictly increasing mtimes in sorted-name order, all in the past
    (a file written afterwards still sorts last) — the property the
    file source needs for in-order rate-limited replay."""
    import os
    import time as _time

    from kafka_stream_unify_order_messages_spark.sources.files import (
        pin_file_arrival_order,
    )

    d = tmp_path / "parts"
    d.mkdir()
    # create in scrambled order so ctime/mtime disagree with name order
    for name in ["part-00002", "part-00000", "part-00001"]:
        (d / name).write_bytes(b"x")
    (d / "unrelated.txt").write_bytes(b"y")
    ordered = pin_file_arrival_order(str(d))
    assert [os.path.basename(f) for f in ordered] == [
        "part-00000", "part-00001", "part-00002",
    ]
    mtimes = [os.stat(f).st_mtime for f in ordered]
    assert mtimes == sorted(mtimes)
    assert len(set(mtimes)) == len(mtimes)  # strictly increasing
    assert mtimes[-1] < _time.time()  # later writes still sort after
    # non-matching files untouched
    assert os.stat(d / "unrelated.txt").st_mtime > mtimes[-1]
