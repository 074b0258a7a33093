"""Streaming throughput smoke: the full unify pipeline must sustain
orders of magnitude more than the reference's demo load (~3 events/s in,
~1 projection/s out — BASELINE.md). Thresholds are deliberately loose so
machine noise cannot flake the test; bench.py is the real measurement.
"""

from __future__ import annotations

import time
import uuid

import pytest

from kafka_stream_unify_order_messages_spark.sources.generator import (
    generate_order_events,
    order_events_df,
)
from kafka_stream_unify_order_messages_spark.streaming import unify_stream

N_LIFECYCLES = 2000  # 6000 events


@pytest.mark.slow
def test_unify_stream_throughput(spark, tmp_path):
    events = generate_order_events(N_LIFECYCLES, seed=3)
    src = tmp_path / "in"
    src.mkdir()
    order_events_df(spark, events).select(
        "order_id", "type", "timestamp", "order_details"
    ).coalesce(4).write.parquet(str(src), mode="overwrite")

    name = f"tp_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(
        "order_id string, type string, timestamp string, order_details string"
    ).parquet(str(src))
    t0 = time.time()
    q = (
        unify_stream(stream, buffer_ms=1000)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if q.exception():
                raise q.exception()
            if spark.table(name).count() >= N_LIFECYCLES:
                break
            time.sleep(0.5)
        elapsed = time.time() - t0
        n_out = spark.table(name).count()
        assert n_out == N_LIFECYCLES
        events_per_sec = (N_LIFECYCLES * 3) / elapsed
        # reference demo load is ~3 events/s; require >= 100x headroom
        assert events_per_sec > 300, f"{events_per_sec:.0f} events/s"
    finally:
        q.stop()
