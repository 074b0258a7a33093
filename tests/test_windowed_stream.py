"""Streaming event-time windowed aggregations: watermark advance, late-row
merging, session windows — file source -> append-mode memory sink."""

from __future__ import annotations

import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from kafka_stream_unify_order_messages_spark.streaming.windowed import (
    session_windows,
    tumbling_counts,
)

SCHEMA = "order_id string, type string, timestamp string"
COLS = ["order_id", "type", "timestamp"]


def write_batch(src_dir, rows, batch_no):
    table = pa.table({k: [r[i] for r in rows] for i, k in enumerate(COLS)})
    pq.write_table(table, f"{src_dir}/batch-{batch_no:04d}.parquet")


def ev(order_id, etype, second):
    minute, sec = divmod(second, 60)
    return (order_id, etype, f"2026-01-01T00:{minute:02d}:{sec:02d}.000Z")


def drain(spark, query, name, min_rows=1, timeout_s=60):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if query.exception():
            raise query.exception()
        if spark.table(name).count() >= min_rows:
            return True
        time.sleep(0.3)
    return False


def test_tumbling_counts_with_late_data(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    name = f"tw_{uuid.uuid4().hex[:8]}"
    events = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        tumbling_counts(events, window="10 seconds", watermark_delay="5 seconds")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        write_batch(src, [ev("a", "click", 1), ev("a", "click", 3)], 0)
        q.processAllAvailable()
        # late row for the same window, inside the watermark delay: merges
        write_batch(src, [ev("b", "click", 4)], 1)
        q.processAllAvailable()
        # watermark push far past window 0-10 + delay: window finalizes
        write_batch(src, [ev("c", "click", 120)], 2)
        q.processAllAvailable()
        assert drain(spark, q, name)
        rows = {
            (r.window_start.second, r.type): r.n
            for r in spark.table(name).collect()
        }
        assert rows[(0, "click")] == 3  # 2 on-time + 1 late, one output row
    finally:
        q.stop()


def test_session_windows_gap_split(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    name = f"sw_{uuid.uuid4().hex[:8]}"
    events = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        session_windows(events, gap="10 seconds", watermark_delay="2 seconds")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # two bursts for o1 separated by > gap: two sessions
        write_batch(
            src,
            [ev("o1", "e", 0), ev("o1", "e", 5), ev("o1", "e", 8),
             ev("o1", "e", 40), ev("o1", "e", 45)],
            0,
        )
        q.processAllAvailable()
        write_batch(src, [ev("hb", "e", 300)], 1)  # close both sessions
        q.processAllAvailable()
        assert drain(spark, q, name, min_rows=2)
        sessions = sorted(
            (r.session_start.second, r.n_events)
            for r in spark.table(name).collect()
            if r.order_id == "o1"
        )
        assert sessions == [(0, 3), (40, 2)]
    finally:
        q.stop()


def test_sliding_counts_overlapping_windows(spark, tmp_path):
    from kafka_stream_unify_order_messages_spark.streaming.windowed import (
        sliding_counts,
    )

    src = tmp_path / "in_slide"
    src.mkdir()
    name = f"sw_{uuid.uuid4().hex[:8]}"
    events = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        sliding_counts(
            events,
            window="10 seconds",
            slide="5 seconds",
            watermark_delay="5 seconds",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .start()
    )
    try:
        # second 7 lands in windows [0,10) and [5,15)
        write_batch(src, [ev("a", "click", 7)], 0)
        q.processAllAvailable()
        # advance watermark far past both windows so they emit
        write_batch(src, [ev("z", "click", 50)], 1)
        q.processAllAvailable()
        write_batch(src, [ev("z", "click", 80)], 2)
        q.processAllAvailable()
        rows = {
            (r["window_start"].second + 60 * r["window_start"].minute, r["n"])
            for r in spark.table(name).filter("type = 'click'").collect()
            if r["window_start"].minute == 0 and r["window_start"].second < 20
        }
        assert (0, 1) in rows and (5, 1) in rows
    finally:
        q.stop()


def test_trending_topk_stream_ranks_in_foreach_batch(spark, tmp_path):
    """Aggregate in the stream, rank at the edge: tumbling counts flow
    append-mode into a foreachBatch sink that applies rank_topk per
    closed window."""
    from kafka_stream_unify_order_messages_spark.streaming.windowed import (
        rank_topk,
        trending_topk,
    )

    src = tmp_path / "in"
    src.mkdir()
    out: list = []

    def sink(batch_df, batch_id):
        out.extend(rank_topk(batch_df, k=2).collect())

    events = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = (
        trending_topk(events, window="10 seconds",
                      key_col="type", watermark_delay="5 seconds")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # window [0,10): a x3, b x2, c x1 -> top-2 = a, b
        rows = (
            [ev(f"o{i}", "a", 1) for i in range(3)]
            + [ev(f"p{i}", "b", 2) for i in range(2)]
            + [ev("q0", "c", 3)]
        )
        write_batch(src, rows, 0)
        q.processAllAvailable()
        # advance the watermark past window end so [0,10) closes
        write_batch(src, [ev("z0", "a", 40)], 1)
        q.processAllAvailable()
        write_batch(src, [ev("z1", "a", 80)], 2)
        q.processAllAvailable()
        got = {
            (r["type"], r["n"], r["rnk"])
            for r in out
            if r["window_start"].second == 0 and r["window_start"].minute == 0
        }
        assert ("a", 3, 1) in got
        assert ("b", 2, 2) in got
        assert not any(t == "c" for t, _, _ in got)
    finally:
        q.stop()
