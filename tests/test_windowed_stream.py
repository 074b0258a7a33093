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


def test_windowed_value_histogram_counts_and_clamps(spark, tmp_path):
    from kafka_stream_unify_order_messages_spark.streaming.windowed import (
        windowed_value_histogram,
    )

    src = tmp_path / "in"
    src.mkdir()
    name = f"wh_{uuid.uuid4().hex[:8]}"
    schema = "event_id long, value double, timestamp string"
    events = spark.readStream.schema(schema).parquet(str(src))
    q = (
        windowed_value_histogram(
            events, value_col="value", lo=0.0, hi=1.0, n_bins=4,
            window="10 seconds", watermark_delay="5 seconds",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def evv(eid, value, second):
        minute, sec = divmod(second, 60)
        return (eid, value, f"2026-01-01T00:{minute:02d}:{sec:02d}.000Z")

    try:
        # window [0,10): bins 0,0,1,3 + out-of-range clamps to edge bins
        write_batch_v = lambda rows, n: pq.write_table(  # noqa: E731
            pa.table({
                "event_id": [r[0] for r in rows],
                "value": [r[1] for r in rows],
                "timestamp": [r[2] for r in rows],
            }),
            f"{src}/vbatch-{n:04d}.parquet",
        )
        write_batch_v(
            [
                evv(1, 0.05, 1), evv(2, 0.20, 2), evv(3, 0.30, 3),
                evv(4, 0.90, 4), evv(5, -3.0, 5), evv(6, 42.0, 6),
            ],
            0,
        )
        q.processAllAvailable()
        # watermark kicker closes window [0,10)
        write_batch_v([evv(7, 0.5, 120)], 1)
        q.processAllAvailable()
        assert drain(spark, q, name)
        rows = {
            (r.window_start.second, r.bin): r.cnt
            for r in spark.table(name).collect()
            if r.window_start.second == 0
        }
        # 0.05, 0.20 -> bin 0; -3.0 clamps to 0; 0.30 -> bin 1;
        # 0.90 -> bin 3; 42.0 clamps to 3
        assert rows == {(0, 0): 3, (0, 1): 1, (0, 3): 2}
    finally:
        q.stop()


def test_windowed_histogram_merges_with_batch_sketch(spark):
    """Additivity across legs: the stream-shaped histogram computed in
    batch mode merges with merge_histogram_sketches exactly like any
    per-group sketch (shared fixed binning)."""
    from kafka_stream_unify_order_messages_spark.operators import sketches as SK
    from kafka_stream_unify_order_messages_spark.streaming.windowed import (
        windowed_value_histogram,
    )
    import pyspark.sql.functions as F

    rows = [
        (i, (i % 10) / 10.0, f"2026-01-01T00:00:{i % 50:02d}.000Z")
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, value double, timestamp string"
    )
    wh = windowed_value_histogram(df, lo=0.0, hi=1.0, n_bins=4)
    # windows partition the data, so summing the per-window sketches must
    # reproduce the direct batch histogram over the same fixed binning
    merged = (
        wh.select(
            F.lit(0.0).alias("lo"), F.lit(1.0).alias("hi"), "bin", "cnt"
        )
        .groupBy("lo", "hi", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = (
        df.select(
            F.least(
                F.greatest(
                    F.floor(F.col("value") * 4).cast("long"),
                    F.lit(0).cast("long"),
                ),
                F.lit(3).cast("long"),
            ).alias("bin")
        )
        .groupBy("bin")
        .count()
    )
    got = {r["bin"]: r["cnt"] for r in merged.collect()}
    want = {r["bin"]: r["count"] for r in direct.collect()}
    assert got == want and sum(got.values()) == 200


def test_streamed_sketches_roll_up_to_coarser_grain(spark, tmp_path):
    """The docstring's roll-up claim, exercised from a REAL stream: the
    10 s window sketches a stream emits are re-grained to 1 minute by
    truncating window_start and summing bins (merge identity), and the
    per-minute quantile read over the rolled-up sketch equals the one
    computed directly from the raw rows in batch — the sketch never has
    to be recomputed from data to serve a coarser grain."""
    import uuid as _uuid

    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.operators import (
        sketches as SK,
    )
    from kafka_stream_unify_order_messages_spark.streaming.windowed import (
        windowed_value_histogram,
    )

    src = tmp_path / "in"
    src.mkdir()
    name = f"ru_{_uuid.uuid4().hex[:8]}"
    cols = ["event_id", "value", "timestamp"]
    rows = [
        (i, float((i * 37) % 100), f"2026-01-01T00:{(i // 60) % 3:02d}:{i % 60:02d}.000Z")
        for i in range(180)
    ]
    table = pa.table({k: [r[j] for r in rows] for j, k in enumerate(cols)})
    pq.write_table(table, f"{src}/batch-0000.parquet")
    # kicker: closes every real 10 s window in append mode
    kick = pa.table(
        {
            "event_id": [10_000],
            "value": [0.0],
            "timestamp": ["2026-01-01T09:00:00.000Z"],
        }
    )

    events = spark.readStream.schema(
        "event_id long, value double, timestamp string"
    ).parquet(str(src))
    q = (
        windowed_value_histogram(
            events, lo=0.0, hi=100.0, n_bins=8, window="10 seconds"
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        pq.write_table(kick, f"{src}/batch-0001.parquet")
        q.processAllAvailable()
        streamed = spark.table(name).filter(
            F.col("window_start") < F.lit("2026-01-01T08:00:00")
        )
        # re-grain WITHOUT touching data: minute = trunc(window_start),
        # shared fixed binning rides along as (lo, hi) literals
        minute_sk = (
            streamed.select(
                F.date_trunc("minute", "window_start").alias("minute"),
                F.lit(0.0).alias("lo"),
                F.lit(100.0).alias("hi"),
                "bin",
                "cnt",
            )
            .groupBy("minute", "lo", "hi", "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
        est = SK.histogram_quantiles(
            minute_sk, [0.5, 0.9], n_bins=8, group_col="minute"
        )
        got = {
            (r["minute"].isoformat(), r["q"]): round(r["estimate"], 6)
            for r in est.collect()
        }
        # direct batch reference at the coarser grain, same binning
        raw = spark.createDataFrame(
            rows, "event_id long, value double, timestamp string"
        ).select(
            F.date_trunc(
                "minute", F.to_timestamp("timestamp")
            ).alias("minute"),
            "value",
        )
        direct = (
            raw.crossJoin(
                F.broadcast(
                    raw.agg(
                        F.lit(0.0).alias("lo"), F.lit(100.0).alias("hi")
                    )
                )
            )
            .groupBy(
                "minute",
                "lo",
                "hi",
                F.least(
                    F.greatest(
                        F.floor(F.col("value") / 100.0 * 8).cast("long"),
                        F.lit(0).cast("long"),
                    ),
                    F.lit(7).cast("long"),
                ).alias("bin"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        want = {
            (r["minute"].isoformat(), r["q"]): round(r["estimate"], 6)
            for r in SK.histogram_quantiles(
                direct, [0.5, 0.9], n_bins=8, group_col="minute"
            ).collect()
        }
        assert got == want and len(got) == 6  # 3 minutes x 2 quantiles
    finally:
        q.stop()
        spark.catalog.dropTempView(name)
