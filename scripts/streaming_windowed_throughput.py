"""Streaming windowed-histogram throughput (streaming/windowed.py:
windowed_value_histogram): events/s through the event-time tumbling
histogram sketch, measured end-to-end (file source -> watermarked
window aggregation -> memory sink), with the emitted rows checked
row-for-row against the batch twin on the same input — the same
evidentiary standard as STREAMING_DEDUP.md gives the dedup stream
(the batch twin `windowed_histogram` is strict-oracled; this measures
the STREAMING leg and pins stream==batch on the measured corpus).

Harness shape: synthetic (event_id, ts, value) rows with monotone
event-time spanning ~2 hours, 1-minute windows, 30 s watermark. Files
are range-partitioned by id so arrival order tracks event time (no
late drops — parity with the batch twin stays exact). Append mode only
emits a window once the watermark passes its end, so after the real
input drains a far-future KICKER event closes the remaining windows
(the streaming_throughput.py event-time pattern); the kicker's own
1-row window is excluded from the parity compare on both sides.

**bulk** = all input in one micro-batch; **sustained** = ~10
micro-batches via maxFilesPerTrigger (per-batch state commits against
live window state — the steady-state profile). State is O(active
windows x bins), watermark-dropped, independent of event count — the
property that makes this sketch the 100 TB streaming-quantile answer.

Usage:
    python scripts/streaming_windowed_throughput.py  # writes STREAMING_WINDOWED.md/json
    SPARK_WINDOWED_TIERS=100000 python scripts/streaming_windowed_throughput.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark import get_spark
from kafka_stream_unify_order_messages_spark.streaming.windowed import (
    windowed_value_histogram,
)

_ROOT = Path(__file__).resolve().parent.parent
TIERS = [
    int(t)
    for t in os.environ.get(
        "SPARK_WINDOWED_TIERS", "100000,1000000"
    ).split(",")
    if t.strip()
]
N_FILES = 20
SPAN_SEC = 7200  # event time spans 2 hours -> 120 one-minute windows
SCHEMA = "event_id long, ts timestamp, value double"
BASE_TS = "2026-01-01 00:00:00"
KICKER_TS = "2026-06-01 00:00:00"  # far future: closes every real window


def synth_events(spark, n: int):
    """Monotone event-time rows: ts = base + id * (span / n), value
    deterministic in [0, 1000) so every bin is populated."""
    step = SPAN_SEC / n
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0), F.col("id") * F.lit(step)
            )
        ).alias("ts"),
        ((F.col("id") * 37 % 1000) + 0.5).cast("double").alias("value"),
    )


def _kicker(spark):
    return spark.createDataFrame(
        [(int(-1), KICKER_TS, 0.5)], "event_id long, ts string, value double"
    ).select(
        "event_id", F.to_timestamp("ts").alias("ts"), "value"
    )


def run_tier(spark, n_events: int, src: str, mode: str) -> dict:
    name = f"wtp_{mode}_{n_events}"
    reader = spark.readStream.schema(SCHEMA)
    if mode == "sustained":
        reader = reader.option("maxFilesPerTrigger", N_FILES // 10)
    stream = reader.parquet(src)
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    wh = windowed_value_histogram(
        stream, ts_col="ts", value_col="value",
        lo=0.0, hi=1000.0, n_bins=16,
        window="1 minute", watermark_delay="30 seconds",
    )
    q = (
        wh.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    t0 = time.time()
    try:
        q.processAllAvailable()  # drain the real input
        # close remaining windows: the kicker advances the watermark
        # past every real window end
        _kicker(spark).write.mode("append").parquet(src)
        q.processAllAvailable()
        elapsed = time.time() - t0
        got = (
            spark.table(name)
            .filter(F.col("window_start") < F.to_timestamp(F.lit(KICKER_TS)))
            .select("window_start", "window_end", "bin", "cnt")
        )
        want = windowed_value_histogram(
            synth_events(spark, n_events),
            ts_col="ts", value_col="value",
            lo=0.0, hi=1000.0, n_bins=16, window="1 minute",
        )
        n_rows = got.count()
        n_want = want.count()
        n_match = got.join(
            want, ["window_start", "window_end", "bin", "cnt"]
        ).count()
        assert n_rows == n_want == n_match, (n_rows, n_want, n_match)
        prog = q.lastProgress
        state_rows = (
            prog["stateOperators"][0]["numRowsTotal"] if prog else None
        )
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.catalog.dropTempView(name)
    return {
        "events_in": n_events,
        "mode": mode,
        "elapsed_sec": round(elapsed, 2),
        "events_per_sec": round(n_events / elapsed),
        "sketch_rows_out": n_rows,
        "batch_twin_match": True,
        "state_rows_final": state_rows,
    }


def main() -> None:
    spark = get_spark(
        "streaming-windowed-throughput",
        master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    records = []
    for n in TIERS:
        src = tempfile.mkdtemp(prefix=f"wtp_src_{n}_")
        # range-partition by id AND stamp mtimes in path order: file
        # content tracks event time, and FileStreamSource orders by
        # modification time (parallel write tasks scramble it), so the
        # watermark never sees out-of-order arrival and never drops a
        # row — stream==batch stays exact
        synth_events(spark, n).repartitionByRange(
            N_FILES, "event_id"
        ).write.mode("overwrite").parquet(src)
        base = time.time() - 10_000
        for i, p in enumerate(sorted(Path(src).glob("part-*.parquet"))):
            os.utime(p, (base + i, base + i))
        try:
            for mode in ("bulk", "sustained"):
                rec = run_tier(spark, n, src, mode)
                records.append(rec)
                print(json.dumps(rec), flush=True)
        finally:
            shutil.rmtree(src, ignore_errors=True)

    prior_path = _ROOT / "STREAMING_WINDOWED.json"
    if prior_path.exists():
        key = lambda r: (r["events_in"], r["mode"])  # noqa: E731
        fresh = {key(r) for r in records}
        records = [
            r
            for r in json.loads(prior_path.read_text())
            if key(r) not in fresh
        ] + records
        records.sort(key=lambda r: (r["events_in"], r["mode"]))
    prior_path.write_text(json.dumps(records, indent=1) + "\n")

    lines = [
        "# STREAMING_WINDOWED — measured windowed-histogram stream throughput",
        "",
        "The STREAMING leg of the mergeable histogram quantile sketch",
        "(streaming/windowed.py:windowed_value_histogram; batch twin",
        "`windowed_histogram` is strict-oracled): event-time 1-minute",
        "tumbling windows, 16 fixed-bounds bins, 30 s watermark, measured",
        "end-to-end (file source -> watermarked window agg -> memory",
        "sink) on local[32]. Every run's emitted sketch rows are checked",
        "ROW-FOR-ROW against the batch twin on the same input (the",
        "`batch_twin_match` column is an assertion, not a claim).",
        "**bulk** = one micro-batch; **sustained** = ~10 micro-batches",
        "(per-batch commits against live window state). State is",
        "O(active windows x bins) — watermark-dropped, independent of",
        "event count.",
        "",
        "| events | mode | elapsed | events/s | sketch rows out "
        "| == batch twin | state rows final |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in records:
        lines.append(
            f"| {r['events_in']:,} | {r['mode']} | {r['elapsed_sec']} s "
            f"| {r['events_per_sec']:,} | {r['sketch_rows_out']:,} "
            f"| {'yes' if r['batch_twin_match'] else 'NO'} "
            f"| {r['state_rows_final']} |"
        )
    bulk = {
        r["events_in"]: r["events_per_sec"]
        for r in records
        if r["mode"] == "bulk"
    }
    tiers = sorted(bulk)
    if len(tiers) >= 2:
        lo, hi = tiers[0], tiers[-1]
        lines += [
            "",
            f"Bulk throughput at {hi:,} events is "
            f"{bulk[hi] / bulk[lo]:.1f}x the {lo:,}-event rate across a "
            f"{hi // lo}x ramp — per-event cost falls as micro-batch "
            "overhead amortizes; the aggregation state term is constant "
            "(bins x active windows, both fixed here).",
        ]
    (_ROOT / "STREAMING_WINDOWED.md").write_text("\n".join(lines) + "\n")
    print(f"wrote STREAMING_WINDOWED.md with {len(records)} rows")
    spark.stop()


if __name__ == "__main__":
    main()
