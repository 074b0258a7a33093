"""Streaming-throughput ramp for the unify topology (the reference's
headline workload): events/s in and projections/s out, measured
end-to-end through the REAL streaming path (file source ->
applyInPandasWithState -> memory sink) at 6k / 60k / 600k events.

Two arrival profiles per tier:

- **bulk** — all input visible at start, one micro-batch: the replay /
  backfill profile; measures raw pipeline throughput (stateful shuffle +
  Arrow + per-key merge) with one state-store commit.
- **sustained** — `maxFilesPerTrigger` slices the same input into ~10
  micro-batches: the steady-state profile; includes per-batch state
  commits and scheduling, the realistic cost of continuous ingestion.

Two harness choices below fall straight out of the reference's
semantics (faithfully kept by `make_unify_fn`): an order's projection
is emitted AT BUFFER EXPIRY — the punctuator path — and the
completeness gate silently DROPS buffers still incomplete at that
moment. So (a) the buffer is pure added wall-clock in this harness
(every projection waits buffer_ms after its first event): it is set to
1 s, which preserves the reference's design rule (buffer >> one
order's arrival spread) because input files are LIFECYCLE-ALIGNED time
slices — all 3 events of an order always arrive in the same
micro-batch, spread ~0. And (b) that alignment is load-bearing:
randomly-ordered files scatter an order's events across ~20 s of
micro-batches, the 1 s buffer expires in between, and the gate
(correctly) drops nearly every order — measured before this harness
aligned its input. Real deployments size the buffer to arrival spread
(the reference: 5 s vs <= 200 ms); the harness does the same.

Context (BASELINE.md): the reference's demo generator drives ~3
events/s in / ~1 projection/s out with a 1-thread Kafka Streams
topology; it publishes no engine-limit numbers. These measurements back
the throughput-parity claim with the repo's own scaling evidence: the
per-event cost must stay flat as N grows 100x (state keys grow with
concurrent lifecycles, but each key holds <= 3 events).

Usage:
    python scripts/streaming_throughput.py        # writes STREAMING.md/json

Keep the machine otherwise idle; each tier runs once (streaming wall
clock is already an average over thousands of per-event costs, so
best-of-N adds little here).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafka_stream_unify_order_messages_spark import get_spark
from kafka_stream_unify_order_messages_spark.sources.generator import (
    generate_order_events_distributed,
)
from kafka_stream_unify_order_messages_spark.streaming import unify_stream

_ROOT = Path(__file__).resolve().parent.parent

TIERS = [2_000, 20_000, 200_000]  # lifecycles; x3 = events in
N_FILES = 30  # input parquet files per tier; sustained = 3 per trigger
SCHEMA = (
    "order_id string, type string, timestamp string, order_details string"
)


def run_tier(spark, n_lifecycles: int, src: str, mode: str) -> dict:
    """One measured streaming run; returns the timing record."""
    name = f"tp_{mode}_{n_lifecycles}"
    reader = spark.readStream.schema(SCHEMA)
    if mode == "sustained":
        reader = reader.option("maxFilesPerTrigger", N_FILES // 10)
    stream = reader.parquet(src)
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    t0 = time.time()
    # 1 s buffer: emission happens AT expiry (reference punctuator
    # semantics), so buffer_ms is a per-order latency floor, not a
    # throughput knob; lifecycle-aligned input files keep every order's
    # arrival spread at ~0, satisfying the buffer >> spread rule.
    q = (
        unify_stream(stream, buffer_ms=1000)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 900
        done = 0
        while time.time() < deadline:
            if q.exception():
                raise q.exception()
            done = spark.table(name).count()
            if done >= n_lifecycles:
                break
            time.sleep(0.25)
        elapsed = time.time() - t0
        if done < n_lifecycles:
            raise SystemExit(
                f"{name}: only {done}/{n_lifecycles} projections "
                f"after {elapsed:.0f}s"
            )
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.catalog.dropTempView(name)
    n_events = n_lifecycles * 3
    return {
        "lifecycles": n_lifecycles,
        "events_in": n_events,
        "mode": mode,
        "elapsed_sec": round(elapsed, 2),
        "events_per_sec": round(n_events / elapsed),
        "projections_per_sec": round(n_lifecycles / elapsed),
    }


def main() -> None:
    spark = get_spark(
        "streaming-throughput",
        master="local[32]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    records = []
    for n in TIERS:
        src = tempfile.mkdtemp(prefix=f"tp_src_{n}_")
        (
            # slice = lifecycle index (the generator spaces lifecycles
            # 1 s apart and keeps intra-order gaps <= 200 ms, so the
            # event-time SECOND identifies the lifecycle): range-
            # partitioning on it guarantees no order spans two files
            generate_order_events_distributed(spark, n)
            .select("order_id", "type", "timestamp", "order_details")
            .withColumn(
                "slice",
                (F.unix_millis(F.to_timestamp("timestamp")) / 1000)
                .cast("long"),
            )
            .repartitionByRange(N_FILES, "slice")
            .drop("slice")
            .write.mode("overwrite")
            .parquet(src)
        )
        # warm the streaming machinery once per tier shape so the first
        # measured run doesn't pay one-off python-worker/codegen startup
        if n == TIERS[0]:
            run_tier(spark, n, src, "bulk")
        for mode in ("bulk", "sustained"):
            rec = run_tier(spark, n, src, mode)
            records.append(rec)
            print(
                f"{n:>8} lifecycles {mode:9s} {rec['elapsed_sec']:7.2f}s "
                f"{rec['events_per_sec']:>7} ev/s in "
                f"{rec['projections_per_sec']:>7} proj/s out",
                file=sys.stderr,
            )
        shutil.rmtree(src, ignore_errors=True)
    spark.stop()

    (_ROOT / "STREAMING.json").write_text(
        json.dumps({"records": records}, indent=1) + "\n"
    )
    lines = [
        "# STREAMING — measured unify-topology throughput",
        "",
        "End-to-end through the real streaming path (file source ->",
        "`unify_stream` applyInPandasWithState -> memory sink), local[32],",
        "1 s buffer, lifecycle-aligned time-sliced input files (in-order",
        "arrival, no order spans two micro-batches), every lifecycle",
        "complete. Projections emit AT buffer expiry (reference punctuator",
        "semantics), so buffer_ms is a fixed per-order latency, not part of",
        "the throughput story. **bulk** = whole input in one micro-batch (the",
        "replay/backfill profile, one state commit); **sustained** = the same",
        "input in ~10 micro-batches via maxFilesPerTrigger (steady-state",
        "profile, includes per-batch state commits). Reference context",
        "(BASELINE.md): the demo harness drives ~3 events/s; the reference",
        "publishes no engine-limit numbers, so the claim these numbers back",
        "is throughput headroom + flat per-event cost as N grows 100x.",
        "",
        "| lifecycles | events in | mode | elapsed | events/s in | projections/s out |",
        "|---|---|---|---|---|---|",
    ]
    for r in records:
        lines.append(
            f"| {r['lifecycles']:,} | {r['events_in']:,} | {r['mode']} "
            f"| {r['elapsed_sec']:.2f} s | {r['events_per_sec']:,} "
            f"| {r['projections_per_sec']:,} |"
        )
    bulk = [r for r in records if r["mode"] == "bulk"]
    if len(bulk) >= 2:
        lo, hi = bulk[0], bulk[-1]
        ratio = (hi["events_in"] / hi["elapsed_sec"]) / (
            lo["events_in"] / lo["elapsed_sec"]
        )
        lines += [
            "",
            f"Bulk throughput at {hi['events_in']:,} events is "
            f"{ratio:.1f}x the {lo['events_in']:,}-event rate — per-event "
            "cost falls as fixed micro-batch overhead amortizes; no "
            "super-linear state-store term (state per key is <= 3 events "
            "regardless of N).",
        ]
    lines.append("")
    (_ROOT / "STREAMING.md").write_text("\n".join(lines))
    print(json.dumps({"written": "STREAMING.md", "tiers": len(records)}))


if __name__ == "__main__":
    main()
