"""Unit coverage for the measurement harnesses' load-bearing helpers
(scripts/streaming_latency.py, scripts/streaming_throughput.py): the
measured numbers are only meaningful if the harness feeds the stream
byte-identical wire data and never splits an order across files.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.sources.generator import (
    generate_order_events,
    generate_order_events_distributed,
    order_events_df,
)

_SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def _load_module(name: str):
    spec = importlib.util.spec_from_file_location(name, _SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_latency_iso_matches_wire_format(spark):
    """_iso must produce byte-identical timestamps to order_events_df's
    wire form — otherwise the latency harness measures a different
    serde path than the one the reference parity tests pin."""
    lat = _load_module("streaming_latency")
    events = generate_order_events(20, seed=5)
    wire = {
        (r["order_id"], r["type"]): r["timestamp"]
        for r in order_events_df(spark, events)
        .select("order_id", "type", "timestamp")
        .collect()
    }
    for e in events:
        assert lat._iso(e["timestamp_ms"]) == wire[(e["order_id"], e["type"])]


def test_latency_wave_table_schema_and_grouping():
    lat = _load_module("streaming_latency")
    events = generate_order_events(5, seed=7)
    t = lat._wave_table(events)
    assert t.column_names == list(lat.COLS)
    assert t.num_rows == len(events)
    # all-string wire schema (the stream reader's schema contract)
    assert all(str(f.type) == "string" for f in t.schema)


def test_throughput_slices_never_split_an_order(spark):
    """The throughput harness's lifecycle-aligned slicing is load-bearing
    (random order + short buffer drops ~everything — see the script
    docstring): every order's 3 events must land in ONE slice."""
    n_files = 10
    df = (
        generate_order_events_distributed(spark, 500)
        .select("order_id", "type", "timestamp", "order_details")
        .withColumn(
            "slice",
            (F.unix_millis(F.to_timestamp("timestamp")) / 1000).cast("long"),
        )
        .repartitionByRange(n_files, "slice")
        .withColumn("pid", F.spark_partition_id())
    )
    split = (
        df.groupBy("order_id")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .filter(F.col("n_parts") > 1)
        .count()
    )
    assert split == 0


def test_dedup_throughput_corpus_has_designed_dup_structure(spark):
    """STREAMING_DEDUP.md's load-bearing generator: every 10th doc
    re-sends doc (i-9)'s text VERBATIM (so exactly one of each pair is
    flagged regardless of intra-batch arrival order), non-resend texts
    are distinct, and generation is deterministic."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from streaming_dedup_throughput import synth_docs

    rows = {r["doc_id"]: r["text"] for r in synth_docs(spark, 200).collect()}
    assert len(rows) == 200
    for i in range(9, 200, 10):
        assert rows[i] == rows[i - 9], i
    originals = [rows[i] for i in range(200) if i % 10 != 9]
    assert len(set(originals)) == len(originals)  # no accidental dups
    again = {r["doc_id"]: r["text"] for r in synth_docs(spark, 200).collect()}
    assert again == rows


def test_ttl_study_corpus_mixed_near_far_structure(spark):
    """The TTL retention study's generator (synth_docs_mixed): near dups
    re-send (i-9) verbatim, far dups injectively re-send the opening 5%
    (each far target re-sent exactly once — a re-used target's bucket
    would be re-claimed by its first re-send and hide the recall trade),
    and generation is deterministic."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "scripts")
    )
    from streaming_dedup_throughput import synth_docs_mixed

    n = 400
    rows = {
        r["doc_id"]: r["text"]
        for r in synth_docs_mixed(spark, n).collect()
    }
    assert len(rows) == n
    far_targets = []
    for i in range(n):
        if i % 10 == 9 and i >= 9:
            assert rows[i] == rows[i - 9], f"near dup broken at {i}"
        elif i % 10 == 4 and i >= n // 2:
            j = (i - n // 2 - 4) // 5
            # even target inside the opening batch: never a near-dup
            # re-sender, so the far doc is a TRUE verbatim dup
            assert j % 2 == 0 and j < n // 10
            assert rows[i] == rows[j], f"far dup broken at {i}->{j}"
            far_targets.append(j)
    # injective far mapping
    assert len(far_targets) == n // 20
    assert len(set(far_targets)) == len(far_targets)
    again = {
        r["doc_id"]: r["text"]
        for r in synth_docs_mixed(spark, n).collect()
    }
    assert again == rows


def test_windowed_throughput_events_monotone_and_kicker_closes(spark):
    """STREAMING_WINDOWED.md's generator: event time is monotone in id
    (so range-partitioned + mtime-stamped files give in-order arrival
    and the watermark never drops a row) and the kicker's timestamp is
    beyond every real window end."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "scripts")
    )
    from streaming_windowed_throughput import _kicker, synth_events

    ev = synth_events(spark, 500).orderBy("event_id").collect()
    ts = [r["ts"] for r in ev]
    assert all(a <= b for a, b in zip(ts, ts[1:]))
    assert all(0.0 <= r["value"] < 1000.0 for r in ev)
    kick = _kicker(spark).collect()[0]["ts"]
    assert kick > ts[-1]


def test_bench_diff_classifies_wall_up_cpu_down_as_mixed(tmp_path, capsys, monkeypatch):
    """The classifier's docstring defines contention as wall-up with cpu
    FLAT; a query whose CPU got cheaper while wall regressed is evidence
    of a shape change under load, not host noise — it must land in the
    'mixed' bucket, never be laundered as contention."""
    import importlib
    import json

    bench_diff = importlib.import_module("scripts.bench_diff")

    old = {"value": 10.0, "cpu_value": 20.0,
           "queries": {"q_mixed": 2.0, "q_cont": 2.0, "q_reg": 2.0},
           "queries_cpu": {"q_mixed": 8.0, "q_cont": 8.0, "q_reg": 2.0}}
    new = {"value": 14.0, "cpu_value": 16.0,
           # all three wall-up past 1.5x; cpu: down / flat / up
           "queries": {"q_mixed": 4.0, "q_cont": 4.0, "q_reg": 4.0},
           "queries_cpu": {"q_mixed": 4.0, "q_cont": 8.2, "q_reg": 4.0}}
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))

    monkeypatch.setattr(sys, "argv", ["bench_diff.py", str(po), str(pn)])
    bench_diff.main()
    out = capsys.readouterr().out
    section = {}
    current = None
    for line in out.splitlines():
        if line.endswith("):") and "(" in line:
            current = line.split(" (")[0]
        elif line.strip().startswith("q_") and current:
            section[line.split()[0]] = current
    assert section["q_mixed"] == "mixed"
    assert section["q_cont"] == "contention"
    assert section["q_reg"] == "REGRESSION?"
