"""Streaming heavy hitters (streaming/heavy_hitters_stream.py): the
sharded Misra-Gries state must deliver its contract against the batch
twin `operators/sketches.py:heavy_hitters_exact` (strict-oracled via
the `bigram_heavy_hitters` registry query):

- the thresholded candidate set is a SUPERSET of the exact heavy
  hitters at the same den, whatever the micro-batch slicing;
- every emitted [lb, lb + d_max] interval contains the true count;
- with capacity >= distinct items, Misra-Gries never decrements and
  the stream's final counts are BIT-EQUAL to the exact batch counts;
- items heavy only CUMULATIVELY (light in every single micro-batch)
  are found — the part that exercises persisted shard state.
"""

from __future__ import annotations

import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.operators import sketches as SK
from kafka_stream_unify_order_messages_spark.streaming.heavy_hitters_stream import (
    heavy_hitter_candidates_stream,
    heavy_hitters_from_candidates,
    latest_candidate_snapshot,
    make_shard_mg_fn,
)

from conftest import SF_DIR

SCHEMA = "item string"


def _write_chunk(src_dir, items, n):
    pq.write_table(
        pa.table({"item": list(items)}), f"{src_dir}/chunk-{n:04d}.parquet"
    )


def _run_stream(spark, tmp_path, chunks, **kw):
    src = tmp_path / "in"
    src.mkdir(exist_ok=True)
    name = f"hh_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    query = (
        heavy_hitter_candidates_stream(stream, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        for n, chunk in enumerate(chunks):
            _write_chunk(src, chunk, n)
            query.processAllAvailable()
    finally:
        query.stop()
    return latest_candidate_snapshot(spark.table(name))


def _doc_bigrams(spark, n_docs=60):
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n_docs)
        .collect()
    )
    grams = []
    for r in rows:
        toks = str(r["text"]).lower().split()
        grams.extend(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    return grams


def _zipf_corpus():
    """Deterministic Zipf-ish stream: item w{j} occurs floor(3000/j)
    times over j = 1..2000 (~24.8k arrivals, 2000 distinct — an order
    of magnitude over the summary capacity, so decrements fire
    constantly), deterministically shuffled."""
    import random

    items = [
        f"w{j}" for j in range(1, 2001) for _ in range(3000 // j)
    ]
    random.Random(7).shuffle(items)
    return items


def _check_contract(spark, snap, items, den):
    """Shared assertions: superset of the exact batch twin, sound
    per-candidate intervals, total reconciliation."""
    got = heavy_hitters_from_candidates(snap, den)
    items_df = spark.createDataFrame([(t,) for t in items], SCHEMA)
    exact = {
        r["item"]: r["n_item"]
        for r in SK.heavy_hitters_exact(items_df, den=den).collect()
    }
    from collections import Counter

    true_counts = Counter(items)
    got_rows = {r["item"]: (r["lb"], r["ub"]) for r in got.collect()}
    assert exact, "test corpus produced no exact heavy hitters"
    missing = set(exact) - set(got_rows)
    assert not missing, f"stream lost true heavy hitters: {missing}"
    snap_rows = snap.collect()
    for r in snap_rows:
        true = true_counts[r["item"]]
        assert r["lb"] <= true <= r["lb"] + r["d_max"], (
            r["item"], r["lb"], r["d_max"], true,
        )
    per_shard = {}
    for r in snap_rows:
        per_shard[r["shard"]] = r["n_shard"]
    assert sum(per_shard.values()) == len(items)
    return exact, got_rows


def test_superset_under_heavy_decrement_pressure(spark, tmp_path):
    """2000 distinct items through capacity-200 summaries: decrements
    fire constantly, yet the ~12 true heavy hitters must all survive
    with sound bounds."""
    den, k, shards = 100, 200, 8
    items = _zipf_corpus()
    third = len(items) // 3
    chunks = [items[:third], items[third : 2 * third], items[2 * third :]]
    snap = _run_stream(
        spark, tmp_path, chunks, den=den, k=k, shards=shards
    ).cache()
    exact, got_rows = _check_contract(spark, snap, items, den)
    # the Zipf construction really exercises pressure: w1 is heavy and
    # the threshold sits around rank ~12
    assert "w1" in exact and len(exact) >= 5
    snap.unpersist()


def test_superset_on_document_bigrams(spark, tmp_path):
    """Real-data twin of the registry query `bigram_heavy_hitters`:
    document bigrams (874 distinct at this slice) through capacity-600
    summaries."""
    den = 300
    grams = _doc_bigrams(spark)
    half = len(grams) // 2
    chunks = [grams[:half], grams[half:]]
    snap = _run_stream(spark, tmp_path, chunks, den=den, shards=8).cache()
    _check_contract(spark, snap, grams, den)
    snap.unpersist()


def test_exact_when_capacity_exceeds_distinct(spark, tmp_path):
    """k >= distinct items => no decrement ever happens, d_max == 0,
    and the stream's final counts equal the exact batch counts."""
    items = (
        ["alpha"] * 30 + ["beta"] * 20 + ["gamma"] * 7 + ["delta"] * 3
    )
    # interleave so every chunk sees every item
    chunks = [items[i::3] for i in range(3)]
    snap = _run_stream(
        spark, tmp_path, chunks, den=4, k=64, shards=4
    )
    rows = snap.collect()
    assert all(r["d_max"] == 0 for r in rows)
    got = {r["item"]: r["lb"] for r in rows}
    assert got == {"alpha": 30, "beta": 20, "gamma": 7, "delta": 3}
    hh = {
        r["item"]: (r["lb"], r["ub"])
        for r in heavy_hitters_from_candidates(snap, den=4).collect()
    }
    # ceil(60/4)=15: alpha and beta qualify, bounds are exact
    assert hh == {"alpha": (30, 30), "beta": (20, 20)}


def test_cumulative_heavy_hitter_across_batches(spark, tmp_path):
    """An item light in every micro-batch but heavy overall must be
    found: 5 x 8 occurrences of 'needle' among 5 x 90 distinct fillers,
    under a capacity that forces decrements every batch."""
    chunks = [
        ["needle"] * 8 + [f"filler-{b}-{i}" for i in range(90)]
        for b in range(5)
    ]
    n = sum(len(c) for c in chunks)  # 490
    den = 12  # threshold ceil(490/12) = 41 > any filler, < needle's 40?
    # needle count = 40, threshold 41 — adjust: use den=13 -> ceil=38
    den = 13
    snap = _run_stream(
        spark, tmp_path, chunks, den=den, shards=4
    )
    got = {r["item"] for r in
           heavy_hitters_from_candidates(snap, den=den).collect()}
    assert "needle" in got
    nrow = [r for r in snap.collect() if r["item"] == "needle"]
    assert nrow and nrow[0]["lb"] <= 40 <= nrow[0]["lb"] + nrow[0]["d_max"]
    assert n == 490


def test_kernel_matches_batch_kernel_semantics():
    """The streaming kernel's merge is the batch kernel's merge: fold
    the same arrivals through make_shard_mg_fn in two slicings and
    through one pandas pass; the (item -> lb) maps must agree when no
    decrement triggers, and totals must always agree."""
    import pandas as pd

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    items = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    fn = make_shard_mg_fn(k=8)
    for slicing in ([items], [items[:4], items[4:7], items[7:]]):
        st = FakeState()
        out = None
        for chunk in slicing:
            out = list(fn((0,), iter([pd.DataFrame({"item": chunk})]), st))[-1]
        got = dict(zip(out["item"], out["lb"]))
        assert got == {"a": 5, "b": 3, "c": 2, "d": 1}
        assert out["n_shard"].iloc[0] == len(items)
        assert out["d_max"].iloc[0] == 0


def test_capacity_validation():
    import pytest

    with pytest.raises(ValueError, match="k must be >= 1"):
        make_shard_mg_fn(0)

    from kafka_stream_unify_order_messages_spark.streaming import (
        heavy_hitters_stream as H,
    )

    with pytest.raises(ValueError, match="survival guarantee"):
        H.heavy_hitter_candidates_stream(None, den=100, k=50)
    with pytest.raises(ValueError, match="den must be >= 1"):
        H.heavy_hitter_candidates_stream(None, den=0)
    with pytest.raises(ValueError, match="shards must be >= 1"):
        H.heavy_hitter_candidates_stream(None, shards=0)
