"""Stateful streaming near-duplicate detection: first-wins MinHash-LSH
dedup OVER THE STREAM ITSELF.

`streaming/ingest.py` already covers the two bounded-state forms —
watermarked exact dedup (`clean_corpus_stream`) and screening arrivals
against a STATIC history snapshot (`screen_stream_near_dups`). What
neither can answer is "is this document a near-duplicate of anything
that has arrived earlier IN THIS STREAM?" — the question a continuous
crawl-ingest pipeline asks of every page. The corpus-wide band JOIN is
not stream-expressible, but the corpus-wide band STATE is: keep, per
LSH bucket, only the FIRST document that ever claimed it. A new arrival
is a near-duplicate iff any of its band buckets is already claimed by an
earlier document — exactly the reference's KV-store shape
(OrderProjectionTopology.java:48-52 holds per-key state in RocksDB; here
the key is the LSH bucket instead of the order id).

State is bounded by the number of DISTINCT band buckets, not documents
and never pairs: duplicates add no state (their buckets are already
claimed), so state grows with the corpus's novelty rate. At 100 TB the
bucket keyspace shards across the stateful shuffle like any keyed state,
and the RocksDB provider (app.py:apply_state_store_config) keeps it
off-heap. By default no timeout is registered — dedup history must not
expire; for INFINITE streams, ``ttl_ms`` turns on retention-window
dedup (a bucket idle for the TTL is forgotten, every touch re-arms —
LRU semantics), the standard bounded-state trade. Exact sliding-window
dedup on content hashes remains `dedup_within_watermark` upstream.

Semantics are PINNED to the batch registry query
`near_dup_first_wins` (queries_training.py): with arrival order == seq
order, the stream's verdicts are bit-equal to the batch query's output
(tests/test_dedup_stream.py proves it file-by-file through a real
file-source stream). The batch query is strict-oracled against DuckDB,
so the streaming operator inherits a value-checked oracle.

For OUT-OF-ORDER arrival, `band_decisions_stream_event_time` is the
REPLAY-DETERMINISTIC twin (the same relationship unify_stream_event_time
has to unify_stream): verdicts are decided by the watermark instead of
arrival, so the bucket's exemplar is the global minimum seq and the
output is bit-equal to the batch query under ANY arrival order within
the watermark delay — and identical across replays regardless of
micro-batch slicing. Its bounded-state option is ``retention_ms``
(the event-time twin of ``ttl_ms``): exemplars idle past a
watermark-driven event-time horizon are forgotten, so even the
forgetting replays deterministically.

CHECKPOINT COMPATIBILITY: adding ``last_ts`` (round 9) widened the
event-time kernels' state row. A stream restarted from a pre-change
checkpoint is handled defensively in Python (old 5/7-field tuples read
as ``last_ts=None``; retention re-arms on the bucket's next touch), but
Spark's JVM-side state deserializer may reject the widened schema
before Python runs — event-time dedup streams upgraded across that
change should restart on a FRESH checkpoint.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# per-(band, band_key) rows emitted by the stateful op; the per-document
# verdict is the OR across a document's bands (near_dup_verdicts)
BAND_DECISION_SCHEMA = (
    "doc_id long, seq long, band long, is_dup boolean, dup_of long"
)
# verified mode adds the estimated jaccard vs the bucket exemplar
# (fraction of equal minhash components — exact k/num_hashes doubles)
BAND_DECISION_VERIFIED_SCHEMA = BAND_DECISION_SCHEMA + ", est double"
# the claimed-bucket exemplar: first arrival's (seq, id)
BUCKET_STATE_SCHEMA = "first_seq long, first_id long"
# verified mode also stores the exemplar's full signature
BUCKET_STATE_VERIFIED_SCHEMA = BUCKET_STATE_SCHEMA + ", sig array<long>"


def make_bucket_first_wins_fn(ttl_ms: int | None = None):
    """Stateful kernel: per (band, band_key) group, the first-arriving
    document claims the bucket; every later arrival is flagged against
    the exemplar. Rows within a micro-batch are processed in (seq,
    doc_id) order so intra-batch arrivals resolve exactly like
    cross-batch ones.

    ``ttl_ms`` (requires ProcessingTimeTimeout wiring) bounds state for
    infinite streams: a bucket untouched for the TTL is forgotten — its
    next claimant becomes a fresh exemplar, so the dedup horizon is
    "anything seen within the retention window", the standard trade for
    unbounded ingest. Every touch re-arms the timer (LRU semantics:
    frequently re-sent content stays deduped forever).
    """

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # retention expired with no arrivals: forget the exemplar
            # (empty generator — nothing to emit for a timeout)
            state.remove()
            return
        band = int(key[0])  # key order is (band, band_key)
        rows = pd.concat(
            [p[["doc_id", "seq"]] for p in pdfs], ignore_index=True
        ).sort_values(["seq", "doc_id"])
        if state.exists:
            first_seq, first_id = state.get
        else:
            first_seq, first_id = None, None
        out = {"doc_id": [], "seq": [], "band": [], "is_dup": [], "dup_of": []}
        for doc_id, seq in rows.itertuples(index=False):
            doc_id, seq = int(doc_id), int(seq)
            if first_seq is None:
                first_seq, first_id = seq, doc_id
                dup, of = False, None
            else:
                dup, of = True, first_id
            out["doc_id"].append(doc_id)
            out["seq"].append(seq)
            out["band"].append(band)
            out["is_dup"].append(dup)
            out["dup_of"].append(of)
        state.update((first_seq, first_id))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out)

    return fn


def make_bucket_verified_fn(
    threshold: float, num_hashes: int, ttl_ms: int | None = None
):
    """Verified variant: the exemplar's FULL minhash signature lives in
    the bucket state; a collision is a duplicate only when the estimated
    jaccard (fraction of equal signature components — exact k/num_hashes
    doubles, no float drift) clears ``threshold``. False-positive
    colliders are flagged is_dup=false with their est, and do NOT claim
    the bucket (the exemplar stays first-wins).
    """

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        band = int(key[0])  # key order is (band, band_key)
        rows = pd.concat(
            [p[["doc_id", "seq", "_sig"]] for p in pdfs], ignore_index=True
        ).sort_values(["seq", "doc_id"])
        if state.exists:
            first_seq, first_id, first_sig = state.get
            first_sig = list(first_sig)
        else:
            first_seq, first_id, first_sig = None, None, None
        out = {
            "doc_id": [], "seq": [], "band": [],
            "is_dup": [], "dup_of": [], "est": [],
        }
        for doc_id, seq, sig in rows.itertuples(index=False):
            doc_id, seq = int(doc_id), int(seq)
            sig = [int(x) for x in sig]
            if first_seq is None:
                first_seq, first_id, first_sig = seq, doc_id, sig
                dup, of, est = False, None, None
            else:
                n_eq = sum(a == b for a, b in zip(sig, first_sig))
                est = n_eq / num_hashes
                dup = est >= threshold
                of = first_id if dup else None
            out["doc_id"].append(doc_id)
            out["seq"].append(seq)
            out["band"].append(band)
            out["is_dup"].append(dup)
            out["dup_of"].append(of)
            out["est"].append(est)
        state.update((first_seq, first_id, first_sig))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out)

    return fn


def band_decisions_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    seq_col: str = "seq",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    verify_threshold: float | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-band first-wins decisions for a STREAM of (id, seq, text).

    Band keys are pure scan-local expressions (minhash_band_cols_local —
    no pre-state aggregation, so the plan stays legal in append mode);
    the only shuffle is the stateful groupBy on (band, band_key). `seq`
    is the arrival order (any unique monotone long — an offset, a file
    sequence number, or the id itself when ids are assigned on arrival).

    With ``verify_threshold`` set, the full minhash signature rides into
    the bucket state and a collision only counts as a duplicate when the
    estimated jaccard vs the exemplar clears the threshold — the in-stream
    analogue of the batch candidate-verify step, filtering LSH false
    positives at the cost of num_hashes longs per bucket. Batch twin:
    `near_dup_verified` (strict-oracled).

    Returns an append-mode stream with BAND_DECISION_SCHEMA (plus `est`
    in verified mode); reduce to per-document verdicts with
    `near_dup_verdicts` (all of a document's band rows surface in the
    same micro-batch, so a foreachBatch aggregation is exact).
    """
    from kafka_stream_unify_order_messages_spark.operators.dedup import (
        minhash_band_cols_local,
        minhash_sig_band_cols_local,
    )

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(seq_col).cast("long").alias("seq"),
        F.col(text_col).alias("text"),
    )
    verified = verify_threshold is not None
    keyed_fn = minhash_sig_band_cols_local if verified else minhash_band_cols_local
    keyed = keyed_fn(
        base,
        text_col="text",
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    carry = [F.col("_sig")] if verified else []
    long_rows = keyed.select(
        "doc_id",
        "seq",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("band"),
                        F.col(f"_bk{b}").alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bk"),
    ).select("doc_id", "seq", *(["_sig"] if verified else []),
             F.col("_bk.band").alias("band"),
             F.col("_bk.band_key").alias("band_key"))
    if verified:
        fn = make_bucket_verified_fn(verify_threshold, num_hashes, ttl_ms)
        out_schema, state_schema = (
            BAND_DECISION_VERIFIED_SCHEMA, BUCKET_STATE_VERIFIED_SCHEMA,
        )
    else:
        fn = make_bucket_first_wins_fn(ttl_ms)
        out_schema, state_schema = BAND_DECISION_SCHEMA, BUCKET_STATE_SCHEMA
    # ttl_ms bounds state for infinite streams (retention-window dedup);
    # without it the dedup history is permanent by design — see module
    # docstring
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return long_rows.groupBy("band", "band_key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def near_dup_verdicts(band_decisions: DataFrame) -> DataFrame:
    """Collapse per-band decisions to per-document verdicts: a document
    is a near-duplicate iff ANY band bucket was already claimed (and, in
    verified mode, the exemplar cleared the similarity threshold);
    `dup_of` is the smallest exemplar id among its qualifying buckets
    (deterministic, and equal to the batch query's min-over-firsts). In
    verified mode `best_est` is the max estimated jaccard vs any earlier
    exemplar, qualifying or not.

    Stateless per document — apply inside foreachBatch (every band row
    of a document lands in the same micro-batch) or over any union of
    emitted batches.
    """
    aggs = [
        F.max("is_dup").alias("is_dup"),
        F.min(F.when(F.col("is_dup"), F.col("dup_of"))).alias("dup_of"),
    ]
    if "est" in band_decisions.columns:
        aggs.append(F.max("est").alias("best_est"))
    return band_decisions.groupBy("doc_id", "seq").agg(*aggs)


# event-time variant: a pending buffer rides in the bucket state until
# the watermark passes each document's event time; last_ts records the
# event time of the bucket's most recent touch (the retention clock)
BUCKET_STATE_EVENT_SCHEMA = (
    "first_seq long, first_id long,"
    " pend_seqs array<long>, pend_ids array<long>, pend_ts array<long>,"
    " last_ts long"
)
# verified event-time: exemplar signature + per-pending-doc signatures
BUCKET_STATE_EVENT_VERIFIED_SCHEMA = (
    "first_seq long, first_id long, sig array<long>,"
    " pend_seqs array<long>, pend_ids array<long>, pend_ts array<long>,"
    " pend_sigs array<array<long>>, last_ts long"
)


def make_bucket_first_wins_event_fn(retention_ms: int | None = None):
    """SEQ-DETERMINISTIC first-wins kernel (event-time twin of
    ``make_bucket_first_wins_fn``): the bucket's exemplar is the MINIMUM
    ``seq`` among all documents that ever touch it — the batch query
    ``near_dup_first_wins``'s ``min(doc_id)`` — regardless of arrival
    order, as long as every document arrives within the watermark delay
    of its event time.

    Mechanism: arrivals buffer in state; a buffered document is DECIDED
    only once the watermark reaches its event time (``ts <= wm``),
    because then no lower-seq claimant can still arrive (Spark's
    pre-state late filter drops arrivals with event time <= watermark,
    and event times must be monotone in ``seq`` — derive them from the
    offset, as ``band_decisions_stream_event_time`` does). Decidable
    rows resolve in (seq, doc_id) order, so the first decision a bucket
    ever makes is its global-minimum seq: replaying the same input gives
    the same verdicts for ANY micro-batch slicing — the determinism the
    processing-time kernel (and the reference's wall-clock punctuation)
    only has under seq-ordered arrival.

    By default the exemplar half of the state is permanent (dedup
    history never expires) and only the pending buffer arms an
    event-time timeout, at the earliest undecided event time. For
    INFINITE streams ``retention_ms`` is the event-time twin of the
    processing-time kernel's ``ttl_ms``: a bucket whose last touch's
    EVENT TIME (``last_ts``) falls ``retention_ms`` behind the watermark
    forgets its exemplar — the next claimant is fresh, so the dedup
    horizon is "anything seen within the retention window of event
    time". Every touch re-arms (LRU semantics), and the horizon is
    watermark-driven, so it is as replay-deterministic as the verdicts:
    the same input forgets the same exemplars at the same watermarks
    under any micro-batch slicing. Retention can never race a pending
    decision: while rows pend, ``last_ts >= max(pending ts) > wm``, so
    the idle horizon is unreachable until the buffer drains.
    """

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])  # key order is (band, band_key)
        if state.exists:
            st = state.get
            if len(st) == 5:
                # pre-retention checkpoint layout (no last_ts column):
                # tolerate it as last_ts=None — retention re-arms on the
                # bucket's next touch. Upgrade path (verified by
                # test_pre_retention_5field_checkpoint_compat): under the
                # default stateStore.stateSchemaCheck=true a restart on a
                # 5-field checkpoint fails fast with the named
                # STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE error; with the
                # check disabled for ONE upgrade run, the old row
                # deserializes correctly under the widened schema (a
                # trailing nullable long is positionally safe), this
                # branch reads it, and re-writes store 6 fields —
                # re-enable the check afterwards. Operator-facing
                # runbook: docs/DEPLOYMENT.md §5 "State-schema upgrades
                # on a live checkpoint".
                first_seq, first_id, p_seqs, p_ids, p_ts = st
                last_ts = None
            else:
                first_seq, first_id, p_seqs, p_ids, p_ts, last_ts = st
            pend = sorted(zip(p_seqs, p_ids, p_ts))
        else:
            first_seq, first_id, pend, last_ts = None, None, [], None
        if not state.hasTimedOut:
            for pdf in pdfs:
                for doc_id, seq, ts in pdf[
                    ["doc_id", "seq", "_ts_ms"]
                ].itertuples(index=False):
                    ts = int(ts)
                    pend.append((int(seq), int(doc_id), ts))
                    if last_ts is None or ts > last_ts:
                        last_ts = ts
            pend.sort()
        wm = state.getCurrentWatermarkMs()
        out = {
            "doc_id": [], "seq": [], "band": [], "is_dup": [], "dup_of": []
        }
        remaining = []
        for seq, doc_id, ts in pend:
            # decidable at ts <= wm: Spark's pre-state late filter drops
            # arriving rows with event time <= watermark (measured: a
            # ts==0 row vanished against the initial 0 watermark), so
            # once wm reaches a pending row's ts no lower-seq claimant
            # at or below it can ever arrive — deciding AT equality is
            # safe and keeps latency one timeout-hop lower than a strict
            # rule would. Event times must therefore be STRICTLY
            # positive — the initial watermark is 0 and would eat a
            # ts==0 row. The ts == wm boundary is pinned by
            # tests/test_dedup_stream.py.
            if ts <= wm:
                if first_seq is None:
                    first_seq, first_id = seq, doc_id
                    dup, of = False, None
                else:
                    dup, of = True, first_id
                out["doc_id"].append(doc_id)
                out["seq"].append(seq)
                out["band"].append(band)
                out["is_dup"].append(dup)
                out["dup_of"].append(of)
            else:
                remaining.append((seq, doc_id, ts))
        if (
            retention_ms is not None
            and not remaining
            and first_seq is not None
            and last_ts is not None
            and wm >= last_ts + retention_ms
        ):
            # idle past the event-time horizon: forget the exemplar (any
            # rows decided this call still emit below)
            state.remove()
            if out["doc_id"]:
                yield pd.DataFrame(out)
            return
        state.update(
            (
                first_seq,
                first_id,
                [s for s, _d, _t in remaining],
                [d for _s, d, _t in remaining],
                [t for _s, _d, t in remaining],
                last_ts,
            )
        )
        if remaining:
            fire_at = min(t for _s, _d, t in remaining)
        elif retention_ms is not None and first_seq is not None:
            fire_at = last_ts + retention_ms
        else:
            fire_at = None
        if fire_at is not None:
            # fire when the watermark passes the earliest undecided
            # event time (or, with retention and an empty buffer, the
            # idle horizon). The wm+1 clamp is a defensive invariant,
            # not behavior: EventTimeTimeout requires a timestamp
            # STRICTLY above the watermark, and under the `ts <= wm`
            # decide rule every remaining ts already exceeds wm (rows at
            # ts <= wm just decided), while an un-forgotten horizon
            # satisfies last_ts + retention_ms > wm (else the branch
            # above removed the state) — so the max() never alters
            # fire_at; it only guards the Spark contract if either
            # invariant is ever broken.
            state.setTimeoutTimestamp(max(fire_at, wm + 1))
        if out["doc_id"]:
            yield pd.DataFrame(out)

    return fn


def make_bucket_verified_event_fn(
    threshold: float, num_hashes: int, retention_ms: int | None = None
):
    """Verified + seq-deterministic: the event-time kernel carrying the
    exemplar's full minhash signature (make_bucket_verified_fn's rule:
    a collision is a duplicate only when the estimated jaccard clears
    ``threshold``; sub-threshold colliders never claim the bucket) on
    the watermark-decided pending buffer (make_bucket_first_wins_event_fn's
    mechanism — see its docstring for the decide rule and for
    ``retention_ms``, the watermark-driven event-time exemplar horizon)."""

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0])  # key order is (band, band_key)
        if state.exists:
            st = state.get
            if len(st) == 7:
                # pre-retention checkpoint layout (no last_ts) — see the
                # first-wins kernel's note on JVM-side schema acceptance
                first_seq, first_id, first_sig, p_seqs, p_ids, p_ts, p_sigs = st
                last_ts = None
            else:
                (
                    first_seq, first_id, first_sig,
                    p_seqs, p_ids, p_ts, p_sigs, last_ts,
                ) = st
            first_sig = list(first_sig) if first_sig is not None else None
            pend = sorted(
                zip(p_seqs, p_ids, p_ts, [list(g) for g in p_sigs])
            )
        else:
            first_seq, first_id, first_sig, pend, last_ts = (
                None, None, None, [], None,
            )
        if not state.hasTimedOut:
            for pdf in pdfs:
                for doc_id, seq, ts, sig in pdf[
                    ["doc_id", "seq", "_ts_ms", "_sig"]
                ].itertuples(index=False):
                    ts = int(ts)
                    pend.append(
                        (int(seq), int(doc_id), ts,
                         [int(x) for x in sig])
                    )
                    if last_ts is None or ts > last_ts:
                        last_ts = ts
            pend.sort()
        wm = state.getCurrentWatermarkMs()
        out = {
            "doc_id": [], "seq": [], "band": [],
            "is_dup": [], "dup_of": [], "est": [],
        }
        remaining = []
        for seq, doc_id, ts, sig in pend:
            if ts <= wm:  # decide rule: see make_bucket_first_wins_event_fn
                if first_seq is None:
                    first_seq, first_id, first_sig = seq, doc_id, sig
                    dup, of, est = False, None, None
                else:
                    n_eq = sum(a == b for a, b in zip(sig, first_sig))
                    est = n_eq / num_hashes
                    dup = est >= threshold
                    of = first_id if dup else None
                out["doc_id"].append(doc_id)
                out["seq"].append(seq)
                out["band"].append(band)
                out["is_dup"].append(dup)
                out["dup_of"].append(of)
                out["est"].append(est)
            else:
                remaining.append((seq, doc_id, ts, sig))
        if (
            retention_ms is not None
            and not remaining
            and first_seq is not None
            and last_ts is not None
            and wm >= last_ts + retention_ms
        ):
            state.remove()
            if out["doc_id"]:
                yield pd.DataFrame(out)
            return
        state.update(
            (
                first_seq,
                first_id,
                first_sig,
                [s for s, _d, _t, _g in remaining],
                [d for _s, d, _t, _g in remaining],
                [t for _s, _d, t, _g in remaining],
                [g for _s, _d, _t, g in remaining],
                last_ts,
            )
        )
        if remaining:
            fire_at = min(t for _s, _d, t, _g in remaining)
        elif retention_ms is not None and first_seq is not None:
            fire_at = last_ts + retention_ms
        else:
            fire_at = None
        if fire_at is not None:
            # wm+1 clamp: defensive invariant only — see
            # make_bucket_first_wins_event_fn
            state.setTimeoutTimestamp(max(fire_at, wm + 1))
        if out["doc_id"]:
            yield pd.DataFrame(out)

    return fn


def band_decisions_stream_event_time(
    docs: DataFrame,
    id_col: str = "doc_id",
    seq_col: str = "seq",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    verify_threshold: float | None = None,
    watermark_delay: str = "2 seconds",
    retention_ms: int | None = None,
) -> DataFrame:
    """REPLAY-DETERMINISTIC per-band first-wins decisions: the
    event-time twin of ``band_decisions_stream``, exactly as
    ``unify_stream_event_time`` twins ``unify_stream``.

    The processing-time kernel matches the strict-oracled batch query
    ``near_dup_first_wins`` only under seq-ordered arrival (first
    ARRIVAL claims the bucket); this variant matches it under ANY
    arrival order within ``watermark_delay``, and re-running the same
    input under a different micro-batch slicing yields identical
    verdicts. Event time is derived FROM ``seq`` (epoch millis), making
    it strictly monotone in seq by construction — with a real Kafka
    source, use the record timestamp and a seq that is monotone in it
    (e.g. the offset).

    ``verify_threshold`` composes exactly as in ``band_decisions_stream``:
    the exemplar's full minhash signature rides in state and a collision
    only counts as a duplicate when the estimated jaccard clears the
    threshold (sub-threshold colliders never claim the bucket) — here
    against the SEQ-MINIMUM exemplar rather than the first arrival.

    ``retention_ms`` is the event-time twin of ``band_decisions_stream``'s
    ``ttl_ms`` for INFINITE streams: a bucket whose last touch's event
    time falls ``retention_ms`` behind the watermark forgets its
    exemplar (next claimant is fresh — the retention-window recall
    trade). Because the horizon is watermark-driven, forgetting is as
    replay-deterministic as the verdicts. Default None = permanent
    dedup history.

    Cost of determinism: decisions wait out the watermark delay (the
    same latency trade as the event-time unify leg, measured in
    STREAMING_DEDUP.md's event rows). The throughput gap vs the
    processing-time kernel is TUNABLE, not fixed: larger micro-batches
    let more rows decide in the batch that carries them instead of via
    a later timeout touch — measured 0.53x -> 0.77x of sustained
    throughput going from 10-batch to single-batch ingest at 100k docs
    (STREAMING_DEDUP.md event-mode tuning section); the residual is the
    irreducible buffer+decide double handling. Pending rows
    buffer in state until decidable — bounded by arrival-rate x delay,
    on top of the one-exemplar-per-bucket state (permanent unless
    ``retention_ms``). A document's
    band rows may surface in different micro-batches (each bucket's
    timeout fires independently), so aggregate verdicts over the drained
    frame or with a downstream stateful aggregation, not per-batch.
    """
    from kafka_stream_unify_order_messages_spark.operators.dedup import (
        minhash_band_cols_local,
        minhash_sig_band_cols_local,
    )

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(seq_col).cast("long").alias("seq"),
        F.col(text_col).alias("text"),
    )
    verified = verify_threshold is not None
    keyed_fn = (
        minhash_sig_band_cols_local if verified else minhash_band_cols_local
    )
    keyed = keyed_fn(
        base,
        text_col="text",
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    carry = ["_sig"] if verified else []
    long_rows = (
        keyed.select(
            "doc_id",
            "seq",
            *carry,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).cast("long").alias("band"),
                            F.col(f"_bk{b}").alias("band_key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("_bk"),
        )
        .select(
            "doc_id",
            "seq",
            *carry,
            F.col("_bk.band").alias("band"),
            F.col("_bk.band_key").alias("band_key"),
        )
        .withColumn("_ts_ms", F.col("seq"))
        .withColumn("_event_time", F.timestamp_millis(F.col("seq")))
        .withWatermark("_event_time", watermark_delay)
    )
    if verified:
        fn = make_bucket_verified_event_fn(
            verify_threshold, num_hashes, retention_ms
        )
        out_schema, state_schema = (
            BAND_DECISION_VERIFIED_SCHEMA,
            BUCKET_STATE_EVENT_VERIFIED_SCHEMA,
        )
    else:
        fn = make_bucket_first_wins_event_fn(retention_ms)
        out_schema, state_schema = (
            BAND_DECISION_SCHEMA, BUCKET_STATE_EVENT_SCHEMA,
        )
    return long_rows.groupBy("band", "band_key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
